"""Explicit skew handling: salting helpers for hot keys.

The audio table's ``codec`` is deliberately skewed (~80% pcm_s16le,
FIXTURES.md §1) and at 10^12 rows any per-codec or per-duration-bucket
aggregation beyond plain count (collect-like, distinct-like) concentrates on
a few reducers. Two mitigations, per the north rule ("explicit salting and
AQE skew-join hints"):

1. AQE (always on, session.py): splits skewed SMJ partitions and coalesces
   small ones at runtime — handles joins.
2. Explicit two-stage salting (this module) for aggregations whose partial
   state does NOT collapse map-side (e.g. approx-distinct per key, large
   collect_set-like state): stage 1 aggregates (key, salt) over S random
   salts, stage 2 merges the S partials per key. For algebraic aggregates
   (count/sum/min/max) Spark's hash-aggregate partial step already achieves
   the same collapse — documented so the salt isn't cargo-culted onto them.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, salt_col: str = "__salt") -> DataFrame:
    """Deterministic row salt (hash of all columns), uniform over n_salts."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_distinct_count(
    df: DataFrame, key: str, value: str, n_salts: int = 16, rsd: float = 0.05
) -> DataFrame:
    """approx distinct values per key without a hot reducer.

    HLL sketches don't merge across groupBy rows in DataFrame API, so the
    salted two-stage uses exact distinct within (key, salt) — each salt
    partition holds ~1/S of the hot key's values — then sums distinct
    shards (upper bound; exact when values don't repeat across salts, which
    hash-salting by VALUE guarantees).
    """
    stage1 = (
        df.withColumn("__salt", F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)))
        .groupBy(key, "__salt")
        .agg(F.count_distinct(F.col(value)).alias("__d"))
    )
    # value-hash salting => a given value always lands in ONE salt shard, so
    # the shard distinct-counts sum to the exact per-key distinct count
    return stage1.groupBy(key).agg(F.sum("__d").alias("distinct_count"))


def skewed_group_metrics(
    df: DataFrame, key: str, value_exprs: Sequence[tuple[str, Column]], n_salts: int = 16
) -> DataFrame:
    """Generic two-stage salted aggregation: (key, salt) partials → merge.

    ``value_exprs`` = [(name, aggregate Column)] where the aggregate is
    re-mergeable by SUM (counts, sums). Use for pipelines where stage-1
    output feeds further per-key work and the hot key must be pre-split.
    """
    salted = with_salt(df, n_salts)
    stage1 = salted.groupBy(key, "__salt").agg(
        *[expr.alias(f"__{name}") for name, expr in value_exprs]
    )
    return stage1.groupBy(key).agg(
        *[F.sum(f"__{name}").alias(name) for name, _ in value_exprs]
    )
