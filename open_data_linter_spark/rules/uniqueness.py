"""Key-uniqueness rule via salted two-stage aggregation.

North-rule mandate: "uniqueness on clip_id via salted repartition-and-count"
(BASELINE.json north_star). The scalable shape:

    stage 1 (NO shuffle): groupBy(key, spark_partition_id()).count()
            — pure map-side; a key duplicated a billion times within one
            partition collapses to one row before anything moves.
    stage 2 (shuffle of pre-aggregated rows only): groupBy(key).sum(cnt)
            — the shuffle carries at most (#partitions x #distinct keys
            present per partition) rows, never the raw table.

``spark_partition_id()`` is the salt: it is deterministic for a given scan,
free, and guarantees stage 1 never shuffles. This generalizes the hot-key
salting pattern; AQE's skew handling covers residual stage-2 skew.

Generalizes the reference's duplicate-detection spirit (SURVEY.md §2.6);
the reference itself has no key concept (positional columns only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_data_linter_spark.core.model import Rule, RuleOutcome, RuleScope


def duplicate_keys(df: DataFrame, key: str = "clip_id") -> DataFrame:
    """Keys occurring more than once: (key, dup_count)."""
    stage1 = (
        df.where(F.col(key).isNotNull())
        .groupBy(F.col(key), F.spark_partition_id().alias("__salt"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    return (
        stage1.groupBy(key)
        .agg(F.sum("__cnt").alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )


def make_uniqueness_rule(key: str = "clip_id", rule_id: str = "uniq") -> Rule:
    message = f"duplicate {key}"

    def runner(spark: SparkSession, df: DataFrame, ctx: dict) -> RuleOutcome:
        dups = duplicate_keys(df, key)
        # tiny result at sane dup rates; count() triggers the two-stage agg
        n_dup_keys = dups.count()
        violations = None
        if n_dup_keys > 0:
            violations = dups.select(
                F.lit(rule_id).alias("rule_id"),
                F.col(key).alias("clip_id"),
                F.lit(key).alias("column"),
                F.concat(F.lit(message + " x"), F.col("dup_count")).alias("message"),
                F.lit(None).cast("int").alias("partition_id"),
            )
        return RuleOutcome(
            rule_id,
            is_valid=n_dup_keys == 0,
            violations=violations,
            metrics={"duplicate_key_count": float(n_dup_keys)},
        )

    return Rule(
        rule_id=rule_id,
        description=f"{key} must be unique (salted two-stage count)",
        scope=RuleScope.SHUFFLE,
        message=message,
        runner=runner,
    )
