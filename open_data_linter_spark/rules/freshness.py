"""Group freshness: how stale is each partition of an event-time table?

The reference validates files that are already in hand; a warehouse
table is also wrong when data simply STOPS ARRIVING — an upstream
producer dies and one ``event_type`` (or source, or shard) silently
flatlines while the table as a whole keeps growing. Freshness is the
completeness rule (reference check 1-6, csv_linter.py:216-232) projected
onto event time: instead of "cells that should be filled are empty",
"groups that should be current are stale".

``check_freshness`` reports, per group:

- ``last_ts``  — the group's newest event (``max(ts)``)
- ``lag_s``    — whole seconds between ``last_ts`` and the as-of point
  (floor; computed on exact epoch microseconds so every SQL engine
  replays it bit-for-bit — NOT ``timestampdiff``, whose boundary-crossing
  vs truncation semantics differ across engines)
- ``stale``    — ``lag_s > max_lag_s``; a group whose timestamps are all
  NULL has no ``last_ts`` and is reported stale (missing data is the
  staleness worst case, not an excuse)

The as-of point defaults to the observed global ``max(ts)`` — the right
anchor for batch validation, where "now" is the snapshot's own frontier
and wall-clock time would make the check non-reproducible. Pass
``as_of`` (an ISO timestamp string) to anchor against an external clock
instead.

Plan shape: one partial-aggregated groupBy on the group columns; the
default as-of adds one single-row global aggregate broadcast-crossed
into the (tiny, one-row-per-group) result — the input is never scanned
twice for it and nothing is collected. Timestamps are normalized through
``cast("timestamp")`` before ``unix_micros`` (parquet event times read
as ``timestamp_ntz``; the engine session pins UTC, so the cast is the
identity on the wall-clock reading — session.py:64).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _epoch_us(col: F.Column) -> F.Column:
    # unix_micros rejects TIMESTAMP_NTZ; under the engine's pinned UTC
    # session the cast preserves the wall-clock reading exactly
    return F.unix_micros(col.cast("timestamp"))


def check_freshness(
    df: DataFrame,
    ts_col: str,
    group_cols: Sequence[str],
    max_lag_s: int,
    as_of: str | None = None,
) -> DataFrame:
    """Per-group staleness report: (groups..., last_ts, lag_s, stale)."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    g = df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.max(ts_col).alias("last_ts")
    )
    if as_of is None:
        asof_df = df.agg(F.max(ts_col).alias("__as_of"))
        g = g.crossJoin(F.broadcast(asof_df))
        asof_col = F.col("__as_of")
    else:
        asof_col = F.lit(as_of).cast(df.schema[ts_col].dataType)
    lag_us = _epoch_us(asof_col) - _epoch_us(F.col("last_ts"))
    # floor on a double is exact here: epoch micros < 2^53
    lag_s = F.floor(lag_us / F.lit(1_000_000.0)).cast("long")
    return g.select(
        *group_cols,
        "last_ts",
        lag_s.alias("lag_s"),
        F.coalesce(lag_s > F.lit(int(max_lag_s)), F.lit(True)).alias("stale"),
    ).orderBy(*group_cols)
