"""Gap-based sessionization: split each key's event stream into
sessions wherever the inter-event gap exceeds a threshold.

The reference has no event-stream notion (its tables are static CSV
grids, ``csv_linter.py``); sessionization is the canonical behavioral
grouping every event pipeline needs — and a validation signal in its
own right (session duration/size distributions drifting is an ingest
bug long before row counts move).

Semantics:

- Events are ordered per key by the timestamp. A new session starts at
  the first event and whenever ``ts - prev_ts > gap_s`` (strictly:
  a gap of exactly ``gap_s`` stays in-session). Gap math is exact
  epoch-microsecond integer arithmetic, never timestamp diffs
  (cross-engine truncation semantics differ — see working notes).
- NULL timestamps are excluded (a sessionless event is reported by the
  completeness rules, not silently glued into a session).
- Ties (equal ts within a key) are gap 0, so they land in the same
  session regardless of tie order — the assignment is deterministic
  even though the sort is not total.

Plan shape: ONE hash Exchange on the key for the lag/cumsum window;
``session_stats`` then aggregates (key, session) with map-side partial
aggregation — the grouping key extends the window's partition key, so
rows are already co-located and AQE-era Spark still inserts a cheap
Exchange over the SHRUNKEN per-session rows, not the input. Linear in
events, no joins, no Python.
"""

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _micros(c):
    return F.unix_micros(c.cast("timestamp"))


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_s: float,
    session_col: str = "session_idx",
) -> DataFrame:
    """Append a per-key 1-based session index column."""
    if gap_s <= 0:
        raise ValueError("gap_s must be positive")
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    prev = F.lag(_micros(F.col(ts_col))).over(w)
    new = (
        prev.isNull()
        | (_micros(F.col(ts_col)) - prev > F.lit(int(gap_s * 1_000_000)))
    ).cast("int")
    run = Window.partitionBy(*key_cols).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        df.where(F.col(ts_col).isNotNull())
        .withColumn("__new", new)
        .withColumn(session_col, F.sum("__new").over(run))
        .drop("__new")
    )


def session_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_s: float,
) -> DataFrame:
    """One row per (key, session): start/end/duration_s/n_events."""
    s = sessionize(df, key_cols, ts_col, gap_s)
    return (
        s.groupBy(*key_cols, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            (
                (F.max(_micros(F.col(ts_col))) - F.min(_micros(F.col(ts_col))))
                / F.lit(1_000_000.0)
            ).alias("duration_s"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy(*key_cols, "session_idx")
    )
