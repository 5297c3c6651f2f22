"""Change-point detection: two-sided CUSUM over bucketed series —
the level-shift monitor.

The volume rule (``rules/volume.py``) flags individual outlier
buckets; a 20% PERSISTENT drop after a deploy never trips a per-bucket
z test (each day is individually unremarkable) yet is exactly the
instrumentation regression a pipeline owner needs paged on. CUSUM
(Page 1954) accumulates small consistent deviations until they cross a
decision threshold — the classic sequential change detector. The
reference has nothing temporal (``csv_linter.py`` is grid-local).

Semantics:

- The input is reduced to a per-(group, bucket) series first: row
  counts (``value_col=None``) or means of ``value_col``.
- Each group's series is self-standardized (z against the group's own
  bucket mean/std — a screen, not a calibrated baseline; a zero-
  variance series yields NULL z via try_divide and never alarms).
- Two-sided CUSUM with slack ``k`` and threshold ``h`` (in σ units):
  ``S⁺_t = max(0, S⁺_{t−1} + z_t − k)``, mirrored for S⁻. Implemented
  in CLOSED FORM — ``S⁺_t = cum_t − min(0, min_{j≤t} cum_j)`` with
  ``cum_t = Σ(z_i − k)`` — which is two window aggregates (running
  sum + running min), fully declarative, no recursion, no Python, and
  therefore exactly replayable in any SQL engine.
- A bucket alarms when S⁺ or S⁻ exceeds ``h``; consecutive alarm
  buckets are one sustained shift (the first alarm is the estimated
  change point's upper bound).

Plan shape: ONE partial-aggregated count/avg Exchange over the input
(the only pass over row data), then one group-key window over the
shrunken bucket frame (days × groups rows). Scale-free in the input:
everything after the first aggregate is O(buckets).
"""

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = frozenset({"day", "hour", "week", "month"})


def cusum_shifts(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str] | None = None,
    bucket: str = "day",
    value_col: str | None = None,
    k: float = 0.5,
    h: float = 5.0,
) -> DataFrame:
    """One row per alarming bucket:
    ``(*groups, bucket, value, z, s_pos, s_neg, direction)`` with
    ``direction`` ``up``/``down`` (S⁺ vs S⁻ breach; both → ``up``),
    ordered by group and bucket."""
    if bucket not in _BUCKETS:
        raise ValueError(f"bucket must be one of {sorted(_BUCKETS)}")
    if h <= 0 or k < 0:
        raise ValueError("need h > 0 and k >= 0")
    group_cols = list(group_cols or [])

    b = F.date_trunc(bucket, F.col(ts_col))
    measure = (
        F.count(F.lit(1)).cast("double")
        if value_col is None
        else F.avg(value_col)
    )
    series = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(*group_cols, b.alias("bucket"))
        .agg(measure.alias("value"))
    )

    grp = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    whole = grp.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    run = grp.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # windows can't nest in one expression: materialize each stage as a
    # column; all three Window nodes share the partitioning + ordering,
    # so Catalyst chains them behind ONE Exchange + sort
    z = F.try_divide(
        F.col("value") - F.avg("value").over(whole),
        F.stddev_samp("value").over(whole),
    )
    staged = (
        series.withColumn("z", z)
        .withColumn("__cp", F.sum(F.col("z") - F.lit(k)).over(run))
        .withColumn("__cn", F.sum(-F.col("z") - F.lit(k)).over(run))
        .withColumn(
            "s_pos",
            F.col("__cp")
            - F.least(F.lit(0.0), F.min("__cp").over(run)),
        )
        .withColumn(
            "s_neg",
            F.col("__cn")
            - F.least(F.lit(0.0), F.min("__cn").over(run)),
        )
        .drop("__cp", "__cn")
    )
    out = (
        staged.where(
            (F.col("s_pos") > F.lit(h)) | (F.col("s_neg") > F.lit(h))
        )
        .withColumn(
            "direction",
            F.when(F.col("s_pos") > F.lit(h), F.lit("up")).otherwise(
                F.lit("down")
            ),
        )
    )
    return out.orderBy(*group_cols, "bucket")
