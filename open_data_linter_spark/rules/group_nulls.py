"""Per-segment null-rate anomalies: which GROUP's feed went missing.

The global null rate (check 1-6, ``csv_linter.py:451-458``; the
engine's column metrics) hides a partner whose feed ships 40% null
emails inside a fleet averaging 2% — per-file linting would catch it
file by file, but a consolidated table needs the segment view. Flag a
group when its null rate is an outlier against the OTHER groups
(robust modified-z over the tiny per-group rate frame) or breaches an
absolute ceiling.

Semantics:

- Per group: ``n_rows``, ``n_nulls``, ``null_rate``.
- ``z`` is the modified z-score of the group's rate against the
  across-group median/MAD (0.6745·dev/MAD, the rules/rate.py
  convention); MAD = 0 (most groups identical) degenerates to NULL z
  — the absolute ceiling still applies.
- Flag = ``null_rate > max_rate`` OR ``|z| > z_threshold``.

Plan shape: ONE partial-aggregated count shuffle over (group) — the
conditional null count rides the same aggregate; the rate frame is
O(groups), so its median/MAD window is single-partition by design
(groups = partners/regions, not data).
"""

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_null_anomalies(
    df: DataFrame,
    col: str,
    group_cols: list[str],
    max_rate: float = 1.0,
    z_threshold: float = 3.5,
) -> DataFrame:
    """One row per group:
    ``(*groups, n_rows, n_nulls, null_rate, z, flagged)`` ordered by
    group."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if not 0 <= max_rate <= 1:
        raise ValueError("max_rate must be in [0, 1]")

    rates = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col(col).isNull(), 1).otherwise(0)
        ).alias("n_nulls"),
    ).withColumn(
        "null_rate", F.round(F.col("n_nulls") / F.col("n_rows"), 6)
    )

    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = rates.withColumn("__med", F.median("null_rate").over(w))
    staged = staged.withColumn(
        "__mad",
        F.median(F.abs(F.col("null_rate") - F.col("__med"))).over(w),
    )
    scored = staged.withColumn(
        "z",
        F.round(
            F.try_divide(
                F.lit(0.6745) * (F.col("null_rate") - F.col("__med")),
                F.col("__mad"),
            ),
            6,
        ),
    ).drop("__med", "__mad")
    return (
        scored.withColumn(
            "flagged",
            (F.col("null_rate") > F.lit(max_rate))
            | F.coalesce(
                F.abs(F.col("z")) > F.lit(z_threshold), F.lit(False)
            ),
        )
        .orderBy(*group_cols)
    )
