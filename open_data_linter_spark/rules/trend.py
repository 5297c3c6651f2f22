"""Per-group trend detection: closed-form least-squares slope of a
measure against time — the GRADUAL-drift detector.

CUSUM (``rules/changepoint.py``) catches level SHIFTS; a sensor that
drifts 0.5%/day never shifts level but trends — by the time the level
test fires, weeks of data are miscalibrated. The slope of the
per-bucket series, with its t-statistic, is the classic screen
(ordinary least squares y = a + b·t): all of it is closed-form in the
co-moment aggregates, so the whole rule is ONE aggregation per group.

Semantics:

- The input reduces to a per-(group, bucket) series (count or mean of
  ``value_col``) exactly like changepoint.py, then per group over the
  n bucket points: ``slope = covar(t, y)/var(t)`` with t in DAYS since
  epoch (so the slope unit is per-day regardless of bucket size),
  ``r2 = corr²`` via the same co-moments, and the t-statistic
  ``t = r·√(n−2)/√(1−r²)`` — flag when ``|t| ≥ t_crit`` (default 4.0,
  conservative; distribution-free screen, not a calibrated p-value).
- Degenerate groups (n < 3, zero time- or value-variance) report NULL
  slope/t and never flag (``try_divide`` everywhere; Spark 4 ANSI
  ``corr`` throws on zero variance, so co-moments are assembled
  manually like rules/correlation.py).

Plan shape: one partial-aggregated series Exchange over the input,
then one partial-aggregated group aggregate over the O(buckets)
series. No windows, no Python, two shuffles of shrinking data.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_data_linter_spark.rules.changepoint import _BUCKETS


def group_trends(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str] | None = None,
    bucket: str = "day",
    value_col: str | None = None,
    t_crit: float = 4.0,
) -> DataFrame:
    """One row per group:
    ``(*groups, n_buckets, slope_per_day, r2, t_stat, trending)``
    ordered by group."""
    if bucket not in _BUCKETS:
        raise ValueError(f"bucket must be one of {sorted(_BUCKETS)}")
    if t_crit <= 0:
        raise ValueError("t_crit must be positive")
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
        .agg(measure.alias("y"))
        .withColumn(
            "t",
            F.unix_micros(F.col("bucket").cast("timestamp"))
            / F.lit(86_400_000_000.0),
        )
    )

    n = F.count(F.lit(1))
    cov = F.covar_samp("t", "y")
    vt = F.var_samp("t")
    r = F.try_divide(cov, F.stddev_samp("t") * F.stddev_samp("y"))
    # float co-moments can put r² a few ulps ABOVE 1 on a perfect line:
    # clamp so the reported r2 is well-defined and sqrt never sees a
    # negative (NaN); an exact-zero denominator goes through try_divide
    # to NULL, which `perfect` below re-flags
    out = series.groupBy(*group_cols).agg(
        n.alias("n_buckets"),
        F.try_divide(cov, vt).alias("slope_per_day"),
        F.least(r * r, F.lit(1.0)).alias("r2"),
        F.try_divide(
            r * F.sqrt(n - F.lit(2)),
            F.sqrt(F.greatest(F.lit(1.0) - r * r, F.lit(0.0))),
        ).alias("t_stat"),
    )
    # an EXACTLY perfect line has r² = 1 -> 1-r² = 0 -> NULL t_stat;
    # that is infinite evidence, not no evidence — flag it explicitly
    perfect = (
        (F.col("r2") >= 1.0)
        & F.col("slope_per_day").isNotNull()
        & (F.col("slope_per_day") != 0)
    )
    sig = F.abs(F.col("t_stat")) >= F.lit(t_crit)
    return (
        out.withColumn(
            "trending",
            (F.col("n_buckets") >= 3)
            & (F.coalesce(sig, F.lit(False)) | F.coalesce(perfect, F.lit(False))),
        )
        .orderBy(*group_cols)
    )
