"""Bivariate Mahalanobis outliers: rows whose (x, y) PAIR is wrong
even though each coordinate is individually unremarkable.

Per-column screens (``rules/rate.py`` robust z, check 1-3's numeric
gate) can never catch a swapped pair — a 5-unit order priced like a
50-unit one has a perfectly ordinary quantity and a perfectly ordinary
price. The pair lives far from the joint distribution, and the
Mahalanobis distance d² = (v−μ)ᵀ Σ⁻¹ (v−μ) measures exactly that;
under approximate normality d² ~ χ²₂, so the default threshold is the
χ²₂ tail cut (13.816 at α=0.001).

Semantics:

- μ and Σ come from the pairwise-complete rows (both sides non-NULL)
  of the data itself — a screen, not a calibrated model (same
  self-norm stance as rules/changepoint.py).
- The 2×2 inverse is closed form: with variances vx, vy and
  covariance c, d² = (dx²·vy − 2·dx·dy·c + dy²·vx)/(vx·vy − c²).
  Everything is built from the same five co-moment aggregates the
  correlation rule uses — one aggregation pass, broadcast back as
  literals via a single-row cross join.
- Degenerate inputs (singular Σ: a constant column or |r| = 1 —
  determinant 0) yield NULL d² via try_divide and flag nothing:
  perfectly collinear data belongs to the correlation rule's
  redundant-column finding, not a distance screen.
- Rows with a NULL side are excluded (the null rules own those).

Plan shape: one partial-aggregated stats pass over the scan, then the
stats row is a BROADCAST cross join (plan-asserted) feeding a codegen
projection + filter — two passes over the input, zero row shuffles.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHI2_2_CRIT = {0.01: 9.210, 0.001: 13.816, 0.0001: 18.421}


def bivariate_outliers(
    df: DataFrame,
    x_col: str,
    y_col: str,
    threshold: float | None = None,
    alpha: float = 0.001,
) -> DataFrame:
    """Rows with d² above the threshold (default: χ²₂ at ``alpha``):
    ``df.* + d2``, ordered by d² descending."""
    if threshold is None:
        if alpha not in CHI2_2_CRIT:
            raise ValueError(f"alpha must be one of {sorted(CHI2_2_CRIT)}")
        threshold = CHI2_2_CRIT[alpha]

    x, y = F.col(x_col), F.col(y_col)
    both = x.isNotNull() & y.isNotNull()
    mx, my = F.when(both, x), F.when(both, y)
    stats = df.agg(
        F.avg(mx).alias("__mx"),
        F.avg(my).alias("__my"),
        F.var_samp(mx).alias("__vx"),
        F.var_samp(my).alias("__vy"),
        F.covar_samp(mx, my).alias("__c"),
    )

    dx = x - F.col("__mx")
    dy = y - F.col("__my")
    det = F.col("__vx") * F.col("__vy") - F.col("__c") * F.col("__c")
    d2 = F.try_divide(
        dx * dx * F.col("__vy")
        - F.lit(2.0) * dx * dy * F.col("__c")
        + dy * dy * F.col("__vx"),
        det,
    )
    return (
        df.where(both)
        .crossJoin(F.broadcast(stats))
        .withColumn("d2", F.round(d2, 6))
        .drop("__mx", "__my", "__vx", "__vy", "__c")
        .where(F.col("d2") > F.lit(float(threshold)))
        .orderBy(F.col("d2").desc())
    )
