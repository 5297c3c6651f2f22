"""Per-column distribution metrics: distinctness, uniqueness, entropy.

The column profiler (rules/classifier.py) answers "what TYPE is this
column"; these metrics answer "what SHAPE is its value distribution" —
the quantities a validation suite thresholds on when no domain is known:

- ``distinctness`` = ndv / n_nonnull        (1.0 ⇒ candidate key)
- ``uniqueness``   = #singleton values / n_nonnull  (Deequ's Uniqueness:
  the fraction of rows whose value appears exactly once)
- ``entropy``      = −Σ p·ln p over the value frequencies (natural log;
  0 ⇒ constant column, ln(ndv) ⇒ uniform — a collapsed-entropy column is
  the classic silent-upstream-bug signal: the join still works, the type
  still matches, but every row now carries the same value)

NULLs are excluded from the value distribution (their rate is its own
metric, ``null_count``; completeness is rule 1-6's job) — matching the
reference's per-column counting convention of skipping blanks
(column_classifier.py) rather than counting them as a value.

Plan shape: ONE scan and ONE shuffle for ALL requested columns — the
columns are melted to ``(column, value)`` pairs (values cast to string:
the metrics are representation-level, and within one column the cast is
injective for the atomic types this engine profiles) via an exploded
array of structs, then a single partial-aggregated
``groupBy(column, value)`` feeds a per-column roll-up whose output is
#columns rows. The melt multiplies scan rows ×k into the first
aggregate — the explicit, partially-aggregated cousin of the Expand that
k exact ``count(DISTINCT)``s would plan — but needs only one pass over
the input where per-column jobs would need k. Entropy terms are summed
as doubles and rounded to 6 (the repo's partition-order-independence
contract; the accumulation error at fixture scale is ~1e-12).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_metrics(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column metrics over a single melt-shuffle.

    Columns: ``column``, ``n_rows``, ``null_count``, ``ndv``,
    ``distinctness``, ``uniqueness``, ``entropy`` (NULL for an all-NULL
    column: no distribution to measure). Ordered by column name.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.column", "p.value")

    freq = pairs.groupBy("column", "value").agg(F.count(F.lit(1)).alias("cnt"))

    nn = F.sum(F.when(F.col("value").isNotNull(), F.col("cnt")).otherwise(F.lit(0)))
    ndv = F.sum(F.col("value").isNotNull().cast("long"))
    singles = F.sum(
        (F.col("value").isNotNull() & (F.col("cnt") == 1)).cast("long")
    )
    # Σ cnt·ln(cnt) over non-null values; H = ln(nn) − that/nn (algebraic
    # form of −Σ p·ln p that keeps the per-group term integer-driven)
    slnl = F.sum(
        F.when(
            F.col("value").isNotNull(),
            F.col("cnt").cast("double") * F.log(F.col("cnt").cast("double")),
        ).otherwise(F.lit(0.0))
    )
    out = freq.groupBy("column").agg(
        (nn + F.sum(F.when(F.col("value").isNull(), F.col("cnt")).otherwise(F.lit(0)))).alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), F.col("cnt")).otherwise(F.lit(0))).alias("null_count"),
        nn.alias("__nn"),
        ndv.alias("ndv"),
        singles.alias("__singles"),
        slnl.alias("__slnl"),
    )
    nn_d = F.col("__nn").cast("double")
    return out.select(
        "column",
        "n_rows",
        "null_count",
        "ndv",
        F.when(F.col("__nn") > 0, F.round(F.col("ndv").cast("double") / nn_d, 6)).alias(
            "distinctness"
        ),
        F.when(
            F.col("__nn") > 0, F.round(F.col("__singles").cast("double") / nn_d, 6)
        ).alias("uniqueness"),
        F.when(
            F.col("__nn") > 0,
            F.round(F.log(nn_d) - F.col("__slnl") / nn_d, 6),
        ).alias("entropy"),
    ).orderBy("column")
