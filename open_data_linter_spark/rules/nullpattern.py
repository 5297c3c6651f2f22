"""Null-pattern mining: which COMBINATIONS of columns go missing
together.

The reference (check 1-6, ``csv_linter.py:451-458``) and the engine's
null-rate metrics count missing cells per column; but missingness is
usually STRUCTURED — an upstream join failure nulls the same three
columns at once, a v2 producer never fills the legacy field. Per-column
rates can look individually unremarkable while one pattern accounts
for every miss. The pattern profile (pandas-profiling's "missingness"
/ Deequ-adjacent) makes the structure visible and diffable across
snapshots.

Semantics:

- Each row maps to its null MASK over the given columns, rendered as a
  string like ``"props,value"`` (the sorted-by-given-order list of
  null columns; complete rows map to ``""``). A readable key, stable
  across engines, no bit-width limit.
- Output is one row per observed pattern with count and fraction,
  descending — the head is the structure, the tail is the anomaly.

Plan shape: ONE partial-aggregated count shuffle over a k-boolean
projection (the mask is codegen concat, no Python); output cardinality
is bounded by min(2^k, distinct patterns), in practice a handful.
"""

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def null_patterns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per observed missingness pattern:
    ``(pattern, n_nulls, n_rows, frac)`` ordered by count desc then
    pattern; ``pattern`` lists the null columns comma-joined in the
    given column order, ``""`` for complete rows."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if len(set(cols)) != len(cols):
        raise ValueError("duplicate column in cols")

    pattern = F.concat_ws(
        ",",
        *[
            F.when(F.col(c).isNull(), F.lit(c)).otherwise(F.lit(None))
            for c in cols
        ],
    )
    n_nulls = sum(
        F.when(F.col(c).isNull(), 1).otherwise(0) for c in cols
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        df.select(
            pattern.alias("pattern"), n_nulls.alias("n_nulls")
        )
        .groupBy("pattern", "n_nulls")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn(
            "frac", F.round(F.col("n_rows") / F.sum("n_rows").over(w), 6)
        )
        .orderBy(F.col("n_rows").desc(), "pattern")
    )
