"""Fuzzy domain conformance: out-of-domain values with nearest-valid
suggestions — the typo detector for categorical columns.

The reference's masked-value domain check flags a cell as simply
in-or-out of the allowed set (``csv_linter.py:616-633``, check 1-13,
and the prefecture list of check 1-12); at curation scale the far more
actionable report is WHICH invalid value appeared, how often, and what
it was almost certainly meant to be. ``'1-URGENT'`` miskeyed as
``'-URGENT'`` is a fix; "437 rows failed the domain check" is a
ticket.

Semantics:

- A value is out-of-domain if non-NULL and not exactly in ``domain``
  (case-sensitive — casefold upstream if the domain is).
- For each DISTINCT out-of-domain value, the suggestion is the domain
  entry with minimum Levenshtein distance ≤ ``max_distance``; ties
  break to the lexicographically smallest entry (deterministic,
  engine-portable). No entry within reach → NULL suggestion (a truly
  foreign value, not a typo).
- Distances are Unicode code-point Levenshtein (Spark's builtin).
  NOTE: DuckDB's ``levenshtein`` counts BYTES, so the oracle twin is
  exact only over ASCII domains — same class of pinned divergence as
  the chardet ladder (tests/test_encoding_detection.py).

Scale shape: the input is reduced to a DISTINCT-value count aggregate
FIRST (partial map-side agg — a categorical column has bounded
cardinality, this is the whole point of a domain check), then the tiny
out-of-domain frame crosses a BROADCAST of the domain literals for the
distance scan: |oov_distinct| × |domain| comparisons, zero row-data
shuffle beyond the one count Exchange. The raw table is scanned once,
one column.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_fuzzy_domain(
    df: DataFrame,
    col: str,
    domain: list[str],
    max_distance: int = 1,
) -> DataFrame:
    """One row per distinct out-of-domain value:
    ``(value, n_rows, suggestion, distance)`` ordered by ``n_rows``
    desc then value."""
    if not domain:
        raise ValueError("domain must be non-empty")
    if len(set(domain)) != len(domain):
        raise ValueError("duplicate domain entry")

    spark = df.sparkSession
    observed = (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(~F.col("value").isin(domain))
    )
    dom = spark.createDataFrame([(d,) for d in domain], "candidate string")
    # conditional min folds the suggestion into ONE aggregation (no
    # self-join back onto `observed`, which would re-scan the input);
    # all candidates out of reach -> min of all-NULL -> NULL suggestion
    best = F.min(
        F.when(
            F.col("distance") <= max_distance,
            F.struct(F.col("distance"), F.col("candidate")),
        )
    ).alias("best")
    return (
        observed.crossJoin(F.broadcast(dom))
        .withColumn("distance", F.levenshtein("value", "candidate"))
        .groupBy("value", "n_rows")
        .agg(best)
        .select(
            "value",
            "n_rows",
            F.col("best.candidate").alias("suggestion"),
            F.col("best.distance").alias("distance"),
        )
        .orderBy(F.col("n_rows").desc(), "value")
    )
