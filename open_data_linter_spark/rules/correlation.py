"""Cross-column correlation profile: pairwise Pearson r in ONE pass.

The reference's only multi-column signal is the hard-coded era↔year
cross-field consistency check (csv_linter.py:495-530, check 1-11);
``rules/fd.py`` generalizes it to exact functional dependencies. This
module covers the CONTINUOUS analog: columns that should move together
(a derived total vs its base measure, a duration vs a byte count) or
must NOT (a measurement vs its own row id — correlation with ingest
order is a pipeline bug). A near-±1 pair is also the classic
redundant/derived-column signal a schema review wants surfaced.

Semantics:

- Pearson r over PAIRWISE-COMPLETE rows (rows where either side is
  NULL are excluded per pair — both Spark's and DuckDB's ``corr``
  aggregate do this natively, so the oracle twin replays it exactly).
- Degenerate pairs (zero variance on either side, or fewer than two
  complete rows) report NULL, never NaN. Spark 4's ANSI mode makes the
  built-in ``corr`` THROW ``DIVIDE_BY_ZERO`` on a zero-variance side,
  so Pearson is assembled from its co-moments —
  ``try_divide(covar_samp, stddev_samp·stddev_samp)`` — which is the
  identical statistic (same single-pass co-moment accumulators, same
  merge) with NULL instead of an error/NaN on the degenerate cases.
- ``high_corr`` flags |r| ≥ ``threshold`` (default 0.95) — the
  suspected-duplicate/derived-column screen.

Plan shape — the scale property is the point: ALL k·(k−1)/2 pairs are
computed in ONE global aggregation over ONE scan of the k columns
(``corr`` and the pairwise-complete count are declarative aggregates,
so they partially aggregate map-side and the only exchange moves one
partial row per task). No Expand, no per-pair jobs, no shuffle of row
data. k is a profile-sized knob (tens of columns): the aggregate row
is O(k²) scalars, driver-trivial. The pair table is exploded from that
single row — a zero-job projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def correlation_matrix(
    df: DataFrame,
    cols: list[str],
    threshold: float = 0.95,
) -> DataFrame:
    """Pairwise Pearson correlation over the given numeric columns.

    Returns one row per unordered pair, ordered by (col_x, col_y):
    ``(col_x, col_y, n_pairs, corr, high_corr)``.
    """
    if len(cols) < 2:
        raise ValueError("need at least two columns to correlate")
    if len(set(cols)) != len(cols):
        raise ValueError("duplicate column in cols")

    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    aggs = []
    for i, (a, b) in enumerate(pairs):
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        # pairwise-complete moments: each side masked by the OTHER side's
        # non-nullness so stddev/covar see exactly the complete rows
        xa = F.when(both, F.col(a))
        xb = F.when(both, F.col(b))
        aggs.append(
            F.try_divide(
                F.covar_samp(xa, xb), F.stddev_samp(xa) * F.stddev_samp(xb)
            ).alias(f"__c{i}")
        )
        aggs.append(F.count(F.when(both, F.lit(1))).alias(f"__n{i}"))
    row = df.agg(*aggs)

    structs = [
        F.struct(
            F.lit(a).alias("col_x"),
            F.lit(b).alias("col_y"),
            F.col(f"__n{i}").alias("n_pairs"),
            F.col(f"__c{i}").alias("corr"),
        )
        for i, (a, b) in enumerate(pairs)
    ]
    return (
        row.select(F.explode(F.array(*structs)).alias("p"))
        .select("p.*")
        .withColumn(
            "high_corr",
            F.coalesce(F.abs(F.col("corr")) >= F.lit(float(threshold)), F.lit(False)),
        )
        .orderBy("col_x", "col_y")
    )
