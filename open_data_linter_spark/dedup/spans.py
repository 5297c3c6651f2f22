"""Duplicate-span statistics — cross-document repeated n-gram coverage.

Exact-match and MinHash dedup operate at document granularity; web-scale
training corpora also carry SPAN-level duplication (boilerplate headers,
licenses, navigation chrome) that document dedup never sees. The canonical
treatment is suffix-array substring dedup (Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL'22); a distributed
suffix array is not a Spark-shaped structure, so this operator computes the
actionable per-document signal instead: for word k-grams, the fraction of a
document's gram OCCURRENCES whose gram also appears in at least ``min_df``
distinct documents. High coverage => the document is mostly made of spans
that exist elsewhere (drop or trim candidates), even when no single whole
document is its near-duplicate.

Pipeline (all Catalyst): positional (non-distinct) k-grams per doc →
explode → gram document-frequency (count distinct doc) → semi-join the
occurrence stream against grams with df >= min_df → per-doc occurrence
counts → coverage. Deterministic and SQL-expressible end-to-end — the
driver oracle is a FULL exact DuckDB twin.

Scale: the exploded occurrence stream is O(total tokens) — the same order
as any tokenizing pass over the corpus; both shuffles (gram df, per-doc
count) carry map-side partial aggregates. Hot grams (stopword runs) are
exactly the signal and stay as grouped counts, never expanded into pairs,
so there is no quadratic blow-up to cap. ``hash_grams`` (default True)
xxhash64-hashes grams before the shuffles to shed string bytes — counts
are identical to string grams up to 64-bit collisions (the DuckDB twin
computes on the strings and matches).

The reference (volare-all/open-data-linter) has no span-level ops; this
extends the engine per the training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_data_linter_spark.dedup._cache import persist_scoped, spread_and_pin
from open_data_linter_spark.functions.text import positional_shingles


def duplicate_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_df: int = 2,
    hash_grams: bool = True,
) -> DataFrame:
    """Per-doc repeated-span coverage: (doc_id, n_spans, n_dup_spans,
    dup_coverage), one row per non-empty document.

    ``min_df`` counts DISTINCT documents containing the gram, so a span
    repeated only within one document does not count as duplicated
    (cross-doc semantics); ``min_df=2`` flags any span shared with at least
    one other document.

    Input contract: ``id_col`` is unique — duplicate id rows would merge
    their gram streams in the per-doc aggregation.
    """
    if min_df < 2:
        raise ValueError(f"min_df must be >= 2 (cross-doc), got {min_df}")
    src = spread_and_pin(
        "spans.src",
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")),
    )
    grams = positional_shingles(F.col("__t"), k)
    if hash_grams:
        grams = F.transform(grams, lambda g: F.xxhash64(g))
    base = src.where(F.trim(F.coalesce(F.col("__t"), F.lit(""))) != "").select(
        "id", grams.alias("g")
    )
    base = persist_scoped("spans.base", base)  # sizes + occurrence stream
    sizes = base.select("id", F.size("g").cast("long").alias("n_spans"))
    occ = base.select("id", F.explode("g").alias("gram"))
    dup_grams = (
        occ.groupBy("gram")
        .agg(F.count_distinct("id").alias("gdf"))
        .where(F.col("gdf") >= min_df)
        .select("gram")
    )
    dup_counts = (
        occ.join(dup_grams, "gram", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_dup_spans"))
    )
    return (
        sizes.join(dup_counts, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_spans",
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.round(
                F.coalesce("n_dup_spans", F.lit(0)).cast("double")
                / F.col("n_spans"),
                6,
            ).alias("dup_coverage"),
        )
        .orderBy(id_col)
    )
