"""Intra-document repetition statistics — Gopher-style quality signals.

Web-scale corpus curation filters documents whose content is dominated by
REPEATED material inside the document itself (machine-generated listings,
keyword stuffing, navigation loops): Rae et al., "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher" (arXiv 2112.11446,
table A1) gate on the fraction of a document made of duplicated n-grams and
on the share taken by the single most frequent n-gram. ``dedup/spans.py``
measures CROSS-document span duplication; this module measures the
WITHIN-document analog, per n-gram size:

- ``n_grams``        — total n-gram positions (occurrence stream length)
- ``distinct_grams`` — distinct n-grams in the document
- ``dup_position_rate`` — fraction of positions whose n-gram occurs more
  than once in the document (n=1 gives 1 - type/token boundary signal)
- ``top_gram_rate``  — occurrence share of the single most frequent n-gram

Scale design: everything is computed INSIDE one narrow projection — per
document the gram array is xxhash64-hashed, sorted, and folded with a
single ``F.aggregate`` run-length pass (O(m log m) per row, no UDF). The
token/occurrence stream is never exploded and never shuffled: the operator
is embarrassingly parallel over documents, which is the plan you want when
the corpus is 100 TB and the per-doc state is a few kilobytes. (Contrast
dedup/spans.py, which must shuffle because its statistic is cross-doc.)

Counting on 64-bit gram hashes is identical to counting on the gram strings
up to xxhash64 collisions; the driver oracle recomputes on the raw strings
in DuckDB and matches (same argument as dedup/spans.py ``hash_grams``).

The reference (volare-all/open-data-linter) has no intra-doc repetition
checks; this extends the engine per the training-data-pipeline mandate.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from open_data_linter_spark.functions.text import positional_shingles


def _run_length_stats(hashes: Column) -> Column:
    """Fold a sorted hash array into repetition counters.

    Returns struct(tot, distinct, dup, top):
      tot      — array length (total positions)
      distinct — number of distinct values
      dup      — number of positions whose value occurs > 1 time
      top      — occurrence count of the most frequent value

    Implemented as one ``F.aggregate`` run-length scan over the sorted
    array; the accumulator carries (prev value, current run length,
    finalized counters). xxhash64 output is never NULL, so a NULL ``prev``
    unambiguously marks the pre-first-element state.
    """
    s = F.array_sort(hashes)
    init = F.struct(
        F.lit(None).cast("bigint").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("tot"),
        F.lit(0).cast("bigint").alias("distinct"),
        F.lit(0).cast("bigint").alias("dup"),
        F.lit(0).cast("bigint").alias("top"),
    )

    def merge(acc: Column, h: Column) -> Column:
        same = acc["prev"].isNotNull() & (acc["prev"] == h)
        # Close the previous run when the value changes.
        run_dup = F.when(acc["run"] > 1, acc["run"]).otherwise(F.lit(0))
        return F.struct(
            h.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            (acc["tot"] + 1).alias("tot"),
            F.when(same, acc["distinct"])
            .otherwise(acc["distinct"] + 1)
            .alias("distinct"),
            F.when(same, acc["dup"]).otherwise(acc["dup"] + run_dup).alias("dup"),
            F.when(same, acc["top"])
            .otherwise(F.greatest(acc["top"], acc["run"]))
            .alias("top"),
        )

    def finish(acc: Column) -> Column:
        run_dup = F.when(acc["run"] > 1, acc["run"]).otherwise(F.lit(0))
        return F.struct(
            acc["tot"].alias("tot"),
            acc["distinct"].alias("distinct"),
            (acc["dup"] + run_dup).alias("dup"),
            F.greatest(acc["top"], acc["run"]).alias("top"),
        )

    return F.aggregate(s, init, merge, finish)


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: Sequence[int] = (1, 2, 3),
) -> DataFrame:
    """Per-document, per-n repetition metrics (long format).

    Output: one row per (non-empty document, n) —
    (doc_id, n, n_grams, distinct_grams, dup_position_rate, top_gram_rate),
    rates rounded to 6 places. Tokenization and the short-doc whole-text
    fallback follow ``functions.text.positional_shingles`` exactly, so the
    numbers compose with dedup/spans.py and the shingle-based dedup family.

    Input contract: ``id_col`` is unique per document.
    """
    if not ns:
        raise ValueError("ns must be a non-empty sequence of n-gram sizes")
    c = F.col(text_col)
    per_n = []
    for n in ns:
        grams = positional_shingles(c, int(n))
        hashed = F.transform(grams, lambda g: F.xxhash64(g))
        per_n.append(
            F.struct(
                F.lit(int(n)).alias("n"), _run_length_stats(hashed).alias("st")
            )
        )
    st = F.col("r")["st"]
    tot = st["tot"]
    # spread + pin BEFORE the per-doc sort/fold projection: a single-file
    # scan is ONE partition and Catalyst collapses column-independent
    # projections below a bare repartition, so without the pinned
    # boundary the whole O(m log m)-per-row pass serializes onto one
    # core (22.5s -> ~2s at sf0.1; the round-2 minhash trap)
    from open_data_linter_spark.dedup._cache import spread_and_pin

    src = spread_and_pin(
        f"repetition:{id_col}",
        df.select(id_col, text_col).where(
            F.trim(F.coalesce(c, F.lit(""))) != ""
        ),
    )
    return (
        src.select(F.col(id_col), F.explode(F.array(*per_n)).alias("r"))
        .select(
            F.col(id_col),
            F.col("r")["n"].alias("n"),
            tot.alias("n_grams"),
            st["distinct"].alias("distinct_grams"),
            F.round(st["dup"] / tot, 6).alias("dup_position_rate"),
            F.round(st["top"] / tot, 6).alias("top_gram_rate"),
        )
        .orderBy(id_col, "n")
    )


def repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_2gram_rate: float = 0.6,
    max_top_2gram_rate: float = 0.2,
    min_grams: int = 5,
) -> DataFrame:
    """Keep-filter: drop documents whose 2-gram repetition exceeds the
    Gopher-style gates. The gates only bind for documents with at least
    ``min_grams`` 2-gram positions — a two-word document trivially has
    top_gram_rate 1.0 and carries no repetition signal (Gopher likewise
    pairs repetition gates with minimum-length gates). Empty documents are
    dropped (no signal). Returns the surviving rows of ``df`` unchanged."""
    st = repetition_stats(df, text_col, id_col, ns=(2,)).where(
        (F.col("n_grams") < F.lit(int(min_grams)))
        | (
            (F.col("dup_position_rate") <= max_dup_2gram_rate)
            & (F.col("top_gram_rate") <= max_top_2gram_rate)
        )
    )
    return df.join(st.select(id_col), on=id_col, how="semi")
