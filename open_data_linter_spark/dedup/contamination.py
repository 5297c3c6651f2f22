"""Benchmark-contamination screening: corpus docs sharing k-gram shingles
with a (small) evaluation set.

The standard decontamination step for training corpora (reference-class
pipelines drop or flag any training document overlapping an eval
benchmark): build the eval set's word-k-gram inverted index, broadcast it
against the corpus shingle stream, and score every (corpus doc, eval doc)
pair by shared-shingle count and by coverage of the eval doc's shingle
set.

Scale design: the eval side is benchmarks — thousands of rows, not
billions — so the join is a BROADCAST hash join on the shingle; the
corpus is touched once, streaming, with no shuffle of corpus text (only
the matched (corpus_id, eval_id) pairs aggregate). ``min_coverage``
filters at the aggregate, after exact counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_data_linter_spark.dedup._cache import persist_scoped
from open_data_linter_spark.functions.text import shingles


def ngram_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    k: int = 5,
    corpus_id: str = "doc_id",
    corpus_text: str = "text",
    eval_id: str = "eval_id",
    eval_text: str = "text",
    min_coverage: float = 0.0,
    broadcast_eval: bool = True,
) -> DataFrame:
    """(doc_id, eval_id, n_shared, eval_coverage) for every corpus doc
    sharing ≥1 word-k-gram with an eval doc and coverage ≥ min_coverage.

    ``eval_coverage`` = shared distinct shingles / eval doc's distinct
    shingles — 1.0 means the eval doc's content is fully present.
    Excludes corpus rows whose id equals an eval id (self-matches when
    screening a corpus against a subset of itself).
    """
    # shingles() returns a per-doc DISTINCT array (functions/text.py), so
    # exploding it yields each (id, shingle) exactly once — no cross-row
    # distinct, hence no shuffle of the corpus shingle stream at all
    ev = eval_df.select(
        F.col(eval_id).alias("eval_id"),
        F.explode(shingles(F.col(eval_text), k)).alias("shingle"),
    )
    ev_sizes = ev.groupBy("eval_id").agg(F.count(F.lit(1)).alias("n_eval"))
    ev_index = ev.join(ev_sizes, "eval_id")
    if broadcast_eval:
        ev_index = F.broadcast(ev_index)
    corp = corpus.select(F.col(corpus_id).alias("doc_id"),
                         F.col(corpus_text).alias("__t"))
    # single-file inputs arrive as ONE partition, and Catalyst collapses a
    # column-independent projection below a round-robin exchange — spread
    # the narrow (id, text) rows and PIN the boundary with a persist so
    # the shingling projection runs at session parallelism (the same
    # pathology and fix as dedup/minhash.py; guarded to never shrink an
    # already-wide cluster input)
    par = corpus.sparkSession.sparkContext.defaultParallelism
    if corp.rdd.getNumPartitions() < par:
        corp = persist_scoped("contamination.corp", corp.repartition(par))
    corp = corp.select(
        "doc_id", F.explode(shingles(F.col("__t"), k)).alias("shingle")
    )
    return (
        corp.join(ev_index, "shingle")
        .where(F.col("doc_id") != F.col("eval_id"))
        .groupBy("doc_id", "eval_id")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.round(F.count(F.lit(1)) / F.first("n_eval"), 6).alias(
                "eval_coverage"
            ),
        )
        .where(F.col("eval_coverage") >= min_coverage)
        .orderBy("doc_id", "eval_id")
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    k: int = 5,
    min_coverage: float = 0.5,
    corpus_id: str = "doc_id",
    corpus_text: str = "text",
    eval_id: str = "eval_id",
    eval_text: str = "text",
) -> DataFrame:
    """Corpus minus documents whose overlap covers ≥ min_coverage of any
    eval doc's shingles (left-anti join on the flagged ids)."""
    flagged = ngram_contamination(
        corpus, eval_df, k, corpus_id, corpus_text, eval_id, eval_text,
        min_coverage=min_coverage,
    ).select("doc_id").distinct()
    return corpus.join(
        flagged.withColumnRenamed("doc_id", corpus_id), on=corpus_id,
        how="left_anti",
    )
