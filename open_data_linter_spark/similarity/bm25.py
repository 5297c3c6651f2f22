"""BM25 keyword search — inverted-index scoring with a full SQL twin.

Okapi BM25 (Robertson & Zaragoza, "The Probabilistic Relevance
Framework: BM25 and Beyond", FnTIR 2009, eq. 3.15) is the standard
lexical retrieval operator a corpus platform needs beside the embedding
ANN paths (similarity/knn.py): data curation uses it for eval-set leak
hunting by keyword, targeted subcorpus pulls, and quality auditing.

Plan shape (scale-first):

1. ONE corpus shuffle builds the (doc, term) -> tf postings table
   (explode + groupBy with map-side partial agg — the exact-dedup shape).
2. Document lengths are a narrow projection (``size(tokens)``, no
   shuffle); the corpus-wide (N, avgdl) pair is a single-row aggregate
   broadcast back via cross join.
3. The postings table is immediately SEMI-JOINED down to the query term
   set (an ``isin`` literal filter — queries are small by definition, so
   this is a pushed-down predicate, not a join), and every downstream
   aggregate (df per term, per-(query, doc) score sum, top-k window)
   runs on candidates only: docs sharing at least one term with a query.
4. Scoring is pure Catalyst arithmetic; the per-query top-k is a window
   over candidates of that query, partitioned by query id — never a
   global sort.

idf uses the +1 form ``ln(1 + (N - df + 0.5)/(df + 0.5))`` (never
negative, the Lucene convention). Scores are rounded to 6 decimals and
tie-break (score DESC, doc_id ASC) so ranking is total — the driver
oracle recomputes the identical formula in DuckDB from the raw table as
a FULL exact twin.

Tokenization follows the package-wide contract (trim/lower/whitespace
split — functions/vocab.py, dedup shingles), so BM25 composes with the
vocab/dedup family.

The reference (volare-all/open-data-linter) has no retrieval operators;
this extends the engine per the training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from open_data_linter_spark.functions.text import ws_tokens

ROUND = 6


def _tokens(c):
    return ws_tokens(c)


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k BM25 hits per query: (query_id, doc_id, score, rank).

    ``queries`` is a driver-side [(query_id, query_text)] list — queries
    are small by definition; they become literal predicates (term
    ``isin``) and a broadcast (query, term) frame, never a corpus-side
    shuffle. Duplicate terms inside one query count once (the standard
    bag-of-words-with-binary-query-tf simplification).
    """
    if not queries:
        raise ValueError("queries must be non-empty")
    if k < 1:
        raise ValueError("k must be >= 1")
    spark = docs.sparkSession
    # java_ws_tokens, NOT str.split(): the doc side tokenizes with Java
    # \s+ (ASCII whitespace); a Unicode-split query term containing NBSP
    # context could otherwise never match its doc token
    from open_data_linter_spark.functions.text import java_ws_tokens

    qterms = sorted(
        {(qid, t) for qid, qtext in queries for t in java_ws_tokens(qtext)}
    )
    if not qterms:
        raise ValueError("queries contain no terms")
    qdf = F.broadcast(
        spark.createDataFrame(qterms, "query_id long, term string")
    )
    all_terms = sorted({t for _, t in qterms})

    # spread + pin the tokenized projection: a single-file scan is ONE
    # partition (the tokenize/explode map side would serialize on one
    # core), and toks feeds two consumers (corpus stats + postings) —
    # the persist keeps it one parallel pass (dedup/_cache notes)
    from open_data_linter_spark.dedup._cache import spread_and_pin

    toks = spread_and_pin(
        f"bm25:{id_col}",
        docs.select(
            F.col(id_col).alias("doc_id"),
            _tokens(F.col(text_col)).alias("toks"),
        ),
    )
    # corpus-wide stats: one single-row aggregate, broadcast via crossJoin
    stats = toks.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size("toks")).alias("avgdl"),
    )
    # postings restricted to query terms BEFORE the tf groupBy: the
    # explode emits only matching positions, so the one corpus shuffle
    # carries candidates, not the whole token stream
    tf = (
        toks.select(
            "doc_id",
            F.size("toks").alias("dl"),
            F.explode(
                F.filter(F.col("toks"), lambda t: t.isin(*all_terms))
            ).alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(qdf, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("s"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("s"), ROUND).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
