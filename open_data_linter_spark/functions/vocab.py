"""Corpus vocabulary statistics — top-k token counts with coverage.

Tokenizer/vocabulary construction is the first corpus-level pass of any
training-data pipeline (BPE merges start from a word-frequency table;
quality dashboards track head-token coverage drift). This operator
computes the head of that table: the k most frequent tokens with their
corpus share and cumulative coverage.

Scale design: one shuffle — ``groupBy(token)`` with map-side partial
aggregation over xxhash64-bucketable word counts (the same shape as exact
dedup); the top-k is a ``TakeOrdered`` (heap per partition + driver merge
of k-row heads), never a global sort; the coverage denominator is a
single-row aggregate broadcast back via cross join; the rank/cumsum window
runs over exactly k rows. Nothing driver-side ever holds more than k rows.

Determinism: ties break by token ascending (count DESC, token ASC) — the
ordering is total, so the driver oracle is a FULL exact DuckDB twin.

The reference (volare-all/open-data-linter) has no corpus-level token
table; this extends the engine per the training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from open_data_linter_spark.functions.text import positional_shingles


def vocab_topk(
    df: DataFrame, text_col: str = "text", k: int = 50
) -> DataFrame:
    """Top-k corpus tokens: (rank, token, cnt, coverage, cum_coverage).

    Tokenization follows the package-wide ``positional_shingles`` contract
    (trim/lower/whitespace-split; empty docs contribute nothing), so vocab
    numbers compose with the shingle-based dedup/repetition family.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    c = F.col(text_col)
    # spread + pin before the explode: a single-file scan is one
    # partition, so the tokenize/explode map side of the count shuffle
    # would serialize onto one core (see dedup/_cache.spread_and_pin)
    from open_data_linter_spark.dedup._cache import spread_and_pin

    src = spread_and_pin(
        f"vocab:{text_col}",
        df.select(text_col).where(F.trim(F.coalesce(c, F.lit(""))) != ""),
    )
    tokens = src.select(F.explode(positional_shingles(c, 1)).alias("token"))
    counts = tokens.groupBy("token").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    top = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(int(k))
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .withColumn("coverage", F.round(F.col("cnt") / F.col("total"), 6))
        .withColumn(
            "cum_coverage",
            F.round(
                F.sum("cnt").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                )
                / F.col("total"),
                6,
            ),
        )
        .select("rank", "token", "cnt", "coverage", "cum_coverage")
        .orderBy("rank")
    )
