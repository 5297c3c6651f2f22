"""Context-window document chunking (sliding token windows).

Long documents must be split to a model's context length before packing;
the standard construction is a sliding token window with overlap (stride
< window) so no span is ever cut without appearing whole in some chunk
(the train-time analog of the inference-time sliding window in
tokenizer pipelines, e.g. HF `return_overflowing_tokens` + `stride`).

This is a PURE-CATALYST row expander: tokenize once (the package
contract), build the start offsets with ``F.sequence``, explode, slice.
No Python, no shuffle — the plan is scan → generate → project, so it
composes with any downstream shuffle (packing, dedup) without adding
exchanges of its own.

Contract:
- starts = 0, stride, 2·stride, … while start < n_tokens; the last
  chunk may be shorter than ``chunk_tokens`` (never empty).
- a doc with 0 tokens (NULL/empty text) emits NO chunks — there is
  nothing to train on; callers needing row preservation left-join back.
- ``chunk_id`` = start / stride (0-based, dense per doc);
  ``chunk_text`` re-joins the window's tokens with single spaces (the
  tokenize contract is lossy about whitespace by design — chunks feed
  tokenizers, not renderers).

The reference (volare-all/open-data-linter) has no chunking; this
extends the engine per the training-data-pipeline mandate
(functions/packing.py bins the RESULTING sequences into token budgets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_data_linter_spark.functions.text import ws_tokens


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 512,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, chunk_id, start_token, n_chunk_tokens, chunk_text).

    ``stride`` defaults to ``chunk_tokens`` (disjoint windows); a smaller
    stride overlaps consecutive chunks by ``chunk_tokens - stride``
    tokens. ``stride > chunk_tokens`` is rejected (it would silently drop
    tokens between windows)."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    stride = chunk_tokens if stride is None else stride
    if not 1 <= stride <= chunk_tokens:
        raise ValueError(
            f"stride must be in [1, chunk_tokens], got {stride}"
        )
    toks = df.select(
        F.col(id_col), ws_tokens(F.col(text_col)).alias("toks")
    ).withColumn("n", F.size("toks")).where(F.col("n") > 0)
    starts = F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))
    exploded = toks.select(
        id_col, "toks", "n", F.explode(starts).alias("s")
    )
    win = F.slice(
        F.col("toks"),
        F.col("s") + 1,
        F.least(F.lit(chunk_tokens), F.col("n") - F.col("s")),
    )
    return exploded.select(
        F.col(id_col),
        (F.col("s") / stride).cast("long").alias("chunk_id"),
        F.col("s").cast("long").alias("start_token"),
        F.size(win).cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", win).alias("chunk_text"),
    )
