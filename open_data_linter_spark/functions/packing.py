"""Sequence packing: group documents into token-budget bins for training.

Training pipelines pack variable-length documents into fixed token-budget
sequences; the operator here is NEXT-FIT over a deterministic document
order, parallelized by explicit id ranges:

- range id = ``id // range_size`` — an EXPLICIT, layout-independent split
  (a range partitioner's sampled boundaries would change with cluster
  size and be irreproducible);
- inside each range, documents are walked in id order and a document
  starts a new bin when it would overflow ``budget`` (a document larger
  than the whole budget gets a bin of its own — callers truncate later);
- global bin id = ``range_id * RANGE_STRIDE + bin_seq`` — stable across
  runs, partitionings, and cluster sizes.

The per-range walk is a sequential recurrence (bin state feeds the next
decision), so it runs as an Arrow-grouped ``applyInPandas`` — one group
per range, bounded memory by ``range_size``, ranges in parallel. Token
counts are the engine's whitespace ``token_count`` (SQL-twinned), which
makes the WHOLE operator exactly reproducible in SQL via a recursive CTE
— the driver oracle replays the same recurrence.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_data_linter_spark.functions.text import token_count

RANGE_STRIDE = 1_000_000  # max bins per range; range_size docs can't exceed it


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    range_size: int = 100,
) -> DataFrame:
    """(id, n_tokens, bin_id): next-fit packing of whitespace-token counts
    into ``budget``-sized bins, deterministic and layout-independent."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if range_size < 1 or range_size > RANGE_STRIDE:
        raise ValueError(f"range_size must be in [1, {RANGE_STRIDE}]")
    base = df.select(
        F.col(id_col).alias("id"),
        token_count(F.col(text_col)).alias("n_tokens"),
        # floor, not a truncating cast: negative ids must bucket like
        # python's // so the id -> range map is one convention everywhere
        F.floor(F.col(id_col) / range_size).cast("long").alias("rng"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        rng = int(pdf["rng"].iloc[0])
        bins, seq, filled = [], 0, 0
        for tok in pdf["n_tokens"]:
            tok = int(tok)
            if filled > 0 and filled + tok > budget:
                seq += 1
                filled = tok
            else:
                filled += tok
            bins.append(rng * RANGE_STRIDE + seq)
        out = pdf[["id", "n_tokens"]].copy()
        out["bin_id"] = bins
        return out

    return base.groupBy("rng").applyInPandas(
        pack, "id long, n_tokens int, bin_id long"
    )


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """One row: bins, docs, tokens, max bin fill, overflow-bin count
    (bins above budget exist only for single oversized documents)."""
    per_bin = packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )
    return per_bin.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("bin_tokens").alias("total_tokens"),
        F.max("bin_tokens").alias("max_bin_tokens"),
        F.sum(
            ((F.col("bin_tokens") > budget) & (F.col("n_docs") > 1)).cast("long")
        ).alias("invalid_overflow_bins"),
    )
