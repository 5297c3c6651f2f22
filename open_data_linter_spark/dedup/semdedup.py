"""SemDeDup — semantic deduplication via k-means cells + in-cell greedy.

Embedding-level semantic dedup at corpus scale (Abbas et al., "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication",
arXiv 2303.09540): cluster the embedding space with a k-means coarse
quantizer, then look for near-duplicate pairs only WITHIN each cluster —
the O(n²) pair problem becomes k independent O((n/k)²) problems that never
see each other. This complements the pairwise paths in this package:
``dedup/embedding.py`` (hyperplane-LSH banding) finds pairs above a high
threshold with tunable miss probability; SemDeDup trades a small recall
loss at cluster boundaries for a plan with exactly ONE shuffle and a
per-cluster working set that fits in an executor.

Semantics (deterministic, replayable):

- Every non-null vector is assigned to its nearest centroid cell (cosine;
  seeded Lloyd training on a uniform sample via ``train_centroids`` —
  never ``limit``, see similarity/knn.py round-3/4 notes).
- Within a cell, members are visited in KEEP-PRIORITY order: centroid
  cosine ASCENDING, id ascending — the paper keeps the examples with LOW
  similarity to the centroid (they carry the most information), so the
  farthest-from-centroid member of a duplicate group survives.
- Greedy leader pass: a member is KEPT iff its (6-decimal-rounded) cosine
  to every already-kept member of the cell is below ``threshold``;
  otherwise it is DROPPED and annotated with its nearest kept leader
  (``dup_of``, max cosine, ties to the smallest leader id) and that
  cosine (``dup_sim``). Kept rows therefore form a pairwise-dissimilar
  set within each cell — an invariant tests assert directly.

Scale design: centroid assignment is one Arrow-vectorized matmul per batch
over the spread-and-pinned source (the single-file-scan projection trap —
see dedup/_cache.spread_and_pin); the only shuffle is the groupBy(cell)
feeding ``applyInPandas``; the greedy pass is numpy inside the cell with
an incrementally-filled kept-matrix buffer (O(m·kept·d) flops, no m×m
materialization). Cells are bounded by ``max_cell`` — at 10^12 rows you
raise ``n_cells`` so cells stay executor-sized (the paper runs 50k
clusters on LAION); the guard raises rather than silently OOMing.

Determinism: training is seeded, the visit order is total, and cosines
are rounded to 6 decimals BEFORE every compare, so two runs over the same
input layout byte-agree and the driver oracle can recompute every reported
``dup_sim`` from the raw parquet in DuckDB (cell assignment itself is
engine-internal — the oracle pins WHICH ids were dropped, recomputes
their pair cosines + the kept-leader invariant in SQL, and zeroes the
result under a recall floor versus the brute-force pair set).

The reference (volare-all/open-data-linter) has no embedding operations;
this extends the engine per the training-data-pipeline mandate.
"""

from __future__ import annotations

# module-top pd/np: function-local imports break @pandas_udf type-hint
# resolution under `from __future__ import annotations` (CLAUDE.md)
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from open_data_linter_spark.dedup._cache import spread_and_pin
from open_data_linter_spark.similarity.knn import train_centroids

ROUND = 6  # decimal rounding applied to every cosine before comparison


def semdedup(
    df: DataFrame,
    threshold: float,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_size: int = 20_000,
    seed: int = 42,
    max_cell: int = 50_000,
) -> DataFrame:
    """Per-row SemDeDup verdicts: (id, cell, centroid_sim, keep, dup_of,
    dup_sim). ``dup_of``/``dup_sim`` are NULL on kept rows. Rows whose
    vector is NULL are excluded (same contract as the ANN paths)."""
    from pyspark.sql.functions import pandas_udf

    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    cents = train_centroids(df, n_cells, vec_col, train_size, seed=seed)

    # built per call: a cached udf would pin a dead session's _judf
    @pandas_udf("struct<cell:int,centroid_sim:double>")
    def _assign(v: pd.Series) -> pd.DataFrame:
        mat = np.stack(v.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ cents.T  # (rows, k); cents are L2-normalized
        cell = sims.argmax(axis=1).astype(np.int32)
        best = np.round(sims[np.arange(len(mat)), cell], ROUND)
        return pd.DataFrame({"cell": cell, "centroid_sim": best})

    src = spread_and_pin(
        f"semdedup:{id_col}",
        df.select(id_col, vec_col).where(F.col(vec_col).isNotNull()),
    )
    assigned = src.select(
        id_col, vec_col, _assign(vec_col).alias("a")
    ).select(id_col, vec_col, "a.cell", "a.centroid_sim")

    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType, False),
            T.StructField("cell", T.IntegerType(), False),
            T.StructField("centroid_sim", T.DoubleType(), False),
            T.StructField("keep", T.BooleanType(), False),
            T.StructField("dup_of", id_field.dataType, True),
            T.StructField("dup_sim", T.DoubleType(), True),
        ]
    )

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m > max_cell:
            raise ValueError(
                f"semdedup cell of {m} rows exceeds max_cell={max_cell}; "
                "raise n_cells so cells stay executor-sized"
            )
        V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        ids = pdf[id_col].to_numpy()
        order = np.lexsort((ids, pdf["centroid_sim"].to_numpy()))
        keep = np.zeros(m, dtype=bool)
        dup_of = np.full(m, None, dtype=object)
        dup_sim = np.full(m, np.nan)
        kept = np.empty_like(V)  # incrementally-filled kept-row matrix
        kept_rows: list[int] = []
        for pos in order:
            nk = len(kept_rows)
            if nk:
                sims = np.round(kept[:nk] @ V[pos], ROUND)
                best = float(sims.max())
                if best >= threshold:
                    ties = [kept_rows[t] for t in np.flatnonzero(sims == best)]
                    leader = min(ties, key=lambda t: ids[t])
                    dup_of[pos] = ids[leader]
                    dup_sim[pos] = best
                    continue
            keep[pos] = True
            kept[len(kept_rows)] = V[pos]
            kept_rows.append(pos)
        return pd.DataFrame(
            {
                id_col: ids,
                "cell": pdf["cell"].to_numpy(),
                "centroid_sim": pdf["centroid_sim"].to_numpy(),
                "keep": keep,
                "dup_of": dup_of,
                "dup_sim": dup_sim,
            }
        )

    return assigned.groupBy("cell").applyInPandas(_greedy, out_schema)


def semdeduplicate(
    df: DataFrame,
    threshold: float,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_size: int = 20_000,
    seed: int = 42,
    max_cell: int = 50_000,
) -> DataFrame:
    """Keep-one filter: the input rows whose id survived ``semdedup``.

    Null-vector rows are KEPT (they carry no semantic signal to dedup on;
    screen them upstream if they should not survive). The join is on the
    id column only, so the full input row — every column — passes through.
    """
    verdicts = semdedup(
        df, threshold, n_cells, vec_col, id_col, train_size, seed, max_cell
    )
    dropped = verdicts.where(~F.col("keep")).select(id_col)
    return df.join(dropped, id_col, "left_anti")
