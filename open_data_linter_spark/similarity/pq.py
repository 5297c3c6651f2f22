"""IVF-PQ approximate nearest neighbor — product-quantized search.

Product quantization (Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search", TPAMI 2011) is the standard memory-compressed
ANN path: each vector is cut into ``m`` subspaces and every subspace is
vector-quantized against its own 2^bits-entry codebook, so a 64-dim
float32 vector (256 bytes) becomes ``m`` one-byte codes. Search scores
candidates with ADC (asymmetric distance computation): the QUERY builds a
per-subspace lookup table of dot products against every codebook entry
(m × 2^bits floats, computed once per query), and a candidate's
approximate score is just ``m`` table lookups summed — no candidate
vector is ever touched.

Why this matters at 10^12 rows: the IVF-Flat path (similarity/knn.py)
ships full vectors through the probe join; here the join carries only
the code arrays (a 32× payload reduction at m=8 on 64-dim float32), the
shape that keeps a trillion-row index in cluster memory. The plan is the
ivf_topk shape — corpus hash-joins broadcast queries on the coarse cell
id — with the exact-cosine re-rank replaced by Arrow-vectorized ADC
(one numpy gather+sum per batch).

Scoring model: codebooks are trained on L2-NORMALIZED vectors, and ADC
approximates the cosine (dot-on-normalized) by ``sum_s q_s · c_s[code]``
— the PQ reconstruction of the candidate dotted with the exact query.
Scores are approximate; ``ivf_pq_topk`` is for candidate surfacing, and
callers needing exact ranks re-score the short list (the driver oracle
does exactly that in SQL: pins surfaced ids, recomputes true cosine,
enforces a recall floor — the knn_ivf pattern).

Determinism: coarse centroids and subspace codebooks both come from the
seeded uniform-sample trainer (never ``limit``); encoding and ADC are
argmin/gather arithmetic; ties in the final rank break by neighbor id.

The reference (volare-all/open-data-linter) has no vector search; this
extends the engine per the training-data-pipeline mandate.
"""

from __future__ import annotations

# module-top pd/np: function-local imports break @pandas_udf type-hint
# resolution under `from __future__ import annotations` (CLAUDE.md)
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_data_linter_spark.similarity.knn import (
    _rank_topk,
    normalized_train_sample,
    train_centroids,
)
from open_data_linter_spark.functions.vectors import nearest_centroids


def train_codebooks(
    corpus: DataFrame,
    m: int = 8,
    bits: int = 4,
    vec_col: str = "embedding",
    train_size: int = 20_000,
    iters: int = 10,
    seed: int = 42,
    centroids: np.ndarray | None = None,
    sample: np.ndarray | None = None,
) -> np.ndarray:
    """Per-subspace Lloyd's k-means codebooks, shape (m, 2^bits, dsub),
    trained on the seeded uniform sample of L2-normalized vectors.
    Subspace s covers dims [s*dsub, (s+1)*dsub); dim must divide by m.

    With ``centroids`` (the IVF coarse quantizer), codebooks are trained
    on RESIDUALS ``v - centroid(cell(v))`` — the IVFADC formulation
    (Jégou et al. 2011 §IV). This is what makes in-cell ranking work:
    after coarse assignment all candidates share the cell centroid, so
    flat PQ codes would collapse to near-identical reconstructions and
    ranks would be tie-break noise; the residual is exactly the signal
    that distinguishes neighbors within a cell."""
    ksub = 1 << bits
    if sample is None:
        sample = normalized_train_sample(corpus, vec_col, train_size, seed)
    if centroids is not None:
        assign = (sample @ centroids.T).argmax(axis=1)
        sample = sample - centroids[assign]
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub))
    for s in range(m):
        sub = sample[:, s * dsub : (s + 1) * dsub]
        k = min(ksub, len(sub))
        cents = sub[rng.choice(len(sub), size=k, replace=False)]
        for _ in range(iters):
            # |a-b|^2 via the dot identity (row-constant |a|^2 dropped —
            # argmin over cents only): BLAS matmul instead of a
            # rows x k x dsub broadcast temporary
            d2 = (cents**2).sum(axis=1)[None, :] - 2.0 * (sub @ cents.T)
            assign = d2.argmin(axis=1)
            for c in range(k):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        if k < ksub:  # degenerate tiny sample: pad with repeats
            cents = np.concatenate([cents, np.repeat(cents[:1], ksub - k, 0)])
        books[s] = cents
    return books


def pq_encode(
    df: DataFrame,
    books: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Append the m-byte PQ code array (argmin L2 per subspace over the
    L2-normalized vector) — one vectorized distance computation per Arrow
    batch."""
    from pyspark.sql.functions import pandas_udf

    m, ksub, dsub = books.shape
    b = books  # closure capture

    @pandas_udf("array<int>")
    def _enc(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(mat), m), dtype=np.int32)
        for s in range(m):
            sub = mat[:, s * dsub : (s + 1) * dsub]
            d2 = (b[s] ** 2).sum(axis=1)[None, :] - 2.0 * (sub @ b[s].T)
            codes[:, s] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return df.withColumn(out_col, _enc(vec_col))


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    m: int = 8,
    bits: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_size: int = 20_000,
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ top-k: coarse probe join on cell id (the ivf_topk shape),
    ADC scoring over code arrays (candidate vectors never shipped),
    rank by approximate score with (score DESC, neighbor_id ASC) ties.
    Returns (query_id, neighbor_id, adc_score, rank).

    The per-subspace lookup table is recomputed per candidate ROW inside
    the Arrow batch (dsub × ksub flops ≈ 1k — memory-bandwidth noise)
    rather than grouped per query: it keeps the plan a plain projection
    after the probe join, with no extra shuffle on (query, candidates).
    """
    from pyspark.sql.functions import pandas_udf

    # ONE sample draw feeds both quantizers: at 10^12 rows each draw is
    # a corpus count + a sampled scan, so sharing halves the train cost
    smp = normalized_train_sample(corpus, vec_col, train_size, seed)
    cents = train_centroids(
        corpus, n_cells, vec_col, train_size, seed=seed, sample=smp
    )
    books = train_codebooks(
        corpus, m, bits, vec_col, train_size, seed=seed,
        centroids=cents, sample=smp,
    )
    nprobe = max(1, min(nprobe, cents.shape[0]))
    corpus = corpus.where(F.col(vec_col).isNotNull())
    queries = queries.where(F.col(vec_col).isNotNull())

    mm, ksub, dsub = books.shape
    b, cn = books, cents

    # one pass per corpus batch: coarse assign + residual PQ encode
    @pandas_udf("struct<cell:int,pq_code:array<int>>")
    def _enc(v: pd.Series) -> pd.DataFrame:
        mat = np.stack(v.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        cell = (mat @ cn.T).argmax(axis=1)
        res = mat - cn[cell]
        codes = np.empty((len(mat), mm), dtype=np.int32)
        for s in range(mm):
            sub = res[:, s * dsub : (s + 1) * dsub]
            # encode is the at-scale hot loop (every corpus batch); the
            # dot-identity form is one rows x ksub matmul per subspace
            # instead of a rows x ksub x dsub broadcast temporary
            d2 = (b[s] ** 2).sum(axis=1)[None, :] - 2.0 * (sub @ b[s].T)
            codes[:, s] = d2.argmin(axis=1)
        return pd.DataFrame(
            {"cell": cell.astype(np.int32), "pq_code": list(codes)}
        )

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _enc(F.col(vec_col)).alias("e"),
    ).select("neighbor_id", "e.cell", "e.pq_code")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).select(
        "query_id", "qv",
        F.explode(nearest_centroids("qv", cents, nprobe)).alias("cell"),
    )

    # ADC against the probed cell: score = q . cent[cell] + q . rec(residual)
    @pandas_udf("double")
    def _adc(qv: pd.Series, cell: pd.Series, code: pd.Series) -> pd.Series:
        qm = np.stack(qv.to_numpy()).astype(np.float64)
        qm /= np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
        cells = cell.to_numpy().astype(np.int64)
        codes = np.stack(code.to_numpy()).astype(np.int64)  # (rows, m)
        score = (qm * cn[cells]).sum(axis=1)
        # per-row lookup-table gather: table[r, s, j] = q_sub(r,s) @ book[s, j]
        for s in range(mm):
            tab = qm[:, s * dsub : (s + 1) * dsub] @ b[s].T  # (rows, ksub)
            score += tab[np.arange(len(qm)), codes[:, s]]
        return pd.Series(np.round(score, 6))

    scored = (
        c.join(F.broadcast(q), on="cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _adc(F.col("qv"), F.col("cell"), F.col("pq_code")).alias(
                "cos_sim"
            ),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return _rank_topk(scored, k).withColumnRenamed("cos_sim", "adc_score")
