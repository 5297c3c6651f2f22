"""Approximate-nearest-neighbor search over an embedding column.

- ``brute_force_topk``: exact cosine top-k per query — cross join + window
  rank. Correctness baseline; O(n·q) but embarrassingly parallel (queries
  broadcast when small).
- ``lsh_topk``: random-hyperplane bucket restriction with multi-table
  OR-construction + 1-bit multi-probe — data-independent scale path: the
  join key (table, bucket) turns the cross join into a hash join, recall
  tuned by bits/tables.
- ``ivf_topk``: learned centroid cells (k-means on a driver-side sample,
  Lloyd iterations in numpy) with nprobe nearest cells per query — the
  data-ADAPTIVE scale path (FAISS IVF-Flat shape): assignment is one
  vectorized matmul per Arrow batch, search is a hash join on cell id.
  Beats LSH on clustered data at equal candidate volume; the sample-train/
  broadcast-centroids split is exactly how it runs at 10^12 rows (train on
  ~1e5 rows, centroids are a few MB of literals).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from open_data_linter_spark.functions.vectors import (
    bucket_signatures,
    cosine_given_norms,
    nearest_centroids,
    norm,
)


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, cos_sim, rank). Self-matches
    (same id) are excluded.

    Round 6: with ``broadcast_queries=True`` (the documented
    small-queries mode — every caller) the scoring runs as one numpy
    matmul per Arrow batch of the corpus (guide §4.2): the query matrix
    is collected driver-side and closed over, each corpus partition
    emits only its per-query top-k candidate rows (selected by the FINAL
    sort key — rounded cosine desc, neighbor id asc — so the union
    provably contains the global top-k), and the existing window ranks
    the reduced set. The former shape cross-joined every (corpus, query)
    pair and evaluated the dot as an interpreted HOF fold — n·q·dim
    interpreted lambda evaluations (8.4M pairs × 64 dims for the bench's
    audio probe) plus an n·q-row window shuffle. Float caveat: numpy's
    pairwise summation can differ from the sequential JVM fold by final
    ulps; values are still rounded by the same JVM F.round, and the
    FULL exact oracle twins (knn_bruteforce, knn_lsh, audio_knn) gate
    the results at every checked scale.

    With ``broadcast_queries=False`` (queries too large to collect) the
    original cross-join + window shape runs unchanged."""
    if broadcast_queries:
        return _brute_force_topk_np(corpus, queries, k, vec_col, id_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    scored = (
        c.crossJoin(q)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_given_norms(
                    F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    return _rank_topk(scored, k)


def _brute_force_topk_np(
    corpus: DataFrame, queries: DataFrame, k: int, vec_col: str, id_col: str
) -> DataFrame:
    """Vectorized exact top-k (see ``brute_force_topk``): queries driver-
    side, per-corpus-partition matmul + partial top-k, final window."""
    import pandas as pd

    spark = corpus.sparkSession
    qid_t = queries.schema[id_col].dataType.simpleString()
    nid_t = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"query_id {qid_t}, neighbor_id {nid_t}, cos_sim double"
    rank_schema = out_schema + ", rank int"
    qrows = (
        queries.select(id_col, vec_col)
        .where(F.col(vec_col).isNotNull())
        .collect()
    )
    if not qrows:
        return spark.createDataFrame([], rank_schema)
    q_ids = np.array([r[0] for r in qrows])
    qm = np.array([np.asarray(r[1], dtype=np.float64) for r in qrows])
    qn = np.sqrt((qm * qm).sum(axis=1))
    kk = int(k)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            nid = pdf[id_col].to_numpy()
            # pre-sort rows by neighbor id so stable argsort below breaks
            # cosine ties by ascending id — the final window's tie rule
            order0 = np.argsort(nid, kind="stable")
            nid = nid[order0]
            cm = np.array(
                [
                    np.asarray(v, dtype=np.float64)
                    for v in pdf[vec_col].to_numpy()[order0]
                ]
            )
            cn = np.sqrt((cm * cm).sum(axis=1))
            denom = cn[:, None] * qn[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                s = np.where(denom == 0.0, 0.0, (cm @ qm.T) / denom)
            # selection key = the FINAL sort key: HALF_UP-rounded cosine
            # (sign-aware), descending, id-ascending via stable sort
            r6 = np.sign(s) * np.floor(np.abs(s) * 1e6 + 0.5) / 1e6
            self_mask = nid[:, None] == q_ids[None, :]
            r6 = np.where(self_mask, -np.inf, r6)
            qi, ni, cs = [], [], []
            for j in range(len(q_ids)):
                idx = np.argsort(-r6[:, j], kind="stable")[:kk]
                idx = idx[~self_mask[idx, j]]
                if not len(idx):
                    continue
                qi.extend([q_ids[j]] * len(idx))
                ni.extend(nid[idx])
                cs.extend(s[idx, j])  # unrounded; JVM F.round below
            if qi:
                yield pd.DataFrame(
                    {"query_id": qi, "neighbor_id": ni, "cos_sim": cs}
                )

    par = spark.sparkContext.defaultParallelism
    src = corpus.select(id_col, vec_col).where(F.col(vec_col).isNotNull())
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    cand = src.mapInPandas(score, out_schema).withColumn(
        "cos_sim", F.round("cos_sim", 6)
    )
    return _rank_topk(cand, k)


def lsh_planes(tables: int, bits: int, dim: int, seed: int = 42) -> np.ndarray:
    """The (tables, bits, dim) unit hyperplanes lsh_topk hashes with —
    exposed so measurement tooling (scripts/sweep_lsh_recall.py) probes
    the SAME planes the shipped path uses."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((tables, bits, dim))
    planes /= np.linalg.norm(planes, axis=2, keepdims=True)
    return planes


def lsh_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    planes: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multiprobe: bool = True,
) -> DataFrame:
    """Distinct (query_id, neighbor_id, qv, cv, qn, cn) candidate pairs
    colliding in ≥1 table (multi-probe included) — the candidate stage of
    lsh_topk, shared with the recall/candidate-volume sweep. ``qn``/``cn``
    are the per-row vector norms, projected once per side so the scoring
    stage pays one array fold per pair."""
    bits = planes.shape[1]
    # null vectors can't be signed (np.stack in bucket_signatures raises on
    # None) and can't be neighbors — drop them up front, same as ivf_topk
    corpus = corpus.where(F.col(vec_col).isNotNull())
    queries = queries.where(F.col(vec_col).isNotNull())
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
    ).select(
        "neighbor_id", "cv", "cn",
        F.posexplode(bucket_signatures("cv", planes)).alias("table", "bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    ).select(
        "query_id", "qv", "qn",
        F.posexplode(bucket_signatures("qv", planes)).alias("table", "qbucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("qbucket"),
            *[F.col("qbucket").bitwiseXOR(F.lit(1 << b)) for b in range(bits)],
        )
        q = q.select(
            "query_id", "qv", "qn", "table", F.explode(probes).alias("bucket")
        )
    else:
        q = q.select(
            "query_id", "qv", "qn", "table", F.col("qbucket").alias("bucket")
        )
    return (
        c.join(F.broadcast(q), on=["table", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    dim: int = 64,
    multiprobe: bool = True,
    seed: int = 42,
    tables: int = 1,
) -> DataFrame:
    """Approximate top-k via hyperplane buckets + 1-bit multi-probe.

    ``tables`` > 1 is the classic multi-table (L hash tables) LSH
    OR-construction: each table has independent planes; a corpus vector is
    a candidate if it collides with the query (or a 1-bit probe of it) in
    ANY table. Recall rises much faster than candidate volume because
    collisions concentrate on genuinely-close vectors; the join stays a
    hash join on (table, bucket).
    """
    planes = lsh_planes(tables, bits, dim, seed)
    cand = lsh_candidates(corpus, queries, planes, vec_col, id_col, multiprobe)
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_given_norms(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")),
            6,
        ).alias("cos_sim"),
    )
    return _rank_topk(scored, k)


def normalized_train_sample(
    corpus: DataFrame,
    vec_col: str = "embedding",
    train_size: int = 20_000,
    seed: int = 42,
) -> np.ndarray:
    """Seeded UNIFORM bounded sample of L2-normalized vectors — the
    shared trainer draw for IVF centroids and PQ codebooks. Never a
    ``limit``: Spark's limit drains the first partitions, so on
    ingestion-ordered data it would train on one time-slice of the
    corpus and bias every quantizer there (round-3 verdict)."""
    src = corpus.select(vec_col).where(F.col(vec_col).isNotNull())
    # size the fraction from the UNFILTERED corpus count: a bare-scan
    # count() is answered from parquet footer metadata (no data pass),
    # while counting the isNotNull-filtered frame would scan the embedding
    # column — a full extra corpus pass at 10^12 rows. Null rows only
    # shrink the draw below the overdraw slack; the empty-draw fallback
    # below covers pathological all-null corpora.
    n = corpus.count()
    if n == 0:
        raise ValueError(f"ivf: no non-null vectors in column {vec_col!r}")
    if n <= train_size:
        rows = [r[0] for r in src.collect()]
        if not rows:
            raise ValueError(f"ivf: no non-null vectors in column {vec_col!r}")
    else:
        # overdraw ~10% + slack so the binomial draw under-shooting
        # train_size is vanishingly unlikely; per-partition seeded sampling
        # keeps the pin regenerable for a fixed input layout
        frac = min(1.0, (train_size * 1.1 + 100.0) / n)
        rows = [r[0] for r in src.sample(False, frac, seed).collect()]
        if not rows:  # zero-draw: mostly-null corpus (or binomial fluke)
            rows = [r[0] for r in src.limit(train_size).collect()]
        if not rows:
            raise ValueError(f"ivf: no non-null vectors in column {vec_col!r}")
        if len(rows) > train_size:
            pick = np.random.default_rng(seed).choice(
                len(rows), size=train_size, replace=False
            )
            rows = [rows[i] for i in np.sort(pick)]
    sample = np.array(rows, dtype=np.float64)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    return sample


def train_centroids(
    corpus: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    train_size: int = 20_000,
    iters: int = 10,
    seed: int = 42,
    sample: np.ndarray | None = None,
) -> np.ndarray:
    """IVF coarse quantizer: Lloyd's k-means on a bounded driver-side
    sample (spherical: vectors and centroids L2-normalized, so argmax dot
    == argmax cosine). The sample is capped — at 10^12 rows this is the
    standard train-on-a-sample step, not a full collect.

    The sample is a seeded UNIFORM draw across the whole corpus, never a
    ``limit``: Spark's limit drains the first partitions, so on
    ingestion-ordered data it would train the quantizer on one time-slice
    of the corpus and skew every centroid there (round-3 verdict). A cheap
    count sizes the Bernoulli fraction with a small overdraw; if the draw
    lands over ``train_size`` it is trimmed driver-side with a seeded
    uniform choice (NOT a limit — a limit over the sample would re-bias
    toward early partitions)."""
    if sample is None:
        sample = normalized_train_sample(corpus, vec_col, train_size, seed)
    # degrade gracefully on tiny corpora/samples: fewer cells, never a crash
    n_cells = max(1, min(n_cells, len(sample)))
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=n_cells, replace=False)]
    for _ in range(iters):
        assign = (sample @ cents.T).argmax(axis=1)
        for c in range(n_cells):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_size: int = 20_000,
    seed: int = 42,
) -> DataFrame:
    """IVF-Flat top-k: corpus rows hash-join queries on centroid cell id;
    each query probes its ``nprobe`` nearest cells; exact cosine re-ranks.

    Expected candidate volume per query ≈ nprobe/n_cells of the corpus —
    tune both for the recall/cost point. All per-row work is one matmul per
    Arrow batch (nearest_centroids); no Python loop touches rows.
    """
    cents = train_centroids(corpus, n_cells, vec_col, train_size, seed=seed)
    nprobe = max(1, min(nprobe, cents.shape[0]))  # tiny corpus => fewer cells
    # null vectors are excluded from training above; exclude them from the
    # scoring path too (np.stack in the assignment UDF can't take None)
    corpus = corpus.where(F.col(vec_col).isNotNull())
    queries = queries.where(F.col(vec_col).isNotNull())
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
    ).select(
        "neighbor_id", "cv", "cn",
        F.element_at(nearest_centroids("cv", cents, 1), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    ).select(
        "query_id", "qv", "qn",
        F.explode(nearest_centroids("qv", cents, nprobe)).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_given_norms(
                    F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
                ),
                6,
            ).alias("cos_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return _rank_topk(scored, k)
