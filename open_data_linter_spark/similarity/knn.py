"""Approximate-nearest-neighbor search over an embedding column.

- ``brute_force_topk``: exact cosine top-k per query — cross join + window
  rank. Correctness baseline; O(n·q) but embarrassingly parallel (queries
  broadcast when small).
- ``lsh_topk``: random-hyperplane bucket restriction with multi-probe
  (query probes its own bucket plus 1-bit-flip neighbors) — the scale path:
  the join key (bucket) turns the cross join into a hash join, and recall
  is tuned by bits/probes.

An IVF variant at 100 TB would replace buckets with learned centroid cells
(k-means on a sample) — same join shape, different assignment.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from open_data_linter_spark.functions.vectors import bucket_signatures, cosine


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
    (same id) are excluded."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    if broadcast_queries:
        q = F.broadcast(q)
    scored = (
        c.crossJoin(q)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    return _rank_topk(scored, k)


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
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((tables, bits, dim))
    planes /= np.linalg.norm(planes, axis=2, keepdims=True)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).select(
        "neighbor_id", "cv",
        F.posexplode(bucket_signatures("cv", planes)).alias("table", "bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).select(
        "query_id", "qv",
        F.posexplode(bucket_signatures("qv", planes)).alias("table", "qbucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("qbucket"),
            *[F.col("qbucket").bitwiseXOR(F.lit(1 << b)) for b in range(bits)],
        )
        q = q.select("query_id", "qv", "table", F.explode(probes).alias("bucket"))
    else:
        q = q.select("query_id", "qv", "table", F.col("qbucket").alias("bucket"))
    scored = (
        c.join(F.broadcast(q), on=["table", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return _rank_topk(scored, k)
