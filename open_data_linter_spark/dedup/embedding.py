"""Embedding-cosine near-duplicate detection.

Two strategies over an ``array<float>`` column:
- brute-force: self-join + Catalyst cosine — exact, O(n²), the correctness
  baseline (and the DuckDB-oracle-checkable path);
- LSH-bucketed: random-hyperplane signature restricts the self-join to
  same-bucket pairs — the scale path (expected recall tunable by bits).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_data_linter_spark.functions.vectors import cosine, hyperplane_bucket


def embedding_near_duplicates(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    lsh_bits: int | None = None,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Pairs (id_a < id_b, cosine >= threshold)."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    join_on = [F.col("l.id") < F.col("r.id")]
    if lsh_bits:
        assert dim, "dim required for LSH planes"
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((lsh_bits, dim))
        planes /= np.linalg.norm(planes, axis=1, keepdims=True)
        base = base.withColumn("bucket", hyperplane_bucket(F.col("v"), planes.tolist()))
        join_on.insert(0, F.col("l.bucket") == F.col("r.bucket"))
    l, r = base.alias("l"), base.alias("r")
    return (
        l.join(r, on=join_on)
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(cosine(F.col("l.v"), F.col("r.v")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
        .orderBy("id_a", "id_b")
    )
