"""MinHash + LSH near-duplicate detection, DataFrame-native.

Pipeline (all Catalyst, no UDF):
  shingle(k-gram) → 64 permutation min-hashes (xxhash64 with per-permutation
  seed, array_min) → band into b bands of r rows → explode bands →
  groupBy(band, band_hash) bucket join → candidate pairs → exact Jaccard
  verification on the shingle sets.

Scale notes:
- the only big shuffle is the band-bucket self-join; bucket sizes are
  bounded by hashing (hot buckets = near-identical content, which is the
  signal, and AQE skew-split handles the residue);
- candidate verification joins back to the (distinct) shingle sets by id —
  at 100 TB these would be bucketed tables; candidates are a tiny fraction
  of the corpus;
- banding params (b=16, r=4) target J ≈ 0.7+: P(candidate) = 1-(1-J^r)^b.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_data_linter_spark.functions.text import shingles

N_PERM_DEFAULT = 64


def minhash_signature(shingle_col, n_perm: int = N_PERM_DEFAULT):
    """Array of n_perm min-hashes. Permutation i = xxhash64(shingle, seed=i)."""
    return F.array(
        *[
            F.array_min(F.transform(shingle_col, lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(n_perm)
        ]
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_perm: int = N_PERM_DEFAULT,
    bands: int = 16,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, jaccard >= threshold)."""
    rows_per_band = n_perm // bands
    base = df.select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), k).alias("sh"),
    ).where(F.size("sh") > 0)
    sig = base.select(
        "id", "sh", minhash_signature(F.col("sh"), n_perm).alias("sig")
    )
    banded = sig.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                "_",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sh", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))

    left = banded.alias("l")
    right = banded.alias("r")
    candidates = (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bh") == F.col("r.bh"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sh").alias("sh_a"),
            F.col("r.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        candidates.select(
            "id_a",
            "id_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )
