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
    """Array of n_perm min-hashes.

    One xxhash64 over the shingle STRING, then each permutation re-hashes
    the resulting long with a per-permutation salt — hashing an 8-byte long
    is far cheaper than hashing the string n_perm times. (An affine a*h+b
    family would be cheaper still, but long-multiply overflow throws under
    ANSI mode.)
    """
    base = F.transform(shingle_col, lambda s: F.xxhash64(s))
    return F.array(
        *[
            F.array_min(F.transform(base, lambda h, i=i: F.xxhash64(h, F.lit(i))))
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
    max_bucket_size: int | None = 500,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, jaccard >= threshold).

    ``max_bucket_size`` drops LSH buckets larger than the cap before the
    self-join: a bucket of m members contributes m² candidate pairs, so hot
    buckets (caused by near-universal shingles) dominate cost quadratically
    while contributing mostly sub-threshold pairs. Essential at scale; set
    None for exhaustive candidates.
    """
    rows_per_band = n_perm // bands
    base = df.select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), k).alias("sh"),
    ).where(F.size("sh") > 0)
    # self-joins below would otherwise recompute shingling+signatures on BOTH
    # sides; truncate lineage once (at cluster scale: persist to storage)
    base = base.localCheckpoint(eager=True)
    sig = base.select(
        "id", "sh", minhash_signature(F.col("sh"), n_perm).alias("sig")
    )
    # band rows carry ONLY (id, band, band-hash): the candidate self-join and
    # its dedup never shuffle the shingle arrays (they re-join by id after)
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    banded = banded.localCheckpoint(eager=True)
    if max_bucket_size is not None:
        ok_buckets = (
            banded.groupBy("band", "bh")
            .agg(F.count(F.lit(1)).alias("__m"))
            .where(F.col("__m") <= max_bucket_size)
            .select("band", "bh")
        )
        banded = banded.join(ok_buckets, ["band", "bh"])

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
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_a = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = candidates.join(sh_a, "id_a").join(sh_b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        verified.select(
            "id_a",
            "id_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )
