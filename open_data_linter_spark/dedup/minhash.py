"""MinHash + LSH near-duplicate detection, DataFrame-native.

Pipeline (all Catalyst, no UDF):
  shingle(k-gram) → xxhash64 each shingle once (array<long>) → 64
  permutation min-hashes (re-hash the long with a per-permutation seed,
  array_min) → band into b bands of r rows → explode bands →
  groupBy(band, band_hash) bucket join → candidate pairs → exact Jaccard
  verification on the hashed shingle sets.

Scale notes:
- the only big shuffle is the band-bucket self-join; bucket sizes are
  bounded by hashing (hot buckets = near-identical content, which is the
  signal, and AQE skew-split handles the residue);
- candidate verification joins back to the (distinct) hashed shingle sets
  by id — at 100 TB these would be bucketed tables; candidates are a tiny
  fraction of the corpus;
- the checkpointed intermediate holds array<long>, never the shingle
  strings: Jaccard over the hashed sets equals Jaccard over the string
  sets (xxhash64 collisions are negligible at any realistic doc size),
  and the materialized bytes drop by roughly the mean shingle length;
- single-file inputs arrive as one partition — spread to the session's
  parallelism BEFORE the shingling projection (never reducing an already
  parallel input);
- banding params (b=16, r=4) target J ≈ 0.7+: P(candidate) = 1-(1-J^r)^b.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_data_linter_spark.dedup._cache import persist_scoped, spread_and_pin
from open_data_linter_spark.functions.text import shingles

N_PERM_DEFAULT = 64


def minhash_signature(shingle_col, n_perm: int = N_PERM_DEFAULT):
    """Array of n_perm min-hashes from a STRING shingle array.

    One xxhash64 over the shingle string, then each permutation re-hashes
    the resulting long with a per-permutation salt — hashing an 8-byte long
    is far cheaper than hashing the string n_perm times. (An affine a*h+b
    family would be cheaper still, but long-multiply overflow throws under
    ANSI mode.)
    """
    base = F.transform(shingle_col, lambda s: F.xxhash64(s))
    return minhash_signature_from_hashes(base, n_perm)


def minhash_signature_from_hashes(hash_col, n_perm: int = N_PERM_DEFAULT):
    """Array of n_perm min-hashes from an already-hashed array<long>.

    Feed this a materialized column (not an inline transform subtree):
    Catalyst does not CSE across higher-order-function lambdas, so an
    embedded subtree would re-hash every shingle string n_perm times.

    The per-permutation salt MUST be closed over with a single-parameter
    lambda: PySpark decides by ARITY whether a transform lambda receives
    (element) or (element, array_index), so the natural
    ``lambda h, i=i: ...`` capture silently rebinds ``i`` to the index
    column and every "permutation" becomes the same expression — the
    signature degenerates to n_perm copies of one min-hash and banding
    recall collapses from 1-(1-J^r)^b to J (found in round 4: two
    jaccard-0.97 pairs missed at sf0.01; regression-pinned in
    tests/test_dedup_similarity.py::test_minhash_permutations_vary).
    """

    def perm(i: int):
        return lambda h: F.xxhash64(h, F.lit(i))

    return F.array(
        *[F.array_min(F.transform(hash_col, perm(i))) for i in range(n_perm)]
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

    Jaccard is computed on the xxhash64-hashed shingle sets — identical to
    string-set Jaccard up to 64-bit hash collisions (~0 in practice) —
    so only array<long> is ever checkpointed or shuffled.
    """
    rows_per_band = n_perm // bands
    # spread + boundary pin (measured: without it the whole shingling pass
    # serialized onto one core) — see dedup/_cache.spread_and_pin
    src = spread_and_pin(
        "minhash.src",
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")),
    )
    hashed = src.select(
        "id",
        F.transform(shingles(F.col("__t"), k), lambda s: F.xxhash64(s)).alias("hs"),
    ).where(F.size("hs") > 0)
    # hashed feeds three consumers (signatures, both verify sides); persist
    # so shingling runs once. At cluster scale: persist to storage / a
    # bucketed table instead.
    hashed = persist_scoped("minhash.hashed", hashed)
    sig = hashed.select(
        "id", minhash_signature_from_hashes(F.col("hs"), n_perm).alias("sig")
    )
    # band rows carry ONLY (id, band, band-hash): the candidate self-join and
    # its dedup never shuffle the hash arrays (they re-join by id after).
    # No second checkpoint — re-deriving band rows from the checkpointed
    # hashes is one narrow stage, cheaper than an eager materialization
    # (measured: the former second checkpoint cost more than it saved).
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
    # Candidate pairs: ONE shuffle (groupBy band,bh), then in-bucket pair
    # expansion as a Catalyst array comprehension — replaces the former
    # bucket-count + filter-join + self-join + dropDuplicates chain (3-4
    # exchanges on the same tiny keys). Hot buckets above the cap are
    # dropped before expansion, so the flatten is bounded by cap² per
    # bucket; the per-bucket member list fits comfortably in an executor
    # row (cap defaults to 500 ids).
    buckets = banded.groupBy("band", "bh").agg(
        F.array_sort(F.collect_list("id")).alias("ids")
    )
    if max_bucket_size is not None:
        buckets = buckets.where(F.size("ids") <= max_bucket_size)
    buckets = buckets.where(F.size("ids") >= 2)
    pair_expr = F.flatten(
        F.transform(
            F.slice(F.col("ids"), 1, F.size("ids") - 1),
            lambda a, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size("ids")),
                lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
            ),
        )
    )
    candidates = (
        buckets.select(F.explode(pair_expr).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        # duplicate id rows in the input sort adjacent in the bucket member
        # list and would expand to (x, x) self-pairs (the old self-join's
        # l.id < r.id excluded them structurally)
        .where(F.col("id_a") != F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hs_a = hashed.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a"))
    hs_b = hashed.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"))
    verified = candidates.join(hs_a, "id_a").join(hs_b, "id_b")
    inter = F.size(F.array_intersect("hs_a", "hs_b")).cast("double")
    union = F.size(F.array_union("hs_a", "hs_b")).cast("double")
    return (
        verified.select(
            "id_a",
            "id_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )
