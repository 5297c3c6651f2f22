"""Incremental near-dup detection: match a NEW batch against a persisted
MinHash index instead of re-deduplicating the whole corpus.

At 100 TB you never re-run the O(corpus) self-join for a daily ingest
batch. The scalable shape is:

  1. ``build_minhash_index(corpus)`` → two narrow frames the caller
     writes once as bucketed tables: band rows ``(id, band, bh)``
     (bucketed by ``(band, bh)``) and hashed shingle sets ``(id, hs)``
     (bucketed by ``id``). Building touches each corpus doc exactly once
     and is embarrassingly parallel — no self-join, no pair expansion.
  2. ``match_against_index(batch, index)`` → ``(batch_id, index_id,
     jaccard)``. Only the BATCH is re-shingled; candidates come from an
     equi-join of the batch's band rows against the index's on
     ``(band, bh)`` — with a bucketed index this is a co-located probe
     whose cost follows |batch|, not |corpus| — and the tiny candidate
     set joins back to both hashed-shingle tables for exact-Jaccard
     verification. Batch-internal duplicates are the existing
     ``minhash_near_duplicates`` self-join over just the batch.

Same signature family as dedup/minhash.py (the affine Mersenne-31
permutations), so an index built by one release replays byte-identical
in the next — the curation CLI's rerun contract extends to the index.

The reference (volare-all/open-data-linter) lints single files per run
and has no cross-run state; this extends the engine per the
training-data-pipeline mandate (streaming/dedup.py is the micro-batch
analog; this is the batch-ingest analog).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_data_linter_spark.dedup._cache import persist_scoped, spread_and_pin
from open_data_linter_spark.dedup.minhash import (
    N_PERM_DEFAULT,
    band_rows,
    hashed_shingle_sets,
    minhash_signature_from_hashes,
)


@dataclass(frozen=True)
class MinhashIndex:
    """A built index: two narrow frames plus the parameters that made
    them (a probe MUST use the same shingle k / permutation family /
    banding, so they travel with the data)."""

    bands_df: DataFrame  # (id, band, bh)
    hashed_df: DataFrame  # (id, hs: array<long>)
    k: int
    n_perm: int
    bands: int


def build_minhash_index(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_perm: int = N_PERM_DEFAULT,
    bands: int = 16,
) -> MinhashIndex:
    """One pass over the corpus → band rows + hashed shingle sets.

    Both frames are returned lazy; this helper persists the hashed sets
    (band rows derive from them in one narrow stage). At cluster scale
    the caller writes both with ``write.bucketBy`` — ``(band, bh)`` for
    the band rows, ``id`` for the hashed sets — so every future probe
    join is co-located."""
    src = spread_and_pin(
        "mh_index.src",
        corpus.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")),
    )
    hashed = persist_scoped(
        "mh_index.hashed", hashed_shingle_sets(src, "__t", "id", k)
    )
    sig = hashed.select(
        "id", minhash_signature_from_hashes(F.col("hs"), n_perm).alias("sig")
    )
    return MinhashIndex(band_rows(sig, n_perm, bands), hashed, k, n_perm, bands)


def save_index(index: MinhashIndex, path: str) -> None:
    """Persist an index as three parquet tables under ``path``: ``bands/``
    (repartitioned by band hash — co-locates hot buckets), ``hashed/``
    and a one-row ``params/`` sidecar. Plain parquet (no metastore
    dependency) is deliberate: the probe broadcasts the batch side, so
    bucket metadata would buy nothing — the index is scanned, never
    shuffled, and any Hadoop-supported filesystem works."""
    spark = index.bands_df.sparkSession
    par = spark.sparkContext.defaultParallelism
    index.bands_df.repartition(par, "band", "bh").write.mode(
        "overwrite"
    ).parquet(f"{path}/bands")
    index.hashed_df.repartition(par, "id").write.mode("overwrite").parquet(
        f"{path}/hashed"
    )
    spark.createDataFrame(
        [(index.k, index.n_perm, index.bands)], "k int, n_perm int, bands int"
    ).write.mode("overwrite").parquet(f"{path}/params")


def append_to_index(
    accepted: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Fold an accepted batch into a persisted index (the ingest loop's
    last step: probe → filter survivors → append). Parameters come from
    the index's own params sidecar — an appender can never mix shingle
    k / permutation families. Append-mode parquet writes only the new
    rows; the corpus frames are never read or rewritten.

    Idempotent on ids: docs whose id is ALREADY in the index are skipped
    (anti-join against the stored id column, materialized before the
    self-path append), so a crashed run replayed with the same batch
    cannot double-append rows and duplicate every future probe match."""
    spark = accepted.sparkSession
    p = spark.read.parquet(f"{path}/params").head()
    existing = spark.read.parquet(f"{path}/hashed").select("id")
    idx = build_minhash_index(
        accepted, text_col, id_col, int(p["k"]), int(p["n_perm"]), int(p["bands"])
    )
    hashed = idx.hashed_df.join(existing, "id", "left_anti").localCheckpoint(
        eager=True
    )
    idx.bands_df.join(
        hashed.select("id"), "id", "left_semi"
    ).write.mode("append").parquet(f"{path}/bands")
    hashed.write.mode("append").parquet(f"{path}/hashed")


def load_index(spark, path: str) -> MinhashIndex:
    """Reload a ``save_index`` output; parameters travel with the data so
    a probe can never silently use a mismatched shingle k / banding."""
    p = spark.read.parquet(f"{path}/params").head()
    return MinhashIndex(
        spark.read.parquet(f"{path}/bands"),
        spark.read.parquet(f"{path}/hashed"),
        int(p["k"]),
        int(p["n_perm"]),
        int(p["bands"]),
    )


def match_against_index(
    batch: DataFrame,
    index: MinhashIndex,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    broadcast_batch: bool = True,
) -> DataFrame:
    """(batch_id, index_id, jaccard >= threshold) — new-vs-corpus pairs only.

    Work scales with |batch| + |candidates|: the corpus index is probed
    by equi-join, never rebuilt or self-joined. With the default
    ``broadcast_batch=True`` (an ingest batch ≪ the corpus) every
    batch-derived join side carries a broadcast hint, so the corpus
    frames are SCANNED but never SHUFFLED — the probe plan is
    BroadcastHashJoins all the way down and the only exchange is the
    O(candidates) pair dedup (plan-asserted in
    tests/test_incremental_dedup.py). Disable for a batch too large to
    broadcast and the same plan degrades gracefully to shuffle joins.
    A batch doc that also exists in the index under the same id is not
    reported against itself (re-ingest safety); batch-internal pairs are
    out of scope by design — run ``minhash_near_duplicates`` on the
    batch for those."""
    b_hint = F.broadcast if broadcast_batch else (lambda d: d)
    b_src = spread_and_pin(
        "mh_probe.src",
        batch.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")),
    )
    b_hashed = persist_scoped(
        "mh_probe.hashed", hashed_shingle_sets(b_src, "__t", "id", index.k)
    )
    b_sig = b_hashed.select(
        "id",
        minhash_signature_from_hashes(F.col("hs"), index.n_perm).alias("sig"),
    )
    b_bands = band_rows(b_sig, index.n_perm, index.bands).select(
        F.col("id").alias("batch_id"), "band", "bh"
    )
    # Candidate probe: one equi-join on (band, bh). Any shared band is a
    # candidate; dedup to one row per (batch, index) pair BEFORE the
    # verify join so each pair's shingle sets ship once.
    candidates = (
        index.bands_df.select(F.col("id").alias("index_id"), "band", "bh")
        .join(b_hint(b_bands), ["band", "bh"])
        .where(F.col("batch_id") != F.col("index_id"))
        .select("batch_id", "index_id")
        .dropDuplicates(["batch_id", "index_id"])
    )
    hs_b = b_hashed.select(F.col("id").alias("batch_id"), F.col("hs").alias("hs_b"))
    hs_i = index.hashed_df.select(
        F.col("id").alias("index_id"), F.col("hs").alias("hs_i")
    )
    # Verify: broadcast the id-only candidate pairs into the batch sets
    # (never the full batch set table), then broadcast the joined
    # candidate sets — O(candidates × set size) — so the O(corpus)
    # hashed-set table streams through the verify join unshuffled.
    verified = hs_i.join(b_hint(hs_b.join(b_hint(candidates), "batch_id")), "index_id")
    inter = F.size(F.array_intersect("hs_b", "hs_i")).cast("double")
    union = F.size(F.array_union("hs_b", "hs_i")).cast("double")
    return (
        verified.select(
            "batch_id",
            "index_id",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .orderBy("batch_id", "index_id")
    )
