"""Incremental AUDIO near-dup detection: match a new clip ingest batch
against a persisted fingerprint index — the audio analog of
dedup/incremental.py, and the north-star shape: a 10^12-clip corpus is
fingerprinted ONCE, and each daily ingest batch probes it without the
O(corpus) bucket self-join (or the O(corpus) re-decode, which dominates
everything — see the audiofp scaling section of BENCH/APPENDIX.md).

Index layout (parquet, params sidecar): candidate-key rows ``(id, kb)``
from the melody-gram keys and hashed shingle sets ``(id, hs)`` — the
same two-narrow-frames pattern as the text index. The hot-key cap moves
to BUILD time: keys shared by more than ``max_key_df`` corpus clips are
dropped when the index is written (one O(corpus) groupBy inside the
build pass), so probes never need a corpus-wide bucket count. Probe
joins carry broadcast hints on every batch-derived side: the index is
scanned, never shuffled.

The reference (volare-all/open-data-linter) lints single files per run
and has no cross-run state; this extends the engine per the
training-data-pipeline mandate (method lineage: Haitsma-Kalker 2002 /
Wang 2003, see dedup/audio_fp.py)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_data_linter_spark.dedup._cache import persist_scoped
from open_data_linter_spark.dedup.audio_fp import audio_hashed_keys


@dataclass(frozen=True)
class AudioFpIndex:
    """Built index + the parameters that made it (a probe MUST use the
    same shingle q / melody_q, so they travel with the data)."""

    keys_df: DataFrame  # (id, kb)
    hashed_df: DataFrame  # (id, hs: array<long>)
    q: int
    melody_q: int


def build_audio_fp_index(
    corpus: DataFrame,
    id_col: str = "clip_id",
    payload_col: str = "bytes",
    q: int = 4,
    melody_q: int = 3,
    max_key_df: int | None = 200,
    num_partitions: int | None = None,
) -> AudioFpIndex:
    """One decode+FFT pass over the corpus → key rows + shingle sets.

    ``max_key_df`` drops corpus-hot candidate keys (held tones, room
    hum — the stationary-content false-positive factory, see
    audio_near_duplicates) at build time; the groupBy it costs is
    O(corpus) but runs ONCE, inside the pass that decodes every clip
    anyway."""
    hashed = persist_scoped(
        "afp_index.hashed",
        audio_hashed_keys(corpus, id_col, payload_col, q, melody_q,
                          num_partitions),
    )
    keys = hashed.select("id", F.explode("ck").alias("kb"))
    if max_key_df is not None:
        hot = (
            keys.groupBy("kb")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_key_df)
            .select("kb")
        )
        keys = keys.join(F.broadcast(hot), "kb", "left_anti")
    return AudioFpIndex(keys, hashed.select("id", "hs"), q, melody_q)


def save_audio_fp_index(index: AudioFpIndex, path: str) -> None:
    """Persist as three parquet tables (keys/, hashed/, params/) — same
    plain-parquet rationale as dedup/incremental.save_index: probes
    broadcast the batch side, so bucket metadata would buy nothing."""
    spark = index.keys_df.sparkSession
    par = spark.sparkContext.defaultParallelism
    index.keys_df.repartition(par, "kb").write.mode("overwrite").parquet(
        f"{path}/keys"
    )
    index.hashed_df.repartition(par, "id").write.mode("overwrite").parquet(
        f"{path}/hashed"
    )
    spark.createDataFrame(
        [(index.q, index.melody_q)], "q int, melody_q int"
    ).write.mode("overwrite").parquet(f"{path}/params")


def append_to_audio_fp_index(
    accepted: DataFrame,
    path: str,
    id_col: str = "clip_id",
    payload_col: str = "bytes",
    num_partitions: int | None = None,
    batch_hashed: DataFrame | None = None,
) -> None:
    """Fold an accepted clip batch into a persisted index (the ingest
    loop's last step: probe → filter survivors → append), decoding only
    the batch. Fingerprint parameters come from the index's own params
    sidecar — an appender can never mix shingle q / melody_q families.

    The build-time ``max_key_df`` hot-key cap is NOT re-applied here: a
    batch cannot recount the corpus, and each append adds at most
    |batch| rows per key. Re-apply the cap periodically with
    ``compact_audio_fp_index`` — it recounts from the stored key rows,
    so compaction never re-decodes a clip.

    ``batch_hashed``: a pre-computed ``audio_hashed_keys`` frame
    covering (at least) the accepted clips, produced with the sidecar's
    q/melody_q — the ingest loops fingerprint the whole batch once for
    probe + self-dedup, and the append then needs only a semi-join, no
    third decode.

    Idempotent on ids: clips whose id is ALREADY in the index are
    skipped (one anti-join against the stored id column), so a crashed
    run replayed with the same batch cannot double-append rows and
    inflate every future probe of those clips. First-wins, matching the
    probe's re-ingest semantics."""
    spark = accepted.sparkSession
    existing = spark.read.parquet(f"{path}/hashed").select("id")
    if batch_hashed is not None:
        hashed = batch_hashed.join(
            accepted.select(F.col(id_col).alias("id")), "id", "left_semi"
        ).join(existing, "id", "left_anti")
    else:
        p = spark.read.parquet(f"{path}/params").head()
        hashed = audio_hashed_keys(
            accepted, id_col, payload_col, int(p["q"]), int(p["melody_q"]),
            num_partitions,
        ).join(existing, "id", "left_anti")
    # materialize BEFORE the hashed append: the anti-join's plan reads
    # {path}/hashed, and appending to a path a live plan is reading from
    # would race the write against its own input listing
    hashed = hashed.localCheckpoint(eager=True)
    hashed.select("id", F.explode("ck").alias("kb")).write.mode(
        "append"
    ).parquet(f"{path}/keys")
    hashed.select("id", "hs").write.mode("append").parquet(f"{path}/hashed")


def compact_audio_fp_index(
    spark, path: str, max_key_df: int = 200, out_path: str | None = None
) -> None:
    """Re-apply the hot-key cap over a grown index WITHOUT re-decoding
    anything — the compaction step the appender's docstring defers to.
    Appends skip the cap (a batch cannot recount the corpus), so keys
    that went corpus-hot through growth accumulate candidate fan-out;
    this pass recounts them from the STORED key rows (one groupBy over
    two narrow columns — no payload, no FFT) and rewrites the keys
    table without the hot ones. The hashed verify sets and the params
    sidecar are untouched: capping only ever removes candidates.

    Writes a full standalone index to ``out_path`` if given — the
    cluster-safe mode: retarget readers when it lands. The default
    in-place mode rewrites the keys table via temp subdir + rename
    (shutil — local/posix semantics; on object stores use ``out_path``),
    which keeps readers from seeing a half-written table but is not
    safe against a probe running DURING the swap. Crash recovery: the
    swap is two renames, so a crash between them leaves ``keys`` absent
    with the previous table intact in ``keys.old`` — the next call (or
    the recovery preamble below) restores it before doing anything
    else; a crash after the swap leaves only a stale ``keys.old`` that
    is cleaned up here."""
    import os
    import shutil

    live, stale = f"{path}/keys", f"{path}/keys.old"
    if out_path is None:
        if not os.path.isdir(live) and os.path.isdir(stale):
            shutil.move(stale, live)  # crashed mid-swap: restore
        if os.path.isdir(stale):
            shutil.rmtree(stale)  # crashed post-swap: drop the leftover
    keys = spark.read.parquet(f"{path}/keys")
    hot = (
        keys.groupBy("kb")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > max_key_df)
        .select("kb")
    )
    kept = keys.join(F.broadcast(hot), "kb", "left_anti")
    par = spark.sparkContext.defaultParallelism
    dst = f"{out_path}/keys" if out_path is not None else f"{path}/keys.compact"
    kept.repartition(par, "kb").write.mode("overwrite").parquet(dst)
    if out_path is not None:
        # a full standalone index: copy the (untouched) verify sets + params
        for sub in ("hashed", "params"):
            spark.read.parquet(f"{path}/{sub}").write.mode(
                "overwrite"
            ).parquet(f"{out_path}/{sub}")
        return
    shutil.move(live, stale)
    shutil.move(dst, live)
    shutil.rmtree(stale)


def load_audio_fp_index(spark, path: str) -> AudioFpIndex:
    p = spark.read.parquet(f"{path}/params").head()
    return AudioFpIndex(
        spark.read.parquet(f"{path}/keys"),
        spark.read.parquet(f"{path}/hashed"),
        int(p["q"]),
        int(p["melody_q"]),
    )


def match_audio_against_index(
    batch: DataFrame,
    index: AudioFpIndex,
    id_col: str = "clip_id",
    payload_col: str = "bytes",
    threshold: float = 0.35,
    broadcast_batch: bool = True,
    num_partitions: int | None = None,
    batch_hashed: DataFrame | None = None,
) -> DataFrame:
    """(batch_id, index_id, jaccard >= threshold) — new-vs-corpus pairs.

    ``batch_hashed``: a pre-computed ``audio_hashed_keys`` frame for the
    batch (same q/melody_q as the index — caller's contract); pass it
    when the batch is also self-deduplicated in the same run so it is
    decoded once, not twice. The caller owns its persistence.

    Only the BATCH is decoded; candidates come from an equi-join of the
    batch's melody-gram keys against the index's, verification is
    hashed-set Jaccard against the index's shingle sets. With the
    default ``broadcast_batch=True`` every batch-derived join side is a
    broadcast hint — the corpus frames stream through unshuffled (the
    dedup/incremental.py plan shape, plan-asserted in tests). Re-ingest
    of an id already in the index is not self-matched; batch-internal
    pairs are audio_near_duplicates' job."""
    b_hint = F.broadcast if broadcast_batch else (lambda d: d)
    if batch_hashed is not None:
        b_hashed = batch_hashed
    else:
        b_hashed = persist_scoped(
            "afp_probe.hashed",
            audio_hashed_keys(batch, id_col, payload_col, index.q,
                              index.melody_q, num_partitions),
        )
    b_keys = b_hashed.select(
        F.col("id").alias("batch_id"), F.explode("ck").alias("kb")
    )
    candidates = (
        index.keys_df.select(F.col("id").alias("index_id"), "kb")
        .join(b_hint(b_keys), "kb")
        .where(F.col("batch_id") != F.col("index_id"))
        .select("batch_id", "index_id")
        .dropDuplicates(["batch_id", "index_id"])
    )
    hs_b = b_hashed.select(F.col("id").alias("batch_id"), F.col("hs").alias("hs_b"))
    hs_i = index.hashed_df.select(
        F.col("id").alias("index_id"), F.col("hs").alias("hs_i")
    )
    # broadcast the id-only pairs into the batch sets, then the joined
    # candidate sets — the corpus table streams unshuffled
    verified = hs_i.join(b_hint(hs_b.join(b_hint(candidates), "batch_id")),
                         "index_id")
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
