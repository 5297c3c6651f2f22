"""Streaming deduplication — cross-micro-batch, bounded state.

Two shapes the batch dedup family (dedup/) cannot express over an unbounded
stream:

- ``streaming_exact_dedup``: exact first-occurrence dedup on the normalized
  content fingerprint (functions/text.py::normalized_fingerprint) via
  ``dropDuplicatesWithinWatermark`` — the engine keeps fingerprint state
  only inside the watermark horizon, so state is bounded by ingest rate x
  watermark, not stream length. A duplicate arriving after the horizon
  re-emits (the documented trade: exactness within the horizon, bounded
  state forever).
- ``streaming_minhash_candidates``: a CUSTOM stateful operator
  (``applyInPandasWithState`` keyed by LSH band bucket) that emits
  near-duplicate CANDIDATE pairs across micro-batches: each bucket
  remembers its member ids, and a new arrival pairs with every remembered
  member. State is O(#buckets x cap); a bucket that reaches
  ``max_bucket_size`` saturates (new members are neither paired nor
  remembered) — the streaming analog of the batch hot-bucket drop
  (dedup/minhash.py), except saturation is prospective (already-emitted
  pairs from a bucket's cold start are not retracted; retraction is not
  expressible in append-mode streaming).

A pair colliding in several bands emits once per band — downstream
consumers ``dropDuplicates(["id_a", "id_b"])`` in batch land (or verify
exact Jaccard, which dedups as a side effect). The reference
(volare-all/open-data-linter) is batch-only; this extends the engine per
the training-data-pipeline mandate.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from open_data_linter_spark.dedup.minhash import minhash_signature
from open_data_linter_spark.functions.text import normalized_fingerprint


def streaming_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """One survivor per normalized fingerprint, state bounded by the
    watermark horizon. Emits the original columns plus ``fingerprint``.

    Across micro-batches the FIRST-seen row wins (later batches hit the
    fingerprint state and drop); within a single micro-batch the surviving
    row among same-batch duplicates is arbitrary (no intra-batch order
    guarantee — same as batch ``dropDuplicates``)."""
    return (
        stream_df.withColumn("fingerprint", normalized_fingerprint(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


_CAND_STATE = T.StructType([T.StructField("ids", T.ArrayType(T.LongType()))])

_CAND_OUTPUT = T.StructType(
    [
        T.StructField("band", T.IntegerType()),
        T.StructField("bh", T.LongType()),
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
    ]
)


def _bucket_update_fn(max_bucket_size: int):
    def update(
        key: Tuple[int, int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ids = list(state.get[0]) if state.exists else []
        known = set(ids)
        out_a: list[int] = []
        out_b: list[int] = []
        for pdf in pdfs:
            for raw in pdf["id"]:
                i = int(raw)
                if i in known:
                    continue
                if len(ids) >= max_bucket_size:
                    continue  # saturated bucket: hot-key guard
                for m in ids:
                    a, b = (m, i) if m < i else (i, m)
                    out_a.append(a)
                    out_b.append(b)
                ids.append(i)
                known.add(i)
        state.update((ids,))
        if out_a:
            yield pd.DataFrame(
                {
                    "band": [key[0]] * len(out_a),
                    "bh": [key[1]] * len(out_a),
                    "id_a": out_a,
                    "id_b": out_b,
                }
            )

    return update


def streaming_minhash_candidates(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_perm: int = 64,
    bands: int = 16,
    max_bucket_size: int = 100,
) -> DataFrame:
    """Cross-batch near-dup candidate pairs via stateful LSH buckets.

    ``id_col`` must be a long (the state schema is array<long>). Signature
    and banding match dedup/minhash.py (same shingle/hash contract), so a
    batch verification join over the emitted pairs reproduces the batch
    pipeline's candidates for streams shorter than the bucket cap.

    STATE COMPATIBILITY: the bucket state is keyed by (band, band_hash),
    and band hashes are a pure function of the minhash permutation family
    (dedup/minhash.py::_perm_consts). Changing that family — as round 4
    did when the salted-xxhash64 permutations became affine Mersenne-31 —
    orphans every bucket accumulated under the old family: restarting a
    checkpointed query across such an upgrade silently stops matching
    pairs that span the boundary. Upgrades that touch the signature
    family need a fresh checkpointLocation (re-seeding state from a
    batch backfill if cross-boundary pairs matter).
    """
    rows_per_band = n_perm // bands
    from open_data_linter_spark.functions.text import shingles

    # Each shingle string is hashed once (xxhash64), then the single
    # F.aggregate fold applies the n_perm affine permutations to the
    # resulting longs — no persist() is available inside a streaming
    # projection, but none is needed for the signature itself; the
    # candidate-state shuffle dominates per-batch cost.
    sig = (
        stream_df.select(
            F.col(id_col).cast("long").alias("id"),
            shingles(F.col(text_col), k).alias("sh"),
        )
        .where(F.size("sh") > 0)
        .select("id", minhash_signature(F.col("sh"), n_perm).alias("sig"))
    )
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
    return banded.groupBy("band", "bh").applyInPandasWithState(
        _bucket_update_fn(max_bucket_size),
        outputStructType=_CAND_OUTPUT,
        stateStructType=_CAND_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_index_ingest(
    stream_df: DataFrame,
    index_path: str,
    sink_path: str,
    matches_path: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    grow_index: bool = True,
):
    """The incremental ingest loop (dedup/incremental.py) as a streaming
    sink: every micro-batch probes the PERSISTED MinHash index, drops
    docs that near-dup the corpus (or a smaller-id doc in the same
    batch), appends the survivors to ``sink_path`` — and, with
    ``grow_index`` (default), folds them into the index, so a duplicate
    arriving in a LATER micro-batch matches a survivor from an earlier
    one: cross-batch first-wins with state persisted in the index
    itself, unbounded horizon, zero in-engine streaming state (contrast
    ``streaming_exact_dedup``, whose watermark bounds the horizon).

    Intra-batch near-dup policy is greedy keep-smallest-id: a doc is
    dropped iff it matches the index or a smaller-id doc of its own
    batch (documented non-transitive: in a chain a~b~c without a~c, c is
    dropped via b even though b also dropped). ``matches_path``, if set,
    logs the (batch_id_col, index_id, jaccard) probe matches per batch.

    Returns a ``DataStreamWriter`` (foreachBatch); the caller sets
    checkpointLocation/trigger and calls ``start()``. Replay safety: a
    re-run micro-batch re-probes the same index state only if the
    failure happened before the append — exactly-once requires the
    usual foreachBatch idempotence care; pair it with the ledger
    (plans/ledger.py) when the sink must be transactional."""
    from open_data_linter_spark.dedup.incremental import (
        append_to_index,
        load_index,
        match_against_index,
    )
    from open_data_linter_spark.dedup.minhash import minhash_near_duplicates

    def ingest(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        if not batch.head(1):
            return
        idx = load_index(spark, index_path)
        matches = match_against_index(
            batch, idx, text_col, id_col, threshold
        ).persist()
        if matches_path is not None:
            matches.write.mode("append").parquet(matches_path)
        intra_drops = (
            minhash_near_duplicates(
                batch, text_col, id_col, k=idx.k, n_perm=idx.n_perm,
                bands=idx.bands, threshold=threshold,
            )
            # pairs come out id_a < id_b: the larger side loses
            .select(F.col("id_b").alias(id_col))
        )
        survivors = (
            batch.join(
                matches.select(F.col("batch_id").alias(id_col)),
                id_col,
                "left_anti",
            )
            .join(intra_drops, id_col, "left_anti")
            .persist()
        )
        survivors.write.mode("append").parquet(sink_path)
        if grow_index:
            append_to_index(survivors, index_path, text_col, id_col)
        survivors.unpersist()
        matches.unpersist()

    return stream_df.writeStream.foreachBatch(ingest).outputMode("update")


def streaming_audio_index_ingest(
    stream_df: DataFrame,
    index_path: str,
    sink_path: str,
    matches_path: str | None = None,
    id_col: str = "clip_id",
    payload_col: str = "bytes",
    threshold: float = 0.35,
    grow_index: bool = True,
):
    """``streaming_index_ingest`` on the PAYLOAD axis — the north-star
    ingest shape end-to-end: a stream of audio clips probes the
    persisted fingerprint index (dedup/incremental_audio.py), drops
    clips that near-dup the corpus (or a smaller-id clip of the same
    micro-batch, greedy keep-smallest-id as in the text loop), appends
    survivors to ``sink_path`` and — with ``grow_index`` — folds them
    into the index, so a later batch's re-recording of an earlier
    survivor also drops. Each micro-batch is decoded exactly ONCE: the
    corpus was fingerprinted at build time, and the probe, the
    intra-batch pairing, and the index append all share one
    ``audio_hashed_keys`` frame. Same replay-safety caveats as the
    text loop (the index append itself is id-idempotent)."""
    from open_data_linter_spark.dedup.audio_fp import (
        audio_hashed_keys,
        audio_near_duplicates,
    )
    from open_data_linter_spark.dedup.incremental_audio import (
        append_to_audio_fp_index,
        load_audio_fp_index,
        match_audio_against_index,
    )

    def ingest(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        if not batch.head(1):
            return
        idx = load_audio_fp_index(spark, index_path)
        # fingerprint the micro-batch ONCE: the probe, the intra-batch
        # self-dedup, and the index append all share this frame — the
        # decode pass is the dominant cost and must not run three times
        hashed = audio_hashed_keys(
            batch, id_col, payload_col, idx.q, idx.melody_q
        ).persist()
        matches = match_audio_against_index(
            batch, idx, id_col, payload_col, threshold, batch_hashed=hashed
        ).persist()
        if matches_path is not None:
            matches.write.mode("append").parquet(matches_path)
        intra_drops = (
            audio_near_duplicates(
                batch, id_col, payload_col, threshold,
                q=idx.q, melody_q=idx.melody_q, hashed_keys=hashed,
            )
            # pairs come out id_a < id_b: the larger side loses
            .select(F.col("id_b").alias(id_col))
        )
        survivors = (
            batch.join(
                matches.select(F.col("batch_id").alias(id_col)),
                id_col,
                "left_anti",
            )
            .join(intra_drops, id_col, "left_anti")
            .persist()
        )
        survivors.write.mode("append").parquet(sink_path)
        if grow_index:
            append_to_audio_fp_index(survivors, index_path, id_col,
                                     payload_col, batch_hashed=hashed)
        survivors.unpersist()
        matches.unpersist()
        hashed.unpersist()

    return stream_df.writeStream.foreachBatch(ingest).outputMode("update")
