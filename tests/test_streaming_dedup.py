"""Cross-batch streaming dedup: exact fingerprint + stateful LSH buckets."""

import datetime as dt
import glob
import os
import shutil
import time

from pyspark.sql import types as T

BASE = dt.datetime(2026, 1, 1, 0, 0, 0)


def _write_stream_file(spark, path, rows, schema, mtime):
    df = spark.createDataFrame(rows, schema=schema)
    df.coalesce(1).write.mode("overwrite").parquet(str(path))
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            os.utime(os.path.join(path, f), (mtime, mtime))


def _flatten(tmp_path, *dirs):
    flat = tmp_path / "flat"
    flat.mkdir(exist_ok=True)
    for d in dirs:
        for f in glob.glob(str(d / "*.parquet")):
            dst = flat / (d.name + "-" + os.path.basename(f))
            shutil.copy(f, dst)
            os.utime(dst, (os.path.getmtime(f), os.path.getmtime(f)))
    return flat


def test_streaming_exact_dedup_cross_batch(spark, tmp_path):
    from open_data_linter_spark.streaming.dedup import streaming_exact_dedup

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ingest_ts", T.TimestampType()),
        ]
    )
    now = time.time()
    f1 = tmp_path / "f1"
    _write_stream_file(
        spark,
        f1,
        [
            (1, "hello world one", BASE),
            (2, "another document", BASE + dt.timedelta(seconds=5)),
        ],
        schema,
        now - 20,
    )
    f2 = tmp_path / "f2"
    _write_stream_file(
        spark,
        f2,
        [
            # same normalized fingerprint as doc 1 (case + extra whitespace)
            (3, "Hello   WORLD one", BASE + dt.timedelta(seconds=30)),
            (4, "a genuinely new doc", BASE + dt.timedelta(seconds=40)),
        ],
        schema,
        now - 10,
    )
    flat = _flatten(tmp_path, f1, f2)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    out = streaming_exact_dedup(stream, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("exact_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .start()
    )
    finished = q.awaitTermination(120)
    if not finished:
        q.stop()
    assert finished, "streaming query did not finish within 120s"
    rows = spark.sql("select * from exact_dedup").collect()
    # the cross-batch duplicate (doc 3) is dropped by fingerprint state
    assert {r.doc_id for r in rows} == {1, 2, 4}
    assert len({r.fingerprint for r in rows}) == 3


def test_streaming_minhash_candidates_cross_batch(spark, tmp_path):
    from open_data_linter_spark.streaming.dedup import (
        streaming_minhash_candidates,
    )

    near = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet field toward the distant river bank at dawn"
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    now = time.time()
    f1 = tmp_path / "f1"
    _write_stream_file(
        spark,
        f1,
        [
            (1, near),
            (2, near + " today"),  # near-dup of 1, same batch
            (5, "completely unrelated short text about spark engines"),
        ],
        schema,
        now - 20,
    )
    f2 = tmp_path / "f2"
    _write_stream_file(
        spark,
        f2,
        [(3, near.replace("dawn", "dusk"))],  # near-dup arriving later
        schema,
        now - 10,
    )
    flat = _flatten(tmp_path, f1, f2)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    cands = streaming_minhash_candidates(stream, k=3)
    q = (
        cands.writeStream.format("memory")
        .queryName("mh_cands")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    finished = q.awaitTermination(180)
    if not finished:
        q.stop()
    assert finished, "streaming query did not finish within 180s"
    rows = spark.sql("select * from mh_cands").collect()
    pairs = {(r.id_a, r.id_b) for r in rows}
    # intra-batch pair from batch 0
    assert (1, 2) in pairs
    # CROSS-BATCH pairs: doc 3 collided with remembered bucket members
    assert (1, 3) in pairs and (2, 3) in pairs
    # the unrelated doc never pairs
    assert not any(5 in p for p in pairs)
    # pair emission is per colliding band, but never duplicated per band
    keys = [(r.band, r.bh, r.id_a, r.id_b) for r in rows]
    assert len(keys) == len(set(keys))


def test_streaming_index_ingest_cross_batch(spark, tmp_path):
    """Micro-batch ingest against a persisted index: corpus dups drop,
    intra-batch larger-id dups drop, survivors grow the index so a
    LATER batch's duplicate of an earlier survivor also drops."""
    from open_data_linter_spark.dedup.incremental import (
        build_minhash_index,
        save_index,
    )
    from open_data_linter_spark.streaming.dedup import streaming_index_ingest

    corpus_rows = [
        (i, f"alpha beta gamma delta epsilon zeta eta theta doc{i} "
            f"unique{i} filler{i % 3} iota kappa")
        for i in range(10)
    ]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    corpus = spark.createDataFrame(corpus_rows, schema)
    index_path = str(tmp_path / "idx")
    save_index(build_minhash_index(corpus, k=3), index_path)

    novel_a = "completely different words about rivers mountains and weather"
    novel_b = "unrelated musings on compilers gardens and tidal patterns"
    now = time.time()
    f1 = tmp_path / "f1"
    _write_stream_file(
        spark, f1,
        [
            # near-dup of corpus doc 3 -> dropped via index probe
            (100, corpus_rows[3][1].replace("kappa", "CHANGED")),
            (101, novel_a),                               # survivor
            (102, novel_a + " indeed"),  # intra-batch dup of 101 -> drop
        ],
        schema, now - 20,
    )
    f2 = tmp_path / "f2"
    _write_stream_file(
        spark, f2,
        [
            # near-dup of batch-1 SURVIVOR 101 -> dropped via grown index
            (200, novel_a + " truly"),
            (201, novel_b),                               # survivor
        ],
        schema, now - 10,
    )
    flat = _flatten(tmp_path, f1, f2)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    sink = str(tmp_path / "sink")
    matches = str(tmp_path / "matches")
    q = (
        streaming_index_ingest(
            stream, index_path, sink, matches_path=matches, threshold=0.5
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    finished = q.awaitTermination(180)
    if not finished:
        q.stop()
    assert finished, "streaming query did not finish within 180s"
    kept = {r.doc_id for r in spark.read.parquet(sink).collect()}
    assert kept == {101, 201}
    logged = {
        (r.batch_id, r.index_id)
        for r in spark.read.parquet(matches).collect()
    }
    assert (100, 3) in logged          # corpus match, batch 1
    assert (200, 101) in logged        # grown-index match, batch 2


def test_streaming_audio_index_ingest_cross_batch(spark, tmp_path):
    """The ingest loop on the PAYLOAD axis: clips that near-dup the
    fingerprint corpus drop, intra-batch larger-id near-dups drop, and
    survivors grow the index so a LATER batch's variant of an earlier
    survivor also drops. Planted 32-clip tone fixture (4 blocks of 8:
    leader at pos 0, variants of the leader at pos 6/7, singletons at
    pos 1..5); block 1's leader (c8) and block 2's singleton c17 are
    HELD OUT of the corpus and arrive via the stream."""
    from pyspark.sql import functions as F

    from open_data_linter_spark.audio.synth import synthesize_tone_clips
    from open_data_linter_spark.dedup.incremental_audio import (
        build_audio_fp_index,
        save_audio_fp_index,
    )
    from open_data_linter_spark.streaming.dedup import (
        streaming_audio_index_ingest,
    )

    cid = lambda i: f"clip_{i:08d}"  # noqa: E731
    clips = synthesize_tone_clips(spark, 32, 4).persist()
    pos = F.substring("clip_id", 6, 8).cast("int") % 8
    corpus = clips.where(
        pos.isin(0, 1, 2, 3, 4, 5) & ~F.col("clip_id").isin(cid(8), cid(17))
    )
    index_path = str(tmp_path / "afp_idx")
    save_audio_fp_index(build_audio_fp_index(corpus), index_path)

    now = time.time()
    batch1 = [cid(6), cid(8), cid(15)]
    # c6  = variant of corpus leader c0      -> drops via index probe
    # c8  = held-out block-1 leader (novel)  -> survivor, appended
    # c15 = variant of c8, same batch        -> intra-batch drop (c8 < c15)
    batch2 = [cid(14), cid(17), cid(30)]
    # c14 = variant of c8                    -> drops ONLY via grown index
    # c17 = held-out singleton (novel)       -> survivor
    # c30 = variant of corpus leader c24     -> drops via index probe
    f1, f2 = tmp_path / "f1", tmp_path / "f2"
    for path, ids, mt in ((f1, batch1, now - 20), (f2, batch2, now - 10)):
        clips.where(F.col("clip_id").isin(ids)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(path))
        for f in os.listdir(path):
            if f.endswith(".parquet"):
                os.utime(os.path.join(path, f), (mt, mt))
    flat = _flatten(tmp_path, f1, f2)
    stream = (
        spark.readStream.schema(clips.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    sink = str(tmp_path / "sink")
    matches = str(tmp_path / "matches")
    q = (
        streaming_audio_index_ingest(
            stream, index_path, sink, matches_path=matches, threshold=0.45
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    finished = q.awaitTermination(240)
    if not finished:
        q.stop()
    clips.unpersist()
    assert finished, "streaming query did not finish within 240s"
    kept = {r.clip_id for r in spark.read.parquet(sink).collect()}
    assert kept == {cid(8), cid(17)}
    logged = {
        (r.batch_id, r.index_id)
        for r in spark.read.parquet(matches).collect()
    }
    assert (cid(6), cid(0)) in logged    # corpus match, batch 1
    assert (cid(14), cid(8)) in logged   # grown-index match, batch 2
    assert (cid(30), cid(24)) in logged  # corpus match, batch 2
