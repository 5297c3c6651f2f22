"""Watermarked windowed aggregation + applyInPandasWithState operators."""

import datetime as dt
import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

BASE = dt.datetime(2026, 1, 1, 0, 0, 0)


def _write_stream_file(spark, path, rows, schema, mtime):
    df = spark.createDataFrame(rows, schema=schema)
    df.coalesce(1).write.mode("overwrite").parquet(str(path))
    # the file source orders by modification time: pin it so batch order
    # (and therefore watermark progression) is deterministic
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            os.utime(os.path.join(path, f), (mtime, mtime))


def _flatten(tmp_path, *dirs):
    flat = tmp_path / "flat"
    flat.mkdir(exist_ok=True)
    import glob
    import shutil

    for d in dirs:
        for f in glob.glob(str(d / "*.parquet")):
            dst = flat / (d.name + "-" + os.path.basename(f))
            shutil.copy(f, dst)
            os.utime(dst, (os.path.getmtime(f), os.path.getmtime(f)))
    return flat


def test_windowed_histograms_watermark(spark, tmp_path):
    from open_data_linter_spark.streaming.stateful import windowed_histograms

    schema = T.StructType(
        [
            T.StructField("ingest_ts", T.TimestampType()),
            T.StructField("sr_hz", T.IntegerType()),
        ]
    )
    now = time.time()
    # batch 0: all rows inside window [00:00, 00:01)
    f1 = tmp_path / "f1"
    _write_stream_file(
        spark,
        f1,
        [
            (BASE + dt.timedelta(seconds=5), 16000),
            (BASE + dt.timedelta(seconds=10), 16000),
            (BASE + dt.timedelta(seconds=20), 44100),
        ],
        schema,
        now - 30,
    )
    # batch 1: minute 10 — advances watermark to 08:00 (> window-1 end)
    f2 = tmp_path / "f2"
    _write_stream_file(
        spark, f2, [(BASE + dt.timedelta(minutes=10), 8000)], schema, now - 20
    )
    # batch 2: minute 20 — forces the flush even without a no-data batch
    f3 = tmp_path / "f3"
    _write_stream_file(
        spark, f3, [(BASE + dt.timedelta(minutes=20), 8000)], schema, now - 10
    )
    flat = _flatten(tmp_path, f1, f2, f3)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    hist = windowed_histograms(
        stream, ts_col="ingest_ts", column="sr_hz", window="1 minute", watermark="2 minutes"
    )
    q = (
        hist.writeStream.format("memory")
        .queryName("win_hist")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("select * from win_hist").collect()
    # window [00:00, 00:01) is closed (watermark passed it) and emitted once
    w1 = {
        (r.bin, r.cnt)
        for r in rows
        if r.win_start == BASE
    }
    assert w1 == {(16000, 2), (44100, 1)}
    # every emitted window is final: no window appears with two versions
    keys = [(r.win_start, r.bin) for r in rows]
    assert len(keys) == len(set(keys))


def test_running_codec_stats_cross_batch_state(spark, tmp_path):
    from open_data_linter_spark.streaming.stateful import running_codec_stats

    schema = T.StructType(
        [
            T.StructField("codec", T.StringType()),
            T.StructField("dur_ms", T.IntegerType()),
        ]
    )
    now = time.time()
    f1 = tmp_path / "f1"
    _write_stream_file(
        spark,
        f1,
        [("pcm16", 1000), ("pcm16", 3000), ("ulaw", 500)],
        schema,
        now - 20,
    )
    f2 = tmp_path / "f2"
    _write_stream_file(
        spark,
        f2,
        [("pcm16", 2000), ("ulaw", 1500), ("ulaw", None)],
        schema,
        now - 10,
    )
    flat = _flatten(tmp_path, f1, f2)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    stats = running_codec_stats(stream)
    q = (
        stats.writeStream.format("memory")
        .queryName("codec_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("select * from codec_stats").collect()
    # update mode appends one row per (codec, micro-batch); the row with the
    # HIGHEST count per codec carries the cross-batch cumulative state
    # (collect order is not guaranteed, so don't rely on it)
    final = {}
    for r in rows:
        if r.codec not in final or r.n_clips > final[r.codec][0]:
            final[r.codec] = (r.n_clips, r.mean_dur_ms)
    # state survived across micro-batches: counts cover BOTH files
    assert final["pcm16"] == (3, pytest.approx(2000.0))
    assert final["ulaw"] == (2, pytest.approx(1000.0))  # null dur dropped
    # and intermediate (batch-1) rows exist too, proving incremental emission
    pcm_counts = sorted(r.n_clips for r in rows if r.codec == "pcm16")
    assert pcm_counts == [2, 3]
