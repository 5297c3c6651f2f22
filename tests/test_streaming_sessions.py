"""Session windows: batch cross-check + streaming finalization
(streaming/sessions.py)."""

import datetime as dt
import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from open_data_linter_spark.functions.sessions import session_stats
from open_data_linter_spark.streaming.sessions import (
    session_window_stats,
    streaming_session_stats,
)

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def test_batch_cross_check_two_algorithms_agree(spark):
    """session_window vs the independent lag/cumsum sessionizer on a
    seeded random stream: identical sessions."""
    import numpy as np

    rng = np.random.default_rng(23)
    rows = [
        (int(u), BASE + dt.timedelta(seconds=int(s)))
        for u in range(20)
        for s in np.cumsum(rng.integers(1, 4000, size=40))
    ]
    df = spark.createDataFrame(rows, "u int, t timestamp")
    a = session_window_stats(df, ["u"], "t", 1800).select(
        "u", "session_start", "session_end", "duration_s", "n_events"
    )
    b = session_stats(df, ["u"], "t", 1800).select(
        "u", "session_start", "session_end", "duration_s", "n_events"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_exact_gap_boundary_stays_in_session(spark):
    df = spark.createDataFrame(
        [
            (1, BASE),
            (1, BASE + dt.timedelta(seconds=1800)),  # exactly gap
            (1, BASE + dt.timedelta(seconds=3601)),  # 1801 after -> new
        ],
        "u int, t timestamp",
    )
    out = session_window_stats(df, ["u"], "t", 1800).collect()
    assert [(r["n_events"]) for r in out] == [2, 1]
    # same split as the lag/cumsum rule
    twin = session_stats(df, ["u"], "t", 1800).collect()
    assert [(r["n_events"]) for r in twin] == [2, 1]


def _write_stream_file(spark, path, rows, schema, mtime):
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(path))
    for f in os.listdir(path):
        full = os.path.join(path, f)
        os.utime(full, (mtime, mtime))


def test_streaming_sessions_finalize_once(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("u", T.IntegerType()),
            T.StructField("t", T.TimestampType()),
        ]
    )
    now = time.time()
    # batch 0: two sessions' worth of user-1 events
    _write_stream_file(
        spark,
        tmp_path / "f1",
        [
            (1, BASE),
            (1, BASE + dt.timedelta(seconds=60)),
            (1, BASE + dt.timedelta(seconds=7200)),
        ],
        schema,
        now - 30,
    )
    # batch 1: far-future event advances the watermark past both
    _write_stream_file(
        spark,
        tmp_path / "f2",
        [(2, BASE + dt.timedelta(days=2))],
        schema,
        now - 20,
    )
    # batch 2: further still, flushes state
    _write_stream_file(
        spark,
        tmp_path / "f3",
        [(2, BASE + dt.timedelta(days=4))],
        schema,
        now - 10,
    )
    flat = tmp_path / "flat"
    flat.mkdir()
    for d in ("f1", "f2", "f3"):
        for f in os.listdir(tmp_path / d):
            if f.endswith(".parquet"):
                os.link(tmp_path / d / f, flat / f"{d}_{f}")
                os.utime(
                    flat / f"{d}_{f}",
                    (os.stat(tmp_path / d / f).st_mtime,) * 2,
                )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    out = streaming_session_stats(
        stream, ["u"], "t", gap_s=1800, watermark="1 minute"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql(
        "select * from sess_out where u = 1 order by session_start"
    ).collect()
    assert [(r["n_events"], r["duration_s"]) for r in rows] == [
        (2, 60.0),
        (1, 0.0),
    ]
    assert rows[0]["session_start"] == BASE
    assert rows[0]["session_end"] == BASE + dt.timedelta(seconds=60)
    # finalized once: no session key appears twice
    all_rows = spark.sql("select * from sess_out").collect()
    keys = [(r["u"], r["session_start"]) for r in all_rows]
    assert len(keys) == len(set(keys))


def test_validation(spark):
    df = spark.createDataFrame([(1, BASE)], "u int, t timestamp")
    with pytest.raises(ValueError, match="positive"):
        session_window_stats(df, ["u"], "t", 0)
