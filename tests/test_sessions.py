"""Sessionization (functions/sessions.py)."""

from datetime import datetime, timedelta

import pytest

from open_data_linter_spark.functions.sessions import session_stats, sessionize


def _mk(spark, rows):
    return spark.createDataFrame(rows, "u int, t timestamp")


T0 = datetime(2024, 1, 1, 12, 0, 0)


def test_gap_boundary_is_inclusive(spark):
    df = _mk(
        spark,
        [
            (1, T0),
            (1, T0 + timedelta(seconds=1800)),  # exactly gap -> same session
            (1, T0 + timedelta(seconds=3601)),  # 1801s after -> new session
            (1, None),  # excluded
        ],
    )
    out = sessionize(df, ["u"], "t", 1800).orderBy("t").collect()
    assert [r["session_idx"] for r in out] == [1, 1, 2]


def test_stats_and_multiple_keys(spark):
    df = _mk(
        spark,
        [
            (1, T0),
            (1, T0 + timedelta(seconds=10)),
            (1, T0 + timedelta(hours=2)),
            (2, T0),
        ],
    )
    out = session_stats(df, ["u"], "t", 1800).collect()
    assert [(r["u"], r["session_idx"], r["n_events"]) for r in out] == [
        (1, 1, 2),
        (1, 2, 1),
        (2, 1, 1),
    ]
    first = out[0]
    assert first["duration_s"] == 10.0
    assert first["session_start"] == T0
    assert first["session_end"] == T0 + timedelta(seconds=10)


def test_ties_share_a_session(spark):
    df = _mk(spark, [(1, T0), (1, T0), (1, T0 + timedelta(hours=1))])
    out = session_stats(df, ["u"], "t", 60).collect()
    assert [(r["session_idx"], r["n_events"]) for r in out] == [(1, 2), (2, 1)]


def test_validates_gap(spark):
    with pytest.raises(ValueError, match="positive"):
        sessionize(_mk(spark, [(1, T0)]), ["u"], "t", 0)


def test_plan_one_input_exchange(spark, tmp_path):
    import contextlib
    import io

    p = str(tmp_path / "ev")
    _mk(spark, [(1, T0)]).write.parquet(p)
    out = session_stats(spark.read.parquet(p), ["u"], "t", 1800)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="simple")
    plan = buf.getvalue()
    # one window Exchange on the key over the INPUT; the (key, session)
    # aggregate may add exchanges but only over shrunken session rows,
    # always behind a partial_ aggregate
    assert plan.count("Scan parquet") == 1, plan
    assert "partial_count" in plan or "partial_min" in plan, plan
