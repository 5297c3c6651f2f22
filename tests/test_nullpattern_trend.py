"""Null-pattern mining + trend detection (rules/nullpattern.py,
rules/trend.py)."""

from datetime import datetime, timedelta

import pytest

from open_data_linter_spark.rules.nullpattern import null_patterns
from open_data_linter_spark.rules.trend import group_trends


# ---------- null patterns ----------

def test_patterns_counts_and_order(spark):
    rows = [
        ("a", 1.0, "x"),
        ("b", None, None),
        ("c", None, None),
        (None, 2.0, "y"),
        ("d", 3.0, "z"),
    ]
    df = spark.createDataFrame(rows, "u string, v double, w string")
    out = null_patterns(df, ["u", "v", "w"]).collect()
    assert [(r["pattern"], r["n_nulls"], r["n_rows"], r["frac"]) for r in out] == [
        ("", 0, 2, 0.4),
        ("v,w", 2, 2, 0.4),
        ("u", 1, 1, 0.2),
    ]


def test_pattern_order_follows_given_cols(spark):
    df = spark.createDataFrame([(None, None)], "b string, a string")
    out = null_patterns(df, ["b", "a"]).collect()
    assert out[0]["pattern"] == "b,a"  # given order, not lexicographic


def test_pattern_validation(spark):
    df = spark.createDataFrame([("x",)], "c string")
    with pytest.raises(ValueError, match="non-empty"):
        null_patterns(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        null_patterns(df, ["c", "c"])


def test_pattern_plan_single_scan_partial_agg(spark, tmp_path):
    import contextlib
    import io

    p = str(tmp_path / "np")
    spark.createDataFrame([("x", None)], "a string, b string").write.parquet(p)
    out = null_patterns(spark.read.parquet(p), ["a", "b"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="simple")
    plan = buf.getvalue()
    assert plan.count("Scan parquet") == 1, plan
    assert "partial_count" in plan, plan


# ---------- trends ----------

def _series(spark, ys_by_group):
    rows = []
    for g, ys in ys_by_group.items():
        for i, y in enumerate(ys):
            for j in range(int(y)):  # y events on day i -> count mode
                rows.append(
                    (g, datetime(2024, 1, 1 + i, 6) + timedelta(seconds=j))
                )
    return spark.createDataFrame(rows, "g string, t timestamp")


def test_linear_count_trend_flags(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    up = [int(50 + 5 * i + rng.integers(-3, 4)) for i in range(14)]
    flat = [int(50 + rng.integers(-3, 4)) for _ in range(14)]
    df = _series(spark, {"up": up, "flat": flat})
    out = {r["g"]: r for r in group_trends(df, "t", ["g"]).collect()}
    assert out["up"]["trending"] and out["up"]["slope_per_day"] == pytest.approx(
        5, abs=1.0
    )
    assert not out["flat"]["trending"]
    assert out["up"]["r2"] > 0.9 and out["flat"]["n_buckets"] == 14


def test_slope_matches_numpy(spark):
    import numpy as np

    ys = [10, 13, 17, 18, 25, 24, 30]
    df = _series(spark, {"g": ys})
    r = group_trends(df, "t", ["g"]).collect()[0]
    slope = np.polyfit(np.arange(7), np.array(ys, float), 1)[0]
    assert r["slope_per_day"] == pytest.approx(slope, rel=1e-9)


def test_perfect_line_flags_despite_null_t(spark):
    df = _series(spark, {"g": [10, 20, 30, 40]})
    r = group_trends(df, "t", ["g"]).collect()[0]
    assert r["t_stat"] is None and r["r2"] == pytest.approx(1.0)
    assert r["trending"] is True


def test_degenerate_groups_never_flag(spark):
    df = _series(spark, {"two": [5, 9], "const": [7, 7, 7, 7]})
    out = {r["g"]: r for r in group_trends(df, "t", ["g"]).collect()}
    assert not out["two"]["trending"]  # n < 3
    assert out["const"]["slope_per_day"] == pytest.approx(0.0)
    assert not out["const"]["trending"]


def test_trend_validation(spark):
    df = _series(spark, {"g": [1]})
    with pytest.raises(ValueError, match="bucket"):
        group_trends(df, "t", ["g"], bucket="decade")
    with pytest.raises(ValueError, match="positive"):
        group_trends(df, "t", ["g"], t_crit=0)
