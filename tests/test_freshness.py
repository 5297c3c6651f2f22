"""Group freshness / staleness (rules/freshness.py)."""

import datetime

import pytest

from open_data_linter_spark.rules.freshness import check_freshness


def _df(spark):
    rows = [
        ("a", "2024-01-10 00:00:00.000000"),
        ("a", "2024-01-10 11:59:59.999999"),
        ("b", "2024-01-09 12:00:00.000000"),
        ("c", None),
        ("c", None),
    ]
    return spark.createDataFrame(rows, "grp string, ts string").selectExpr(
        "grp", "try_cast(ts AS timestamp_ntz) AS ts"
    )


def test_freshness_default_asof_is_global_max(spark):
    out = {
        r.grp: r
        for r in check_freshness(_df(spark), "ts", ["grp"], 3600).collect()
    }
    # group a owns the frontier: lag 0, fresh
    assert out["a"].lag_s == 0 and out["a"].stale is False
    # group b lags 1 day minus 0.000001s -> floor = 86399 whole seconds
    assert out["b"].lag_s == 86399 and out["b"].stale is True
    assert out["b"].last_ts == datetime.datetime(2024, 1, 9, 12, 0)
    # all-NULL group: no last_ts, stale by definition
    assert out["c"].last_ts is None and out["c"].lag_s is None
    assert out["c"].stale is True


def test_freshness_explicit_asof_and_threshold(spark):
    out = {
        r.grp: r
        for r in check_freshness(
            _df(spark), "ts", ["grp"], 86400, as_of="2024-01-10 12:00:00"
        ).collect()
    }
    assert out["a"].lag_s == 0  # 1 microsecond behind the anchor
    # exactly at the threshold is NOT stale (strict >)
    assert out["b"].lag_s == 86400 and out["b"].stale is False


def test_freshness_microsecond_floor_not_boundary_crossing(spark):
    # 0.2s apart across a second boundary: whole-second lag is 0, not 1
    df = spark.createDataFrame(
        [("g", "2024-01-01 00:00:00.900000")], "grp string, ts string"
    ).selectExpr("grp", "try_cast(ts AS timestamp_ntz) AS ts")
    r = check_freshness(
        df, "ts", ["grp"], 0, as_of="2024-01-01 00:00:01.100000"
    ).collect()[0]
    assert r.lag_s == 0 and r.stale is False


def test_freshness_requires_groups(spark):
    with pytest.raises(ValueError):
        check_freshness(_df(spark), "ts", [], 60)
