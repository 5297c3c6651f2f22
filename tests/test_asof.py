"""As-of join (functions/asof.py)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from open_data_linter_spark.functions.asof import asof_join


def _ts(d, h, m=0):
    return datetime(2024, 1, d, h, m)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(1, 10), "a"),
            (1, _ts(1, 12), "b"),
            (1, _ts(1, 9), "early"),  # before any right row
            (2, _ts(1, 10), "other-key"),
            (3, _ts(1, 10), "no-right-key"),
            (1, None, "null-ts"),
        ],
        "k int, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(1, 9, 30), 1.0),
            (1, _ts(1, 10), 2.0),  # exactly equal to a left ts
            (1, _ts(1, 11), 3.0),
            (2, _ts(1, 8), 9.0),
            (1, None, -1.0),  # NULL right time must never match
        ],
        "k int, rt timestamp, v double",
    )
    return left, right


def _by_tag(rows):
    return {r["tag"]: r for r in rows}

def test_backward_matches_latest_at_or_before(sides):
    left, right = sides
    out = _by_tag(asof_join(left, right, ["k"], "t", "rt").collect())
    assert len(out) == 6  # left-outer: every left row kept
    assert out["a"]["v"] == 2.0 and out["a"]["rt"] == _ts(1, 10)  # inclusive tie
    assert out["b"]["v"] == 3.0
    assert out["early"]["v"] is None and out["early"]["rt"] is None
    assert out["other-key"]["v"] == 9.0
    assert out["no-right-key"]["v"] is None
    assert out["null-ts"]["v"] is None


def test_backward_tolerance_nulls_stale_matches(sides):
    left, right = sides
    out = _by_tag(
        asof_join(left, right, ["k"], "t", "rt", tolerance_s=1800).collect()
    )
    assert out["a"]["v"] == 2.0  # lag 0 <= 30 min
    assert out["b"]["v"] is None  # lag 60 min > 30 min -> nulled
    assert out["other-key"]["v"] is None  # 2h stale
    assert len(out) == 6  # rows never dropped, only payload nulled
    # the tolerance boundary is inclusive: lag exactly 60 min survives
    out2 = _by_tag(
        asof_join(left, right, ["k"], "t", "rt", tolerance_s=3600).collect()
    )
    assert out2["b"]["v"] == 3.0 and out2["b"]["rt"] == _ts(1, 11)


def test_forward_matches_earliest_at_or_after(sides):
    left, right = sides
    out = _by_tag(
        asof_join(left, right, ["k"], "t", "rt", direction="forward").collect()
    )
    assert out["early"]["v"] == 1.0
    assert out["a"]["v"] == 2.0  # inclusive tie at 10:00
    assert out["b"]["v"] is None  # nothing after 12:00
    assert out["other-key"]["v"] is None  # right row is before
    # round-5 ADVICE: a NULL left timestamp sorts into the NULLS FIRST
    # prefix, where the following-frame first() used to match the key's
    # EARLIEST right row — the documented contract is a NULL match
    assert out["null-ts"]["v"] is None and out["null-ts"]["rt"] is None


def test_suffix_collision_raises(spark):
    left = spark.createDataFrame([(1, _ts(1, 10), 5.0)], "k int, t timestamp, v double")
    right = spark.createDataFrame(
        [(1, _ts(1, 9), 7.0, "y")], "k int, t timestamp, v double, v_r string"
    )
    # right carries both v and v_r while left has v: suffixing v would
    # collide with the real v_r column — must raise, not emit an
    # ambiguous duplicate payload field
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["k"], "t", "t")


def test_collision_suffix_and_payload_selection(spark):
    left = spark.createDataFrame([(1, _ts(1, 10), 5.0)], "k int, t timestamp, v double")
    right = spark.createDataFrame(
        [(1, _ts(1, 9), 7.0, "x")], "k int, t timestamp, v double, extra string"
    )
    out = asof_join(left, right, ["k"], "t", "t").collect()[0]
    assert out["v"] == 5.0 and out["v_r"] == 7.0
    assert out["t_r"] == _ts(1, 9) and out["extra"] == "x"
    only = asof_join(left, right, ["k"], "t", "t", right_cols=["extra"])
    assert set(only.columns) == {"k", "t", "v", "t_r", "extra"}


def test_matches_pandas_merge_asof(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    lt = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 300),
            "t": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, 300), unit="s"),
        }
    )
    rt = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "rt": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, 200), unit="s"),
            "v": rng.normal(size=200),
        }
    ).drop_duplicates(["k", "rt"])
    expected = pd.merge_asof(
        lt.sort_values("t"),
        rt.sort_values("rt"),
        left_on="t",
        right_on="rt",
        by="k",
    ).sort_values(["k", "t"])
    got = (
        asof_join(
            spark.createDataFrame(lt), spark.createDataFrame(rt), ["k"], "t", "rt"
        )
        .orderBy("k", "t")
        .toPandas()
    )
    assert list(got["v"].round(12).fillna(0)) == list(
        expected["v"].round(12).fillna(0)
    )


def test_plan_one_exchange_no_join(spark, tmp_path):
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(
        [(1, _ts(1, 10), 1.0)], "k int, t timestamp, v double"
    ).write.parquet(lp)
    spark.createDataFrame(
        [(1, _ts(1, 9), 2.0)], "k int, rt timestamp, w double"
    ).write.parquet(rp)
    out = asof_join(
        spark.read.parquet(lp), spark.read.parquet(rp), ["k"], "t", "rt"
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="simple")
    plan = buf.getvalue()
    assert "Join" not in plan, plan  # the union trick, not a range join
    assert plan.count("Exchange") == 1, plan
