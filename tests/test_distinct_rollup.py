"""HLL distinct rollup (rules/distinct_rollup.py)."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from open_data_linter_spark.rules.distinct_rollup import distinct_rollup


def _mk(spark, rows):
    return spark.createDataFrame(rows, "g string, t timestamp, u long")


def test_estimates_track_exact_and_rollup_merges(spark):
    # 3 days, overlapping user sets: per-day 200 distinct, total 400
    rows = []
    for d in range(3):
        for u in range(d * 100, d * 100 + 200):
            rows.append(("a", datetime(2024, 1, 1 + d, 8), u))
    df = _mk(spark, rows)
    out = distinct_rollup(df, "u", "t", ["g"]).collect()
    daily = [r for r in out if r["bucket"] is not None]
    roll = [r for r in out if r["bucket"] is None]
    assert len(daily) == 3 and len(roll) == 1
    for r in daily:
        assert r["est_distinct"] == pytest.approx(200, rel=0.05)
    # the rollup is the UNION estimate: ~400, NOT the sum 600
    assert roll[0]["est_distinct"] == pytest.approx(400, rel=0.05)
    assert roll[0]["est_distinct"] < 500


def test_union_of_sketches_equals_sketch_of_union(spark):
    """Mergeability: the rollup estimate from unioned daily sketches
    must equal the estimate of ONE sketch over all rows."""
    rows = [
        ("a", datetime(2024, 1, 1 + (u % 7), 8), u * 2654435761 % 100003)
        for u in range(5000)
    ]
    df = _mk(spark, rows)
    roll = (
        distinct_rollup(df, "u", "t", ["g"])
        .where(F.col("bucket").isNull())
        .collect()[0]["est_distinct"]
    )
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("u", F.lit(12)))
    ).collect()[0][0]
    assert roll == direct


def test_nulls_excluded_and_groups_independent(spark):
    rows = [
        ("a", datetime(2024, 1, 1, 8), 1),
        ("a", datetime(2024, 1, 1, 9), None),
        ("a", None, 2),
        ("b", datetime(2024, 1, 1, 8), 1),
    ]
    out = distinct_rollup(_mk(spark, rows), "u", "t", ["g"]).collect()
    got = {(r["g"], r["bucket"] is None): r["est_distinct"] for r in out}
    assert got[("a", False)] == 1  # null value + null ts excluded
    assert got[("b", False)] == 1
    assert got[("a", True)] == 1


def test_plan_one_input_exchange_partial_sketch(spark, tmp_path):
    import contextlib
    import io

    p = str(tmp_path / "dr")
    _mk(spark, [("a", datetime(2024, 1, 1, 8), 1)]).write.parquet(p)
    out = distinct_rollup(spark.read.parquet(p), "u", "t", ["g"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="simple")
    plan = buf.getvalue()
    # sketch building partially aggregates map-side (the one pass over
    # rows); the rollup union reads the sketch frame, not the input
    assert "partial_hll_sketch_agg" in plan, plan
    assert "partial_hll_union_agg" in plan, plan
    assert plan.count("Scan parquet") <= 2, plan  # per-bucket + rollup branches


def test_hour_buckets_do_not_collapse(spark):
    """Regression (round-5 review): hour-truncated buckets must stay
    timestamps — a date cast silently merged a day's 24 buckets."""
    rows = [
        ("a", datetime(2024, 1, 1, h, m), h * 100 + m)
        for h in range(6)
        for m in range(30)
    ]
    out = distinct_rollup(_mk(spark, rows), "u", "t", ["g"], bucket="hour")
    daily = out.where(out.bucket.isNotNull()).collect()
    assert len(daily) == 6  # six distinct hours, not one collapsed day
    assert all(r["est_distinct"] == 30 for r in daily)
    roll = out.where(out.bucket.isNull()).collect()
    assert roll[0]["est_distinct"] == 180


def test_validation(spark):
    df = _mk(spark, [("a", datetime(2024, 1, 1), 1)])
    with pytest.raises(ValueError, match="bucket"):
        distinct_rollup(df, "u", "t", ["g"], bucket="epoch")
