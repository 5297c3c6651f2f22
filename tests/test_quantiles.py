"""Per-group quantile thresholds + CCNet-style bucketing
(functions/quantiles.py)."""

import pytest
from pyspark.sql import functions as F

from open_data_linter_spark.functions.quantiles import (
    group_lower_quantiles,
    quantile_buckets,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, g string, v double")


def test_thresholds_are_actual_elements(spark):
    # group a: sorted values [1,2,3,4,5,6] -> k(1/3)=ceil(2.0)=2 -> 2.0,
    # k(2/3)=ceil(4.0)=4 -> 4.0 ; group b: [10,20,30] -> k=1 -> 10, k=2 -> 20
    rows = [(i, "a", float(v)) for i, v in enumerate([4, 1, 6, 3, 2, 5])]
    rows += [(10, "b", 30.0), (11, "b", 10.0), (12, "b", 20.0)]
    thr = {
        r["g"]: r
        for r in group_lower_quantiles(_df(spark, rows), "v", "g").collect()
    }
    assert (thr["a"]["t_1"], thr["a"]["t_2"]) == (2.0, 4.0)
    assert (thr["b"]["t_1"], thr["b"]["t_2"]) == (10.0, 20.0)
    assert thr["a"]["n_values"] == 6 and thr["b"]["n_values"] == 3


def test_bucket_assignment_and_row_preservation(spark):
    rows = [(i, "a", float(v)) for i, v in enumerate([4, 1, 6, 3, 2, 5])]
    rows += [(20, "a", None)]  # NULL value -> NULL bucket, row kept
    out = quantile_buckets(_df(spark, rows), "v", "g")
    got = {r["id"]: r["bucket"] for r in out.collect()}
    # thresholds 2.0 / 4.0: v<=2 head, v<=4 middle, else tail
    assert got == {
        0: "middle", 1: "head", 2: "tail", 3: "middle", 4: "head",
        5: "tail", 20: None,
    }
    assert out.count() == len(rows)
    assert set(out.columns) == {"id", "g", "v", "bucket"}


def test_ties_share_a_bucket(spark):
    # six equal values: every threshold IS that value -> everything head
    rows = [(i, "a", 7.0) for i in range(6)]
    out = quantile_buckets(_df(spark, rows), "v", "g")
    assert {r["bucket"] for r in out.collect()} == {"head"}


def test_head_fraction_on_distinct_values(spark):
    # distinct values: head count == ceil(n/3) by the lower-quantile rank
    n = 100
    rows = [(i, "a", float(i)) for i in range(n)]
    out = quantile_buckets(_df(spark, rows), "v", "g")
    counts = {
        r["bucket"]: r["cnt"]
        for r in out.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()
    }
    assert counts["head"] == 34  # ceil(100/3)
    assert counts["head"] + counts["middle"] + counts["tail"] == n


def test_null_group_and_singleton_group(spark):
    rows = [(0, None, 5.0), (1, None, 1.0), (2, "solo", 9.0)]
    out = quantile_buckets(_df(spark, rows), "v", "g")
    got = {r["id"]: r["bucket"] for r in out.collect()}
    # NULL group is a real group (eqNullSafe join): [1,5] -> t1=1, t2=5
    assert got[1] == "head" and got[0] == "middle"
    # singleton: both thresholds = the value -> head
    assert got[2] == "head"


def test_all_null_group_gets_null_buckets(spark):
    rows = [(0, "x", None), (1, "x", None), (2, "y", 1.0)]
    out = quantile_buckets(_df(spark, rows), "v", "g")
    got = {r["id"]: r["bucket"] for r in out.collect()}
    assert got == {0: None, 1: None, 2: "head"}


def test_validation_errors(spark):
    df = _df(spark, [(0, "a", 1.0)])
    with pytest.raises(ValueError, match="ascending"):
        group_lower_quantiles(df, "v", "g", qs=(0.9, 0.3))
    with pytest.raises(ValueError, match="in \\(0, 1\\]"):
        group_lower_quantiles(df, "v", "g", qs=(0.0, 0.5))
    with pytest.raises(ValueError, match="labels"):
        quantile_buckets(df, "v", "g", cuts=(0.5,), labels=("a", "b", "c"))
    with pytest.raises(ValueError, match="at least one"):
        group_lower_quantiles(df, "v", "g", qs=())
    with pytest.raises(ValueError, match="at least one"):
        quantile_buckets(df, "v", "g", cuts=(), labels=("only",))
    clash = df.withColumnRenamed("id", "bucket")
    with pytest.raises(ValueError, match="collide"):
        quantile_buckets(clash, "v", "g")


def test_approx_path_contract(spark):
    # approx thresholds come from percentile_approx sketches; on a spread
    # distribution the bucket SIZES must be close to the exact split
    rows = [(i, "a", float(i)) for i in range(999)]
    out = quantile_buckets(_df(spark, rows), "v", "g", approx=True)
    counts = {
        r["bucket"]: r["cnt"]
        for r in out.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()
    }
    assert sum(counts.values()) == 999
    for b in ("head", "middle", "tail"):
        assert abs(counts[b] - 333) <= 10, counts


def test_broadcast_no_corpus_shuffle_for_assignment(spark):
    # the bucket join must be a broadcast hash join (threshold side tiny)
    rows = [(i, "a", float(i)) for i in range(50)]
    out = quantile_buckets(_df(spark, rows), "v", "g")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_auto_guard_plan_has_no_whole_group_collect(spark, monkeypatch):
    """Default args above the auto threshold must plan percentile_approx
    sketches, never a whole-group collect_list buffer."""
    from open_data_linter_spark.functions import quantiles

    monkeypatch.setattr(quantiles, "EXACT_QUANTILE_MAX_ROWS", 100)
    rows = [(i, "a", float(i)) for i in range(999)]
    thr = group_lower_quantiles(_df(spark, rows), "v", "g")
    plan = thr._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan and "percentile" in plan
    # below the threshold auto stays exact (collect_list + sorted pick)
    small = group_lower_quantiles(_df(spark, rows[:50]), "v", "g")
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" in plan_small


def test_auto_guard_exact_below_threshold_bitwise(spark):
    rows = [(i, "ab"[i % 2], float((i * 37) % 101)) for i in range(200)]
    auto = sorted(
        tuple(r) for r in quantile_buckets(_df(spark, rows), "v", "g").collect()
    )
    exact = sorted(
        tuple(r)
        for r in quantile_buckets(_df(spark, rows), "v", "g", approx=False).collect()
    )
    assert auto == exact
