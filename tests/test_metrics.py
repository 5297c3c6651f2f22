"""Per-column distribution metrics (rules/metrics.py)."""

import math

import pytest

from open_data_linter_spark.rules.metrics import column_metrics


def _df(spark):
    rows = [
        ("a", 1, None),
        ("a", 2, None),
        ("b", 3, None),
        (None, 3, None),
    ]
    return spark.createDataFrame(rows, "s string, x int, z string")


def test_metrics_hand_computed(spark):
    out = {r.column: r for r in column_metrics(_df(spark), ["s", "x", "z"]).collect()}
    s = out["s"]  # values a,a,b (one NULL excluded)
    assert (s.n_rows, s.null_count, s.ndv) == (4, 1, 2)
    assert s.distinctness == pytest.approx(2 / 3, abs=1e-6)
    assert s.uniqueness == pytest.approx(1 / 3, abs=1e-6)
    assert s.entropy == pytest.approx(
        round(math.log(3) - (2 * math.log(2)) / 3, 6), abs=1e-9
    )
    x = out["x"]  # 1,2,3,3
    assert (x.n_rows, x.null_count, x.ndv) == (4, 0, 3)
    assert x.uniqueness == pytest.approx(0.5, abs=1e-6)
    z = out["z"]  # all NULL: no distribution
    assert (z.null_count, z.ndv) == (4, 0)
    assert z.distinctness is None and z.uniqueness is None and z.entropy is None


def test_metrics_key_column_and_constant(spark):
    df = spark.createDataFrame([(i, "k") for i in range(100)], "id int, c string")
    out = {r.column: r for r in column_metrics(df, ["id", "c"]).collect()}
    assert out["id"].distinctness == 1.0 and out["id"].uniqueness == 1.0
    assert out["id"].entropy == pytest.approx(round(math.log(100), 6), abs=1e-9)
    # constant column: the collapsed-entropy upstream-bug signal
    assert out["c"].ndv == 1 and out["c"].entropy == 0.0
    assert out["c"].uniqueness == 0.0


def test_metrics_single_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "a")], "x int, s string")
    plan = (
        column_metrics(df, ["x", "s"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one melt (explode/generate), no Expand, and the input is scanned once
    assert "Expand" not in plan
    assert plan.count("Generate") == 1


def test_metrics_requires_cols(spark):
    with pytest.raises(ValueError):
        column_metrics(_df(spark), [])
