"""Bivariate Mahalanobis outliers (rules/mahalanobis.py)."""

import pytest

from open_data_linter_spark.rules.mahalanobis import bivariate_outliers


def _corr_cloud(n=400, rho=0.95, seed=3):
    import numpy as np

    rng = np.random.default_rng(seed)
    x = rng.normal(size=n)
    y = rho * x + np.sqrt(1 - rho**2) * rng.normal(size=n)
    return [(float(a), float(b)) for a, b in zip(x, y)]


def test_swapped_pair_flags_where_columns_look_normal(spark):
    rows = _corr_cloud()
    # plant a pair-inconsistent row: both coordinates WELL inside their
    # marginals (|z| < 1.5) but jointly impossible under rho=0.95
    rows.append((1.4, -1.4))
    df = spark.createDataFrame(rows, "x double, y double")
    out = bivariate_outliers(df, "x", "y").collect()
    assert out, "the planted inconsistent pair must flag"
    assert out[0]["x"] == 1.4 and out[0]["y"] == -1.4
    assert out[0]["d2"] > 13.816


def test_matches_numpy_distance(spark):
    import numpy as np

    rows = _corr_cloud(n=200, rho=0.6, seed=9)
    df = spark.createDataFrame(rows, "x double, y double")
    out = bivariate_outliers(df, "x", "y", threshold=0.0).collect()
    a = np.array(rows)
    mu = a.mean(axis=0)
    cov = np.cov(a.T)
    inv = np.linalg.inv(cov)
    d = a - mu
    d2 = np.einsum("ij,jk,ik->i", d, inv, d)
    got = {(r["x"], r["y"]): r["d2"] for r in out}
    for (x, y), dd in zip(rows, d2):
        # d2 is reported at 6 dp: allow the rounding granularity
        assert got[(x, y)] == pytest.approx(dd, rel=1e-6, abs=1e-6)


def test_singular_covariance_is_silent(spark):
    # y = 2x exactly -> det 0 -> NULL d2 -> nothing flags
    rows = [(float(i), 2.0 * i) for i in range(50)]
    df = spark.createDataFrame(rows, "x double, y double")
    assert bivariate_outliers(df, "x", "y").count() == 0
    const = spark.createDataFrame(
        [(float(i), 7.0) for i in range(50)], "x double, y double"
    )
    assert bivariate_outliers(const, "x", "y").count() == 0


def test_nulls_excluded_and_alpha_validation(spark):
    rows = _corr_cloud(n=100) + [(None, 99.0), (99.0, None)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = bivariate_outliers(df, "x", "y").collect()
    assert all(r["x"] is not None and r["y"] is not None for r in out)
    with pytest.raises(ValueError, match="alpha"):
        bivariate_outliers(df, "x", "y", alpha=0.5)


def test_plan_broadcast_stats_no_shuffle_of_rows(spark, tmp_path):
    import contextlib
    import io

    p = str(tmp_path / "mh")
    spark.createDataFrame(
        _corr_cloud(n=50), "x double, y double"
    ).write.parquet(p)
    out = bivariate_outliers(spark.read.parquet(p), "x", "y")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="simple")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in plan, plan  # single stats row
    assert "partial_avg" in plan, plan  # stats pass combines map-side
    assert "Exchange hashpartitioning" not in plan, plan  # no row shuffle