"""Cross-column correlation profile (rules/correlation.py)."""

import math

import pytest
from pyspark.sql import functions as F

from open_data_linter_spark.rules.correlation import correlation_matrix


def _by_pair(rows):
    return {(r["col_x"], r["col_y"]): r for r in rows}


def test_perfect_linear_pairs(spark):
    rows = [(float(i), 2.0 * i + 3.0, -1.0 * i) for i in range(50)]
    out = _by_pair(
        correlation_matrix(
            spark.createDataFrame(rows, "x double, y double, z double"),
            ["x", "y", "z"],
        ).collect()
    )
    assert set(out) == {("x", "y"), ("x", "z"), ("y", "z")}
    assert out[("x", "y")]["corr"] == pytest.approx(1.0)
    assert out[("x", "z")]["corr"] == pytest.approx(-1.0)
    assert all(r["n_pairs"] == 50 for r in out.values())
    assert all(r["high_corr"] for r in out.values())


def test_zero_variance_is_null_never_nan(spark):
    rows = [(float(i), 7.0) for i in range(10)]
    out = _by_pair(
        correlation_matrix(
            spark.createDataFrame(rows, "x double, c double"), ["x", "c"]
        ).collect()
    )
    r = out[("x", "c")]
    assert r["corr"] is None and not (
        isinstance(r["corr"], float) and math.isnan(r["corr"])
    )
    assert r["high_corr"] is False  # coalesced, never NULL
    assert r["n_pairs"] == 10


def test_pairwise_complete_null_handling(spark):
    # x<->y shares 3 complete rows; x<->z all 5; the NULL row is
    # excluded from the (x,y) moments but still feeds (x,z).
    rows = [
        (1.0, 2.0, 1.0),
        (2.0, None, 2.0),
        (3.0, 6.0, 3.0),
        (4.0, None, 4.0),
        (5.0, 10.0, 5.0),
    ]
    out = _by_pair(
        correlation_matrix(
            spark.createDataFrame(rows, "x double, y double, z double"),
            ["x", "y", "z"],
        ).collect()
    )
    assert out[("x", "y")]["n_pairs"] == 3
    assert out[("x", "z")]["n_pairs"] == 5
    assert out[("x", "y")]["corr"] == pytest.approx(1.0)
    assert out[("x", "z")]["corr"] == pytest.approx(1.0)


def test_matches_numpy_on_noisy_data(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    x = rng.normal(size=200)
    y = 0.6 * x + rng.normal(scale=0.5, size=200)
    expected = float(np.corrcoef(x, y)[0, 1])
    out = _by_pair(
        correlation_matrix(
            spark.createDataFrame(
                [(float(a), float(b)) for a, b in zip(x, y)],
                "x double, y double",
            ),
            ["x", "y"],
            threshold=0.5,
        ).collect()
    )
    r = out[("x", "y")]
    assert r["corr"] == pytest.approx(expected, abs=1e-12)
    assert r["high_corr"] == (abs(expected) >= 0.5)


def test_fewer_than_two_complete_rows_is_null(spark):
    rows = [(1.0, 2.0), (3.0, None), (None, 4.0)]
    out = _by_pair(
        correlation_matrix(
            spark.createDataFrame(rows, "x double, y double"), ["x", "y"]
        ).collect()
    )
    assert out[("x", "y")]["corr"] is None
    assert out[("x", "y")]["n_pairs"] == 1


def test_input_validation(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    with pytest.raises(ValueError, match="at least two"):
        correlation_matrix(df, ["x"])
    with pytest.raises(ValueError, match="duplicate"):
        correlation_matrix(df, ["x", "x"])
