"""Benford first-digit conformance (rules/benford.py)."""

import math

import pytest
from pyspark.sql import functions as F

from open_data_linter_spark.rules.benford import (
    benford_check,
    first_significant_digit,
)


def test_first_digit_extraction_shapes(spark):
    rows = [
        ("123.45",), ("-0.0042",), ("0.9",), ("1e-7",), ("2.5E20",),
        ("0",), ("0.0",), (None,),
    ]
    df = spark.createDataFrame(rows, "s string").select(
        F.col("s").cast("double").alias("x")
    )
    got = [r[0] for r in df.select(first_significant_digit("x")).collect()]
    assert got == [1, 4, 9, 1, 2, None, None, None]


def test_benford_conforming_sample(spark):
    # exact Benford counts by construction: digit d appears round(N*P(d))
    n_by_d = {d: round(10000 * math.log10(1 + 1 / d)) for d in range(1, 10)}
    rows = [(float(d) * 10 ** (i % 3),) for d, n in n_by_d.items() for i in range(n)]
    out = benford_check(spark.createDataFrame(rows, "x double"), "x").collect()
    assert [r.digit for r in out] == list(range(1, 10))
    total = sum(r.n for r in out)
    assert total == sum(n_by_d.values())
    chi2 = sum(r.chi2_contrib for r in out)
    assert chi2 < 0.01  # conforming by construction
    one = next(r for r in out if r.digit == 1)
    assert one.exp_p == pytest.approx(round(math.log10(2), 6), abs=1e-9)
    assert one.n == n_by_d[1]


def test_benford_flags_constant_scale(spark):
    # the classic upstream bug: every value starts with the same digit
    df = spark.createDataFrame([(5000.0 + i,) for i in range(500)], "x double")
    out = benford_check(df, "x").collect()
    assert len(out) == 9  # zero-observation digits still present
    assert next(r for r in out if r.digit == 5).n == 500
    assert next(r for r in out if r.digit == 1).n == 0
    chi2 = sum(r.chi2_contrib for r in out)
    # df=8 critical value at alpha=0.001 is 26.1; this is nowhere close
    assert chi2 > 1000


def test_benford_excludes_zero_and_null(spark):
    df = spark.createDataFrame([(0.0,), (None,), (1.0,)], "x double")
    out = benford_check(df, "x").collect()
    assert sum(r.n for r in out) == 1
