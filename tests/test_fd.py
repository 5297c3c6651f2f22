"""Functional-dependency conformance (rules/fd.py)."""

import pytest
from pyspark.sql import functions as F

from open_data_linter_spark.rules.fd import (
    check_functional_dependency,
    fd_violating_groups,
)


def _df(spark):
    # zip -> city holds except zip 2 (two cities) and zip 3 (city vs NULL);
    # zip NULL is a real group (null-safe determinant) and holds
    rows = [
        (1, "a", 10),
        (1, "a", 11),
        (2, "b", 12),
        (2, "c", 13),
        (2, "c", 14),
        (3, "d", 15),
        (3, None, 16),
        (None, "e", 17),
    ]
    return spark.createDataFrame(rows, "zip int, city string, x int")


def test_fd_summary_counts(spark):
    out = check_functional_dependency(_df(spark), ["zip"], ["city"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r.determinant == "zip" and r.dependent == "city"
    assert r.n_groups == 4 and r.n_rows == 8
    # zip 2 (3 rows) and zip 3 (2 rows: NULL counts as a distinct value)
    assert r.violating_groups == 2 and r.violating_rows == 5
    assert r.conformance == pytest.approx(1 - 5 / 8, abs=1e-9)


def test_fd_multiple_dependents_and_composite_determinant(spark):
    df = _df(spark)
    out = {
        r.dependent: r
        for r in check_functional_dependency(
            df, ["zip"], ["city", "x"]
        ).collect()
    }
    # x is unique per row -> every multi-row group violates
    assert out["x"].violating_groups == 3 and out["x"].violating_rows == 7
    assert out["city"].violating_groups == 2
    # composite determinant (zip, city) -> x: only (2,'c') has 2 rows
    comp = check_functional_dependency(df, ["zip", "city"], ["x"]).collect()[0]
    assert comp.determinant == "zip,city"
    assert comp.n_groups == 6
    assert comp.violating_groups == 2  # (1,'a') x2 and (2,'c') x2
    assert comp.violating_rows == 4


def test_fd_holding_dependency_and_approx_parity(spark):
    df = _df(spark).withColumn("tag", F.col("zip").cast("string"))
    exact = check_functional_dependency(df, ["zip"], ["tag"]).collect()[0]
    assert exact.violating_groups == 0 and exact.conformance == 1.0
    # approx (HLL) path agrees on this tiny frame and plans no Expand
    ap = check_functional_dependency(df, ["zip"], ["tag", "city"], approx=True)
    assert {r.dependent: r.violating_groups for r in ap.collect()} == {
        "tag": 0,
        "city": 2,
    }
    assert "Expand" not in ap._jdf.queryExecution().executedPlan().toString()


def test_fd_exact_multi_dependent_plans_no_expand(spark):
    # round 6: the exact path decides ndv>1 from min/max/counts, so even
    # k>1 dependents plan NO Expand (the former k-distinct aggregate
    # multiplied shuffle rows by ~k+1 and lost map-side combining)
    ex = check_functional_dependency(_df(spark), ["zip"], ["city", "x"])
    assert "Expand" not in ex._jdf.queryExecution().executedPlan().toString()
    # and the rewrite agrees with the distinct-based summary row-for-row
    got = {r.dependent: (r.violating_groups, r.violating_rows)
           for r in ex.collect()}
    # city: zip2 (b,c over 3 rows) + zip3 (d,NULL over 2 rows);
    # x: every multi-row zip group has distinct x (zip1 2 + zip2 3 +
    # zip3 2 rows), the NULL-zip single row holds
    assert got == {"city": (2, 5), "x": (3, 7)}


def test_fd_violating_groups_evidence(spark):
    out = fd_violating_groups(_df(spark), ["zip"], "city").collect()
    assert [(r.zip, r.n_rows, r.ndv) for r in out] == [(2, 3, 2), (3, 2, 2)]
    byzip = {r.zip: r for r in out}
    assert byzip[2].min_city == "b" and byzip[2].max_city == "c"
    # min/max ignore the NULL that made zip 3 violate
    assert byzip[3].min_city == "d" and byzip[3].max_city == "d"


def test_fd_rejects_overlap_and_empty(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        check_functional_dependency(df, ["zip"], ["zip", "city"])
    with pytest.raises(ValueError):
        check_functional_dependency(df, [], ["city"])
    with pytest.raises(ValueError):
        fd_violating_groups(df, ["zip", "city"], "city")
