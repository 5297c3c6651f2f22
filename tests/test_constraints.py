"""Declarative constraint suites: per-kind semantics vs a hand-counted
twin, tolerance knob, empty-input conventions, single-scan plan,
violation-row sampling."""

import pytest
from pyspark.sql import functions as F

from open_data_linter_spark.rules.constraints import (
    check_constraints,
    constraint_violations,
)

ROWS = [
    # (id, status, price, code, ship_day, receipt_day)
    (1, "F", 10.0, "AB-1", 3, 5),
    (2, "O", -1.0, "XY-2", 7, 7),
    (3, None, 55.5, "bad!", 9, 2),   # null status, bad code, ship>receipt
    (4, "P", 600.0, "CD-9", 1, 4),
    (4, "F", 20.0, "EF-3", 2, 2),    # duplicate id
    (5, "Z", None, None, None, 6),   # status outside set, nulls
]
SCHEMA = ("id long, status string, price double, code string,"
          " ship_day int, receipt_day int")

SUITE = [
    {"kind": "not_null", "column": "status", "id": "status_nn"},
    {"kind": "unique", "column": "id", "id": "id_unique"},
    {"kind": "range", "column": "price", "min": 0.0, "max": 500.0,
     "id": "price_range"},
    {"kind": "in_set", "column": "status", "values": ["F", "O", "P"],
     "id": "status_domain"},
    {"kind": "matches", "column": "code", "regex": "[A-Z]{2}-[0-9]",
     "id": "code_format"},
    {"kind": "expr", "sql": "ship_day <= receipt_day", "id": "ship_order"},
]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_counts_match_hand_twin(spark, frame):
    got = {r["constraint_id"]: r.asDict()
           for r in check_constraints(frame, SUITE).collect()}
    n = len(ROWS)
    # hand counts: null status ×1; id dups: 6 non-null ids, 5 distinct → 1;
    # price: -1 and 600 out of range → 2; status in_set: 'Z' → 1;
    # code: 'bad!' fails, NULL skipped → 1; expr: ship>receipt ×1 plus the
    # NULL ship_day row (NOT true) → 2
    want = {
        "status_nn": (n, 1), "id_unique": (6, 1), "price_range": (n, 2),
        "status_domain": (n, 1), "code_format": (n, 1), "ship_order": (n, 2),
    }
    assert set(got) == set(want)
    for cid, (checked, bad) in want.items():
        r = got[cid]
        assert (r["n_checked"], r["n_violations"]) == (checked, bad), cid
        assert r["violation_rate"] == round(bad / checked, 6)
        assert r["passed"] is (bad == 0)


def test_result_preserves_suite_order(spark, frame):
    ids = [r["constraint_id"]
           for r in check_constraints(frame, SUITE).collect()]
    assert ids == [s["id"] for s in SUITE]


def test_tolerance_knob(spark, frame):
    loose = [dict(SUITE[2], max_violation_rate=0.5)]
    r = check_constraints(frame, loose).collect()[0]
    assert r["n_violations"] == 2 and r["passed"] is True
    tight = [dict(SUITE[2], max_violation_rate=0.1)]
    assert check_constraints(frame, tight).collect()[0]["passed"] is False


def test_empty_input_passes_with_null_rate(spark):
    empty = spark.createDataFrame([], SCHEMA)
    for r in check_constraints(empty, SUITE).collect():
        assert (r["n_checked"], r["n_violations"]) == (0, 0)
        assert r["violation_rate"] is None
        assert r["passed"] is True


def test_single_scan_plan(spark, frame):
    plan = (
        check_constraints(frame, SUITE)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the whole suite (incl. the count-distinct fold) reads the input once:
    # one leaf (createDataFrame = LogicalRDD), no self-join/union fan-out
    assert plan.count("LogicalRDD") == 1, plan
    assert "Join" not in plan and "Union" not in plan, plan


def test_violation_sampling(spark, frame):
    bad_prices = sorted(
        r["price"]
        for r in constraint_violations(frame, SUITE, "price_range").collect()
    )
    assert bad_prices == [-1.0, 600.0]
    dups = constraint_violations(frame, SUITE, "id_unique").collect()
    assert [(r["value"], r["occurrences"]) for r in dups] == [(4, 2)]
    with pytest.raises(KeyError):
        constraint_violations(frame, SUITE, "nope")


def test_unknown_kind_rejected(spark, frame):
    with pytest.raises(ValueError, match="unknown constraint kind"):
        check_constraints(frame, [{"kind": "frobnicate", "column": "id"}])


def test_group_counts_completeness(spark):
    from open_data_linter_spark.rules.constraints import check_group_counts

    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",), ("c",)] + [("d",)] * 10,
        "g string",
    )
    got = {r["group"]: (r["n_rows"], r["status"])
           for r in check_group_counts(
               df, "g", expected=["a", "b", "e"], min_rows=2, max_rows=5
           ).collect()}
    assert got == {
        "a": (3, "ok"),
        "b": (1, "under"),
        "c": (1, "unexpected"),
        "d": (10, "unexpected"),   # unexpected wins over 'over'
        "e": (0, "missing"),
    }


def test_group_counts_without_expected_and_null_group(spark):
    from open_data_linter_spark.rules.constraints import check_group_counts

    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)] * 2, "g string"
    )
    got = {r["group"]: (r["n_rows"], r["status"])
           for r in check_group_counts(df, "g", min_rows=3).collect()}
    assert got["a"] == (4, "ok")
    assert got["b"] == (2, "under")
    assert got[None] == (2, "under")  # NULL key is a real group


def test_zero_tolerance_catches_sub_rounding_rates(spark):
    # 1 violation in 10^7 rows rounds to 0.000000 but must still FAIL a
    # zero-tolerance constraint (the verdict compares the raw rate)
    n = 10_000_000
    df = spark.range(n).select(
        F.when(F.col("id") == 0, None).otherwise(F.col("id")).alias("v")
    )
    r = check_constraints(df, [{"kind": "not_null", "column": "v"}]).collect()[0]
    assert r["n_violations"] == 1
    assert r["violation_rate"] == 0.0  # the displayed, rounded rate
    assert r["passed"] is False        # but the verdict sees 1e-7 > 0


def test_null_group_declared_in_expected(spark):
    from open_data_linter_spark.rules.constraints import check_group_counts

    df = spark.createDataFrame([(None,), (None,), ("a",)], "g string")
    got = {r["group"]: (r["n_rows"], r["expected"], r["status"])
           for r in check_group_counts(df, "g",
                                       expected=[None, "a"]).collect()}
    assert got[None] == (2, True, "ok")   # one row, not missing+unexpected
    assert got["a"] == (1, True, "ok")
    assert len(got) == 2


def test_suggest_constraints_bootstrap_loop(spark):
    from open_data_linter_spark.rules.constraints import suggest_constraints

    df = spark.createDataFrame(
        [(1, "F", 10.0, "freeform text one"),
         (2, "O", -3.5, "two"),
         (3, "F", 99.0, None),
         (4, "P", 50.0, "four")],
        "id long, status string, price double, note string",
    )
    suite = suggest_constraints(df, max_domain=3)
    by_id = {s["id"]: s for s in suite}
    # id: not_null + full observed range
    assert by_id["id_range"] == {"kind": "range", "column": "id",
                                 "min": 1.0, "max": 4.0, "id": "id_range"}
    assert "id_not_null" in by_id
    # status: 3 distinct <= max_domain -> in_set over the sorted domain
    assert by_id["status_domain"]["values"] == ["F", "O", "P"]
    # price: range over observed bounds incl. the negative
    assert (by_id["price_range"]["min"], by_id["price_range"]["max"]) == (
        -3.5, 99.0)
    # note: nullable (no not_null), 3 distinct non-null values but it has
    # a NULL — distinct counts non-null only, so it still gets a domain
    assert "note_not_null" not in by_id
    # the bootstrap loop: the source snapshot passes its own suite
    rep = check_constraints(df, suite).collect()
    assert all(r["passed"] for r in rep)
    # and a drifted snapshot fails exactly the breached expectations
    drifted = spark.createDataFrame(
        [(9, "X", 1000.0, "x")],
        "id long, status string, price double, note string",
    )
    got = {r["constraint_id"]: r["passed"]
           for r in check_constraints(drifted, suite).collect()}
    assert got["id_range"] is False          # 9 > observed max 4
    assert got["status_domain"] is False     # X outside {F,O,P}
    assert got["price_range"] is False       # 1000 > 99
