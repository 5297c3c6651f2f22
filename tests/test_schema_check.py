"""Declared-schema conformance (rules/schema_check.py)."""

from open_data_linter_spark.rules.schema_check import check_schema


def test_schema_statuses(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.0)], "id bigint, name string, score double"
    )
    out = {
        r.column: r
        for r in check_schema(
            df, {"id": "bigint", "name": "int", "created_at": "timestamp"}
        ).collect()
    }
    assert out["id"].status == "ok" and out["id"].actual_type == "bigint"
    assert out["name"].status == "type_mismatch"
    assert (out["name"].expected_type, out["name"].actual_type) == ("int", "string")
    assert out["created_at"].status == "missing"
    assert out["created_at"].actual_type is None
    assert out["score"].status == "unexpected"
    assert out["score"].expected_type is None
    # nullable surfaces for present columns only
    assert out["id"].nullable in (True, False)
    assert out["created_at"].nullable is None


def test_schema_check_never_scans_the_table(spark):
    # schemas are plan metadata: the report must not reference the input
    # relation at all (a 10^12-row table is checked without touching it)
    df = spark.range(5).selectExpr("id", "CAST(id AS string) AS s")
    rows = check_schema(df, {"id": "bigint", "s": "string"})
    plan = rows._jdf.queryExecution().executedPlan().toString()
    # the whole plan is the local report rows; the input's Range scan is absent
    assert "ExistingRDD" in plan and "Range" not in plan
    assert all(r.status == "ok" for r in rows.collect())
