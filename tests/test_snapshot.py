"""Snapshot diff: added/removed/type-changed columns, null-rate and
cardinality stats vs a hand twin, empty sides, plan shape (one agg per
side, no row-level join)."""

import pytest
from pyspark.sql import functions as F

from open_data_linter_spark.rules.snapshot import snapshot_diff

OLD = [
    (1, "a", 10.0),
    (2, "b", None),
    (3, None, 30.0),
    (4, "a", 40.0),
]
NEW = [
    (1, "1", "x"),
    (2, "2", None),
    (3, "3", "x"),
    (4, None, "y"),
    (5, "5", "z"),
]


@pytest.fixture(scope="module")
def frames(spark):
    old = spark.createDataFrame(OLD, "id long, tag string, price double")
    # tag migrated string->string (same), price dropped, id type changed
    # long->string, note added
    new = spark.createDataFrame(NEW, "id string, tag string, note string")
    return old, new


def test_diff_report(spark, frames):
    old, new = frames
    got = {r["column"]: r.asDict() for r in snapshot_diff(old, new).collect()}
    assert sorted(got) == ["id", "note", "price", "tag"]

    i = got["id"]
    assert (i["in_old"], i["in_new"], i["type_changed"]) == (True, True, True)
    assert (i["type_old"], i["type_new"]) == ("bigint", "string")
    assert (i["n_old"], i["n_new"]) == (4, 5)
    assert (i["null_rate_old"], i["null_rate_new"]) == (0.0, 0.0)
    assert i["null_rate_delta"] == 0.0
    assert (i["distinct_old"], i["distinct_new"]) == (4, 5)

    p = got["price"]  # removed column: new side all NULL stats
    assert (p["in_old"], p["in_new"], p["type_changed"]) == (True, False, False)
    assert p["type_new"] is None and p["null_rate_new"] is None
    assert p["null_rate_old"] == 0.25 and p["distinct_old"] == 3
    assert p["null_rate_delta"] is None

    n = got["note"]  # added column
    assert (n["in_old"], n["in_new"]) == (False, True)
    assert n["null_rate_new"] == 0.2 and n["distinct_new"] == 3

    t = got["tag"]
    assert t["type_changed"] is False
    assert (t["null_rate_old"], t["null_rate_new"]) == (0.25, 0.2)
    assert t["null_rate_delta"] == round(0.2 - 0.25, 6)
    assert (t["distinct_old"], t["distinct_new"]) == (2, 4)


def test_empty_side_yields_null_rates(spark, frames):
    old, _ = frames
    empty = spark.createDataFrame([], "id long, tag string, price double")
    got = {r["column"]: r.asDict()
           for r in snapshot_diff(old, empty).collect()}
    assert got["tag"]["n_new"] == 0
    assert got["tag"]["null_rate_new"] is None
    assert got["tag"]["null_rate_delta"] is None
    assert got["tag"]["distinct_new"] == 0


def test_plan_one_agg_per_side(spark, frames):
    old, new = frames
    plan = (
        snapshot_diff(old, new)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # two leaves (one per snapshot), broadcast-cross of two single rows,
    # never a row-level join of the snapshots
    assert plan.count("LogicalRDD") == 2, plan
    assert plan.count("Aggregate") >= 2, plan


def test_approx_mode_runs(spark, frames):
    old, new = frames
    got = {r["column"]: r for r in snapshot_diff(old, new, approx=True).collect()}
    # HLL on tiny sets is exact in practice; presence/type facts identical
    assert got["id"]["distinct_old"] == 4
    assert got["id"]["type_changed"] is True
