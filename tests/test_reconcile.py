"""Row-level reconciliation: change classification vs a hand twin, NULL
vs empty-string discrimination, dup-key guard + xor multiset mode,
shuffle carries hashes not payloads."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException  # noqa: F401

from open_data_linter_spark.rules.reconcile import (
    reconcile_counts,
    reconcile_rows,
)

OLD = [
    (1, "a", 10.0),
    (2, "b", 20.0),
    (3, "c", 30.0),
    (4, None, 40.0),
    (5, "", 50.0),
]
NEW = [
    (1, "a", 10.0),      # unchanged
    (2, "B", 20.0),      # updated (tag)
    (4, "", 40.0),       # updated (NULL -> empty string must be seen!)
    (5, "", 50.0),       # unchanged
    (6, "f", 60.0),      # inserted; 3 deleted
]
SCHEMA = "id long, tag string, price double"


@pytest.fixture(scope="module")
def frames(spark):
    return (
        spark.createDataFrame(OLD, SCHEMA),
        spark.createDataFrame(NEW, SCHEMA),
    )


def test_counts(spark, frames):
    old, new = frames
    got = {r["change"]: r["n_keys"]
           for r in reconcile_counts(old, new, "id").collect()}
    assert got == {"inserted": 1, "deleted": 1, "updated": 2, "unchanged": 2}


def test_rows(spark, frames):
    old, new = frames
    got = {(r["key"], r["change"])
           for r in reconcile_rows(old, new, "id").collect()}
    assert got == {(6, "inserted"), (3, "deleted"),
                   (2, "updated"), (4, "updated")}


def test_all_classes_present_even_when_zero(spark, frames):
    old, _ = frames
    got = {r["change"]: r["n_keys"]
           for r in reconcile_counts(old, old, "id").collect()}
    assert got == {"inserted": 0, "deleted": 0, "updated": 0,
                   "unchanged": len(OLD)}


def test_compare_cols_subset(spark, frames):
    old, new = frames
    # comparing only price: both tag changes become invisible
    got = {r["change"]: r["n_keys"]
           for r in reconcile_counts(old, new, "id",
                                     compare_cols=["price"]).collect()}
    assert got["updated"] == 0 and got["unchanged"] == 4


def test_dup_key_guard_raises(spark):
    dup = spark.createDataFrame([(1, "a", 1.0), (1, "b", 2.0)], SCHEMA)
    clean = spark.createDataFrame([(1, "a", 1.0)], SCHEMA)
    with pytest.raises(Exception, match="duplicate keys"):
        reconcile_counts(dup, clean, "id").collect()


def test_dup_keys_xor_multiset_mode(spark):
    a = spark.createDataFrame([(1, "x", 1.0), (1, "y", 2.0)], SCHEMA)
    b = spark.createDataFrame([(1, "y", 2.0), (1, "x", 1.0)], SCHEMA)
    got = {r["change"]: r["n_keys"]
           for r in reconcile_counts(a, b, "id",
                                     allow_dup_keys=True).collect()}
    assert got["unchanged"] == 1 and got["updated"] == 0
    c = spark.createDataFrame([(1, "x", 1.0), (1, "z", 2.0)], SCHEMA)
    got2 = {r["change"]: r["n_keys"]
            for r in reconcile_counts(a, c, "id",
                                      allow_dup_keys=True).collect()}
    assert got2["updated"] == 1


def test_join_carries_hashes_not_payload(spark, frames):
    old, new = frames
    plan = (
        reconcile_rows(old, new, "id")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the full-outer join's direct children are the (__k, __h)
    # reductions — the payload columns never cross the join
    lines = plan.splitlines()
    ji = next(i for i, l in enumerate(lines) if "Join FullOuter" in l)
    assert "Aggregate [__k" in lines[ji + 1], plan
    second = next(
        l for l in lines[ji + 2:] if l.lstrip().startswith("+- ")
        and l.index("+- ") == lines[ji + 1].index(":- ")
    )
    assert "Aggregate [__k" in second, plan


def test_null_keys_classified_null_safely(spark):
    """A NULL key is a legal key value (round-4 advice finding): present in
    both snapshots it must compare as unchanged/updated — not 'inserted' —
    and one that vanishes from old must report 'deleted'."""
    a = spark.createDataFrame([(None, "x", 1.0), (1, "a", 2.0)], SCHEMA)
    b = spark.createDataFrame([(None, "x", 1.0), (1, "a", 2.0)], SCHEMA)
    got = {r["change"]: r["n_keys"]
           for r in reconcile_counts(a, b, "id").collect()}
    assert got == {"inserted": 0, "deleted": 0, "updated": 0, "unchanged": 2}
    # content change under the NULL key is an update, not insert+delete
    c = spark.createDataFrame([(None, "y", 1.0), (1, "a", 2.0)], SCHEMA)
    got2 = {(r["key"], r["change"])
            for r in reconcile_rows(a, c, "id").collect()}
    assert got2 == {(None, "updated")}
    # NULL key removed from old is a deletion
    d = spark.createDataFrame([(1, "a", 2.0)], SCHEMA)
    got3 = {(r["key"], r["change"])
            for r in reconcile_rows(a, d, "id").collect()}
    assert got3 == {(None, "deleted")}
    # and dup-NULL-keys still trip the uniqueness guard
    e = spark.createDataFrame([(None, "x", 1.0), (None, "y", 2.0)], SCHEMA)
    with pytest.raises(Exception, match="duplicate keys"):
        reconcile_counts(e, d, "id").collect()


def test_xor_cancellation_and_separator_injection_resist(spark):
    # even multiplicities must NOT cancel: {r1,r1} vs {r2,r2} differ
    a = spark.createDataFrame([(1, "r1", 0.0), (1, "r1", 0.0)], SCHEMA)
    b = spark.createDataFrame([(1, "r2", 0.0), (1, "r2", 0.0)], SCHEMA)
    got = {r["change"]: r["n_keys"]
           for r in reconcile_counts(a, b, "id",
                                     allow_dup_keys=True).collect()}
    assert got["updated"] == 1
    # multiplicity changes of the SAME row must be visible: [r] vs [r,r,r]
    c = spark.createDataFrame([(1, "r1", 0.0)], SCHEMA)
    d = spark.createDataFrame([(1, "r1", 0.0)] * 3, SCHEMA)
    got2 = {r["change"]: r["n_keys"]
            for r in reconcile_counts(c, d, "id",
                                      allow_dup_keys=True).collect()}
    assert got2["updated"] == 1
    # separator injection: content shifted across column boundaries
    e = spark.createDataFrame([(1, "x\x01b", "b\x01y")],
                              "id long, a string, b string")
    f = spark.createDataFrame([(1, "x", "b\x01b\x01y")],
                              "id long, a string, b string")
    got3 = {r["change"]: r["n_keys"]
            for r in reconcile_counts(e, f, "id").collect()}
    assert got3["updated"] == 1
    # NULL vs the literal NUL-byte string must differ
    g = spark.createDataFrame([(1, None, "z")], "id long, a string, b string")
    h = spark.createDataFrame([(1, "\x00", "z")], "id long, a string, b string")
    got4 = {r["change"]: r["n_keys"]
            for r in reconcile_counts(g, h, "id").collect()}
    assert got4["updated"] == 1
