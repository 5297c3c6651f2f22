"""Leakage-safe splits (functions/splits.py)."""

import pytest
from pyspark.sql import functions as F

from open_data_linter_spark.functions.splits import leakage_safe_split


def _docs(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_clusters_never_straddle(spark):
    docs = _docs(spark, 200)
    # chains of 3: (0,1),(1,2), (10,11),(11,12), ...
    edges = []
    for base in range(0, 60, 10):
        edges += [(base, base + 1), (base + 1, base + 2)]
    out = leakage_safe_split(docs, _pairs(spark, edges), test_fraction=0.5)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 200  # row-preserving
    for base in range(0, 60, 10):
        trio = [rows[base + i] for i in range(3)]
        assert len({r["split"] for r in trio}) == 1  # no straddle
        assert {r["unit_id"] for r in trio} == {base}  # min-member label
    # singleton units carry their own id
    assert rows[99]["unit_id"] == 99


def test_deterministic_and_fraction_reasonable(spark):
    docs = _docs(spark, 2000)
    pairs = _pairs(spark, [(0, 1)])
    a = sorted((r["doc_id"], r["split"]) for r in
               leakage_safe_split(docs, pairs, 0.2).collect())
    b = sorted((r["doc_id"], r["split"]) for r in
               leakage_safe_split(docs, pairs, 0.2).collect())
    assert a == b  # replay-stable
    n_test = sum(1 for _, s in a if s == "test")
    assert 0.15 < n_test / 2000 < 0.25  # hash-Bernoulli around 0.2


def test_fraction_extremes_and_validation(spark):
    docs = _docs(spark, 50)
    pairs = _pairs(spark, [(0, 1)])
    all_train = leakage_safe_split(docs, pairs, 0.0)
    assert all_train.where(F.col("split") == "test").count() == 0
    all_test = leakage_safe_split(docs, pairs, 1.0)
    assert all_test.where(F.col("split") == "train").count() == 0
    with pytest.raises(ValueError, match="test_fraction"):
        leakage_safe_split(docs, pairs, 1.5)


def test_seed_changes_assignment_not_invariant(spark):
    docs = _docs(spark, 500)
    edges = [(i, i + 1) for i in range(0, 100, 2)]
    p = _pairs(spark, edges)
    a = {r["doc_id"]: r["split"] for r in
         leakage_safe_split(docs, p, 0.5, seed=1).collect()}
    b = {r["doc_id"]: r["split"] for r in
         leakage_safe_split(docs, p, 0.5, seed=2).collect()}
    assert a != b  # different seeds, different splits
    for i in range(0, 100, 2):  # invariant holds under any seed
        assert a[i] == a[i + 1] and b[i] == b[i + 1]
