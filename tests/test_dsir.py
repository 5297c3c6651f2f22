"""DSIR importance weighting (functions/dsir.py)."""

import math

import pytest
from pyspark.sql import functions as F

from open_data_linter_spark.functions.dsir import (
    dsir_select,
    importance_weights,
    ngram_bag,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_bag_contract(spark):
    df = spark.createDataFrame(
        [("a b c",), ("solo",), ("",), (None,), ("  x\t y ",)], "text string"
    )
    got = [r[0] for r in df.select(ngram_bag(F.col("text"))).collect()]
    assert got[0] == ["a", "b", "c", "a b", "b c"]
    assert got[1] == ["solo"]  # no whole-doc fallback, no bigram
    assert got[2] == [] and got[3] == []
    assert got[4] == ["x", "y", "x y"]


def _py_weights(raw, target, alpha=1.0):
    """Independent python recomputation of the model."""

    def bag(t):
        toks = [w for w in t.lower().split() if w]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    from collections import Counter

    rawc = Counter(f for _, t in raw for f in bag(t))
    tgtc = Counter(f for t in target for f in bag(t))
    vocab = set(rawc) | set(tgtc)
    v, tr, tt = len(vocab), sum(rawc.values()), sum(tgtc.values())
    out = {}
    for i, t in raw:
        fs = bag(t)
        lw = sum(
            math.log((tgtc[f] + alpha) / (tt + alpha * v))
            - math.log((rawc[f] + alpha) / (tr + alpha * v))
            for f in fs
        )
        out[i] = (len(fs), round(lw, 6)) if fs else (None, None)
    return out


def test_weights_match_independent_recomputation(spark):
    raw = [(0, "the cat sat"), (1, "dogs bark loud"), (2, "the cat ran"),
           (3, ""), (4, "cat")]
    target = ["the cat sat down", "a cat sat"]
    exp = _py_weights(raw, target)
    got = {
        r["doc_id"]: (r["n_feats"], r["logw"])
        for r in importance_weights(
            _docs(spark, raw),
            spark.createDataFrame([(t,) for t in target], "text string"),
        ).collect()
    }
    assert got == exp


def test_row_preserving_and_empty_bag_null(spark):
    raw = [(0, "a b"), (1, None), (2, "   ")]
    out = importance_weights(
        _docs(spark, raw), _docs(spark, [(9, "a b")]).select("text")
    )
    got = {r["doc_id"]: r["logw"] for r in out.collect()}
    assert set(got) == {0, 1, 2}
    assert got[1] is None and got[2] is None and got[0] is not None


def test_select_prefers_target_like_docs(spark):
    # planted: docs 0-4 share the target's vocabulary, 5-9 don't
    raw = [(i, "alpha beta gamma delta") for i in range(5)]
    raw += [(i, "zig zag zog zug") for i in range(5, 10)]
    target = _docs(spark, [(100, "alpha beta gamma"), (101, "beta gamma delta")])
    top = dsir_select(_docs(spark, raw), target, k=5)
    assert sorted(r["doc_id"] for r in top.collect()) == [0, 1, 2, 3, 4]
    # and the hashed-bucket scale path agrees on the planted split
    top_b = dsir_select(_docs(spark, raw), target, k=5, buckets=4096)
    assert sorted(r["doc_id"] for r in top_b.collect()) == [0, 1, 2, 3, 4]


def test_select_deterministic_tie_break(spark):
    # identical docs -> identical weights -> selection is id-ordered
    raw = [(3, "a b"), (1, "a b"), (2, "a b")]
    target = _docs(spark, [(9, "a b")])
    top = dsir_select(_docs(spark, raw), target, k=2)
    assert [r["doc_id"] for r in top.collect()] == [1, 2]


def test_bucketed_path_broadcasts_and_is_deterministic(spark):
    raw = _docs(spark, [(i, f"tok{i} tok{i + 1} tok{i + 2}") for i in range(40)])
    target = _docs(spark, [(99, "tok1 tok2 tok3 tok4")])
    w = importance_weights(raw, target, buckets=256)
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    a = sorted((r["doc_id"], r["logw"]) for r in w.collect())
    b = sorted(
        (r["doc_id"], r["logw"])
        for r in importance_weights(raw, target, buckets=256).collect()
    )
    assert a == b


def test_validation_errors(spark):
    raw = _docs(spark, [(0, "a")])
    with pytest.raises(ValueError, match="alpha"):
        importance_weights(raw, raw, alpha=0.0)
    with pytest.raises(ValueError, match="buckets"):
        importance_weights(raw, raw, buckets=1)
    with pytest.raises(ValueError, match="k must"):
        dsir_select(raw, raw, k=0)


def test_unhashed_path_never_builds_corpus_broadcast(spark):
    # round 6: the scalars crossJoin inflated the ratio estimate until
    # the planner broadcast the exploded CORPUS side of the scoring
    # join; the fix inlines the scalars as literals (no BNLJ) and
    # explicitly broadcasts the (probed-small) ratio table instead
    raw = _docs(spark, [(i, f"tok{i} tok{i + 1} tok{i + 2}") for i in range(40)])
    target = _docs(spark, [(99, "tok1 tok2 tok3 tok4")])
    w = importance_weights(raw, target)  # buckets=None
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
