"""Corpus token-distribution divergence (functions/divergence.py)."""

import math

import pytest

from open_data_linter_spark.functions.divergence import token_divergence


def _docs(spark, rows, with_group=False):
    if with_group:
        return spark.createDataFrame(rows, "doc_id long, g string, text string")
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def _py_div(a_texts, b_texts, alpha=0.5):
    from collections import Counter

    tok = lambda t: [w for w in t.lower().split() if w]  # noqa: E731
    ca = Counter(w for t in a_texts for w in tok(t))
    cb = Counter(w for t in b_texts for w in tok(t))
    vocab = sorted(set(ca) | set(cb))
    v, ta, tb = len(vocab), sum(ca.values()), sum(cb.values())
    p = {w: (ca[w] + alpha) / (ta + alpha * v) for w in vocab}
    q = {w: (cb[w] + alpha) / (tb + alpha * v) for w in vocab}
    kl_ab = sum(p[w] * math.log(p[w] / q[w]) for w in vocab)
    kl_ba = sum(q[w] * math.log(q[w] / p[w]) for w in vocab)
    js = 0.5 * sum(p[w] * math.log(p[w] / ((p[w] + q[w]) / 2)) for w in vocab) \
        + 0.5 * sum(q[w] * math.log(q[w] / ((p[w] + q[w]) / 2)) for w in vocab)
    return round(kl_ab, 6), round(kl_ba, 6), round(js, 6), v, ta, tb


def test_matches_independent_recomputation(spark):
    a = ["the cat sat on the mat", "dogs bark", "the the the"]
    b = ["a cat ran", "birds sing loudly", "the mat"]
    r = token_divergence(_docs(spark, a), _docs(spark, b)).collect()[0]
    kl_ab, kl_ba, js, v, ta, tb = _py_div(a, b)
    assert (r["kl_ab"], r["kl_ba"], r["js"]) == (kl_ab, kl_ba, js)
    assert (r["v_union"], r["n_tokens_a"], r["n_tokens_b"]) == (v, ta, tb)


def test_identical_corpora_diverge_zero(spark):
    a = ["x y z", "y z w"]
    r = token_divergence(_docs(spark, a), _docs(spark, a)).collect()[0]
    assert (r["kl_ab"], r["kl_ba"], r["js"]) == (0.0, 0.0, 0.0)


def test_js_symmetric_and_bounded(spark):
    a, b = ["alpha beta gamma"], ["zig zag zog"]
    r1 = token_divergence(_docs(spark, a), _docs(spark, b)).collect()[0]
    r2 = token_divergence(_docs(spark, b), _docs(spark, a)).collect()[0]
    assert r1["js"] == r2["js"]
    assert 0.0 < r1["js"] <= math.log(2) + 1e-9


def test_per_group_with_one_sided_and_null_groups(spark):
    a = _docs(spark, [(0, "en", "hello world"), (1, None, "nul grp")], True)
    b = _docs(spark, [(0, "en", "hello there"),
                      (1, "fr", "bonjour bonjour monde")], True)
    rows = {r["g"]: r for r in
            token_divergence(a, b, group_col="g").collect()}
    assert set(rows) == {"en", "fr", None}
    # fr exists only in b: the a-side becomes the smoothed UNIFORM over
    # the union vocab (T_a=0), so a skewed one-sided group diverges > 0
    assert rows["fr"]["n_tokens_a"] == 0 and rows["fr"]["n_tokens_b"] == 3
    assert rows["fr"]["js"] > 0
    assert rows[None]["n_tokens_a"] == 2 and rows[None]["n_tokens_b"] == 0


def test_group_totals_join_is_broadcast(spark):
    a = _docs(spark, ["x y"] * 4)
    out = token_divergence(a, _docs(spark, ["x z"] * 4))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_validation(spark):
    a = _docs(spark, ["x"])
    with pytest.raises(ValueError, match="alpha"):
        token_divergence(a, a, alpha=0.0)
