"""Model-based quality gate: pure-Python differential, OOV contract,
Pareto acceptance determinism + nesting, broadcast scoring plan."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from open_data_linter_spark.functions.quality_model import (
    pareto_quality_sample,
    quality_model_scores,
    train_quality_classifier,
)
from open_data_linter_spark.functions.text import java_ws_tokens

POS = [
    "clean prose with careful structure and clear meaning",
    "a well formed paragraph carries its argument clearly",
    "careful writing with clear structure wins",
]
NEG = [
    "buy buy cheap cheap click click now now now",
    "spam spam link click buy now cheap",
    "click here buy cheap spam link",
]
RAW = [
    (0, "careful clear writing with structure"),
    (1, "buy cheap spam click now"),
    (2, "clear argument but click now"),
    (3, "zzz qqq totally unseen tokens"),
    (4, ""),
    (5, None),
    (6, "clean\tprose\nwith meaning"),
]


def _train_py(alpha=1.0):
    cp, cn = Counter(), Counter()
    for t in POS:
        cp.update(java_ws_tokens(t))
    for t in NEG:
        cn.update(java_ws_tokens(t))
    vocab = set(cp) | set(cn)
    tp, tn, v = sum(cp.values()), sum(cn.values()), len(vocab)

    def w(a, b):
        return math.log((a + alpha) / (tp + alpha * v)) - math.log(
            (b + alpha) / (tn + alpha * v)
        )

    return {f: w(cp[f], cn[f]) for f in vocab}, w(0, 0)


def _score_py(text, weights, w0):
    toks = java_ws_tokens(text)
    if not toks:
        return (None, None, None)
    m = round(sum(weights.get(t, w0) for t in toks) / len(toks), 6)
    return (len(toks), m, round(1.0 / (1.0 + math.exp(-m)), 6))


@pytest.fixture(scope="module")
def frames(spark):
    pos = spark.createDataFrame([(t,) for t in POS], "text string")
    neg = spark.createDataFrame([(t,) for t in NEG], "text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    return pos, neg, raw


def test_scores_match_python_twin(spark, frames):
    pos, neg, raw = frames
    model = train_quality_classifier(pos, neg)
    got = {
        r["doc_id"]: (r["n_tokens"], r["mean_logodds"], r["p_quality"])
        for r in quality_model_scores(raw, model).collect()
    }
    weights, w0 = _train_py()
    assert len(got) == len(RAW)  # row-preserving
    for doc_id, text in RAW:
        assert got[doc_id] == _score_py(text, weights, w0), (doc_id, text)


def test_oov_doc_scores_exactly_w0(spark, frames):
    pos, neg, raw = frames
    model = train_quality_classifier(pos, neg)
    _, w0 = _train_py()
    row = (
        quality_model_scores(raw, model)
        .where(F.col("doc_id") == 3)
        .collect()[0]
    )
    assert row["mean_logodds"] == round(w0, 6)


def test_discrimination(spark, frames):
    pos, neg, raw = frames
    model = train_quality_classifier(pos, neg)
    got = {
        r["doc_id"]: r["p_quality"]
        for r in quality_model_scores(raw, model).collect()
    }
    assert got[0] > 0.5 > got[1]  # posish doc above, spammy below
    assert got[0] > got[2] > got[1]  # mixed doc in between


def test_model_requires_oov_row(spark, frames):
    pos, neg, raw = frames
    model = train_quality_classifier(pos, neg).where(F.col("f").isNotNull())
    with pytest.raises(Exception, match="OOV"):
        quality_model_scores(raw, model).collect()


def test_pareto_deterministic_and_nested(spark, frames):
    pos, neg, raw = frames
    model = train_quality_classifier(pos, neg)
    k9a = {r["doc_id"] for r in pareto_quality_sample(raw, model).collect()}
    k9b = {r["doc_id"] for r in pareto_quality_sample(raw, model).collect()}
    assert k9a == k9b  # replay-stable
    k2 = {
        r["doc_id"]
        for r in pareto_quality_sample(raw, model, shape=2.0).collect()
    }
    k30 = {
        r["doc_id"]
        for r in pareto_quality_sample(raw, model, shape=30.0).collect()
    }
    assert k30 <= k9a <= k2  # tightening never resurrects a dropped doc
    assert 4 not in k2 and 5 not in k2  # unscorable docs never kept


def test_pareto_favors_high_scores(spark, frames):
    pos, neg, _ = frames
    model = train_quality_classifier(pos, neg)
    hi = spark.createDataFrame(
        [(i, "careful clear structure") for i in range(200)],
        "doc_id long, text string",
    )
    lo = spark.createDataFrame(
        [(i, "spam click buy cheap") for i in range(200)],
        "doc_id long, text string",
    )
    n_hi = pareto_quality_sample(hi, model).count()
    n_lo = pareto_quality_sample(lo, model).count()
    assert n_hi > n_lo


def test_bucketed_scoring_broadcasts(spark, frames):
    pos, neg, raw = frames
    model = train_quality_classifier(pos, neg, buckets=64)
    assert model.count() <= 65  # <= buckets features + the OOV row
    scored = quality_model_scores(raw, model, buckets=64)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # hash collisions aside, the bucketed path still scores every doc
    assert scored.where(F.col("mean_logodds").isNotNull()).count() == 5
