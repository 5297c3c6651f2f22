"""vocab_topk: brute-force parity, tie determinism, top-k plan shape."""

import random
from collections import Counter

import pytest

from open_data_linter_spark.functions.vocab import vocab_topk

WORDS = ["red", "blue", "green", "teal", "cyan", "plum", "gold", "jade"]


@pytest.fixture(scope="module")
def docs(spark):
    rng = random.Random(7)
    rows = [
        (i, " ".join(rng.choice(WORDS) for _ in range(rng.randint(0, 30))))
        for i in range(80)
    ]
    rows += [(80, "  "), (81, None), (82, "TEAL Teal teal")]  # case fold
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute(rows, k):
    cnt = Counter()
    for _, text in rows:
        if text is None or not text.strip():
            continue
        cnt.update(text.strip().lower().split())
    total = sum(cnt.values())
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    out = []
    run = 0
    for i, (tok, c) in enumerate(ordered, 1):
        run += c
        out.append(
            {
                "rank": i,
                "token": tok,
                "cnt": c,
                "coverage": round(c / total, 6),
                "cum_coverage": round(run / total, 6),
            }
        )
    return out


def test_matches_bruteforce(spark, docs):
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    for k in (1, 5, len(WORDS) + 10):
        got = [r.asDict() for r in vocab_topk(docs, k=k).collect()]
        want = _brute(rows, k)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            for key in w:
                assert g[key] == pytest.approx(w[key]), (k, g, w)


def test_tie_break_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "b a"), (2, "a b")], "doc_id long, text string"
    )
    got = [r["token"] for r in vocab_topk(df, k=2).collect()]
    assert got == ["a", "b"]  # equal counts -> token ascending


def test_plan_uses_take_ordered(spark, docs):
    plan = (
        vocab_topk(docs, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan  # heap top-k, not a global sort
