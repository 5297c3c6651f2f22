"""Intra-doc repetition stats: brute-force parity + edge cases + filter."""

import random
from collections import Counter

import pytest

from open_data_linter_spark.functions.repetition import (
    repetition_filter,
    repetition_stats,
)


def _brute(text, n):
    """Reference recomputation mirroring positional_shingles semantics."""
    toks = text.strip().lower().split()
    if not toks:
        return None
    if len(toks) >= n:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    else:
        grams = [" ".join(toks)]
    cnt = Counter(grams)
    tot = len(grams)
    dup = sum(c for c in cnt.values() if c > 1)
    top = max(cnt.values())
    return {
        "n_grams": tot,
        "distinct_grams": len(cnt),
        "dup_position_rate": round(dup / tot, 6),
        "top_gram_rate": round(top / tot, 6),
    }


WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


@pytest.fixture(scope="module")
def docs(spark):
    rng = random.Random(41)
    rows = []
    for i in range(60):
        k = rng.randint(1, 40)
        # Skewed word choice so duplicated n-grams actually occur.
        rows.append((i, " ".join(rng.choice(WORDS[: rng.randint(1, 6)]) for _ in range(k))))
    rows += [
        (100, "solo"),                      # single token, n>len fallback
        (101, "same same same same"),       # fully repeated
        (102, "a b a b a b"),               # alternating bigram repetition
        (103, "   "),                       # whitespace-only -> excluded
        (104, None),                        # NULL -> excluded
        (105, "x y"),                       # below n=3 -> whole-doc fallback
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_matches_bruteforce(spark, docs):
    got = {
        (r["doc_id"], r["n"]): r.asDict()
        for r in repetition_stats(docs, ns=(1, 2, 3)).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    expected_keys = set()
    for doc_id, text in texts.items():
        for n in (1, 2, 3):
            want = _brute(text, n) if text is not None else None
            if want is None:
                assert (doc_id, n) not in got
                continue
            expected_keys.add((doc_id, n))
            have = got[(doc_id, n)]
            for k, v in want.items():
                assert have[k] == pytest.approx(v), (doc_id, n, k, have, want)
    assert set(got) == expected_keys


def test_known_values(spark, docs):
    rows = {
        (r["doc_id"], r["n"]): r.asDict()
        for r in repetition_stats(docs, ns=(2,)).collect()
    }
    # "same same same same" -> 3 positions of "same same", all duplicated.
    r = rows[(101, 2)]
    assert r["n_grams"] == 3 and r["distinct_grams"] == 1
    assert r["dup_position_rate"] == 1.0 and r["top_gram_rate"] == 1.0
    # "a b a b a b" -> grams: ab,ba,ab,ba,ab -> dup rate 1.0, top 3/5.
    r = rows[(102, 2)]
    assert r["n_grams"] == 5 and r["distinct_grams"] == 2
    assert r["top_gram_rate"] == 0.6
    # single token: whole-doc fallback, one unique gram.
    r = rows[(100, 2)]
    assert r["n_grams"] == 1 and r["dup_position_rate"] == 0.0


def test_filter_drops_repetitive(spark, docs):
    kept = repetition_filter(
        docs, max_dup_2gram_rate=0.9, max_top_2gram_rate=0.7
    )
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 102 not in ids                      # repetitive and >= min_grams
    assert 101 in ids                          # 3 grams < min_grams=5 -> exempt
    assert 100 in ids                          # short doc exempt from gates
    assert 103 not in ids and 104 not in ids   # empty docs dropped


def test_plan_is_shuffle_free(spark, docs):
    plan = repetition_stats(docs, ns=(2,))._jdf.queryExecution().executedPlan().toString()
    # Only the final orderBy may exchange; the stats themselves are a
    # projection. Strip the sort's range-partitioning exchange and assert
    # no hash exchange (no groupBy shuffle of the gram stream).
    assert "hashpartitioning" not in plan.lower()
