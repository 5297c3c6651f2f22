"""Blocklist gate: Python-twin parity, phrase boundaries, filter policy."""

import re

import pytest

from open_data_linter_spark.functions.blocklist import (
    blocklist_filter,
    blocklist_stats,
)
from open_data_linter_spark.functions.text import java_ws_tokens

TERMS = ["slow", "fail", "Broken"]  # mixed case: normalized at entry
PHRASES = ["row scan", "merge  batch"]  # inner runs collapse at entry

CASES = [
    (0, "fast table slow value slow"),            # 2/5 blocked
    (1, "row scan starts the doc"),               # phrase hit
    (2, "a row scanner is not a row scan"),       # phrase at end
    (3, "borrow scan"),                           # no hit: token boundary
    (4, "merge batch merge batch"),               # phrase twice -> 1 distinct
    (5, "BROKEN\tSLOW\nfail"),                    # 3/3 blocked, tabs/newline
    (6, ""),                                      # empty -> NULL fraction
    (7, None),                                    # null -> NULL fraction
    (8, "clean text only"),                       # nothing blocked
    (9, "slowly failing"),                        # substrings never match
]


def _py_stats(text):
    toks = java_ws_tokens(text)
    n_blocked = sum(1 for t in toks if t in ("slow", "fail", "broken"))
    padded = " " + " ".join(toks) + " "
    n_phr = sum(1 for p in ("row scan", "merge batch") if f" {p} " in padded)
    return {
        "n_tokens": len(toks),
        "n_blocked": n_blocked,
        "blocked_fraction": (
            round(n_blocked / len(toks), 6) if toks else None
        ),
        "n_blocked_phrases": n_phr,
    }


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CASES, "doc_id long, text string")


def test_stats_match_python_twin(spark, docs):
    got = {
        r["doc_id"]: r.asDict()
        for r in blocklist_stats(docs, TERMS, PHRASES).collect()
    }
    for doc_id, text in CASES:
        want = _py_stats(text)
        for k, v in want.items():
            assert got[doc_id][k] == v, (doc_id, k, got[doc_id], want)


def test_filter_any_hit_policy(spark, docs):
    kept = {
        r["doc_id"]
        for r in blocklist_filter(docs, TERMS, PHRASES).collect()
    }
    # any blocked token or phrase drops; empty/null/clean docs pass
    assert kept == {3, 6, 7, 8, 9}


def test_filter_fraction_policy(spark, docs):
    kept = {
        r["doc_id"]
        for r in blocklist_filter(docs, TERMS, max_fraction=0.5).collect()
    }
    # doc 0 is 2/5=0.4 <= 0.5 kept; doc 5 is 3/3 dropped; phrases not given
    assert 0 in kept and 5 not in kept
    assert {1, 2, 3, 4, 6, 7, 8, 9} <= kept


def test_terms_validated(spark, docs):
    with pytest.raises(ValueError):
        blocklist_stats(docs, ["two words"])  # term with whitespace
    with pytest.raises(ValueError):
        blocklist_stats(docs, [])  # empty blocklist
    with pytest.raises(ValueError):
        blocklist_filter(docs, TERMS, max_fraction=1.0)


def test_plan_shuffle_free(spark, docs):
    plan = blocklist_stats(docs, TERMS, PHRASES)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert not re.search(r"BatchEvalPython|ArrowEvalPython", plan), plan
