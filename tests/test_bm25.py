"""BM25 top-k vs an independent pure-Python implementation."""

import math
from collections import Counter

import pytest

from open_data_linter_spark.similarity.bm25 import ROUND, bm25_topk

DOCS = [
    (0, "spark shuffle join hash join"),
    (1, "broadcast join small table"),
    (2, "hash aggregate partial merge"),
    (3, "spark spark spark streaming watermark"),
    (4, "the quick brown fox"),
    (5, ""),
    (6, None),
    (7, "JOIN Hash JOIN  spark   "),  # case/whitespace normalization
]

QUERIES = [(0, "hash join"), (1, "spark"), (2, "zebra"), (3, "join join spark")]


def ref_bm25(docs, queries, k, k1=1.2, b=0.75):
    toks = {i: (t or "").lower().split() for i, t in docs}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    tfs = {i: Counter(v) for i, v in toks.items()}
    out = []
    for qid, q in queries:
        terms = sorted(set((q or "").lower().split()))
        scores = {}
        for d, tf in tfs.items():
            s = 0.0
            for t in terms:
                if tf[t] == 0:
                    continue
                df = sum(1 for x in tfs.values() if x[t] > 0)
                idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
                s += idf * tf[t] * (k1 + 1) / (
                    tf[t] + k1 * (1 - b + b * len(toks[d]) / avgdl)
                )
            if s > 0:
                scores[d] = round(s, ROUND)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out.extend(
            (qid, d, s, r + 1) for r, (d, s) in enumerate(ranked)
        )
    return sorted(out)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_reference(docs):
    got = sorted(
        tuple(r) for r in bm25_topk(docs, QUERIES, k=5).collect()
    )
    assert got == ref_bm25(DOCS, QUERIES, 5)


def test_topk_truncation_and_rank_order(docs):
    rows = bm25_topk(docs, [(9, "join spark hash")], k=2).collect()
    assert len(rows) == 2
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == [1, 2]
    assert rows[0].score >= rows[1].score or rows[0].doc_id < rows[1].doc_id


def test_no_hits_query_absent_from_output(docs):
    rows = bm25_topk(docs, QUERIES, k=5).collect()
    assert not any(r.query_id == 2 for r in rows)  # "zebra" matches nothing


def test_duplicate_query_terms_count_once(docs):
    one = {
        (r.doc_id, r.score)
        for r in bm25_topk(docs, [(0, "join spark")], k=8).collect()
    }
    dup = {
        (r.doc_id, r.score)
        for r in bm25_topk(docs, [(0, "join join spark")], k=8).collect()
    }
    assert one == dup


def test_param_validation(docs):
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(docs, [])
    with pytest.raises(ValueError, match="no terms"):
        bm25_topk(docs, [(0, "  ")])
    with pytest.raises(ValueError, match="k must"):
        bm25_topk(docs, QUERIES, k=0)
