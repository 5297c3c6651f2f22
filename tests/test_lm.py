"""Bigram-LM perplexity vs an independent pure-Python computation."""

import math
from collections import Counter

import pytest

from open_data_linter_spark.functions.lm import lm_perplexity

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the cat"),
    (2, "the dog ran"),
    # scrambled: COMMON prefix words with never-repeated pairs -> high
    # ppl. (Novel WORDS would not work under self-training: a hapax
    # prefix makes its one observed transition near-deterministic, so
    # "zx qy vw" scores LOW — the peaked-conditional property of
    # non-backoff bigram LMs.)
    (3, "on cat the sat"),
    (4, "the"),                  # single token -> NULL ppl
    (5, ""),
    (6, None),
    (7, "The  CAT sat "),        # normalization
]


def ref_ppl(docs, alpha, train=None):
    tok = lambda t: (t or "").lower().split()  # noqa: E731
    train_toks = [tok(t) for _, t in (train if train is not None else docs)]
    big = Counter()
    vocab = set()
    for ts in train_toks:
        vocab.update(ts)
        big.update(zip(ts, ts[1:]))
    pre = Counter()
    for (w1, _), c in big.items():
        pre[w1] += c
    v = len(vocab)
    out = {}
    for i, t in docs:
        ts = tok(t)
        if len(ts) < 2:
            out[i] = (len(ts), None)
            continue
        lps = [
            math.log((big[(a, b)] + alpha) / (pre[a] + alpha * v))
            for a, b in zip(ts, ts[1:])
        ]
        out[i] = (len(ts), round(math.exp(-sum(lps) / len(lps)), 6))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_reference(docs):
    got = {
        r.doc_id: (r.n_tokens, r.ppl)
        for r in lm_perplexity(docs, alpha=0.1).collect()
    }
    want = ref_ppl(DOCS, 0.1)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], i
        if want[i][1] is None:
            assert got[i][1] is None, i
        else:
            assert got[i][1] == pytest.approx(want[i][1], abs=2e-6), i


def test_scrambled_transitions_score_worse(docs):
    got = {r.doc_id: r.ppl for r in lm_perplexity(docs).collect()}
    assert got[3] > got[0] and got[3] > got[1]


def test_cross_corpus_scoring(spark, docs):
    eval_docs = [(100, "the cat sat"), (101, "purple monkey dishwasher")]
    ev = spark.createDataFrame(eval_docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.ppl)
        for r in lm_perplexity(ev, alpha=0.1, train_df=docs).collect()
    }
    want = ref_ppl(eval_docs, 0.1, train=DOCS)
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], abs=2e-6)
    # seen transitions must beat never-seen ones
    assert got[100][1] < got[101][1]


def test_alpha_validation(docs):
    with pytest.raises(ValueError, match="alpha"):
        lm_perplexity(docs, alpha=0.0)
