"""Duplicate-span coverage: golden + brute-force parity."""

import math
import random
from collections import Counter

import pytest

from open_data_linter_spark.dedup.spans import duplicate_span_stats


def _grams(text, k):
    toks = text.lower().split()
    if not toks:
        return []
    if len(toks) < k:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _exact(rows, k, min_df):
    per_doc = {i: _grams(t or "", k) for i, t in rows}
    per_doc = {i: g for i, g in per_doc.items() if g}
    docfreq = Counter()
    for g in per_doc.values():
        docfreq.update(set(g))
    out = {}
    for i, g in per_doc.items():
        dup = sum(1 for x in g if docfreq[x] >= min_df)
        out[i] = (len(g), dup, math.floor(dup / len(g) * 1e6 + 0.5) / 1e6)
    return out


def test_span_stats_golden(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "zeta alpha beta gamma delta"),   # shares grams with 1
        (3, "totally unrelated words here now"),
        (4, ""),
        (5, None),
        (6, "tiny"),                           # < k tokens -> whole-doc gram
        (7, "tiny"),                           # cross-doc dup of 6
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_coverage)
        for r in duplicate_span_stats(df, k=3, min_df=2).collect()
    }
    # doc 1 trigram stream: 3 grams, 'alpha beta gamma' + 'beta gamma delta'
    # shared with doc 2
    assert got[1] == (3, 2, pytest.approx(2 / 3, abs=1e-6))
    assert got[2] == (3, 2, pytest.approx(2 / 3, abs=1e-6))
    assert got[3] == (3, 0, 0.0)
    assert 4 not in got and 5 not in got  # empty docs excluded
    assert got[6] == (1, 1, 1.0) and got[7] == (1, 1, 1.0)


@pytest.mark.parametrize("seed,k,min_df", [(21, 3, 2), (22, 5, 3)])
def test_span_stats_matches_bruteforce(spark, seed, k, min_df):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(25)]
    rows = []
    for i in range(40):
        n = rng.randint(0, 15)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # plant shared boilerplate spans
    boiler = "copyright terms apply to all content herein always"
    rows.append((100, boiler + " plus unique tail alpha"))
    rows.append((101, boiler + " plus unique tail beta"))
    rows.append((102, "prefix text then " + boiler))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_coverage)
        for r in duplicate_span_stats(df, k=k, min_df=min_df).collect()
    }
    want = _exact(rows, k, min_df)
    assert set(got) == set(want)
    for i, (n, d, c) in want.items():
        assert got[i][0] == n and got[i][1] == d, i
        assert got[i][2] == pytest.approx(c, abs=5e-7)


def test_span_stats_min_df_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        duplicate_span_stats(df, min_df=1)


# ---------------------------------------------------------------------------
# remove_duplicate_spans (cross-doc span REMOVAL, keep-first)
# ---------------------------------------------------------------------------

from open_data_linter_spark.dedup.spans import remove_duplicate_spans  # noqa: E402


def _remove_exact(rows, k, min_df):
    """Pure-Python replay of the removal contract (independent of Spark)."""
    docs = {i: (t or "").lower().split() for i, t in rows}
    docs = {i: t for i, t in docs.items() if t}
    gram_occ = []  # (id, start, length, gram)
    for i, toks in docs.items():
        n = len(toks)
        if n >= k:
            gram_occ += [(i, s, k, " ".join(toks[s : s + k])) for s in range(n - k + 1)]
        else:
            gram_occ.append((i, 0, n, " ".join(toks)))
    byg = {}
    for i, s, gl, g in gram_occ:
        byg.setdefault(g, set()).add(i)
    dup = {g for g, ids in byg.items() if len(ids) >= min_df}
    cov = {}
    for i, s, gl, g in gram_occ:
        if g in dup:
            cov.setdefault(i, set()).update(range(s, s + gl))
    spans = []
    for i, ps in cov.items():
        sp = sorted(ps)
        start = prev = sp[0]
        for p in sp[1:]:
            if p == prev + 1:
                prev = p
                continue
            spans.append((i, start, prev))
            start = prev = p
        spans.append((i, start, prev))
    firsts = {}
    for i, rs, re in sorted(spans):
        firsts.setdefault(" ".join(docs[i][rs : re + 1]), (i, rs))
    dropped = {}
    for i, rs, re in spans:
        if firsts[" ".join(docs[i][rs : re + 1])] != (i, rs):
            dropped.setdefault(i, set()).update(range(rs, re + 1))
    out = {}
    for i, toks in docs.items():
        d = dropped.get(i, set())
        kept = [t for p, t in enumerate(toks) if p not in d]
        out[i] = (len(toks), len(toks) - len(kept), " ".join(kept))
    return out


def test_span_removal_golden(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon unique1"),
        (2, "zzz alpha beta gamma delta epsilon qqq"),  # shares the 5-token run
        (3, "totally unrelated words here now"),
        (4, "   "),
        (6, "tiny doc"),  # whole-doc gram (n < k)
        (7, "tiny doc"),  # cross-doc dup of 6 -> fully removed
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_dropped, r.text_clean)
        for r in remove_duplicate_spans(df, k=3, min_df=2).collect()
    }
    # first occurrence (doc 1) keeps the shared run; doc 2 loses it
    assert got[1] == (6, 0, "alpha beta gamma delta epsilon unique1")
    assert got[2] == (7, 5, "zzz qqq")
    assert got[3] == (5, 0, "totally unrelated words here now")
    assert 4 not in got  # blank docs excluded
    assert got[6] == (2, 0, "tiny doc")
    assert got[7] == (2, 2, "")  # whole doc was the duplicated span
    # differential closes the loop on the same corpus
    assert got == _remove_exact(rows, 3, 2)


@pytest.mark.parametrize("seed,k,min_df", [(31, 3, 2), (32, 4, 3)])
def test_span_removal_matches_bruteforce(spark, seed, k, min_df):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(20)]
    rows = []
    for i in range(50):
        n = rng.randint(0, 18)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    boiler = "copyright terms apply to all content herein always"
    rows.append((100, boiler + " plus unique tail alpha"))
    rows.append((101, boiler + " plus unique tail beta"))
    rows.append((102, "prefix text then " + boiler))
    rows.append((103, boiler))  # the run IS the whole doc
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_dropped, r.text_clean)
        for r in remove_duplicate_spans(df, k=k, min_df=min_df).collect()
    }
    assert got == _remove_exact(rows, k, min_df)


def test_span_removal_min_df_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        remove_duplicate_spans(df, min_df=1)
