"""APSS prefix-filter exactness: output must equal brute-force all-pairs."""

import itertools
import math
import random

import pytest
from pyspark.sql import functions as F

from open_data_linter_spark.dedup.apss import apss_jaccard_pairs


def _round6(x: float) -> float:
    # mirror Spark's HALF_UP F.round for non-negative values
    return math.floor(x * 1e6 + 0.5) / 1e6


def _exact_pairs(rows, threshold):
    sets = {i: set(t.lower().split()) for i, t in rows if t.strip()}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter == 0:
            continue
        j = inter / len(sets[a] | sets[b])
        # unrounded threshold filter, rounded reported value (engine parity)
        if j >= threshold:
            out[(a, b)] = _round6(j)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "the quick brown fox jumps over the lazy cat"),
        (4, "The  quick brown fox jumps over the lazy dog"),
        (5, "completely different words entirely unrelated content here"),
        (6, "spark engine validation rules audio transcript table"),
        (7, "spark engine validation rules audio transcript column"),
        (8, ""),
        (9, "   "),
        (10, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_apss_golden(docs):
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in apss_jaccard_pairs(docs, threshold=0.5).collect()
    }
    # 1/2/4 identical token sets; 3 swaps one of 8 distinct tokens
    # (inter 7 / union 9); 6 vs 7 swap one of 7 (inter 6 / union 8)
    assert got[(1, 2)] == 1.0 and got[(1, 4)] == 1.0 and got[(2, 4)] == 1.0
    assert got[(1, 3)] == pytest.approx(7 / 9, abs=1e-6)
    assert got[(6, 7)] == pytest.approx(0.75)
    assert not any(5 in p or 8 in p or 9 in p or 10 in p for p in got)


@pytest.mark.parametrize("seed,threshold", [(11, 0.3), (12, 0.6), (13, 0.85)])
def test_apss_matches_bruteforce(spark, seed, threshold):
    """Prefix filtering is LOSSLESS: random corpora, exact comparison."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(30):
        n = rng.randint(1, 12)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # plant a few near-dups so high thresholds aren't vacuous
    rows.append((100, rows[0][1] + " extra"))
    rows.append((101, rows[1][1]))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in apss_jaccard_pairs(df, threshold=threshold).collect()
    }
    want = _exact_pairs(rows, threshold)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=5e-7)


def test_apss_threshold_validation(docs):
    with pytest.raises(ValueError):
        apss_jaccard_pairs(docs, threshold=0.0)
    with pytest.raises(ValueError):
        apss_jaccard_pairs(docs, threshold=1.5)


@pytest.mark.parametrize("seed,threshold", [(21, 0.3), (22, 0.7)])
def test_apss_large_vocab_general_path(spark, seed, threshold):
    """Same losslessness over a vocabulary ABOVE the bitmask cap, so the
    general hashed-array path runs (round 6 added a small-vocabulary
    bitmask branch; this pins the branch the small fixtures no longer
    exercise)."""
    from open_data_linter_spark.dedup import apss as apss_mod

    rng = random.Random(seed)
    vocab = [f"tok{i:04d}" for i in range(apss_mod._V_CAP + 40)]
    rows = []
    for i in range(40):
        n = rng.randint(1, 15)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    rows.append((200, rows[2][1]))  # identical-set pair
    rows.append((201, rows[3][1] + " tok0000"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in apss_jaccard_pairs(df, threshold=threshold).collect()
    }
    want = _exact_pairs(rows, threshold)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=5e-7)
