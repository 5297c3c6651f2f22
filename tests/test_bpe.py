"""BPE training/encoding vs an independent pure-Python reference."""

from collections import Counter

import pytest

from open_data_linter_spark.functions.bpe import (
    EOW,
    bpe_encode,
    bpe_merges_df,
    bpe_train,
)

# ---------------------------------------------------------------- reference


def ref_word_counts(texts):
    c = Counter()
    for t in texts:
        for w in (t or "").lower().split():
            c[w] += 1
    return c


def ref_apply(syms, left, right):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (left, right):
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def ref_train(texts, n_merges, min_pair_count=2):
    wc = ref_word_counts(texts)
    vocab = {w: list(w) + [EOW] for w in wc}
    merges = []
    for rank in range(1, n_merges + 1):
        pc = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((rank, left, right, cnt))
        vocab = {w: ref_apply(s, left, right) for w, s in vocab.items()}
    return merges, vocab


def ref_encode(text, merges):
    toks = []
    for w in (text or "").lower().split():
        syms = list(w) + [EOW]
        for _, left, right, _ in merges:
            syms = ref_apply(syms, left, right)
        toks.extend(syms)
    return toks


# ------------------------------------------------------------------- corpus

TEXTS = [
    "low lower lowest low low",
    "new newer newest new news",
    "widest wide wider new low",
    "the newer the better the widest",
    "低い 低く 低い low low",  # unicode chars symbolize per-character
    "",
    "   ",
    "lowlowlow newnew estest",
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_train_matches_reference(corpus):
    got = bpe_train(corpus, n_merges=12)
    want, _ = ref_train(TEXTS, 12)
    assert got == want


def test_merges_df_shape(corpus):
    df = bpe_merges_df(corpus, n_merges=5)
    rows = df.collect()
    want, _ = ref_train(TEXTS, 5)
    assert [tuple(r) for r in rows] == want
    assert [r.merge_rank for r in rows] == [1, 2, 3, 4, 5]


def test_tie_break_total_order(spark):
    # (a,b) and (c,d) tie on count 2, as do the EOW pairs; winner must be
    # the lexicographically smallest (left, right) at each count level
    df = spark.createDataFrame(
        [(0, "ab ab cd cd")], "doc_id long, text string"
    )
    got = bpe_train(df, n_merges=2, min_pair_count=1)
    want, _ = ref_train(["ab ab cd cd"], 2, min_pair_count=1)
    assert got == want
    assert got[0][1:3] == ("a", "b")


def test_min_pair_count_early_stop(corpus):
    got = bpe_train(corpus, n_merges=50, min_pair_count=8)
    want, _ = ref_train(TEXTS, 50, min_pair_count=8)
    assert got == want
    assert 0 < len(got) < 50


def test_empty_corpus(spark):
    df = spark.createDataFrame([(0, ""), (1, None)], "doc_id long, text string")
    assert bpe_train(df, n_merges=3) == []


def test_encode_matches_reference(corpus):
    merges = bpe_train(corpus, n_merges=10)
    out = {
        r.doc_id: r.bpe_tokens
        for r in bpe_encode(corpus, merges).select("doc_id", "bpe_tokens").collect()
    }
    for i, t in enumerate(TEXTS):
        assert out[i] == ref_encode(t, merges), (i, t)


def test_encode_reproduces_training_symbolization(corpus):
    """Encoding a training word with the full merge list must yield the
    word's final training-table symbols (training and encoding share the
    same greedy-per-rank semantics)."""
    merges = bpe_train(corpus, n_merges=12)
    _, final_vocab = ref_train(TEXTS, 12)
    spark = corpus.sparkSession
    words = spark.createDataFrame(
        [(w,) for w in final_vocab], "text string"
    )
    got = {
        r.text: r.bpe_tokens
        for r in bpe_encode(words, merges).collect()
    }
    for w, syms in final_vocab.items():
        assert got[w] == syms, w


def test_bad_n_merges(corpus):
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(corpus, n_merges=0)


def test_driver_and_distributed_paths_agree(corpus):
    """The collected driver-side merge loop and the distributed per-round
    loop are the same algorithm — byte-identical merge lists."""
    driver = bpe_train(corpus, n_merges=12)
    dist = bpe_train(corpus, n_merges=12, driver_word_cap=0)
    want, _ = ref_train(TEXTS, 12)
    assert driver == dist == want
    # early-stop parity on both paths
    d2 = bpe_train(corpus, n_merges=50, min_pair_count=8)
    x2 = bpe_train(corpus, n_merges=50, min_pair_count=8, driver_word_cap=0)
    assert d2 == x2


def test_driver_path_constant_job_count(corpus):
    """Driver-side training is one probe + one collect — Spark job count
    must NOT scale with n_merges (the round-4 weakness was one shuffle +
    one checkpoint job per merge round)."""
    sc = corpus.sparkSession.sparkContext

    def jobs_for(tag, n_merges):
        sc.setJobGroup(tag, "driver-side train")
        try:
            got = bpe_train(corpus, n_merges=n_merges, min_pair_count=1)
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        return got, len(sc.statusTracker().getJobIdsForGroup(tag))

    got2, j2 = jobs_for("bpe-jobs-2", 2)
    got20, j20 = jobs_for("bpe-jobs-20", 20)
    # AQE may split the probe/collect queries into a few jobs, but the
    # count must be invariant in n_merges (the round-4 weakness was one
    # shuffle + one checkpoint job PER merge round)
    assert j20 == j2, (j2, j20)
    assert len(got20) == 20 and got20[:2] == got2


def test_driver_trainer_fuzz_vs_reference():
    """Seeded fuzz of the incremental neighbor-delta trainer against the
    naive recount reference — tiny alphabets maximize overlapping chains
    ('aaaa', 'abab'), the hard cases for delta accounting. Pure-Python,
    no Spark."""
    import random

    from open_data_linter_spark.functions.bpe import _train_driver_side

    rng = random.Random(12345)
    for trial in range(40):
        alphabet = "ab" if trial % 2 else "abc"
        words: dict[str, int] = {}
        for _ in range(rng.randint(1, 40)):
            w = "".join(
                rng.choice(alphabet) for _ in range(rng.randint(1, 9))
            )
            words[w] = words.get(w, 0) + rng.randint(1, 5)
        texts = [" ".join([w] * c) for w, c in words.items()]
        got = _train_driver_side(list(words.items()), 25, 1)
        want, _ = ref_train(texts, 25, min_pair_count=1)
        assert got == want, (trial, words, got, want)
