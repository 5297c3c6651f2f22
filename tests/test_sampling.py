"""Deterministic sampling primitives."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, ["en", "es", "ja"][i % 3], f"doc {i}") for i in range(600)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_hash_fraction_sample_deterministic_and_sized(corpus):
    from open_data_linter_spark.functions.sampling import hash_fraction_sample

    s1 = {r.doc_id for r in hash_fraction_sample(corpus, 0.25, "doc_id").collect()}
    s2 = {r.doc_id for r in hash_fraction_sample(corpus, 0.25, "doc_id").collect()}
    assert s1 == s2  # replay-stable
    assert 600 * 0.25 * 0.6 < len(s1) < 600 * 0.25 * 1.5  # ~Binomial(600, .25)
    # nested: a smaller fraction with the same seed is a SUBSET (threshold
    # semantics) — stable train/validation splits depend on this
    s_small = {r.doc_id for r in hash_fraction_sample(corpus, 0.1, "doc_id").collect()}
    assert s_small <= s1
    # different seed ⇒ different (overlapping but not equal) selection
    s_seed = {r.doc_id for r in
              hash_fraction_sample(corpus, 0.25, "doc_id", seed=7).collect()}
    assert s_seed != s1
    # bounds
    assert hash_fraction_sample(corpus, 0.0, "doc_id").count() == 0
    assert hash_fraction_sample(corpus, 1.0, "doc_id").count() == 600


def test_hash_fraction_sample_no_shuffle(corpus):
    from open_data_linter_spark.functions.sampling import hash_fraction_sample

    plan = (
        hash_fraction_sample(corpus, 0.5, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure filter


def test_stratified_sample_exact_per_group(corpus):
    from open_data_linter_spark.functions.sampling import stratified_sample

    got = stratified_sample(corpus, "lang", 50, "doc_id")
    counts = {r.lang: r.n for r in
              got.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"en": 50, "es": 50, "ja": 50}
    # deterministic replay
    a = sorted(r.doc_id for r in got.collect())
    b = sorted(r.doc_id for r in
               stratified_sample(corpus, "lang", 50, "doc_id").collect())
    assert a == b
    # groups smaller than n survive whole
    tiny = corpus.where(F.col("doc_id") < 4)  # en:2, es:1, ja:1
    tc = {r.lang: r.n for r in
          stratified_sample(tiny, "lang", 50, "doc_id")
          .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert tc == {"en": 2, "es": 1, "ja": 1}


def test_stratified_two_phase_equals_one_phase(corpus):
    """The documented skew recipe: hash pre-filter then exact window ==
    straight window, because both order by the SAME hash expression."""
    from open_data_linter_spark.functions.sampling import (
        hash_fraction_sample,
        stratified_sample,
    )

    one = sorted(r.doc_id for r in
                 stratified_sample(corpus, "lang", 20, "doc_id").collect())
    pre = hash_fraction_sample(corpus, 0.5, "doc_id")  # keeps ≥ 20 per group
    two = sorted(r.doc_id for r in
                 stratified_sample(pre, "lang", 20, "doc_id").collect())
    assert one == two
