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


def test_mixture_sample_weights_quotas(corpus):
    from open_data_linter_spark.functions.sampling import mixture_sample

    # 600 rows: 200 per lang. weights 0.5/0.3/0.2, total 300 ->
    # en 150, es 90, ja 60 (none saturated)
    got = (
        mixture_sample(corpus, "lang", "doc_id", total=300,
                       weights={"en": 0.5, "es": 0.3, "ja": 0.2})
        .groupBy("lang").count().collect()
    )
    assert {(r.lang, r["count"]) for r in got} == {
        ("en", 150), ("es", 90), ("ja", 60)}


def test_mixture_sample_saturation_and_exclusion(corpus):
    from open_data_linter_spark.functions.sampling import mixture_sample

    # en quota floor(1000*0.8)=800 > 200 available -> capped at 200;
    # ja absent from weights -> quota 0 (no rows)
    got = dict(
        (r.lang, r["count"])
        for r in mixture_sample(corpus, "lang", "doc_id", total=1000,
                                weights={"en": 0.8, "es": 0.2})
        .groupBy("lang").count().collect()
    )
    assert got == {"en": 200, "es": 200}


def test_mixture_sample_alpha_deterministic(corpus):
    from open_data_linter_spark.functions.sampling import mixture_sample

    # equal group sizes (200 each): p_g = 1/3 for any alpha ->
    # floor(240/3) = 80 per lang
    a = mixture_sample(corpus, "lang", "doc_id", total=240, alpha=0.5)
    got = {(r.lang, r["count"]) for r in a.groupBy("lang").count().collect()}
    assert got == {("en", 80), ("es", 80), ("ja", 80)}
    # replay-stable row selection, and a subset of the stratified order
    s1 = sorted(r.doc_id for r in a.collect())
    s2 = sorted(r.doc_id for r in
                mixture_sample(corpus, "lang", "doc_id", total=240,
                               alpha=0.5).collect())
    assert s1 == s2


def test_mixture_sample_alpha_upsamples_low_resource(spark):
    from open_data_linter_spark.functions.sampling import mixture_sample

    # skewed corpus: 400 en / 25 ja (perfect squares -> exact sqrt doubles).
    # alpha=0.5: p_en = 20/25, p_ja = 5/25 -> quotas 80 / 20 of total 100:
    # ja share rises from 5.9% of the corpus to 20% of the sample
    rows = [(i, "en", f"d{i}") for i in range(400)]
    rows += [(1000 + i, "ja", f"j{i}") for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = dict(
        (r.lang, r["count"])
        for r in mixture_sample(df, "lang", "doc_id", total=100, alpha=0.5)
        .groupBy("lang").count().collect()
    )
    assert got == {"en": 80, "ja": 20}


def test_mixture_sample_validation(corpus):
    from open_data_linter_spark.functions.sampling import mixture_sample

    with pytest.raises(ValueError):
        mixture_sample(corpus, "lang", "doc_id", total=10)
    with pytest.raises(ValueError):
        mixture_sample(corpus, "lang", "doc_id", total=10,
                       weights={"en": 1.0}, alpha=0.5)
    with pytest.raises(ValueError):
        mixture_sample(corpus, "lang", "doc_id", total=0, weights={"en": 1.0})
