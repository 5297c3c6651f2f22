"""Synthetic documents corpus for dedup scale evidence
(sources/textsynth.py)."""

from pyspark.sql import functions as F

from open_data_linter_spark.sources.textsynth import synthesize_documents


def test_deterministic_across_partitionings(spark):
    a = synthesize_documents(spark, 100, num_partitions=2).collect()
    b = synthesize_documents(spark, 100, num_partitions=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_planted_pairs_are_neardups_and_found_by_minhash(spark):
    from open_data_linter_spark.dedup.minhash import minhash_near_duplicates

    docs = synthesize_documents(spark, 300, num_partitions=4)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_duplicates(docs, threshold=0.7).collect()
    }
    planted = {(b, b + 1) for b in range(0, 299, 10)}
    assert planted <= pairs                 # full recall on planted pairs
    extras = pairs - planted
    assert len(extras) <= len(planted) * 0.1  # ~no spurious pairs


def test_pair_texts_differ_only_at_tail(spark):
    docs = synthesize_documents(spark, 12, num_partitions=1)
    rows = {r["doc_id"]: r for r in docs.collect()}
    a, b = rows[0]["text"].split(), rows[1]["text"].split()
    assert len(a) == len(b)
    assert a[:-3] == b[:-3] and a[-3:] != b[-3:]
    assert rows[1]["is_dup"] and not rows[0]["is_dup"]
    # non-pair docs share essentially nothing
    c = set(rows[5]["text"].split())
    assert len(set(a) & c) <= 2
