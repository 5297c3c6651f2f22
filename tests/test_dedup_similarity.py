"""Dedup + similarity operator tests with hand-crafted golden sets."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),          # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),          # near dup of 1
        (4, "The  quick brown fox jumps over the lazy dog"),         # dup after normalize
        (5, "completely different words entirely unrelated content here"),
        (6, "spark engine validation rules audio transcript table"),
        (7, "spark engine validation rules audio transcript column"),  # near dup of 6
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    from open_data_linter_spark.dedup.exact import exact_duplicates

    got = exact_duplicates(docs).collect()
    assert len(got) == 1
    assert got[0].dup_count == 3  # 1, 2, and 4 (normalized)
    assert got[0].doc_ids == [1, 2, 4]


def test_exact_duplicates_unnormalized(docs):
    from open_data_linter_spark.dedup.exact import exact_duplicates

    got = exact_duplicates(docs, normalized=False).collect()
    assert len(got) == 1 and got[0].doc_ids == [1, 2]


def test_distinct_by_fingerprint(docs):
    from open_data_linter_spark.dedup.exact import distinct_by_fingerprint

    kept = {r.doc_id for r in distinct_by_fingerprint(docs).collect()}
    assert kept == {1, 3, 5, 6, 7}


def test_ngram_jaccard(docs):
    from open_data_linter_spark.dedup.jaccard import ngram_jaccard_pairs

    pairs = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, k=3, threshold=0.5).collect()}
    assert (1, 2) in pairs and (1, 4) in pairs and (2, 4) in pairs
    assert (1, 3) in pairs  # 1-word change in 9 -> high trigram overlap? verify >=0.5
    assert not any(5 in p for p in pairs)


def test_minhash_near_duplicates(docs):
    from open_data_linter_spark.dedup.minhash import minhash_near_duplicates

    got = minhash_near_duplicates(docs, k=3, threshold=0.5)
    pairs = {(r.id_a, r.id_b): r.jaccard for r in got.collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (6, 7) in pairs or (1, 3) in pairs  # near dups surface via LSH
    assert not any(5 in p for p in pairs)


def test_minhash_permutations_vary(spark):
    """Round-4 regression: the 64 permutations must be DISTINCT hash
    functions. PySpark binds a two-parameter transform lambda to
    (element, array_index), so a ``lambda h, i=i`` salt capture silently
    collapsed every permutation to the same expression — signature
    agreement became all-or-nothing (0/64 or 64/64) and LSH recall
    degenerated from 1-(1-J^r)^b to J (two jaccard-0.97 pairs missed at
    sf0.01)."""
    from open_data_linter_spark.dedup.minhash import minhash_signature

    row = (
        spark.createDataFrame(
            [("a b c d e f g h i j",)], "text string"
        )
        .select(
            minhash_signature(
                F.split(F.col("text"), " "), n_perm=32
            ).alias("sig")
        )
        .collect()[0]
    )
    # 32 independent permutations over 10 elements: all-equal is the bug;
    # genuinely independent mins collide only by hash coincidence
    assert len(set(row.sig)) >= 30


def test_minhash_banding_recall_not_single_hash(spark):
    """With distinct permutations, a J≈0.9 pair misses a b=16,r=4 banding
    with p≈1e-8 — generate 40 such pairs and require 100% found (the
    collapsed-signature bug dropped ~10% of them, P(find)=J)."""
    import numpy as np

    from open_data_linter_spark.dedup.minhash import minhash_near_duplicates

    rng = np.random.default_rng(99)
    rows = []
    vocab = [f"w{t}" for t in range(500)]
    for i in range(40):
        toks = list(rng.choice(vocab, size=60, replace=False))
        mutated = list(toks)
        mutated[int(rng.integers(1, 59))] = f"x{i}"  # one-token edit
        rows.append((2 * i, " ".join(toks)))
        rows.append((2 * i + 1, " ".join(mutated)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b) for r in
           minhash_near_duplicates(df, k=2, threshold=0.5).collect()}
    planted = {(2 * i, 2 * i + 1) for i in range(40)}
    assert planted <= got, f"missed {sorted(planted - got)}"


def test_minhash_duplicate_id_rows_no_self_pairs(spark):
    """Duplicate id rows sort adjacent in a bucket member list; the pair
    expansion must never emit (x, x) self-pairs (ADVICE r3)."""
    from open_data_linter_spark.dedup.minhash import minhash_near_duplicates

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # same id twice
        (2, "the quick brown fox jumps over the lazy dog"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = minhash_near_duplicates(df, k=3, threshold=0.5).collect()
    assert all(r.id_a != r.id_b for r in got)
    assert {(r.id_a, r.id_b) for r in got} == {(1, 2)}


def test_simhash_near_duplicates(docs):
    from open_data_linter_spark.dedup.simhash import simhash_near_duplicates

    got = {(r.id_a, r.id_b) for r in simhash_near_duplicates(docs, max_hamming=4).collect()}
    assert (1, 2) in got and (1, 4) in got  # same token multiset -> distance 0
    assert not any(5 in p for p in got)


def test_simhash_empty_docs_excluded(spark):
    """Empty/whitespace-only docs were absent from the former
    explode+groupBy signature output; the Arrow projection path must keep
    that contract (an all-zero signature would otherwise pair every empty
    doc with every other empty doc at hamming 0)."""
    from open_data_linter_spark.dedup.simhash import (
        simhash_near_duplicates,
        simhash_signatures,
    )

    rows = [
        (1, "aaa bbb ccc ddd eee"),
        (2, "aaa bbb ccc ddd eee"),
        (3, ""),
        (4, "   "),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r.id for r in simhash_signatures(df).collect()}
    assert sigs == {1, 2}
    got = {(r.id_a, r.id_b) for r in simhash_near_duplicates(df).collect()}
    assert got == {(1, 2)}


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    rows = []
    for i in range(20):
        if i == 1:
            v = base + rng.standard_normal(16) * 0.01   # near-dup of 0
        elif i == 2:
            v = -base                                   # anti-correlated
        else:
            v = rng.standard_normal(16)
        rows.append((i, [float(x) for x in (v if i != 0 else base)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_embedding_near_duplicates(vectors):
    from open_data_linter_spark.dedup.embedding import embedding_near_duplicates

    got = embedding_near_duplicates(
        vectors, threshold=0.95, strategy="brute"
    ).collect()
    assert [(r.id_a, r.id_b) for r in got] == [(0, 1)]


def test_embedding_brute_path_requires_opt_in(vectors):
    """VERDICT r3 #3: default params must never silently plan the O(n²)
    self-cross-join — the brute baseline is an explicit opt-in."""
    import pytest as _pytest

    from open_data_linter_spark.dedup.embedding import embedding_near_duplicates

    with _pytest.raises(ValueError, match="brute"):
        embedding_near_duplicates(vectors, threshold=0.95)
    # the scale path stays the default shape: pure hash joins
    banded = embedding_near_duplicates(
        vectors, threshold=0.95, dim=16, bands=8, rows_per_band=2
    )
    plan = banded._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan


def test_brute_force_topk(vectors):
    from open_data_linter_spark.similarity.knn import brute_force_topk

    q = vectors.where(F.col("vec_id") == 0)
    got = brute_force_topk(vectors, q, k=3).collect()
    assert got[0].neighbor_id == 1 and got[0].rank == 1  # near-dup ranks first
    assert len(got) == 3
    assert all(r.query_id == 0 for r in got)


def test_lsh_topk_finds_neardup(vectors):
    from open_data_linter_spark.similarity.knn import lsh_topk

    q = vectors.where(F.col("vec_id") == 0)
    got = lsh_topk(vectors, q, k=3, bits=6, dim=16).collect()
    # the 0.99-cosine neighbor is in the same bucket (or a 1-bit probe)
    assert any(r.neighbor_id == 1 and r.rank == 1 for r in got)


def test_lsh_topk_null_vectors(spark, vectors):
    """A NULL embedding anywhere must be skipped, not crash the signature
    UDF (ADVICE r2: np.stack raises on None in bucket_signatures)."""
    from open_data_linter_spark.similarity.knn import lsh_topk

    withnull = vectors.union(
        spark.createDataFrame([(99, None)], vectors.schema)
    )
    q = withnull.where(F.col("vec_id").isin(0, 99))
    got = lsh_topk(withnull, q, k=3, bits=6, dim=16).collect()
    assert any(r.neighbor_id == 1 and r.rank == 1 for r in got)
    assert all(r.query_id == 0 for r in got)  # null query contributes nothing
    assert all(r.neighbor_id != 99 for r in got)


def test_embedding_near_duplicates_banded_lsh(vectors):
    """Banded-LSH scale path must find the same pairs as brute at high
    threshold, with a pure hash-join plan (no BroadcastNestedLoopJoin)."""
    from open_data_linter_spark.dedup.embedding import embedding_near_duplicates

    banded = embedding_near_duplicates(
        vectors, threshold=0.95, dim=16, bands=8, rows_per_band=2
    )
    plan = banded._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan
    assert [(r.id_a, r.id_b) for r in banded.collect()] == [(0, 1)]


def test_banded_embedding_recall_danger_zone(spark):
    """Adversarial recall fixture (VERDICT r2 #5): plant pairs with cosine
    in [0.45, 0.50] — the band-miss danger zone for the driver's r=2, b=16
    params, where per-pair collision probability is lowest — and pin
    measured recall vs the exact brute path ≥ 0.99 (theory: miss prob
    ≈ (1-p^2)^16 ≈ 1.6e-4 at cos 0.45)."""
    import numpy as np

    from open_data_linter_spark.dedup.embedding import embedding_near_duplicates

    rng = np.random.default_rng(52)
    dim, n_pairs = 64, 200
    rows = []
    for i in range(n_pairs):
        u = rng.standard_normal(dim)
        u /= np.linalg.norm(u)
        w = rng.standard_normal(dim)
        w -= (w @ u) * u
        w /= np.linalg.norm(w)
        c = rng.uniform(0.45, 0.50)
        v = c * u + np.sqrt(1 - c * c) * w
        rows.append((2 * i, [float(x) for x in u]))
        rows.append((2 * i + 1, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    brute = {(r.id_a, r.id_b) for r in
             embedding_near_duplicates(
                 df, threshold=0.45, strategy="brute").collect()}
    banded = {(r.id_a, r.id_b) for r in embedding_near_duplicates(
        df, threshold=0.45, dim=dim, bands=16, rows_per_band=2
    ).collect()}
    assert len(brute) >= n_pairs  # every planted pair is in the zone
    assert not banded - brute  # exact verify: no false positives
    recall = len(banded & brute) / len(brute)
    assert recall >= 0.99, f"recall {recall:.4f} over {len(brute)} pairs"


def test_multitable_lsh_recall_floor(spark):
    """Multi-table LSH recall vs brute on the sf0.01 embeddings (seeded
    planes => deterministic): the driver golden relies on ≥ 0.9."""
    from open_data_linter_spark.similarity.knn import brute_force_topk, lsh_topk

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = e.where(F.col("vec_id") < 8)
    brute = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(e, q, k=5).collect()}
    lsh = {(r.query_id, r.neighbor_id)
           for r in lsh_topk(e, q, k=5, bits=6, dim=64, tables=8).collect()}
    assert len(brute & lsh) / len(brute) >= 0.9


def test_ivf_train_sample_covers_skewed_layout(spark):
    """VERDICT r3 #2: with vectors SORTED by cluster (first partitions hold
    one cluster only — the ingestion-ordered 100 TB layout), the k-means
    training sample must still cover every cluster. The old ``.limit()``
    drained the first partitions, training all centroids on cluster 0."""
    import numpy as np

    from open_data_linter_spark.similarity.knn import train_centroids

    rng = np.random.default_rng(11)
    dim, per, k = 16, 400, 4
    centers = rng.standard_normal((k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, i = [], 0
    for c in range(k):  # cluster-major order => partition-skewed layout
        for _ in range(per):
            v = centers[c] + rng.standard_normal(dim) * 0.05
            rows.append((i, [float(x) for x in v]))
            i += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartitionByRange(8, "vec_id")  # id-ordered partitions, 2 per cluster
    cents = train_centroids(df, n_cells=8, train_size=100, seed=42)
    # every true cluster center must be closely represented by a centroid;
    # a first-partitions-only sample leaves clusters 1-3 near-orthogonal to
    # every centroid (random 16-dim cosine << 0.9)
    best = (centers @ np.asarray(cents).T).max(axis=1)
    assert (best > 0.9).all(), best


def test_ivf_topk(vectors):
    from open_data_linter_spark.similarity.knn import brute_force_topk, ivf_topk

    q = vectors.where(F.col("vec_id") < 4)
    got = ivf_topk(vectors, q, k=3, n_cells=4, nprobe=2, train_size=20)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan
    rows = got.collect()
    # the 0.99-cosine neighbor of query 0 must share its cell
    assert any(r.query_id == 0 and r.neighbor_id == 1 and r.rank == 1 for r in rows)
    # recall floor vs brute with half the cells probed
    brute = {(r.query_id, r.neighbor_id) for r in brute_force_topk(vectors, q, k=3).collect()}
    ivf = {(r.query_id, r.neighbor_id) for r in rows}
    assert len(brute & ivf) / len(brute) >= 0.5
