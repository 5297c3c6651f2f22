"""Incremental embedding index (dedup/incremental_embedding.py): probe
must equal the full banded self-join's cross pairs, persistence must
replay (planes regenerated from the sidecar), and the probe plan must
broadcast the batch side."""

import math
import random

from open_data_linter_spark.dedup.embedding import embedding_near_duplicates
from open_data_linter_spark.dedup.incremental_embedding import (
    build_embedding_index,
    load_embedding_index,
    match_embeddings_against_index,
    save_embedding_index,
)

DIM = 16
THRESHOLD = 0.9


def _unit(rng):
    v = [rng.gauss(0, 1) for _ in range(DIM)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _perturb(v, rng, eps=0.05):
    w = [x + rng.gauss(0, eps) for x in v]
    n = math.sqrt(sum(x * x for x in w))
    return [x / n for x in w]


def _data(spark):
    rng = random.Random(7)
    corpus_vecs = [_unit(rng) for _ in range(20)]
    corpus = spark.createDataFrame(
        [(i, v) for i, v in enumerate(corpus_vecs)],
        "vec_id long, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [
            (100, _perturb(corpus_vecs[3], rng)),  # near-dup of corpus 3
            (101, corpus_vecs[5]),                 # exact dup of corpus 5
            (102, _unit(rng)),                     # novel
        ],
        "vec_id long, embedding array<double>",
    )
    return corpus, batch


def _params():
    return dict(bands=8, rows_per_band=2, dim=DIM, seed=42)


def test_probe_matches_full_self_join_cross_pairs(spark):
    corpus, batch = _data(spark)
    idx = build_embedding_index(corpus, **_params())
    inc = {
        (r["batch_id"], r["index_id"], r["cos_sim"])
        for r in match_embeddings_against_index(
            batch, idx, threshold=THRESHOLD).collect()
    }
    full = embedding_near_duplicates(
        corpus.unionByName(batch), threshold=THRESHOLD,
        dim=DIM, bands=8, rows_per_band=2,
    ).collect()
    cross = {
        (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]), r["cos_sim"])
        for r in full
        if (r["id_a"] >= 100) != (r["id_b"] >= 100)
    }
    assert inc == cross
    pairs = {(b, i) for b, i, _ in inc}
    assert (100, 3) in pairs and (101, 5) in pairs
    assert not any(b == 102 for b, _ in pairs)


def test_save_load_roundtrip_and_broadcast_plan(spark, tmp_path):
    corpus, batch = _data(spark)
    path = str(tmp_path / "emb_idx")
    save_embedding_index(build_embedding_index(corpus, **_params()), path)
    loaded = load_embedding_index(spark, path)
    assert (loaded.bands, loaded.rows_per_band, loaded.dim, loaded.seed) == (
        8, 2, DIM, 42)
    live = sorted(map(tuple, match_embeddings_against_index(
        batch, build_embedding_index(corpus, **_params()),
        threshold=THRESHOLD).collect()))
    out = match_embeddings_against_index(batch, loaded, threshold=THRESHOLD)
    assert sorted(map(tuple, out.collect())) == live and live
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3


def test_append_folds_batch_into_embedding_index(spark, tmp_path):
    """The ingest loop closes on the embedding axis: after append, a
    later probe matches the appended vectors (banded with the sidecar's
    regenerated plane family) as well as the original corpus."""
    from open_data_linter_spark.dedup.incremental_embedding import (
        append_to_embedding_index,
    )
    import random

    corpus, batch = _data(spark)
    path = str(tmp_path / "emb_idx_grow")
    save_embedding_index(build_embedding_index(corpus, **_params()), path)
    append_to_embedding_index(batch, path)

    rng = random.Random(99)
    batch_vecs = {r["vec_id"]: r["embedding"] for r in batch.collect()}
    corpus_vecs = {r["vec_id"]: r["embedding"] for r in corpus.collect()}
    probe = spark.createDataFrame(
        [
            (200, _perturb(batch_vecs[102], rng)),   # near-dup of APPENDED 102
            (201, _perturb(corpus_vecs[4], rng)),    # near-dup of corpus 4
            (202, _unit(rng)),                       # novel
        ],
        "vec_id long, embedding array<double>",
    )
    pairs = {
        (r["batch_id"], r["index_id"])
        for r in match_embeddings_against_index(
            probe, load_embedding_index(spark, path), threshold=THRESHOLD
        ).collect()
    }
    assert (200, 102) in pairs  # only reachable via the append
    assert (201, 4) in pairs    # original corpus still matches
    assert not any(b == 202 for b, _ in pairs)


def test_append_is_idempotent_on_ids(spark, tmp_path):
    """Replaying an append with the same batch (the crashed-run retry)
    must not double the index rows."""
    from open_data_linter_spark.dedup.incremental_embedding import (
        append_to_embedding_index,
    )

    corpus, batch = _data(spark)
    path = str(tmp_path / "emb_idx_idem")
    save_embedding_index(build_embedding_index(corpus, **_params()), path)
    append_to_embedding_index(batch, path)
    n_bands = spark.read.parquet(f"{path}/bands").count()
    n_vecs = spark.read.parquet(f"{path}/vecs").count()
    append_to_embedding_index(batch, path)  # replay
    assert spark.read.parquet(f"{path}/bands").count() == n_bands
    assert spark.read.parquet(f"{path}/vecs").count() == n_vecs
