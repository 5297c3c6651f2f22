"""Incremental index dedup (dedup/incremental.py): batch-vs-index matches
must equal the full self-join's cross pairs, without rebuilding the corpus."""

from pyspark.sql import functions as F

from open_data_linter_spark.dedup.incremental import (
    append_to_index,
    build_minhash_index,
    load_index,
    match_against_index,
    save_index,
)
from open_data_linter_spark.dedup.minhash import minhash_near_duplicates

CORPUS = [
    (i, f"alpha beta gamma delta epsilon zeta eta theta doc{i} "
        f"unique{i} filler{i % 3} iota kappa")
    for i in range(10)
]
BATCH = [
    # near-dup of corpus doc 3: only the trailing tokens differ
    (100, "alpha beta gamma delta epsilon zeta eta theta doc3 "
          "unique3 filler0 iota CHANGED"),
    # exact duplicate of corpus doc 5 under a new id
    (101, CORPUS[5][1]),
    # novel content, no corpus relative
    (102, "completely different words about rivers mountains and weather "
          "patterns in autumn"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_match_finds_planted_pairs_and_skips_novel(spark):
    idx = build_minhash_index(_df(spark, CORPUS), k=3)
    out = match_against_index(_df(spark, BATCH), idx, threshold=0.5).collect()
    pairs = {(r["batch_id"], r["index_id"]): r["jaccard"] for r in out}
    assert (100, 3) in pairs and pairs[(100, 3)] >= 0.5
    assert pairs[(101, 5)] == 1.0
    assert not any(b == 102 for b, _ in pairs)


def test_parity_with_full_self_join_cross_pairs(spark):
    """The incremental probe must surface exactly the cross pairs the full
    (corpus+batch) self-join surfaces — same banding, same verify."""
    idx = build_minhash_index(_df(spark, CORPUS), k=3)
    inc = {
        (r["batch_id"], r["index_id"], r["jaccard"])
        for r in match_against_index(_df(spark, BATCH), idx,
                                     threshold=0.5).collect()
    }
    full = minhash_near_duplicates(
        _df(spark, CORPUS + BATCH), k=3, threshold=0.5, max_bucket_size=None
    ).collect()
    cross = {
        (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]), r["jaccard"])
        for r in full
        if (r["id_a"] >= 100) != (r["id_b"] >= 100)
    }
    assert inc == cross and inc  # non-vacuous


def test_reingest_same_id_not_self_matched(spark):
    idx = build_minhash_index(_df(spark, CORPUS), k=3)
    reingest = _df(spark, [CORPUS[3]])  # same id, same text
    out = match_against_index(reingest, idx, threshold=0.5).collect()
    assert not any(r["batch_id"] == r["index_id"] for r in out)


def test_save_load_roundtrip_matches_live_index(spark, tmp_path):
    """Parquet-persisted index replays byte-identical: a probe against the
    reloaded index returns exactly the live index's pairs, and the
    params sidecar restores k/n_perm/bands."""
    idx = build_minhash_index(_df(spark, CORPUS), k=3)
    live = sorted(map(tuple, match_against_index(
        _df(spark, BATCH), idx, threshold=0.5).collect()))
    save_index(idx, str(tmp_path / "idx"))
    loaded = load_index(spark, str(tmp_path / "idx"))
    assert (loaded.k, loaded.n_perm, loaded.bands) == (
        idx.k, idx.n_perm, idx.bands)
    reloaded = sorted(map(tuple, match_against_index(
        _df(spark, BATCH), loaded, threshold=0.5).collect()))
    assert reloaded == live and live


def test_append_folds_batch_into_index(spark, tmp_path):
    """The ingest loop closes: after append, a later probe matches against
    the appended docs too (and the original corpus still matches)."""
    path = str(tmp_path / "idx")
    save_index(build_minhash_index(_df(spark, CORPUS), k=3), path)
    append_to_index(_df(spark, BATCH), path)
    # doc 200 is a near-dup of appended doc 102 (novel vs the old corpus)
    probe = _df(spark, [(200, "completely different words about rivers "
                              "mountains and weather patterns in WINTER")])
    out = match_against_index(probe, load_index(spark, path), threshold=0.5)
    pairs = {(r["batch_id"], r["index_id"]) for r in out.collect()}
    assert (200, 102) in pairs
    # the original corpus is still probed: batch doc 100 ~ corpus doc 3
    out2 = match_against_index(_df(spark, [BATCH[0]]),
                               load_index(spark, path), threshold=0.5)
    ids = {r["index_id"] for r in out2.collect()}
    assert 3 in ids


def test_probe_plan_broadcasts_batch_never_shuffles_corpus(spark, tmp_path):
    """With broadcast_batch=True (the default) the corpus index frames are
    scanned but never shuffle-joined: every join in the probe plan is a
    BroadcastHashJoin and no SortMergeJoin / ShuffledHashJoin appears —
    the only exchange is the O(candidates) pair dedup."""
    idx = build_minhash_index(_df(spark, CORPUS), k=3)
    save_index(idx, str(tmp_path / "idx"))
    loaded = load_index(spark, str(tmp_path / "idx"))
    out = match_against_index(_df(spark, BATCH), loaded, threshold=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3


def test_probe_plan_never_rescans_corpus_text(spark):
    """The probe's plan must consume the index frames, not re-shingle the
    corpus: its physical plan references the persisted index caches
    (InMemoryTableScan), and building them exactly once means the
    corpus text column appears only below those cache boundaries."""
    idx = build_minhash_index(_df(spark, CORPUS), k=3)
    out = match_against_index(_df(spark, BATCH), idx, threshold=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan


def test_append_is_idempotent_on_ids(spark, tmp_path):
    """Replaying an append with the same batch (the crashed-run retry)
    must not double the index rows."""
    path = str(tmp_path / "idx_idem")
    save_index(build_minhash_index(_df(spark, CORPUS), k=3), path)
    append_to_index(_df(spark, BATCH), path)
    n_bands = spark.read.parquet(f"{path}/bands").count()
    n_hashed = spark.read.parquet(f"{path}/hashed").count()
    append_to_index(_df(spark, BATCH), path)  # replay
    assert spark.read.parquet(f"{path}/bands").count() == n_bands
    assert spark.read.parquet(f"{path}/hashed").count() == n_hashed
