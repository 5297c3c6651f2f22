"""SemDeDup (k-means cells + in-cell greedy) — planted groups + a full
numpy differential replay of the greedy pass from the operator's own cell
assignments."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_data_linter_spark.dedup.semdedup import ROUND, semdedup, semdeduplicate

DIM = 16
THRESH = 0.9


def _planted_rows(rng):
    """4 well-separated direction groups (in-group cosine ~0.99) + 8
    isotropic singletons. Returns [(vec_id, embedding)], group map."""
    rows, groups = [], {}
    base = rng.normal(size=(4, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vid = 0
    for g, sizes in enumerate([3, 3, 2, 4]):
        for _ in range(sizes):
            v = base[g] + rng.normal(scale=0.03, size=DIM)
            rows.append((vid, [float(x) for x in v]))
            groups[vid] = g
            vid += 1
    for _ in range(8):
        v = rng.normal(size=DIM)
        rows.append((vid, [float(x) for x in v]))
        groups[vid] = None
        vid += 1
    return rows, groups


@pytest.fixture(scope="module")
def planted(spark):
    rows, groups = _planted_rows(np.random.default_rng(7))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, groups


@pytest.fixture(scope="module")
def verdicts(spark, planted):
    df, _ = planted
    return semdedup(
        df, threshold=THRESH, n_cells=6, train_size=1000, seed=11
    ).collect()


def test_groups_collapse_to_one_survivor(verdicts, planted):
    _, groups = planted
    for g in range(4):
        members = [r for r in verdicts if groups[r.vec_id] == g]
        kept = [r for r in members if r.keep]
        assert len(kept) == 1, f"group {g}: {members}"
        # dropped members point at the survivor with the in-group cosine
        for r in members:
            if not r.keep:
                assert r.dup_of == kept[0].vec_id
                assert r.dup_sim >= THRESH
    # isotropic singletons in 16-dim rarely reach cos 0.9; all kept
    singles = [r for r in verdicts if groups[r.vec_id] is None]
    assert all(r.keep for r in singles)


def test_survivor_is_farthest_from_centroid(verdicts, planted):
    _, groups = planted
    for g in range(4):
        members = [r for r in verdicts if groups[r.vec_id] == g]
        by_cell = {}
        for r in members:
            by_cell.setdefault(r.cell, []).append(r)
        for cell_members in by_cell.values():
            kept = [r for r in cell_members if r.keep]
            if len(cell_members) > 1 and len(kept) == 1:
                lo = min(cell_members, key=lambda r: (r.centroid_sim, r.vec_id))
                assert kept[0].vec_id == lo.vec_id


def test_kept_set_pairwise_dissimilar_within_cell(verdicts, planted):
    df, _ = planted
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in df.collect()}
    for v in vecs.values():
        v /= np.linalg.norm(v)
    by_cell = {}
    for r in verdicts:
        if r.keep:
            by_cell.setdefault(r.cell, []).append(r.vec_id)
    for ids in by_cell.values():
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                assert round(float(vecs[a] @ vecs[b]), ROUND) < THRESH


def test_dropped_leader_is_kept_same_cell(verdicts):
    kept = {(r.vec_id, r.cell) for r in verdicts if r.keep}
    for r in verdicts:
        if not r.keep:
            assert (r.dup_of, r.cell) in kept
            assert r.dup_sim is not None and r.dup_sim >= THRESH
        else:
            assert r.dup_of is None and r.dup_sim is None


def test_numpy_differential_replay(verdicts, planted):
    """Replay the greedy pass in plain numpy from the operator's OWN cell
    assignments + the raw vectors; keep/dup_of/dup_sim must byte-agree."""
    df, _ = planted
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in df.collect()}
    for v in vecs.values():
        v /= np.linalg.norm(v)
    by_cell = {}
    for r in verdicts:
        by_cell.setdefault(r.cell, []).append(r)
    for members in by_cell.values():
        members.sort(key=lambda r: (r.centroid_sim, r.vec_id))
        kept_ids = []
        for r in members:
            sims = {k: round(float(vecs[k] @ vecs[r.vec_id]), ROUND) for k in kept_ids}
            best = max(sims.values(), default=-1.0)
            if best >= THRESH:
                leader = min(k for k, s in sims.items() if s == best)
                assert (r.keep, r.dup_of, round(r.dup_sim, ROUND)) == (
                    False,
                    leader,
                    best,
                ), r
            else:
                assert r.keep, r
                kept_ids.append(r.vec_id)


def test_determinism(spark, planted, verdicts):
    df, _ = planted
    again = semdedup(df, threshold=THRESH, n_cells=6, train_size=1000, seed=11).collect()
    key = lambda r: r.vec_id  # noqa: E731
    assert sorted(again, key=key) == sorted(verdicts, key=key)


def test_semdeduplicate_keeps_nulls_and_drops_losers(spark, planted, verdicts):
    df, _ = planted
    with_null = df.unionByName(
        spark.createDataFrame([(999, None)], df.schema)
    )
    kept = semdeduplicate(
        with_null, threshold=THRESH, n_cells=6, train_size=1000, seed=11
    )
    got = {r.vec_id for r in kept.select("vec_id").collect()}
    want = {r.vec_id for r in verdicts if r.keep} | {999}
    assert got == want


def test_tiny_corpus_fewer_rows_than_cells(spark):
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semdedup(df, threshold=0.9, n_cells=16, train_size=100).collect()
    assert len(out) == 3 and all(r.keep for r in out)


def test_max_cell_guard(spark, planted):
    df, _ = planted
    with pytest.raises(Exception, match="max_cell"):
        semdedup(df, threshold=THRESH, n_cells=1, train_size=100, max_cell=4).collect()


def test_bad_threshold(planted):
    df, _ = planted
    with pytest.raises(ValueError, match="threshold"):
        semdedup(df, threshold=0.0)
