"""Sharded export sink: assignment determinism + python-md5 twin, one
file per shard, manifest order-independence, tamper detection."""

import glob
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from open_data_linter_spark.functions.text import java_ws_tokens
from open_data_linter_spark.sources.shards import (
    export_shards,
    shard_assignments,
    shard_manifest,
    verify_shards,
)

DOCS = [
    (0, "alpha beta gamma", "src0"),
    (1, "delta epsilon", "src0"),
    (2, "zeta eta theta iota", "src1"),
    (3, "", "src1"),
    (4, None, "src1"),
    (5, "kappa", "src2"),
    (6, "lambda mu nu xi omicron", "src2"),
    (7, "pi rho sigma", "src2"),
]


def _shard_py(doc_id, n, salt=""):
    h = hashlib.md5((salt + str(doc_id)).encode()).hexdigest()
    return int(h[:15], 16) % n


def _fp_py(rows):
    fp = 0
    for doc_id, text in rows:
        h = hashlib.md5(
            (str(doc_id) + ":" + (text or "")).encode()
        ).hexdigest()
        fp ^= int(h[:15], 16)
    return fp


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, source string"
    ).repartition(4)


def test_assignment_matches_md5_twin_and_is_salted(spark, docs):
    got = {
        r["doc_id"]: r["shard"]
        for r in shard_assignments(docs, 5).collect()
    }
    assert got == {d: _shard_py(d, 5) for d, _, _ in DOCS}
    salted = {
        r["doc_id"]: r["shard"]
        for r in shard_assignments(docs, 5, salt="epoch1").collect()
    }
    assert salted == {d: _shard_py(d, 5, "epoch1") for d, _, _ in DOCS}
    assert salted != got  # independent placement per salt


def test_assignment_is_shuffle_free(spark):
    flat = spark.createDataFrame(
        DOCS, "doc_id long, text string, source string"
    )
    plan = (
        shard_assignments(flat, 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_manifest_matches_python_twin(spark, docs):
    n = 3
    m = {
        r["shard"]: (r["n_docs"], r["n_tokens"], r["n_chars"], r["fingerprint"])
        for r in shard_manifest(shard_assignments(docs, n), n).collect()
    }
    assert set(m) == set(range(n))  # always exactly n_shards rows
    by_shard = {s: [] for s in range(n)}
    for d, t, _ in DOCS:
        by_shard[_shard_py(d, n)].append((d, t))
    for s in range(n):
        rows = by_shard[s]
        want = (
            len(rows),
            sum(len(java_ws_tokens(t)) for _, t in rows),
            sum(len(t or "") for _, t in rows),
            _fp_py(rows),
        )
        assert m[s] == want, (s, m[s], want)


def test_manifest_covers_empty_shards(spark, docs):
    n = 64  # > n_docs, so most shards are empty
    m = shard_manifest(shard_assignments(docs, n), n).collect()
    assert len(m) == n
    empties = [r for r in m if r["n_docs"] == 0]
    assert empties and all(
        (r["n_tokens"], r["n_chars"], r["fingerprint"]) == (0, 0, 0)
        for r in empties
    )
    assert sum(r["n_docs"] for r in m) == len(DOCS)


def test_export_one_file_per_shard_and_roundtrip(spark, docs, tmp_path):
    out = str(tmp_path / "export")
    manifest = export_shards(docs, out, 4)
    for s in range(4):
        files = glob.glob(os.path.join(out, "data", f"shard={s}", "*.parquet"))
        assert len(files) == 1, (s, files)
    back = spark.read.parquet(os.path.join(out, "data"))
    assert back.count() == len(DOCS)
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == {
        d for d, _, _ in DOCS
    }
    # placement on disk agrees with the manifest's counts
    disk = {
        r["shard"]: r["cnt"]
        for r in back.groupBy("shard").agg(F.count("*").alias("cnt")).collect()
    }
    for r in manifest.collect():
        assert disk.get(r["shard"], 0) == r["n_docs"]
    # stored manifest == returned manifest, and verify is clean
    assert verify_shards(spark, out).count() == 0


def test_verify_flags_tampered_shard(spark, docs, tmp_path):
    out = str(tmp_path / "export")
    export_shards(docs, out, 2)
    # tamper: rewrite one shard with a doc dropped
    keep = spark.read.parquet(os.path.join(out, "data", "shard=0"))
    victim = keep.select(F.min("doc_id")).collect()[0][0]
    keep.where(F.col("doc_id") != victim).write.mode("overwrite").parquet(
        str(tmp_path / "shard0_new")
    )
    import shutil

    shutil.rmtree(os.path.join(out, "data", "shard=0"))
    shutil.copytree(
        str(tmp_path / "shard0_new"), os.path.join(out, "data", "shard=0")
    )
    bad = verify_shards(spark, out).collect()
    assert [r["shard"] for r in bad] == [0]
    assert bad[0]["actual_n_docs"] == bad[0]["manifest_n_docs"] - 1
    assert bad[0]["actual_fingerprint"] != bad[0]["manifest_fingerprint"]


def test_binary_manifest_matches_hashlib_twin(spark):
    from open_data_linter_spark.sources.shards import shard_manifest_binary

    CLIPS = [
        ("c0", b"\x00\x01payload-a", 120),
        ("c1", b"", 0),
        ("c2", None, 40),
        ("c3", b"\xff" * 64, 500),
    ]
    df = spark.createDataFrame(
        CLIPS, "clip_id string, bytes binary, dur_ms long"
    )
    n = 3
    got = {
        r["shard"]: (
            r["n_clips"], r["n_bytes"], r["total_dur_ms"], r["fingerprint"]
        )
        for r in shard_manifest_binary(
            shard_assignments(df, n, id_col="clip_id"), n
        ).collect()
    }
    assert set(got) == set(range(n))
    by_shard = {s: [] for s in range(n)}
    for cid, b, dur in CLIPS:
        by_shard[_shard_py(cid, n)].append((cid, b, dur))
    for s in range(n):
        rows = by_shard[s]
        fp = 0
        for cid, b, _ in rows:
            digest = hashlib.md5(b).hexdigest() if b is not None else ""
            h = hashlib.md5((cid + ":" + digest).encode()).hexdigest()
            fp ^= int(h[:15], 16)
        want = (
            len(rows),
            sum(len(b) if b is not None else 0 for _, b, _ in rows),
            sum(d for _, _, d in rows),
            fp,
        )
        assert got[s] == want, (s, got[s], want)
