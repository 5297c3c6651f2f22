"""End-to-end audio ingest CLI (scripts/run_audio_ingest.py): build the
fingerprint index from a corpus, validate + dedup two successive clip
batches, and verify the grown index drops a later batch's duplicate of
an earlier batch's survivor — the full daily-ingest loop as a user
would run it (subprocess, library surface only)."""

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = os.path.join(REPO, "scripts", "run_audio_ingest.py")


def _cid(i: int) -> str:
    return f"clip_{i:08d}"


def _run(args):
    proc = subprocess.run(
        [sys.executable, CLI, *args],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    return proc


def test_audio_ingest_cli_two_batches(spark, tmp_path):
    from open_data_linter_spark.audio.synth import synthesize_tone_clips

    clips = synthesize_tone_clips(spark, 32, 4).persist()
    pos = F.substring("clip_id", 6, 8).cast("int") % 8
    # corpus: every pos-0..5 clip EXCEPT block-1's leader c8 and the
    # singleton c17 — both arrive via the stream of batches instead
    corpus = clips.where(
        pos.isin(0, 1, 2, 3, 4, 5)
        & ~F.col("clip_id").isin(_cid(8), _cid(17))
    )
    corpus_path = str(tmp_path / "corpus")
    corpus.write.parquet(corpus_path)
    # batch 1: c6 = variant of corpus leader c0 (index drop),
    #          c8 = held-out leader (novel -> accept), c15 = variant of
    #          c8 in the SAME batch (intra drop, c8 < c15)
    b1_path = str(tmp_path / "b1")
    clips.where(F.col("clip_id").isin(_cid(6), _cid(8), _cid(15))).write.parquet(b1_path)
    # batch 2: c14 = variant of c8 (drops ONLY via the grown index),
    #          c17 = held-out singleton (novel -> accept),
    #          c30 = variant of corpus leader c24 (index drop)
    b2_path = str(tmp_path / "b2")
    clips.where(F.col("clip_id").isin(_cid(14), _cid(17), _cid(30))).write.parquet(b2_path)
    clips.unpersist()

    idx = str(tmp_path / "fp_index")
    out1, out2 = str(tmp_path / "out1"), str(tmp_path / "out2")
    _run(["--batch", b1_path, "--index", idx, "--out", out1,
          "--build-from", corpus_path, "--grow",
          "--baseline", corpus_path, "--master", "local[8]"])
    _run(["--batch", b2_path, "--index", idx, "--out", out2, "--grow",
          "--master", "local[8]"])

    r1 = json.load(open(os.path.join(out1, "report.json")))
    r2 = json.load(open(os.path.join(out2, "report.json")))
    acc1 = {r.clip_id for r in spark.read.parquet(
        os.path.join(out1, "accepted")).collect()}
    acc2 = {r.clip_id for r in spark.read.parquet(
        os.path.join(out2, "accepted")).collect()}
    assert acc1 == {_cid(8)}
    assert acc2 == {_cid(17)}
    assert r1["index_grown"] and r2["index_grown"]
    assert r1["n_in"] == 3 and r1["n_accepted"] == 1
    # the validation matrix ran: schema + uniqueness must pass on the
    # clean tone clips, drift had a baseline in run 1
    assert r1["matrix"]["1-6-schema"] is True
    assert r1["matrix"]["uniq"] is True
    assert r1["matrix"]["drift-sr"] is not None
    # payload drift ran in run 1 (baseline given); a 3-clip batch can't
    # pin magnitudes (sampling noise dominates a smoothed histogram), so
    # assert the wiring: all five features scored, PSI is never negative
    assert set(r1["payload_drift"]) == {
        "rms_energy", "zero_crossing_rate", "peak",
        "clipping_rate", "silence_fraction",
    }
    assert all(v >= 0.0 for v in r1["payload_drift"].values())
    assert "payload_drift" not in r2  # no baseline in run 2
    # run 2 had no baseline/reference: could-not-check channel
    assert r2["matrix"]["drift-sr"] is None
    assert r2["matrix"]["payload-ref"] is None
    # probe matches logged with the right provenance
    m2 = {(r.batch_id, r.index_id) for r in spark.read.parquet(
        os.path.join(out2, "matches")).collect()}
    assert (_cid(14), _cid(8)) in m2     # grown-index match
    assert (_cid(30), _cid(24)) in m2    # original-corpus match


def test_raw_files_gate_does_not_drop_transcriptless_clips(spark, tmp_path):
    """--raw-files + --drop-invalid WITHOUT a transcript sidecar: every
    clip has a NULL transcript (1-6-nulls fires on all of them), but the
    gate must exempt exactly that rule/column pair — clean clips pass,
    the undecodable file still gates via its other violations."""
    import numpy as np

    from open_data_linter_spark.audio.codecs import encode_clip

    d = tmp_path / "raw"
    d.mkdir()
    rng = np.random.default_rng(9)
    for i in range(2):
        pcm = (rng.normal(0, 0.2, 16000) * 32767).clip(-32768, 32767).astype(
            np.int16
        )
        (d / f"rec_{i}.wav").write_bytes(encode_clip(pcm, 16000, "pcm_s16le"))
    (d / "junk.wav").write_bytes(b"RIFFnot-audio")

    # tiny corpus so the probe has an index to hit (no planted dups here)
    corpus = tmp_path / "corpus"
    from open_data_linter_spark.audio.synth import synthesize_tone_clips

    synthesize_tone_clips(spark, 8, 2).write.parquet(str(corpus))

    out = str(tmp_path / "out")
    _run(["--batch", str(d), "--raw-files", "--drop-invalid",
          "--index", str(tmp_path / "idx"), "--out", out,
          "--build-from", str(corpus), "--master", "local[8]"])
    r = json.load(open(os.path.join(out, "report.json")))
    acc = {row.clip_id for row in spark.read.parquet(
        os.path.join(out, "accepted")).collect()}
    assert acc == {"rec_0", "rec_1"}
    assert r["stages"]["gated"]["rows"] == 2  # junk gated, clean kept
