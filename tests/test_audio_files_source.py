"""Raw-file ingest source (sources/audio_files.py): loose audio files →
the canonical clip table, metadata derived from container headers,
undecodable files surfaced through the 1-1 channel instead of thrown."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from open_data_linter_spark.audio.codecs import encode_clip


@pytest.fixture()
def wav_dir(tmp_path):
    rng = np.random.default_rng(3)
    meta = {}
    for i, (sr, codec, n) in enumerate(
        [
            (16000, "pcm_s16le", 16000),      # 1000 ms
            (8000, "ulaw", 4912),             # 614 ms
            (22050, "alaw", 10672),           # 484 ms
        ]
    ):
        pcm = (rng.normal(0, 0.2, n) * 32767).clip(-32768, 32767).astype(
            np.int16
        )
        ext = "wav" if codec == "pcm_s16le" else codec
        (tmp_path / f"clip_{i}.{ext}").write_bytes(encode_clip(pcm, sr, codec))
        meta[f"clip_{i}"] = (sr, int(round(n / sr * 1000.0)), codec)
    (tmp_path / "broken.wav").write_bytes(b"RIFFgarbage-not-a-wave-file")
    return tmp_path, meta


def test_clips_from_files_derives_metadata(spark, wav_dir):
    from open_data_linter_spark.sources.audio_files import clips_from_files

    tmp_path, meta = wav_dir
    rows = {r.clip_id: r for r in clips_from_files(
        spark, str(tmp_path)).collect()}
    assert set(rows) == set(meta) | {"broken"}
    for cid, (sr, dur, codec) in meta.items():
        r = rows[cid]
        assert (r.sr_hz, r.dur_ms, r.codec) == (sr, dur, codec)
        assert r.transcript is None and len(r.bytes) > 0
    # undecodable file: bytes kept, metadata NULL — never thrown
    b = rows["broken"]
    assert b.sr_hz is None and b.dur_ms is None and b.codec is None
    assert bytes(b.bytes).startswith(b"RIFF")


def test_clips_from_files_transcript_sidecar_and_validation(spark, wav_dir):
    """End-to-end: raw dir -> canonical table + transcript sidecar ->
    ValidationRun. The broken file must surface as a 1-1 violation;
    clean files pass the duration-consistency rule by construction."""
    from open_data_linter_spark.plans.run import ValidationRun
    from open_data_linter_spark.rules.audio_rules import build_audio_ruleset
    from open_data_linter_spark.sources.audio_files import clips_from_files
    from open_data_linter_spark.audio.synth import codec_registry_pdf

    tmp_path, meta = wav_dir
    sidecar = spark.createDataFrame(
        [(cid, f"transcript for {cid}") for cid in meta],
        "clip_id string, transcript string",
    )
    clips = clips_from_files(spark, str(tmp_path), transcripts=sidecar)
    got = {r.clip_id: r.transcript for r in clips.collect()}
    assert got["clip_0"] == "transcript for clip_0"
    assert got["broken"] is None

    ctx = {"codec_registry": spark.createDataFrame(codec_registry_pdf())}
    report = ValidationRun(
        spark, build_audio_ruleset(), collect_violation_rows=True
    ).run(clips, ctx)
    assert report.matrix()["1-1"] is False  # the broken file
    bad = {
        r.clip_id
        for r in report.violations.where(F.col("rule_id") == "1-1").collect()
    }
    assert bad == {"broken"}
