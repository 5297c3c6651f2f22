"""Regenerate the committed audio-metadata fixture parquets.

The driver's DuckDB oracle cannot run the engine's distributed synthesis
(audio/synth.py), so the metadata columns (no bytes) of three deterministic
synthetic batches are materialized once and committed under tests/data/.
Because ``gen_clips_pdf`` is seeded per-clip, the Spark-side
``synthesize_clips`` produces the identical rows at query time — the oracle
reads the file, the query re-derives it through the engine, and the two are
comparable without any run-order dependency.

Usage: python scripts/gen_fixture_parquet.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_data_linter_spark.audio.synth import gen_clips_pdf  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "data")

META_COLS = ["clip_id", "sr_hz", "dur_ms", "codec", "transcript"]

FIXTURES = {
    # audio_uniqueness input: 512 clips, rows 10 and 77 duplicated
    "audio_meta_512_dup.parquet": dict(corrupt={10: "uniq", 77: "uniq"}),
    # drift pair: clean baseline vs sr-distribution-shifted batch
    "audio_meta_512_base.parquet": dict(),
    "audio_meta_512_shifted.parquet": dict(sr_probs=(0.05, 0.1, 0.15, 0.7)),
}


def main() -> None:
    from open_data_linter_spark.audio.codecs import decode_clip

    os.makedirs(OUT_DIR, exist_ok=True)
    for fname, kwargs in FIXTURES.items():
        full = gen_clips_pdf(np.arange(512), **kwargs)

        # decoded sample count per clip (NULL where undecodable): dur_ms
        # round-trips through round(n/sr*1000) so it is NOT exactly
        # invertible — operators that slice PCM (chunk_audio) need the
        # true n for a FULL exact oracle
        def _n(data):
            try:
                return len(decode_clip(bytes(data))[2])
            except (ValueError, TypeError):
                return None

        pdf = full[META_COLS].copy()
        pdf["n_samples"] = full["bytes"].map(_n).astype("Int64")
        # payload digest + byte length: lets oracles replay payload-level
        # invariants (shard manifests) without shipping bytes to DuckDB —
        # hashlib here must match Spark's F.md5 on the same binary
        pdf["payload_md5"] = full["bytes"].map(
            lambda b: hashlib.md5(bytes(b)).hexdigest() if b is not None else None
        )
        pdf["n_bytes"] = (
            full["bytes"].map(lambda b: len(b) if b is not None else 0).astype("int64")
        )
        path = os.path.join(OUT_DIR, fname)
        pdf.to_parquet(path, index=False)
        print(f"wrote {path}: {len(pdf)} rows")
    # planted-duplicate ground truth for the audio fingerprint oracle
    # (clip_id, group_id, variant) — pure f(i), no audio bytes needed
    from open_data_linter_spark.audio.synth import gen_tone_groups_pdf

    path = os.path.join(OUT_DIR, "audio_fp_groups_256.parquet")
    gen_tone_groups_pdf(np.arange(256)).to_parquet(path, index=False)
    print(f"wrote {path}: 256 rows")
    # planted utterance spans for the VAD-segmentation oracle — derived
    # from the layout alone (audio/synth.py::_gapped_layout), never from
    # the decoder or the segmentation operator
    from open_data_linter_spark.audio.synth import gen_gapped_truth_pdf

    path = os.path.join(OUT_DIR, "audio_gapped_truth_256.parquet")
    truth = gen_gapped_truth_pdf(np.arange(256))
    truth.to_parquet(path, index=False)
    print(f"wrote {path}: {len(truth)} rows")


if __name__ == "__main__":
    main()
