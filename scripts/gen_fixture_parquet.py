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
    os.makedirs(OUT_DIR, exist_ok=True)
    for fname, kwargs in FIXTURES.items():
        pdf = gen_clips_pdf(np.arange(512), **kwargs)[META_COLS]
        path = os.path.join(OUT_DIR, fname)
        pdf.to_parquet(path, index=False)
        print(f"wrote {path}: {len(pdf)} rows")
    # planted-duplicate ground truth for the audio fingerprint oracle
    # (clip_id, group_id, variant) — pure f(i), no audio bytes needed
    from open_data_linter_spark.audio.synth import gen_tone_groups_pdf

    path = os.path.join(OUT_DIR, "audio_fp_groups_256.parquet")
    gen_tone_groups_pdf(np.arange(256)).to_parquet(path, index=False)
    print(f"wrote {path}: 256 rows")


if __name__ == "__main__":
    main()
