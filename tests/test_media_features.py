"""Audio quality-gate features (multimodal/media.py): clipping + silence."""

import numpy as np
import pandas as pd
import pytest

from open_data_linter_spark.audio.codecs import encode_clip
from open_data_linter_spark.multimodal.media import audio_features


def _clip_df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["clip_id", "bytes"]))


def test_clipping_and_silence(spark):
    sr = 16000
    full = np.full(sr, 32767, dtype=np.int16)  # hard-clipped DC
    full[::2] = -32768
    half_silent = np.zeros(sr, dtype=np.int16)
    t = np.arange(sr // 2) / sr
    half_silent[sr // 2 :] = (0.4 * 32767 * np.sin(2 * np.pi * 440 * t)).astype(
        np.int16
    )
    clean = (0.4 * 32767 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(
        np.int16
    )
    df = _clip_df(
        spark,
        [
            ("clipped", encode_clip(full, sr, "pcm_s16le")),
            ("halfsil", encode_clip(half_silent, sr, "pcm_s16le")),
            ("clean", encode_clip(clean, sr, "pcm_s16le")),
            ("bad", b"\x00nope"),
        ],
    )
    got = {r.clip_id: r for r in audio_features(df).collect()}
    assert got["clipped"].clipping_rate == pytest.approx(1.0)
    assert got["clean"].clipping_rate == 0.0
    # the silent half counts; the sine half's near-zero crossings add a few
    assert 0.5 <= got["halfsil"].silence_fraction < 0.55
    assert got["clean"].silence_fraction < 0.05
    # decode failure -> NULL for every feature (NaN -> Arrow null),
    # matching the pre-existing columns' semantics
    assert got["bad"].clipping_rate is None
    assert got["bad"].silence_fraction is None


def test_audio_feature_drift_zero_on_identical_sides(spark):
    """Identical batch and baseline: smoothed p == q in every bin, so
    every feature's PSI is exactly 0.0 (no epsilon slop — the smoothing
    is symmetric)."""
    from open_data_linter_spark.audio.synth import synthesize_clips
    from open_data_linter_spark.multimodal.media import audio_feature_drift

    clips = synthesize_clips(spark, 64, 4)
    rows = audio_feature_drift(clips, clips).collect()
    assert len(rows) == 5
    assert all(r.psi == 0.0 for r in rows)
    assert all(r.n_batch == 64 for r in rows)


def test_audio_feature_drift_detects_payload_shift(spark):
    """Tone clips vs speech-ish clips share the metadata schema but have
    very different decoded energy/silence profiles — the payload drift
    must flag action-worthy PSI (> 0.25) on at least rms/silence, while
    same-generator different-seed batches stay below it."""
    from open_data_linter_spark.audio.synth import (
        synthesize_clips,
        synthesize_tone_clips,
    )
    from open_data_linter_spark.multimodal.media import audio_feature_drift

    baseline = synthesize_clips(spark, 96, 4, seed=42)
    shifted = {r.feature: r.psi for r in audio_feature_drift(
        synthesize_tone_clips(spark, 96, 4), baseline).collect()}
    # energy profile shifts decisively; silence happens to be similar
    # between the two generators, which is itself the point — drift is
    # per-feature, not a single verdict
    assert shifted["rms_energy"] > 0.25
    same = {r.feature: r.psi for r in audio_feature_drift(
        synthesize_clips(spark, 96, 4, seed=7), baseline).collect()}
    assert all(v < 0.25 for v in same.values()), same


def test_audio_feature_drift_frozen_baseline_and_nan_exclusion(spark):
    """A pre-decoded feature frame is accepted as the baseline side
    (no second decode), and undecodable clips (NaN feature rows) are
    excluded from the drift mass instead of polluting the top bin."""
    from pyspark.sql import functions as F

    from open_data_linter_spark.audio.synth import synthesize_clips
    from open_data_linter_spark.multimodal.media import (
        audio_feature_drift,
        audio_features,
    )

    clips = synthesize_clips(spark, 64, 4)
    frozen = audio_features(clips).localCheckpoint()
    live = {(r.feature, r.n_batch, r.psi)
            for r in audio_feature_drift(clips, clips).collect()}
    via_frozen = {(r.feature, r.n_batch, r.psi)
                  for r in audio_feature_drift(clips, frozen).collect()}
    assert via_frozen == live
    # corrupt 8 clips' payloads -> decode fails -> NaN rows excluded
    broken = clips.withColumn(
        "bytes",
        F.when(F.substring("clip_id", 6, 8).cast("int") % 8 == 0,
               F.lit(b"not audio")).otherwise(F.col("bytes")),
    )
    rows = audio_feature_drift(broken, frozen).collect()
    assert all(r.n_batch == 56 for r in rows)
    assert all(r.psi < 0.25 for r in rows)
