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
