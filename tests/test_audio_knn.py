"""Payload-derived audio embeddings + content-based retrieval
(multimodal/media.py::audio_embeddings over audio/bands.py band_energies,
composed with similarity/knn.py). Extends the engine per the
training-data-pipeline mandate; the reference
(volare-all/open-data-linter) has no similarity-search ops."""

import numpy as np
import pandas as pd
import pytest

from open_data_linter_spark.audio.bands import N_BANDS, band_energies
from open_data_linter_spark.audio.codecs import encode_clip
from open_data_linter_spark.multimodal.media import audio_embeddings


def _tone(sr: int, secs: float, f0: float, amp: float = 0.4) -> np.ndarray:
    t = np.arange(int(sr * secs)) / sr
    return (amp * 32767 * np.sin(2 * np.pi * f0 * t)).astype(np.int16)


def _df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["clip_id", "bytes"]))


def test_embedding_shape_norm_and_null_channels(spark):
    sr = 16000
    rows = [
        ("ok", encode_clip(_tone(sr, 1.0, 440.0), sr, "pcm_s16le")),
        ("short", encode_clip(_tone(sr, 0.01, 440.0), sr, "pcm_s16le")),  # < 1 frame
        ("bad", b"not audio at all"),
    ]
    out = {r["clip_id"]: r["embedding"] for r in audio_embeddings(_df(spark, rows)).collect()}
    assert out["short"] is None and out["bad"] is None
    emb = np.array(out["ok"])
    assert emb.shape == (N_BANDS,)
    assert abs(np.linalg.norm(emb) - 1.0) < 1e-5
    assert (emb >= 0).all()  # energies are non-negative


def test_embedding_exact_gain_invariance(spark):
    sr = 16000
    base = _tone(sr, 1.2, 620.0)
    gained = np.clip(base.astype(np.float64) * 0.5, -32768, 32767).astype(np.int16)
    rows = [
        ("base", encode_clip(base, sr, "pcm_s16le")),
        ("gain", encode_clip(gained, sr, "pcm_s16le")),
    ]
    out = {r["clip_id"]: np.array(r["embedding"]) for r in
           audio_embeddings(_df(spark, rows)).collect()}
    # a uniform gain scales every band energy by g^2; L2 normalization
    # removes it exactly (up to int16 re-quantization of the halved PCM)
    cos = float(out["base"] @ out["gain"])
    assert cos > 0.9999


def test_band_energies_pool_matches_sequence_front_end():
    # the embedding pools the SAME energy matrix the fingerprint argmaxes
    from open_data_linter_spark.dedup.audio_fp import band_sequence

    sr = 8000
    x = np.concatenate([_tone(sr, 0.3, 500.0), _tone(sr, 0.3, 1500.0)])
    xf = x.astype(np.float32) / 32768.0
    e = band_energies(xf, sr)
    seq = band_sequence(xf, sr)
    assert e.shape == (len(seq), N_BANDS)
    assert (np.argmax(e, axis=1).astype(np.int32) == seq).all()
    # empty-segment guard: at sr=8000 some low bands are narrower than one
    # FFT bin; their energy must be exactly 0, not a leaked neighbor bin
    freqs = np.fft.rfftfreq(int(round(sr * 0.064)), 1.0 / sr)
    from open_data_linter_spark.audio.bands import EDGES

    bounds = np.searchsorted(freqs, EDGES, side="left")
    empty = bounds[1:] <= bounds[:-1]
    if empty.any():
        assert (e[:, empty] == 0.0).all()


def test_planted_variants_retrieve_their_group_top2(spark):
    from open_data_linter_spark.audio.synth import synthesize_tone_clips
    from open_data_linter_spark.similarity.knn import brute_force_topk
    from pyspark.sql import functions as F

    clips = synthesize_tone_clips(spark, 64, 4)
    emb = audio_embeddings(clips).persist()
    pos = F.substring("clip_id", 6, 8).cast("int") % 8
    top2 = brute_force_topk(
        emb, emb.where(pos >= 6), k=2, vec_col="embedding", id_col="clip_id"
    ).collect()
    assert len(top2) == 16 * 2  # 8 blocks x 2 variants x top-2
    for r in top2:
        qi = int(r["query_id"][5:])
        ni = int(r["neighbor_id"][5:])
        group = qi - qi % 8
        assert ni - ni % 8 == group if ni % 8 >= 6 else ni == group
    emb.unpersist()


def test_embedding_pass_is_shuffle_free(spark):
    sr = 16000
    df = _df(spark, [("a", encode_clip(_tone(sr, 0.5, 440.0), sr, "pcm_s16le"))])
    plan = audio_embeddings(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
