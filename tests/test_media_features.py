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


def test_chunk_audio_boundaries_and_roundtrip(spark):
    """Chunk rows must replay the integer recurrence (windows at k*hop,
    tails under min_tail dropped) AND the re-encoded bytes must decode
    back to the sample-exact PCM slice of the source clip."""
    import numpy as np

    from open_data_linter_spark.audio.codecs import decode_clip
    from open_data_linter_spark.audio.synth import synthesize_clips
    from open_data_linter_spark.multimodal.media import chunk_audio

    clips = synthesize_clips(spark, 24, 4)
    src = {r.clip_id: decode_clip(bytes(r.bytes))[1:]  # (sr, pcm)
           for r in clips.collect()}
    rows = chunk_audio(
        clips, window_ms=1000, hop_ms=500, min_tail_ms=240
    ).collect()
    assert rows
    seen = {}
    for r in rows:
        sr, pcm = src[r.clip_id]
        n = len(pcm)
        window, hop, min_tail = sr, sr // 2, sr * 240 // 1000
        start = r.chunk_idx * hop
        assert r.sr_hz == sr
        assert start < n and n - start >= min_tail
        assert r.chunk_samples == min(window, n - start)
        got_sr, got = decode_clip(bytes(r.bytes))[1:]
        assert got_sr == sr
        assert np.array_equal(got, pcm[start:start + r.chunk_samples])
        seen.setdefault(r.clip_id, set()).add(r.chunk_idx)
    # completeness: every clip yields every k with a long-enough tail
    for cid, (sr, pcm) in src.items():
        n, hop, min_tail = len(pcm), sr // 2, sr * 240 // 1000
        want = {k for k in range(0, (n - 1) // hop + 1)
                if n - k * hop >= min_tail}
        assert seen.get(cid, set()) == want


def test_chunk_audio_skips_undecodable_and_stays_shuffle_free(spark):
    from pyspark.sql import functions as F

    from open_data_linter_spark.audio.synth import synthesize_clips
    from open_data_linter_spark.multimodal.media import chunk_audio

    clips = synthesize_clips(spark, 16, 2)
    broken = clips.withColumn(
        "bytes",
        F.when(F.substring("clip_id", 6, 8).cast("int") % 4 == 0,
               F.lit(b"junk")).otherwise(F.col("bytes")),
    )
    out = chunk_audio(broken)
    got_ids = {r.clip_id for r in out.select("clip_id").distinct().collect()}
    assert got_ids == {f"clip_{i:08d}" for i in range(16) if i % 4 != 0}
    # per-row flatMap: no Exchange anywhere in the chunking plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _enc(pcm, sr=16000):
    from open_data_linter_spark.audio.codecs import encode_clip

    return encode_clip(pcm.astype(np.int16), sr, "pcm_s16le")


def test_transform_audio_trim_preserves_inner_samples(spark):
    from open_data_linter_spark.audio.codecs import decode_clip
    from open_data_linter_spark.multimodal.media import transform_audio

    sr = 16000
    sig = (0.4 * 32767 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(
        np.int16
    )
    pad = np.zeros(sr // 4, dtype=np.int16)  # -inf dBFS padding
    rows = [
        ("padded", _enc(np.concatenate([pad, sig, pad])), sr,
         int(1000 * (len(sig) + 2 * len(pad)) / sr), "pcm_s16le", "t"),
        ("silent", _enc(np.zeros(sr, dtype=np.int16)), sr, 1000,
         "pcm_s16le", "t"),
        ("broken", b"RIFFjunk", sr, 1000, "pcm_s16le", "t"),
    ]
    df = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int,"
        " codec string, transcript string",
    )
    out = {r.clip_id: r for r in transform_audio(
        df, trim_silence_db=-40).collect()}
    _, _, got = decode_clip(bytes(out["padded"].bytes))
    # the sine's own first sample is 0 (sin(0)) — below -40 dBFS — so the
    # expected result is the LOUD span of sig, not all of sig
    lvl = 10.0 ** (-40.0 / 20.0) * 32768.0
    loud = np.nonzero(np.abs(sig) >= lvl)[0]
    want = sig[loud[0]:loud[-1] + 1]
    assert np.array_equal(got, want)  # pads gone, loud span bit-exact
    assert out["padded"].dur_ms == int(round(len(want) / sr * 1000.0))
    _, _, s0 = decode_clip(bytes(out["silent"].bytes))
    assert len(s0) == 1  # all-silent trims to one sample, never empty
    assert bytes(out["broken"].bytes) == b"RIFFjunk"  # untouched
    assert out["broken"].dur_ms == 1000
    assert out["broken"].transcript == "t"  # passthrough columns intact


def test_transform_audio_normalize_hits_target_and_never_clips(spark):
    from open_data_linter_spark.audio.codecs import decode_clip, pcm_to_float32
    from open_data_linter_spark.multimodal.media import transform_audio

    sr = 16000
    t = np.arange(sr) / sr
    quiet = (0.05 * 32767 * np.sin(2 * np.pi * 220 * t)).astype(np.int16)
    # spiky: low rms but peak near full scale — naive gain would clip
    spiky = (0.02 * 32767 * np.sin(2 * np.pi * 330 * t)).astype(np.int16)
    spiky[100] = 32000
    df = spark.createDataFrame(
        [("quiet", _enc(quiet)), ("spiky", _enc(spiky)),
         ("silent", _enc(np.zeros(sr, dtype=np.int16)))],
        "clip_id string, bytes binary",
    )
    out = {r.clip_id: r for r in transform_audio(
        df, target_rms=0.2).collect()}

    def rms_peak(b):
        x = pcm_to_float32(decode_clip(bytes(b))[2])
        return float(np.sqrt(np.mean(x ** 2))), float(np.max(np.abs(x)))

    r_q, p_q = rms_peak(out["quiet"].bytes)
    assert abs(r_q - 0.2) < 2e-3 and p_q <= 1.0
    r_s, p_s = rms_peak(out["spiky"].bytes)
    assert p_s <= 1.0 and r_s < 0.2  # gain capped at the peak, no wrap
    r_0, _ = rms_peak(out["silent"].bytes)
    assert r_0 == 0.0  # silent passes through unscaled


def test_transform_audio_composes_with_chunking(spark):
    """The prep pipeline shape: trim + normalize, then window — the
    transform's output is the canonical table, so chunk_audio consumes
    it directly."""
    from open_data_linter_spark.audio.synth import synthesize_clips
    from open_data_linter_spark.multimodal.media import (
        chunk_audio,
        transform_audio,
    )

    clips = synthesize_clips(spark, 16, 2)
    prepped = transform_audio(clips, trim_silence_db=-40, target_rms=0.15)
    chunks = chunk_audio(prepped, window_ms=500, hop_ms=500, min_tail_ms=100)
    assert chunks.count() > 0
    plan = chunks._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # the whole prep chain is shuffle-free


def test_resample_pcm_exactness():
    """Linear-interp resample: exact midpoints on a 2x upsampled ramp,
    constant signals stay constant, and the output length replays the
    divisionless half-up integer formula at every fixture rate."""
    from open_data_linter_spark.audio.synth import SR_CHOICES
    from open_data_linter_spark.multimodal.media import resample_pcm

    ramp = (np.arange(10, dtype=np.int16) * 100)
    up = resample_pcm(ramp, 8000, 16000)
    assert up[:8].tolist() == [0, 50, 100, 150, 200, 250, 300, 350]
    const = resample_pcm(np.full(100, 1234, dtype=np.int16), 44100, 8000)
    assert set(const.tolist()) == {1234}
    same = resample_pcm(ramp, 8000, 8000)
    assert np.array_equal(same, ramp)  # identity, no float round-trip
    for sr in map(int, SR_CHOICES):
        for target in map(int, SR_CHOICES):
            for n in (1, 7, 999, 12345):
                got = len(resample_pcm(np.zeros(n, dtype=np.int16), sr, target))
                assert got == max(1, (n * target + sr // 2) // sr)


def test_transform_audio_resample_preserves_tone(spark):
    from open_data_linter_spark.audio.codecs import decode_clip, pcm_to_float32
    from open_data_linter_spark.multimodal.media import transform_audio

    sr = 8000
    t = np.arange(sr) / sr  # 1 s of 440 Hz
    tone = (0.4 * 32767 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    df = spark.createDataFrame(
        [("tone", _enc(tone, sr), sr, 1000, "pcm_s16le", "t"),
         ("broken", b"RIFFjunk", sr, 1000, "pcm_s16le", "t")],
        "clip_id string, bytes binary, sr_hz int, dur_ms int,"
        " codec string, transcript string",
    )
    out = {r.clip_id: r for r in transform_audio(df, target_sr=16000).collect()}
    assert out["tone"].sr_hz == 16000
    got_sr, got = decode_clip(bytes(out["tone"].bytes))[1:]
    assert got_sr == 16000
    assert len(got) == (len(tone) * 16000 + 4000) // 8000
    assert abs(out["tone"].dur_ms - 1000) <= 1
    x = pcm_to_float32(got)
    spec = np.abs(np.fft.rfft(x))
    f_dom = np.argmax(spec) * 16000 / len(x)
    assert abs(f_dom - 440.0) < 2.0  # pitch preserved through the interp
    assert bytes(out["broken"].bytes) == b"RIFFjunk"  # 1-1 evidence intact
    assert out["broken"].sr_hz == sr  # metadata untouched on decode failure


def test_transform_audio_trim_resample_normalize_one_pass(spark):
    from open_data_linter_spark.audio.codecs import decode_clip, pcm_to_float32
    from open_data_linter_spark.audio.synth import synthesize_clips
    from open_data_linter_spark.multimodal.media import transform_audio

    clips = synthesize_clips(spark, 16, 2)
    out = transform_audio(
        clips, trim_silence_db=-40, target_sr=16000, target_rms=0.2
    )
    rows = out.collect()
    assert len(rows) == 16
    for r in rows:
        assert r.sr_hz == 16000
        sr, pcm = decode_clip(bytes(r.bytes))[1:]
        assert sr == 16000
        x = pcm_to_float32(pcm)
        assert float(np.max(np.abs(x))) <= 1.0  # normalize stays peak-safe
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # all three transforms in one pass


def test_segment_on_silence_recovers_planted_spans(spark):
    """Every planted utterance span of the gapped fixture is recovered
    sample-exactly from the decoded audio, the emitted bytes are exact
    PCM slices, and all-silence clips emit no rows."""
    from open_data_linter_spark.audio.codecs import decode_clip
    from open_data_linter_spark.audio.synth import (
        gen_gapped_truth_pdf,
        synthesize_gapped_clips,
    )
    from open_data_linter_spark.multimodal.media import segment_on_silence

    clips = synthesize_gapped_clips(spark, 64, 4)
    src = {r.clip_id: decode_clip(bytes(r.bytes))[1:] for r in clips.collect()}
    rows = segment_on_silence(clips).collect()
    got = sorted((r.clip_id, r.seg_idx, r.sr_hz, r.start_sample, r.seg_samples)
                 for r in rows)
    truth = gen_gapped_truth_pdf(np.arange(64))
    want = sorted(map(tuple, truth.itertuples(index=False)))
    assert got == want
    for r in rows:
        sr, pcm = src[r.clip_id]
        got_sr, seg = decode_clip(bytes(r.bytes))[1:]
        assert got_sr == sr
        assert np.array_equal(
            seg, pcm[r.start_sample:r.start_sample + r.seg_samples]
        )
    # clip 0 (i % 17 == 0) is planted all-silence: zero segments
    assert all(r.clip_id != "clip_00000000" for r in rows)


def test_segment_on_silence_gap_merge_and_min_segment(spark):
    from open_data_linter_spark.multimodal.media import segment_on_silence

    sr = 16000
    burst = np.full(sr // 4, 12000, dtype=np.int16)  # 250 ms, loud
    short = np.full(sr // 100, 12000, dtype=np.int16)  # 10 ms, under min
    gap_short = np.zeros(sr // 10, dtype=np.int16)   # 100 ms < min_gap 150
    gap_long = np.zeros(sr // 2, dtype=np.int16)     # 500 ms >= min_gap
    merged = np.concatenate([burst, gap_short, burst])
    split = np.concatenate([burst, gap_long, burst, gap_long, short])
    df = spark.createDataFrame(
        [("merged", _enc(merged, sr)), ("split", _enc(split, sr)),
         ("broken", b"RIFFjunk")],
        "clip_id string, bytes binary",
    )
    out = segment_on_silence(df)
    rows = {}
    for r in out.collect():
        rows.setdefault(r.clip_id, []).append(
            (r.seg_idx, r.start_sample, r.seg_samples))
    # sub-min_gap silence does NOT split: one span covering both bursts
    assert rows["merged"] == [(0, 0, len(merged))]
    # long gaps split; the trailing 10 ms burst is dropped (min_segment)
    assert rows["split"] == [
        (0, 0, len(burst)),
        (1, len(burst) + len(gap_long), len(burst)),
    ]
    assert "broken" not in rows
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_prep_audio_matches_chained(spark):
    """The fused single-decode prep pipeline must be sample-exact vs the
    chained composition transform_audio(segment_on_silence(df)) on the
    gapped fixture — every column, bytes included."""
    from open_data_linter_spark.audio.synth import synthesize_gapped_clips
    from open_data_linter_spark.multimodal.media import (
        prep_audio,
        segment_on_silence,
        transform_audio,
    )

    gapped = synthesize_gapped_clips(spark, 48, 4)

    def rows(df):
        return sorted(
            (r.clip_id, r.seg_idx, r.sr_hz, r.start_sample, r.seg_samples,
             bytes(r.bytes))
            for r in df.collect()
        )

    # resample-only (the bench composition)
    chained = rows(transform_audio(segment_on_silence(gapped), target_sr=16000))
    fused = rows(prep_audio(gapped, target_sr=16000))
    assert len(fused) > 0 and fused == chained
    # trim + normalize + resample, all three stages
    chained3 = rows(
        transform_audio(
            segment_on_silence(gapped),
            trim_silence_db=-35.0, target_sr=8000, target_rms=0.125,
        )
    )
    fused3 = rows(
        prep_audio(
            gapped, trim_silence_db=-35.0, target_sr=8000, target_rms=0.125
        )
    )
    assert fused3 == chained3
    # no transform params: prep == segment_on_silence
    assert rows(prep_audio(gapped)) == rows(segment_on_silence(gapped))


def test_prep_audio_validation(spark):
    import pytest as _pytest

    from open_data_linter_spark.multimodal.media import prep_audio

    df = spark.createDataFrame([("a", b"")], "clip_id string, bytes binary")
    with _pytest.raises(ValueError, match="target_rms"):
        prep_audio(df, target_rms=1.5)
    with _pytest.raises(ValueError, match="min_gap_ms"):
        prep_audio(df, min_gap_ms=0)
