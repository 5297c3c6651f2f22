"""Audio near-duplicate fingerprinting (dedup/audio_fp.py).

Ground truth is the planted tone-sequence fixture (audio/synth.py): in
every block of 8 clip ids the last two are seeded variants (codec
re-encode / gain / SNR-35dB noise / truncation) of the block's first id.
"""

import itertools

import numpy as np
import pytest

from open_data_linter_spark.audio.bands import EDGES, TONE_GRID
from open_data_linter_spark.audio.codecs import (
    decode_clip,
    encode_clip,
    pcm_to_float32,
)
from open_data_linter_spark.audio.synth import (
    gen_tone_clips_pdf,
    synthesize_tone_clips,
    tone_group_of,
    tone_variant_of,
)
from open_data_linter_spark.dedup.audio_fp import (
    audio_band_sequences,
    audio_near_duplicates,
    band_sequence,
)

Q = 4
THRESHOLD = 0.45


def _py_shingles(seq, q=Q):
    return {tuple(seq[i : i + q]) for i in range(len(seq) - q + 1)}


def _py_jaccard(a, b, q=Q):
    A, B = _py_shingles(a, q), _py_shingles(b, q)
    return len(A & B) / len(A | B) if A | B else 0.0


def test_band_sequence_pure_tone_lands_in_its_band():
    """A mid-band tone's dominant band is exactly the band containing it,
    at every supported sample rate."""
    for sr in (8000, 16000, 44100):
        for k in (5, 20, 40):
            f0 = float(TONE_GRID[k])
            t = np.arange(int(sr * 0.5)) / sr
            x = (0.4 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
            seq = band_sequence(x, sr)
            assert len(seq) > 0
            want = int(np.searchsorted(EDGES, f0, side="right") - 1)
            assert set(seq.tolist()) == {want}, (sr, k)


def test_band_sequence_short_clip_empty():
    assert band_sequence(np.zeros(10, dtype=np.float32), 16000).size == 0


def test_band_sequence_invariances():
    """Gain scaling leaves the sequence bit-identical; u-law re-encode and
    SNR-35dB noise leave it near-identical (the argmax margin of a real
    tone dwarfs quantization noise)."""
    pdf = gen_tone_clips_pdf(np.arange(1))
    _, sr, pcm = decode_clip(pdf["bytes"][0])
    x = pcm_to_float32(pcm)
    base = band_sequence(x, sr)
    assert np.array_equal(band_sequence(x * 0.5, sr), base)
    # u-law round-trip
    _, _, pcm2 = decode_clip(encode_clip(pcm, sr, "ulaw"))
    assert _py_jaccard(band_sequence(pcm_to_float32(pcm2), sr), base) >= 0.9
    rng = np.random.default_rng(0)
    noisy = x + rng.standard_normal(x.shape).astype(np.float32) * np.sqrt(
        np.mean(x**2) / 10 ** 3.5
    )
    assert _py_jaccard(band_sequence(noisy, sr), base) >= 0.9


def test_planted_separation_pure_python():
    """Driver-free ground-truth check: every planted pair scores >= the
    operating threshold, every cross-group pair scores below it."""
    n = 64
    pdf = gen_tone_clips_pdf(np.arange(n))
    seqs = []
    for _, r in pdf.iterrows():
        _, sr, pcm = decode_clip(r["bytes"])
        seqs.append(band_sequence(pcm_to_float32(pcm), sr))
    assert {tone_variant_of(i) for i in range(n)} >= {"base"}
    for a, b in itertools.combinations(range(n), 2):
        j = _py_jaccard(seqs[a], seqs[b])
        if tone_group_of(a) == tone_group_of(b):
            assert j >= THRESHOLD, (a, b, j)
        else:
            assert j < THRESHOLD, (a, b, j)


def test_audio_near_duplicates_recall_and_precision(spark):
    n = 128
    clips = synthesize_tone_clips(spark, n, num_partitions=8)
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in audio_near_duplicates(clips, threshold=THRESHOLD).collect()
    }
    want = {
        (f"clip_{a:08d}", f"clip_{b:08d}")
        for a, b in itertools.combinations(range(n), 2)
        if tone_group_of(a) == tone_group_of(b)
    }
    assert set(got) == want  # recall 1.0 AND precision 1.0
    assert all(THRESHOLD <= j <= 1.0 for j in got.values())


def test_spark_jaccard_matches_python_twin(spark):
    """The JVM xxhash64-shingle Jaccard equals Jaccard over raw q-gram
    tuples (hashing is injective in practice; a collision would surface
    here as a value mismatch)."""
    n = 32
    clips = synthesize_tone_clips(spark, n, num_partitions=4)
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in audio_near_duplicates(clips, threshold=THRESHOLD).collect()
    }
    pdf = gen_tone_clips_pdf(np.arange(n))
    seqs = {}
    for _, r in pdf.iterrows():
        _, sr, pcm = decode_clip(r["bytes"])
        seqs[r["clip_id"]] = band_sequence(pcm_to_float32(pcm), sr)
    for (a, b), j in got.items():
        assert j == pytest.approx(_py_jaccard(seqs[a], seqs[b]), abs=1e-6)


def test_undecodable_payload_excluded(spark):
    pdf = gen_tone_clips_pdf(np.arange(4))
    pdf.loc[1, "bytes"] = b"\x00garbage"
    sdf = spark.createDataFrame(pdf)
    seqs = {r.id: r.bands for r in audio_band_sequences(sdf).collect()}
    assert seqs["clip_00000001"] == []
    pairs = audio_near_duplicates(sdf, threshold=THRESHOLD).collect()
    assert all("clip_00000001" not in (r.id_a, r.id_b) for r in pairs)


def test_stationary_and_hot_bucket_contracts(spark):
    """Two documented trades of the candidate stage: (a) a held-tone clip
    has no melody (one distinct band -> zero candidate keys) and is NEVER
    pairable, cap or no cap; (b) clips sharing a melody bucket larger
    than max_bucket_size are dropped by the cap, and pairable without."""
    import pandas as pd

    sr = 16000
    t = np.arange(sr) / sr

    def tone_pcm(bands, n_seg=None):
        segs = np.array_split(t, len(bands))
        x = np.concatenate(
            [
                0.4 * np.sin(2 * np.pi * float(TONE_GRID[b]) * s)
                for b, s in zip(bands, segs)
            ]
        )
        return np.clip(x * 32767, -32768, 32767).astype(np.int16)

    hum = [
        {"clip_id": f"hum_{i}", "bytes": encode_clip(tone_pcm([10]), sr, "pcm_s16le")}
        for i in range(6)
    ]
    sdf = spark.createDataFrame(pd.DataFrame(hum))
    assert audio_near_duplicates(sdf, threshold=0.1, max_bucket_size=5).count() == 0
    assert audio_near_duplicates(sdf, threshold=0.1, max_bucket_size=None).count() == 0

    duo = [
        {
            "clip_id": f"duo_{i}",
            "bytes": encode_clip(tone_pcm([10, 20]), sr, "pcm_s16le"),
        }
        for i in range(6)
    ]
    sdf = spark.createDataFrame(pd.DataFrame(duo))
    assert audio_near_duplicates(sdf, threshold=0.1, max_bucket_size=5).count() == 0
    assert (
        audio_near_duplicates(sdf, threshold=0.1, max_bucket_size=None).count() == 15
    )


def test_band_grid_ceiling_excluded():
    """Energy above the 3800 Hz grid ceiling must not leak into band 47
    (reduceat's open-ended last segment): a louder out-of-grid 10 kHz tone
    cannot override in-grid content, so a clip and its band-limited
    re-encode keep the same dominant bands (bands.py sr-invariance)."""
    sr = 44100
    t = np.arange(int(sr * 0.5)) / sr
    in_grid = np.sin(2 * np.pi * 1000.0 * t)
    hiss = 2.0 * np.sin(2 * np.pi * 10000.0 * t)
    seq = band_sequence((in_grid + hiss).astype(np.float32), sr)
    k = int(np.searchsorted(EDGES, 1000.0) - 1)
    assert len(seq) > 0 and (seq == k).all()


def test_truncated_riff_yields_empty_sequence(spark):
    """A 4-11-byte RIFF fragment (stdlib chunk reader raises EOFError, not
    wave.Error) must become the documented empty band sequence, never an
    exception escaping the decode pass."""
    import pandas as pd

    clips = gen_tone_clips_pdf(np.arange(8))
    clips.loc[3, "bytes"] = b"RIFFxx"
    seqs = {
        r.id: r.bands
        for r in audio_band_sequences(spark.createDataFrame(clips)).collect()
    }
    assert seqs[clips.loc[3, "clip_id"]] == []
    assert all(len(v) > 0 for k, v in seqs.items() if k != clips.loc[3, "clip_id"])


def test_plan_shape_no_cartesian(spark):
    """The candidate stage must stay a pure hash-join pipeline — any
    BroadcastNestedLoop/Cartesian means the pair expansion regressed to
    an all-pairs shape that dies at scale."""
    clips = synthesize_tone_clips(spark, 64, num_partitions=4)
    df = audio_near_duplicates(clips, threshold=THRESHOLD)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan


def test_determinism(spark):
    clips = synthesize_tone_clips(spark, 48, num_partitions=4)
    a = sorted(map(tuple, audio_near_duplicates(clips, threshold=THRESHOLD).collect()))
    b = sorted(map(tuple, audio_near_duplicates(clips, threshold=THRESHOLD).collect()))
    assert a == b and len(a) > 0
