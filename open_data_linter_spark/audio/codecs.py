"""Audio containers/codecs for the clip table's ``bytes`` column.

The environment has no soundfile/librosa, so codecs are built on stdlib
``wave`` + ``audioop`` + numpy (SURVEY.md §7 constraint). Three codecs:

- ``pcm_s16le``: WAV/RIFF container, 16-bit PCM (magic ``RIFF``)
- ``ulaw``: G.711 μ-law payload in a minimal custom container (magic ``ODLU``)
- ``alaw``: G.711 A-law payload in a minimal custom container (magic ``ODLA``)

The custom container exists so every codec has sniffable magic bytes: the
1-1 analog rule checks magic ↔ ``codec`` column agreement, mirroring the
reference's extension/charset gate (csv_linter.py:50-79).

Container layout (little-endian): magic[4] | sample_rate u32 | n_frames u32 |
payload. Mono, 16-bit source throughout.

These functions run inside Arrow-batched pandas UDFs (one call per clip, but
over numpy arrays — the per-clip work is C-level in audioop/numpy).
"""

from __future__ import annotations

import audioop
import io
import struct
import wave

import numpy as np

_HDR = struct.Struct("<4sII")

CODEC_MAGIC: dict[str, bytes] = {
    "pcm_s16le": b"RIFF",
    "ulaw": b"ODLU",
    "alaw": b"ODLA",
}
CODECS = tuple(CODEC_MAGIC)
_MAGIC_TO_CODEC = {m: c for c, m in CODEC_MAGIC.items()}


def encode_clip(pcm: np.ndarray, sr_hz: int, codec: str) -> bytes:
    """Encode int16 mono PCM into the container for ``codec``."""
    if pcm.dtype != np.int16:
        raise ValueError("pcm must be int16")
    raw = pcm.tobytes()
    if codec == "pcm_s16le":
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr_hz)
            w.writeframes(raw)
        return buf.getvalue()
    if codec == "ulaw":
        return _HDR.pack(b"ODLU", sr_hz, len(pcm)) + audioop.lin2ulaw(raw, 2)
    if codec == "alaw":
        return _HDR.pack(b"ODLA", sr_hz, len(pcm)) + audioop.lin2alaw(raw, 2)
    raise ValueError(f"unknown codec: {codec}")


def sniff_codec(data: bytes) -> str | None:
    """Codec from magic bytes; None when unrecognized (rule 1-1 analog)."""
    if data is None or len(data) < 4:
        return None
    return _MAGIC_TO_CODEC.get(bytes(data[:4]))


def decode_clip(data: bytes) -> tuple[str, int, np.ndarray]:
    """Decode container bytes -> (codec, sample_rate, int16 PCM).

    Raises ValueError on any malformed input — callers inside UDF batches
    convert the exception into a violation row, never let it escape
    (mirrors decode-failure-as-lint-error, csv_linter.py:73-86).
    """
    codec = sniff_codec(data)
    if codec is None:
        raise ValueError("unrecognized magic bytes")
    if codec == "pcm_s16le":
        try:
            with wave.open(io.BytesIO(data), "rb") as w:
                if w.getsampwidth() != 2 or w.getnchannels() != 1:
                    raise ValueError("unsupported wav layout")
                sr = w.getframerate()
                raw = w.readframes(w.getnframes())
        # EOFError: the stdlib chunk reader raises it (not wave.Error) on a
        # RIFF header truncated mid-chunk (4-11 bytes) — it must become the
        # documented ValueError or one malformed clip kills a whole job
        except (wave.Error, EOFError) as e:
            raise ValueError(f"bad wav: {e}") from e
        return codec, sr, np.frombuffer(raw, dtype=np.int16)
    if len(data) < _HDR.size:
        raise ValueError("truncated g711 header")
    magic, sr, n_frames = _HDR.unpack_from(data)
    payload = data[_HDR.size:]
    if len(payload) != n_frames:
        raise ValueError("truncated g711 payload")
    if codec == "ulaw":
        raw = audioop.ulaw2lin(payload, 2)
    else:
        raw = audioop.alaw2lin(payload, 2)
    return codec, sr, np.frombuffer(raw, dtype=np.int16)


def pcm_to_float32(pcm: np.ndarray) -> np.ndarray:
    return (pcm.astype(np.float32)) / 32768.0


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """SNR of ``test`` against reference signal, in dB (float32 domain).

    +inf for exact match; -inf-ish (large negative) guarded to -99.0 when
    lengths mismatch entirely. The payload rule passes at SNR >= 30 dB
    (BASELINE.json:15).
    """
    if ref.shape != test.shape:
        return -99.0
    noise = ref.astype(np.float64) - test.astype(np.float64)
    p_sig = float(np.sum(ref.astype(np.float64) ** 2))
    p_noise = float(np.sum(noise**2))
    if p_noise == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return -99.0
    return 10.0 * np.log10(p_sig / p_noise)
