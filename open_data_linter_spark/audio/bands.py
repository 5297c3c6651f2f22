"""Shared log-band frequency grid for audio fingerprinting.

One place for the analysis constants so the fingerprint operator
(dedup/audio_fp.py) and the tone-sequence fixture generator
(audio/synth.py) agree on the band geometry without importing each other.

The grid follows the published audio-fingerprinting literature (Haitsma &
Kalker 2002 split 300-2000 Hz into 33 log bands; Wang 2003 hashes spectral
peak positions): 48 logarithmically spaced bands between 150 and 3800 Hz.
The 3800 Hz ceiling keeps every band below the Nyquist frequency of the
lowest supported sample rate (8000 Hz), so the same band ids are defined
for every clip regardless of sr.
"""

from __future__ import annotations

import numpy as np

N_BANDS = 48
F_LO, F_HI = 150.0, 3800.0

# band b covers [EDGES[b], EDGES[b+1]) — left-closed, geometric spacing
EDGES = np.geomspace(F_LO, F_HI, N_BANDS + 1)

# fixture tone alphabet: geometric mid-band frequencies. Placing planted
# tones mid-band makes the ground truth unambiguous (a tone exactly on a
# band edge would split its spectral peak across two bands and the argmax
# would be noise-determined); the fingerprint itself never uses this grid.
TONE_GRID = np.sqrt(EDGES[:-1] * EDGES[1:])

# analysis frame geometry, fixed in TIME so a clip and its re-encode (same
# sample rate) frame identically
FRAME_S = 0.064
HOP_S = 0.032


def band_energies(x: np.ndarray, sr: int) -> np.ndarray:
    """Per-frame energy in each log band: (n_frames, N_BANDS) float64.

    ``x`` is float PCM in [-1, 1]. The shared spectral front end for the
    fingerprint operator (dedup/audio_fp.py takes the per-frame argmax)
    and the embedding operator (multimodal/media.py mean-pools over
    frames). Clips shorter than one frame return a (0, N_BANDS) matrix."""
    frame = int(round(sr * FRAME_S))
    hop = int(round(sr * HOP_S))
    if len(x) < frame:
        return np.zeros((0, N_BANDS))
    frames = np.lib.stride_tricks.sliding_window_view(x, frame)[::hop]
    p = np.abs(np.fft.rfft(frames * np.hanning(frame), axis=1)) ** 2
    freqs = np.fft.rfftfreq(frame, 1.0 / sr)
    # bands are contiguous bin ranges (freqs ascending): reduceat segment
    # sums. EDGES[-1]=3800 < Nyquist>=4000 for every supported sr, so every
    # boundary index is in range.
    bounds = np.searchsorted(freqs, EDGES, side="left")
    # reduceat over ALL 49 edges, then drop the trailing segment: passing
    # bounds[:-1] would make band 47 run from EDGES[47] to Nyquist instead
    # of [EDGES[47], 3800), absorbing every above-grid energy (hiss,
    # sibilance) and breaking the sr-invariance contract above.
    e = np.add.reduceat(p, bounds, axis=1)[:, :-1]
    # reduceat quirk: an EMPTY segment (possible at sr=8000 where low bands
    # are narrower than one bin) yields p[start] instead of 0 — zero it
    empty = bounds[1:] <= bounds[:-1]
    if empty.any():
        e[:, empty] = 0.0
    return e
