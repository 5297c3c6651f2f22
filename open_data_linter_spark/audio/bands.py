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
