"""F0 estimation for the `is_append_f0` data path.

The reference obtains F0 from WORLD vocoder analysis stored in the
DataUtterance proto (utterance.py:664-670; the analysis itself happens
outside the repo).  WORLD is unavailable here, so this provides a
self-contained autocorrelation pitch tracker with the same contract:
per-frame F0 in Hz, 0 for unvoiced frames, default search range matching
utterance.py:33-36 (48-400 Hz).
"""

from __future__ import annotations

import numpy as np


def estimate_f0(
    wav: np.ndarray,
    fs: float,
    frame_shift_ms: float = 5.0,
    frame_length_ms: float = 40.0,
    f0_floor: float = 48.0,
    f0_ceil: float = 400.0,
    voicing_threshold: float = 0.45,
) -> np.ndarray:
    """Normalized-autocorrelation F0 track.

    Returns (num_frames,) float64, 0.0 at unvoiced frames;
    num_frames = floor(len(wav) / shift) + 1 like WORLD's harvest.
    """
    wav = np.asarray(wav, dtype=np.float64)
    if wav.ndim > 1:
        wav = wav[:, 0]
    shift = int(fs * frame_shift_ms / 1000.0)
    size = int(fs * frame_length_ms / 1000.0)
    lag_min = int(fs / f0_ceil)
    lag_max = min(int(fs / f0_floor), size - 1)
    n_frames = len(wav) // shift + 1

    f0 = np.zeros(n_frames)
    energy_floor = 1e-9 + 0.01 * np.sqrt(np.mean(wav**2))
    half = size // 2
    padded = np.pad(wav, (half, size))
    for i in range(n_frames):
        frame = padded[i * shift : i * shift + size]
        frame = frame - frame.mean()
        rms = np.sqrt(np.mean(frame**2))
        if rms < energy_floor:
            continue
        # normalized autocorrelation over the lag search range
        spectrum = np.fft.rfft(frame, n=2 * size)
        ac = np.fft.irfft(spectrum * np.conj(spectrum))[: lag_max + 1]
        ac = ac / (ac[0] + 1e-12)
        search = ac[lag_min : lag_max + 1]
        best = int(np.argmax(search))
        if search[best] >= voicing_threshold:
            lag = lag_min + best
            # parabolic interpolation around the peak
            if 0 < best < len(search) - 1:
                y0, y1, y2 = search[best - 1], search[best], search[best + 1]
                denom = y0 - 2 * y1 + y2
                if abs(denom) > 1e-12:
                    lag = lag + 0.5 * (y0 - y2) / denom
            f0[i] = fs / lag
    return f0
