"""STFT / iSTFT and mel-spectrogram front-end as jitted XLA functions.

Numerics match the reference implementation (src/common/stft.py:44-143,
src/common/layers.py:74-112), which computes the STFT as a conv1d against a
precomputed real/imag Fourier basis on a reflect-padded signal.  A conv
against a dense DFT basis is a GPU-era trick; on TPU the natural formulation
is framing (a strided gather) followed by a real FFT — mathematically
identical (the conv rows ARE windowed DFT atoms) and XLA-friendly: the mel
projection becomes one (n_mels, n_bins) matmul on the MXU fused with the
log-compression that follows.

Equivalences (validated in tests/test_stft.py against an independent numpy
replication of the conv formulation):
  transform:  frame_k = x_pad[k*hop : k*hop + n_fft]
              S_k     = rfft(window * frame_k);  magnitude, phase
  inverse:    y = OLA_k(window * irfft(mag_k * e^{i phase_k})) / wss
              trimmed by n_fft//2 on both sides, wss = window sum-square
              envelope (reference src/common/audio_processing.py:39-88).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from fac_via_ppg_tpu.dsp.mel import mel_filterbank

_TINY_F32 = float(np.finfo(np.float32).tiny)


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic (fftbins=True) Hann window, as scipy.signal.get_window('hann', n)."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return w.astype(dtype)


def pad_center(window: np.ndarray, size: int) -> np.ndarray:
    """Zero-pad a window symmetrically to `size` (librosa.util.pad_center)."""
    n = len(window)
    lpad = (size - n) // 2
    return np.pad(window, (lpad, size - n - lpad))


def window_sumsquare(
    window: np.ndarray, n_frames: int, hop_length: int, n_fft: int
) -> np.ndarray:
    """Sum-square OLA envelope of the analysis window.

    Mirrors reference audio_processing.py:39-88 (itself from librosa 0.6).
    `window` must already be the win_length window; it is squared and
    center-padded to n_fft here.
    """
    n = n_fft + hop_length * (n_frames - 1)
    x = np.zeros(n, dtype=np.float64)
    win_sq = pad_center(np.asarray(window, dtype=np.float64) ** 2, n_fft)
    for i in range(n_frames):
        sample = i * hop_length
        x[sample : min(n, sample + n_fft)] += win_sq[: max(0, min(n_fft, n - sample))]
    return x.astype(np.float32)


@dataclass(frozen=True)
class STFT:
    """Static STFT configuration + precomputed constants.

    Defaults mirror the reference STFT (src/common/stft.py:46).
    """

    filter_length: int = 800
    hop_length: int = 200
    win_length: int = 800
    window: str | None = "hann"
    padded_window: np.ndarray = field(init=False, repr=False, compare=False)

    def __post_init__(self):
        if self.window is not None:
            assert self.filter_length >= self.win_length
            if self.window != "hann":
                raise ValueError("Only the hann window is supported.")
            w = pad_center(hann_window(self.win_length), self.filter_length)
        else:
            w = np.ones(self.filter_length, dtype=np.float32)
        object.__setattr__(self, "padded_window", w)

    # ---------------------------------------------------------------- frames
    def num_frames(self, num_samples: int) -> int:
        padded = num_samples + 2 * (self.filter_length // 2)
        return (padded - self.filter_length) // self.hop_length + 1

    def _frame(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T) -> (B, n_frames, filter_length) on the reflect-padded signal."""
        half = self.filter_length // 2
        x = jnp.pad(x, ((0, 0), (half, half)), mode="reflect")
        n_frames = (x.shape[1] - self.filter_length) // self.hop_length + 1
        starts = np.arange(n_frames) * self.hop_length
        idx = starts[:, None] + np.arange(self.filter_length)[None, :]
        return x[:, idx]

    # ------------------------------------------------------------- transform
    @functools.partial(jax.jit, static_argnums=0)
    def transform(self, x: jnp.ndarray):
        """(B, T) waveform -> (magnitude, phase), each (B, n_bins, n_frames)."""
        frames = self._frame(x) * jnp.asarray(self.padded_window)
        spec = jnp.fft.rfft(frames, n=self.filter_length, axis=-1)
        real = jnp.real(spec).astype(jnp.float32)
        imag = jnp.imag(spec).astype(jnp.float32)
        magnitude = jnp.sqrt(real**2 + imag**2)
        phase = jnp.arctan2(imag, real)
        # (B, n_frames, n_bins) -> (B, n_bins, n_frames) like the reference.
        return magnitude.transpose(0, 2, 1), phase.transpose(0, 2, 1)

    @functools.partial(jax.jit, static_argnums=0)
    def magnitude(self, x: jnp.ndarray) -> jnp.ndarray:
        """Magnitude-only fast path (skips phase; XLA fuses into mel matmul)."""
        frames = self._frame(x) * jnp.asarray(self.padded_window)
        spec = jnp.fft.rfft(frames, n=self.filter_length, axis=-1)
        mag = jnp.abs(spec).astype(jnp.float32)
        return mag.transpose(0, 2, 1)

    # --------------------------------------------------------------- inverse
    def inverse(self, magnitude: jnp.ndarray, phase: jnp.ndarray) -> jnp.ndarray:
        """(B, n_bins, n_frames) x2 -> (B, 1, T) waveform (reference layout)."""
        n_frames = magnitude.shape[-1]
        return self._inverse_jit(magnitude, phase, n_frames)

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _inverse_jit(self, magnitude, phase, n_frames: int):
        spec = magnitude * jnp.exp(1j * phase.astype(jnp.complex64))
        # (B, n_bins, F) -> (B, F, n_bins)
        spec = spec.transpose(0, 2, 1)
        frames = jnp.fft.irfft(spec, n=self.filter_length, axis=-1)
        frames = frames * jnp.asarray(self.padded_window)

        out_len = self.filter_length + self.hop_length * (n_frames - 1)
        starts = np.arange(n_frames) * self.hop_length
        idx = starts[:, None] + np.arange(self.filter_length)[None, :]
        out = jnp.zeros((frames.shape[0], out_len), frames.dtype)
        out = out.at[:, idx].add(frames)

        if self.window is not None:
            wss = window_sumsquare(
                hann_window(self.win_length), n_frames, self.hop_length,
                self.filter_length,
            )
            # Only correct where the envelope is numerically nonzero
            # (reference stft.py:125-130).
            safe = wss > _TINY_F32
            out = jnp.where(safe[None, :], out / jnp.where(safe, wss, 1.0)[None, :], out)

        half = self.filter_length // 2
        out = out[:, half:-half]
        return out[:, None, :]


def dynamic_range_compression(x: jnp.ndarray, C: float = 1.0, clip_val: float = 1e-5):
    """log(clip(x) * C)  (reference audio_processing.py:110-116)."""
    return jnp.log(jnp.clip(x, min=clip_val) * C)


def dynamic_range_decompression(x: jnp.ndarray, C: float = 1.0):
    return jnp.exp(x) / C


@dataclass(frozen=True)
class TacotronSTFT:
    """Waveform -> log-mel spectrogram (reference src/common/layers.py:74-112).

    One fused XLA pipeline: reflect pad -> frame -> rFFT -> |.| -> mel matmul
    (MXU) -> log compression.
    """

    filter_length: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mel_channels: int = 80
    sampling_rate: int = 22050
    mel_fmin: float = 0.0
    mel_fmax: float = 8000.0
    stft_fn: STFT = field(init=False, repr=False, compare=False)
    mel_basis: np.ndarray = field(init=False, repr=False, compare=False)

    def __post_init__(self):
        object.__setattr__(
            self,
            "stft_fn",
            STFT(self.filter_length, self.hop_length, self.win_length, "hann"),
        )
        object.__setattr__(
            self,
            "mel_basis",
            mel_filterbank(
                self.sampling_rate,
                self.filter_length,
                self.n_mel_channels,
                self.mel_fmin,
                self.mel_fmax,
            ),
        )

    def spectral_normalize(self, magnitudes):
        return dynamic_range_compression(magnitudes)

    def spectral_de_normalize(self, magnitudes):
        return dynamic_range_decompression(magnitudes)

    @functools.partial(jax.jit, static_argnums=0)
    def mel_spectrogram(self, y: jnp.ndarray) -> jnp.ndarray:
        """(B, T) in [-1, 1] -> (B, n_mel_channels, n_frames) log-mel."""
        mag = self.stft_fn.magnitude(y)
        mel = jnp.einsum(
            "mf,bft->bmt", jnp.asarray(self.mel_basis), mag,
            preferred_element_type=jnp.float32,
        )
        return dynamic_range_compression(mel)


def griffin_lim(magnitudes, stft_fn: STFT, n_iters: int = 30, seed: int = 0):
    """Griffin-Lim phase reconstruction (reference audio_processing.py:91-107)."""
    key = jax.random.PRNGKey(seed)
    angles = jax.random.uniform(
        key, magnitudes.shape, minval=-np.pi, maxval=np.pi
    ).astype(jnp.float32)
    signal = stft_fn.inverse(magnitudes, angles)[:, 0, :]
    for _ in range(n_iters):
        _, angles = stft_fn.transform(signal)
        signal = stft_fn.inverse(magnitudes, angles)[:, 0, :]
    return signal
