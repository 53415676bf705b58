"""STFT / mel parity tests.

The oracle below independently replicates the reference's conv-based STFT
formulation (src/common/stft.py:44-143: conv1d against a dense real/imag
Fourier basis on a reflect-padded signal; inverse via the pseudo-inverse
basis + window sum-square correction) in pure numpy.  The JAX frame+rFFT
implementation must agree to float32 tolerance.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fac_via_ppg_tpu.dsp import (
    STFT,
    TacotronSTFT,
    dynamic_range_compression,
    hann_window,
    mel_filterbank,
    window_sumsquare,
)
from fac_via_ppg_tpu.dsp.stft import pad_center


class NumpyConvSTFTOracle:
    """Reference-equivalent STFT via explicit Fourier-basis convolution."""

    def __init__(self, filter_length=800, hop_length=200, win_length=800):
        self.filter_length = filter_length
        self.hop_length = hop_length
        self.win_length = win_length
        scale = filter_length / hop_length
        fourier_basis = np.fft.fft(np.eye(filter_length))
        cutoff = filter_length // 2 + 1
        fourier_basis = np.vstack(
            [np.real(fourier_basis[:cutoff]), np.imag(fourier_basis[:cutoff])]
        )
        window = pad_center(hann_window(win_length, np.float64), filter_length)
        self.forward_basis = (fourier_basis * window).astype(np.float64)
        self.inverse_basis = (
            np.linalg.pinv(scale * fourier_basis).T * window
        ).astype(np.float64)
        self.window = window

    def transform(self, x):
        half = self.filter_length // 2
        x = np.pad(x, ((0, 0), (half, half)), mode="reflect")
        n_frames = (x.shape[1] - self.filter_length) // self.hop_length + 1
        cutoff = self.filter_length // 2 + 1
        out = np.zeros((x.shape[0], 2 * cutoff, n_frames))
        for k in range(n_frames):
            frame = x[:, k * self.hop_length : k * self.hop_length + self.filter_length]
            out[:, :, k] = frame @ self.forward_basis.T
        real, imag = out[:, :cutoff], out[:, cutoff:]
        return np.sqrt(real**2 + imag**2), np.arctan2(imag, real)

    def inverse(self, magnitude, phase):
        recombined = np.concatenate(
            [magnitude * np.cos(phase), magnitude * np.sin(phase)], axis=1
        )
        n_frames = magnitude.shape[-1]
        out_len = self.filter_length + self.hop_length * (n_frames - 1)
        out = np.zeros((magnitude.shape[0], out_len))
        # conv_transpose1d with stride = hop
        for k in range(n_frames):
            contrib = recombined[:, :, k] @ self.inverse_basis
            out[:, k * self.hop_length : k * self.hop_length + self.filter_length] += contrib
        wss = window_sumsquare(
            hann_window(self.win_length), n_frames, self.hop_length, self.filter_length
        )
        nz = wss > np.finfo(np.float32).tiny
        out[:, nz] /= wss[nz]
        out *= self.filter_length / self.hop_length
        half = self.filter_length // 2
        return out[:, half:-half]


@pytest.fixture
def wave(rng):
    t = np.arange(4000) / 16000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.randn(4000)
    return x.astype(np.float32)[None, :]


def test_transform_matches_conv_oracle(wave):
    stft = STFT(filter_length=1024, hop_length=160, win_length=1024)
    oracle = NumpyConvSTFTOracle(1024, 160, 1024)
    mag, phase = stft.transform(jnp.asarray(wave))
    mag_ref, phase_ref = oracle.transform(wave.astype(np.float64))
    assert mag.shape == mag_ref.shape
    np.testing.assert_allclose(np.asarray(mag), mag_ref, atol=2e-3)
    # Compare phase only where magnitude is non-negligible.
    significant = mag_ref > 1e-2
    err = np.abs(np.angle(np.exp(1j * (np.asarray(phase) - phase_ref))))
    assert err[significant].max() < 2e-2


def test_inverse_matches_conv_oracle(wave):
    stft = STFT(filter_length=1024, hop_length=160, win_length=1024)
    oracle = NumpyConvSTFTOracle(1024, 160, 1024)
    mag, phase = stft.transform(jnp.asarray(wave))
    rec = np.asarray(stft.inverse(mag, phase))[:, 0, :]
    rec_ref = oracle.inverse(*oracle.transform(wave.astype(np.float64)))
    n = min(rec.shape[1], rec_ref.shape[1])
    np.testing.assert_allclose(rec[:, :n], rec_ref[:, :n], atol=2e-3)


def test_roundtrip_reconstruction(wave):
    stft = STFT(filter_length=1024, hop_length=160, win_length=1024)
    mag, phase = stft.transform(jnp.asarray(wave))
    rec = np.asarray(stft.inverse(mag, phase))[:, 0, :]
    # Interior samples should be reconstructed nearly exactly.
    n = min(rec.shape[1], wave.shape[1])
    interior = slice(1024, n - 1024)
    np.testing.assert_allclose(rec[:, interior], wave[:, interior], atol=1e-3)


def test_num_frames_formula():
    stft = STFT(filter_length=1024, hop_length=160, win_length=1024)
    for n in [4000, 4079, 4081, 16000]:
        x = jnp.zeros((1, n))
        mag, _ = stft.transform(x)
        assert mag.shape[-1] == stft.num_frames(n)


def test_mel_filterbank_properties():
    basis = mel_filterbank(16000, 1024, 80, 0.0, 8000.0)
    assert basis.shape == (80, 513)
    # Every filter has positive mass and band edges increase.
    assert (basis.sum(axis=1) > 0).all()
    peaks = basis.argmax(axis=1)
    assert (np.diff(peaks) > 0).all()
    # Slaney normalization: peak amplitude shrinks as bands widen (log region).
    assert basis[70].max() < basis[5].max()


def test_mel_filterbank_matches_scalar_oracle():
    """Independent scalar evaluation of the Slaney triangle formula."""

    def hz_to_mel(f):
        if f < 1000.0:
            return f / (200.0 / 3.0)
        return 15.0 + np.log(f / 1000.0) / (np.log(6.4) / 27.0)

    def mel_to_hz(m):
        if m < 15.0:
            return m * (200.0 / 3.0)
        return 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0))

    sr, n_fft, n_mels, fmax = 16000, 1024, 80, 8000.0
    edges = [
        mel_to_hz(m)
        for m in np.linspace(hz_to_mel(0.0), hz_to_mel(fmax), n_mels + 2)
    ]
    basis = mel_filterbank(sr, n_fft, n_mels, 0.0, fmax)
    fftfreqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    rs = np.random.RandomState(0)
    for i in rs.choice(n_mels, 12, replace=False):
        f_lo, f_c, f_hi = edges[i], edges[i + 1], edges[i + 2]
        enorm = 2.0 / (f_hi - f_lo)
        for j in rs.choice(len(fftfreqs), 25, replace=False):
            g = fftfreqs[j]
            tri = min((g - f_lo) / (f_c - f_lo), (f_hi - g) / (f_hi - f_c))
            expected = enorm * max(0.0, tri)
            np.testing.assert_allclose(basis[i, j], expected, rtol=1e-4, atol=1e-9)


def test_mel_spectrogram_shapes_and_compression(wave):
    taco = TacotronSTFT(1024, 160, 1024, 80, 16000, 0.0, 8000.0)
    mel = taco.mel_spectrogram(jnp.asarray(wave))
    assert mel.shape == (1, 80, taco.stft_fn.num_frames(wave.shape[1]))
    # Log-compression floor: silence maps to log(1e-5).
    silent = taco.mel_spectrogram(jnp.zeros((1, 2000)))
    np.testing.assert_allclose(np.asarray(silent), np.log(1e-5), atol=1e-4)


def test_dynamic_range_compression_clip():
    x = jnp.array([0.0, 1e-6, 1e-5, 1.0])
    out = np.asarray(dynamic_range_compression(x))
    np.testing.assert_allclose(out[:3], np.log(1e-5), atol=1e-4)
    np.testing.assert_allclose(out[3], 0.0, atol=1e-6)
