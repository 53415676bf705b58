"""Native C++ front-end vs the numpy reference implementation."""

import numpy as np
import pytest

from fac_via_ppg_tpu import native
from fac_via_ppg_tpu.frontend import feat
from fac_via_ppg_tpu.frontend.mfcc import (
    FrameExtractionOptions,
    MfccOptions,
    compute_mfcc,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


@pytest.fixture
def wav(rng):
    t = np.arange(24000) / 16000.0
    return (
        3000 * np.sin(2 * np.pi * 180 * t) + 400 * rng.randn(24000)
    ).astype(np.float64)


def _opts(dither=0.0, **kw):
    return MfccOptions(
        frame_opts=FrameExtractionOptions(snip_edges=False, dither=dither, **kw),
        use_energy=False,
    )


def test_native_mfcc_matches_numpy(wav):
    opts = _opts()
    ref = compute_mfcc(wav, 16000, opts, backend="numpy")
    nat = native.mfcc_compute(wav, 16000, opts)
    assert nat is not None
    assert nat.shape == ref.shape
    np.testing.assert_allclose(nat, ref, atol=1e-3)


def test_native_mfcc_snip_edges(wav):
    opts = MfccOptions(
        frame_opts=FrameExtractionOptions(snip_edges=True, dither=0.0),
        use_energy=False,
    )
    ref = compute_mfcc(wav, 16000, opts, backend="numpy")
    nat = native.mfcc_compute(wav, 16000, opts)
    assert nat.shape == ref.shape
    np.testing.assert_allclose(nat, ref, atol=1e-3)


def test_native_mfcc_with_energy(wav):
    opts = MfccOptions(
        frame_opts=FrameExtractionOptions(snip_edges=False, dither=0.0),
        use_energy=True,
    )
    ref = compute_mfcc(wav, 16000, opts, backend="numpy")
    nat = native.mfcc_compute(wav, 16000, opts)
    np.testing.assert_allclose(nat, ref, atol=1e-3)


def test_native_dither_deterministic(wav):
    opts = _opts(dither=1.0)
    a = native.mfcc_compute(wav, 16000, opts, seed=3)
    b = native.mfcc_compute(wav, 16000, opts, seed=3)
    c = native.mfcc_compute(wav, 16000, opts, seed=4)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0


def test_native_cmn(rng):
    feats = rng.randn(50, 13).astype(np.float32) + 3.0
    out = native.cmn(feats)
    ref = feat.apply_cepstral_mean_norm(feats)
    np.testing.assert_allclose(out, ref, atol=1e-5)
    assert abs(out.sum()) < 1e-2


def test_native_splice(rng):
    feats = rng.randn(20, 5).astype(np.float32)
    out = native.splice(feats, 3, 3)
    ref = feat.splice_frames(feats, 3, 3)
    np.testing.assert_array_equal(out, ref)


def test_native_transform(rng):
    feats = rng.randn(20, 91).astype(np.float32)
    linear = rng.randn(40, 91).astype(np.float32)
    np.testing.assert_allclose(
        native.apply_transform(feats, linear),
        feat.apply_feat_transform(feats, linear),
        atol=1e-4,
    )
    affine = rng.randn(40, 92).astype(np.float32)
    np.testing.assert_allclose(
        native.apply_transform(feats, affine),
        feat.apply_feat_transform(feats, affine),
        atol=1e-4,
    )
    with pytest.raises(ValueError):
        native.apply_transform(feats, rng.randn(40, 50).astype(np.float32))
