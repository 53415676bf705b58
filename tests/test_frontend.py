"""Front-end tests.

Mirror the reference test semantics (test/test_feat.py, test/test_ppg.py):
frame-count formula, MFCC dims, CMN sums to ~0, LDA shapes, sparse-matrix
mass, PPG rows sum to 1 — plus importer round-trips and numpy/JAX MFCC
agreement that the reference could not test (its torch side had no coverage).
"""

import os
import tempfile

import numpy as np
import pytest

from fac_via_ppg_tpu.frontend import feat, kaldi_io, nnet3
from fac_via_ppg_tpu.frontend.mfcc import (
    FrameExtractionOptions,
    MfccJax,
    MfccOptions,
    compute_mfcc,
    num_frames,
)

REFERENCE_DATA = "/root/reference/data/feats"


@pytest.fixture
def wav16k(rng):
    t = np.arange(32000) / 16000.0
    x = 2000 * np.sin(2 * np.pi * 220 * t) + 300 * rng.randn(32000)
    return x.astype(np.float64)


def _opts(dither=0.0, **kw):
    return MfccOptions(
        frame_opts=FrameExtractionOptions(
            snip_edges=False, allow_downsample=True, dither=dither, **kw
        ),
        use_energy=False,
    )


# ---------------------------------------------------------------- Kaldi I/O

def test_read_reference_lda_matrix():
    lda = kaldi_io.read_matrix(os.path.join(REFERENCE_DATA, "final.mat"))
    assert lda.shape == (40, 91)  # 13 MFCC x 7 context frames
    assert np.isfinite(lda).all()


def test_read_reference_sparse_matrix():
    sm = kaldi_io.read_sparse_matrix(os.path.join(REFERENCE_DATA, "reduce_dim.mat"))
    assert sm.shape == (40, 5816)
    # "This is a special matrix" (reference test_feat.py:87)
    assert sm.sum() == 5816


def test_matrix_roundtrip(rng, tmp_path):
    m = rng.randn(17, 23).astype(np.float32)
    path = str(tmp_path / "m.mat")
    kaldi_io.write_matrix(path, m)
    np.testing.assert_array_equal(kaldi_io.read_matrix(path), m)


def test_sparse_roundtrip(rng, tmp_path):
    s = (rng.rand(5, 30) > 0.8).astype(np.float32) * rng.rand(5, 30).astype(np.float32)
    path = str(tmp_path / "s.mat")
    kaldi_io.write_sparse_matrix(path, s)
    np.testing.assert_array_equal(kaldi_io.read_sparse_matrix(path), s)


# -------------------------------------------------------------------- MFCC

def test_mfcc_dims_and_frame_count(wav16k):
    feats = compute_mfcc(wav16k, 16000, _opts())
    assert feats.shape[1] == 13  # default MFCC dims
    # snip_edges=False frame count == round(samples / shift)
    # (reference test_feat.py:61-64)
    expected = int(round(len(wav16k) / (16000 * 10.0 / 1000)))
    assert feats.shape[0] == expected


def test_mfcc_frame_count_rounding():
    opts = FrameExtractionOptions(snip_edges=False)
    assert num_frames(16000, opts) == 100
    assert num_frames(16079, opts) == 100
    assert num_frames(16080, opts) == 101


def test_mfcc_downsampling(wav16k):
    # 32 kHz input downsampled to 16 kHz before analysis.
    up = np.repeat(wav16k, 2)  # crude 2x upsample is fine as a test signal
    feats = compute_mfcc(up, 32000, _opts())
    expected = int(round(len(up) / (32000 * 10.0 / 1000)))
    assert abs(feats.shape[0] - expected) <= 1
    assert feats.shape[1] == 13


def test_mfcc_rejects_wrong_rate_without_downsample(wav16k):
    opts = MfccOptions(
        frame_opts=FrameExtractionOptions(snip_edges=False, allow_downsample=False),
        use_energy=False,
    )
    with pytest.raises(ValueError):
        compute_mfcc(wav16k, 44100, opts)


def test_mfcc_first_channel_only(wav16k):
    stereo = np.stack([wav16k, np.zeros_like(wav16k)], axis=1)
    a = compute_mfcc(stereo, 16000, _opts())
    b = compute_mfcc(wav16k, 16000, _opts())
    np.testing.assert_array_equal(a, b)


def test_mfcc_jax_matches_numpy(wav16k):
    import jax.numpy as jnp

    opts = _opts()
    ref = compute_mfcc(wav16k, 16000, opts)
    jx = MfccJax(opts)
    out = np.asarray(jx(jnp.asarray(wav16k, dtype=jnp.float32), len(wav16k)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-2)


def test_mfcc_dither_reproducible(wav16k):
    a = compute_mfcc(wav16k, 16000, _opts(dither=1.0), seed=7)
    b = compute_mfcc(wav16k, 16000, _opts(dither=1.0), seed=7)
    c = compute_mfcc(wav16k, 16000, _opts(dither=1.0), seed=8)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0


# ------------------------------------------------------------ feat plumbing

def test_cmn_sums_to_zero(wav16k):
    feats = compute_mfcc(wav16k, 16000, _opts())
    normed = feat.apply_cepstral_mean_norm(feats)
    assert abs(normed.sum()) < 1e-2  # reference test_feat.py:72


def test_splice_frames_shape_and_edges(rng):
    x = rng.randn(10, 3).astype(np.float32)
    sp = feat.splice_frames(x, 3, 3)
    assert sp.shape == (10, 21)
    # First frame's left context clamps to frame 0.
    np.testing.assert_array_equal(sp[0, :3], x[0])
    np.testing.assert_array_equal(sp[0, 9:12], x[0])
    # Last frame's right context clamps to the last frame.
    np.testing.assert_array_equal(sp[-1, -3:], x[-1])


def test_lda_transform_shapes(wav16k):
    lda = kaldi_io.read_matrix(os.path.join(REFERENCE_DATA, "final.mat"))
    feats = compute_mfcc(wav16k, 16000, _opts())
    spliced = feat.splice_frames(feats, 3, 3)
    out = feat.apply_feat_transform(spliced, lda)
    assert out.shape == (feats.shape[0], 40)  # reference test_feat.py:82-83


def test_affine_transform_offset_column(rng):
    x = rng.randn(5, 4).astype(np.float32)
    linear = rng.randn(3, 4).astype(np.float32)
    offset = rng.randn(3).astype(np.float32)
    affine = np.concatenate([linear, offset[:, None]], axis=1)
    out = feat.apply_feat_transform(x, affine)
    np.testing.assert_allclose(out, x @ linear.T + offset, rtol=1e-5)


def test_transform_bad_dims_raises(rng):
    with pytest.raises(ValueError):
        feat.apply_feat_transform(rng.randn(5, 4), rng.randn(3, 9))


# -------------------------------------------------------------------- nnet3

def test_nnet3_roundtrip_and_forward(tmp_path):
    net = nnet3.make_random_tdnn(
        input_dim=8, output_dim=20, hidden_dim=16, num_layers=2, seed=3
    )
    path = str(tmp_path / "net.txt")
    nnet3.write_nnet3_text(net, path)
    net2 = nnet3.load_nnet3(path)

    import jax.numpy as jnp

    x = jnp.asarray(np.random.RandomState(0).randn(12, 8), dtype=jnp.float32)
    out1 = np.asarray(net.forward(x))
    out2 = np.asarray(net2.forward(x))
    assert out1.shape == (12, 20)
    np.testing.assert_allclose(out1, out2, rtol=1e-5, atol=1e-6)
    # Softmax output: rows sum to 1 (reference test_ppg.py:54).
    np.testing.assert_allclose(out1.sum(axis=1), 1.0, atol=1e-5)


def test_nnet3_context():
    net = nnet3.make_random_tdnn(input_dim=8, output_dim=10, hidden_dim=8,
                                 num_layers=2, seed=0)
    # layers use +-1 then +-3 context
    assert net.left_context() == 4
    assert net.right_context() == 4


def test_nnet3_offset_clamps_at_edges():
    import jax.numpy as jnp

    # Single affine on Offset(input, -1): row 0 must reuse row 0 (edge clamp,
    # matching DecodableNnetSimple's input padding).
    nodes = {
        "input": nnet3.Node("input", "input", dim=2),
        "aff": nnet3.Node(
            "component", "aff", component="aff",
            descriptor=nnet3.parse_descriptor("Offset(input, -1)"),
        ),
        "output": nnet3.Node(
            "output", "output", descriptor=nnet3.parse_descriptor("aff")
        ),
    }
    comps = {
        "aff": nnet3.Component(
            "NaturalGradientAffineComponent",
            {"LinearParams": np.eye(2, dtype=np.float32),
             "BiasParams": np.zeros(2, dtype=np.float32)},
        )
    }
    net = nnet3.Nnet3(nodes, ["input", "aff", "output"], comps)
    x = jnp.asarray(np.arange(6, dtype=np.float32).reshape(3, 2))
    out = np.asarray(net.forward(x))
    np.testing.assert_array_equal(out[0], x[0])
    np.testing.assert_array_equal(out[1], x[0])
    np.testing.assert_array_equal(out[2], x[1])


def test_descriptor_parser():
    d = nnet3.parse_descriptor(
        "Append(Offset(input, -2), input, Sum(a, Scale(0.5, b)))"
    )
    assert d.op == "append" and len(d.args) == 3
    assert d.args[0].op == "offset" and d.args[0].offset == -2
    assert d.args[2].op == "sum"
    assert d.args[2].args[1].scale == 0.5


# ---------------------------------------------------------------------- PPG

def test_full_ppg_pipeline(tmp_path, rng):
    from fac_via_ppg_tpu.frontend import ppg as P
    from fac_via_ppg_tpu.scripts.make_substitute_am import make_bundle

    make_bundle(str(tmp_path), n_senones=50, n_phones=10, hidden_dim=16,
                num_layers=2)
    deps = P.DependenciesPPG(
        nnet_path=str(tmp_path / "am" / "final.raw.txt"),
        lda_path=str(tmp_path / "feats" / "final.mat"),
        reduce_dim_path=str(tmp_path / "feats" / "reduce_dim.mat"),
        splice_opts_path=str(tmp_path / "feats" / "splice_opts"),
    )
    assert (deps.left_context, deps.right_context) == ("3", "3")

    wav = (rng.randn(8000) * 2000).astype(np.int16)
    full = P.compute_full_ppg_wrapper(wav, 16000, deps.nnet, deps.lda, 10,
                                      dither=0.0)
    assert full.shape == (50, 50)  # 0.5 s at 10 ms -> 50 frames; 50 senones
    np.testing.assert_allclose(full.sum(axis=1), 1.0, atol=1e-4)

    mono = P.compute_monophone_ppg(
        wav, 16000, deps.nnet, deps.lda, deps.monophone_trans, 10, dither=0.0
    )
    assert mono.shape == (50, 10)
    # Monophone reduction preserves probability mass (reference
    # test_ppg.py:56-73).
    np.testing.assert_allclose(mono.sum(axis=1), 1.0, atol=1e-4)


# ---------------------------------------------------------- spec golden pins
# Literal expected values derived independently from the Kaldi formulas
# (feature-window.cc, mel-computations.cc, ComputeDctMatrix, ComputeLifter-
# Coeffs), NOT from this package: they pin the numerics so mfcc.py and the
# C++ twin native/src/frontend.cc cannot drift in lockstep.  Reference
# behavior under test: /root/reference/src/common/feat.py:74-98 (Kaldi
# MFCC, 16 kHz, 25 ms povey frames, 10 ms shift, snip_edges=False).

def test_golden_povey_window_values():
    from fac_via_ppg_tpu.frontend.mfcc import (
        FrameExtractionOptions, feature_window,
    )

    w = feature_window(FrameExtractionOptions())  # 400-sample povey
    assert w.shape == (400,)
    # (0.5 - 0.5 cos(2 pi n / 399))^0.85
    np.testing.assert_allclose(w[0], 0.0, atol=1e-12)
    np.testing.assert_allclose(w[1], 0.0002651509774601967, rtol=1e-10)
    np.testing.assert_allclose(w[100], 0.5566406644983896, rtol=1e-10)
    np.testing.assert_allclose(w[200], 0.9999868261974606, rtol=1e-10)
    np.testing.assert_allclose(w[399], 0.0, atol=1e-12)
    np.testing.assert_allclose(w[199], w[200], rtol=1e-12)  # symmetric peak


def test_golden_frame_counts():
    from fac_via_ppg_tpu.frontend.mfcc import (
        FrameExtractionOptions, num_frames,
    )

    nosnip = FrameExtractionOptions(snip_edges=False)
    # (S + shift/2) // shift
    assert num_frames(16000, nosnip) == 100
    assert num_frames(15999, nosnip) == 100
    assert num_frames(8039, nosnip) == 50
    assert num_frames(399, nosnip) == 2
    assert num_frames(80, nosnip) == 1
    assert num_frames(79, nosnip) == 0
    snip = FrameExtractionOptions(snip_edges=True)
    # 1 + (S - size) // shift
    assert num_frames(16000, snip) == 98
    assert num_frames(400, snip) == 1
    assert num_frames(399, snip) == 0


def test_golden_edge_reflection_indices():
    from fac_via_ppg_tpu.frontend.mfcc import (
        FrameExtractionOptions, frame_indices,
    )

    idx = frame_indices(16000, FrameExtractionOptions(snip_edges=False))
    # first frame starts at -120; s < 0 reflects to -s-1
    assert idx[0, 0] == 119 and idx[0, 1] == 118
    assert idx[0, 119] == 0 and idx[0, 120] == 0 and idx[0, 121] == 1
    assert idx[0, -1] == 279
    # last frame starts at 15720; s >= S reflects to 2S-1-s
    assert idx[-1, 0] == 15720
    assert idx[-1, 279] == 15999 and idx[-1, 280] == 15999
    assert idx[-1, -1] == 15880


def test_golden_mel_bank_geometry():
    from fac_via_ppg_tpu.frontend.mfcc import (
        FrameExtractionOptions, MelBanksOptions, mel_banks, _mel_scale_htk,
    )

    # mel(f) = 1127 ln(1 + f/700); 23 bins spanning 20 Hz .. nyquist
    np.testing.assert_allclose(
        _mel_scale_htk(20.0), 31.748578341466644, rtol=1e-12
    )
    np.testing.assert_allclose(
        _mel_scale_htk(8000.0), 2840.0377117383778, rtol=1e-12
    )
    banks = mel_banks(MelBanksOptions(), FrameExtractionOptions())
    assert banks.shape == (23, 256)  # nyquist bin dropped
    # triangular weights at hand-computed FFT bins (bin = k * 31.25 Hz)
    np.testing.assert_allclose(banks[0, 3], 0.9392369653749131, rtol=1e-9)
    np.testing.assert_allclose(banks[0, 4], 0.688844746310945, rtol=1e-9)
    np.testing.assert_allclose(banks[1, 5], 0.6692443363707117, rtol=1e-9)
    np.testing.assert_allclose(banks[2, 8], 0.6699519247135282, rtol=1e-9)
    np.testing.assert_allclose(banks[0, 10], 0.0, atol=1e-12)
    # every filter is a partition of unity where triangles overlap fully
    assert banks.max() <= 1.0 + 1e-12


def test_golden_dct_and_lifter_rows():
    from fac_via_ppg_tpu.frontend.mfcc import dct_matrix, lifter_coeffs

    dct = dct_matrix(13, 23)
    np.testing.assert_allclose(dct[0], 0.20851441405707477, rtol=1e-12)
    np.testing.assert_allclose(dct[1, 0], 0.2941964698482033, rtol=1e-10)
    np.testing.assert_allclose(dct[12, 22], 0.20127394123166248, rtol=1e-10)
    # orthonormal rows
    np.testing.assert_allclose(dct @ dct.T, np.eye(13), atol=1e-12)

    lift = lifter_coeffs(13, 22.0)
    np.testing.assert_allclose(lift[0], 1.0, rtol=1e-12)
    np.testing.assert_allclose(lift[1], 2.5654632210061363, rtol=1e-10)
    np.testing.assert_allclose(lift[6], 9.313245317896842, rtol=1e-10)
    np.testing.assert_allclose(lift[12], 11.88803586069026, rtol=1e-10)


# The 13 cepstra of one deterministic frame, computed by an independent
# from-the-spec pipeline (remove-DC -> raw energy -> preemph 0.97 with
# x[0] -= 0.97 x[0] -> povey -> 512-FFT power -> 23 mel -> log -> DCT-II
# -> lifter Q=22 -> C0 = raw log energy).  Input: one 440 Hz sine period
# set, frame 1 of snip_edges=False framing (samples 40..439, interior).
GOLDEN_FRAME = np.array([
    21.48752393, 35.55915372, 49.11168063, -9.54441271, -54.80111368,
    -77.17496234, -73.15164786, -48.76179697, -31.82245652, 4.28555171,
    21.92895756, 23.36869716, 25.28961983,
])


def _golden_wav():
    t = np.arange(480)
    return np.round(3276.7 * np.sin(2 * np.pi * 440.0 * t / 16000.0))


@pytest.mark.parametrize("backend", ["numpy", "native"])
def test_golden_full_frame(backend):
    from fac_via_ppg_tpu.frontend.mfcc import (
        FrameExtractionOptions, MfccOptions, compute_mfcc,
    )

    opts = MfccOptions(
        frame_opts=FrameExtractionOptions(dither=0.0, snip_edges=False)
    )
    try:
        out = compute_mfcc(_golden_wav(), 16000.0, opts, backend=backend)
    except RuntimeError:
        pytest.skip("native frontend library unavailable")
    assert out.shape == (3, 13)
    np.testing.assert_allclose(out[1], GOLDEN_FRAME, rtol=2e-6, atol=2e-5)


# ------------------------------------------ real reference wav fixtures

REF_MONO = "/root/reference/test/data/test_mono_channel.wav"
REF_DUAL = "/root/reference/test/data/test_dual_channel.wav"


@pytest.mark.skipif(not os.path.exists(REF_MONO),
                    reason="reference mount unavailable")
def test_reference_wav_fixtures_first_channel():
    """The reference's own test wavs (test_feat.py:31-53 semantics): the
    dual-channel file reduces to its first channel, and the mono pipeline
    produces the documented 13-dim MFCC with the snip_edges=False frame
    count."""
    from fac_via_ppg_tpu.frontend import feat

    fs_m, mono = feat.read_wav(REF_MONO)
    fs_d, dual_first = feat.read_wav(REF_DUAL)
    assert mono.ndim == 1 and dual_first.ndim == 1

    from scipy.io import wavfile

    _, raw_dual = wavfile.read(REF_DUAL)
    assert raw_dual.ndim == 2  # really two channels on disk
    np.testing.assert_array_equal(
        dual_first, raw_dual[:, 0].astype(dual_first.dtype)
    )

    opts = MfccOptions(
        frame_opts=FrameExtractionOptions(snip_edges=False,
                                          allow_downsample=True,
                                          samp_freq=fs_m),
        use_energy=False,
    )
    feats = compute_mfcc(mono, fs_m, opts, seed=0)
    assert feats.shape[1] == 13
    shift = opts.frame_opts.frame_shift_ms / 1000.0
    assert feats.shape[0] == int(round(len(mono) / (fs_m * shift)))


# --------------------------------------------------------------------------
# DeviceFeaturizer: batched device featurization (hparams.featurize_device)
# --------------------------------------------------------------------------

def test_device_featurizer_matches_host_path(tmp_path):
    """The batched device MFCC->CMN->splice->LDA->TDNN program must equal
    the host per-utterance path (reference compute_ppg.py:98-136
    semantics) to float tolerance, including ragged lengths across one
    padded bucket and the per-utterance Kaldi edge reflection."""
    from fac_via_ppg_tpu.frontend.ppg import (
        DependenciesPPG,
        DeviceFeaturizer,
        compute_full_ppg_wrapper,
    )
    from fac_via_ppg_tpu.scripts.make_substitute_am import make_bundle

    bundle = tmp_path / "bundle"
    make_bundle(str(bundle), n_senones=24, n_phones=6, hidden_dim=8,
                num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(bundle / "am" / "final.raw.txt"),
        lda_path=str(bundle / "feats" / "final.mat"),
        reduce_dim_path=str(bundle / "feats" / "reduce_dim.mat"),
        splice_opts_path=str(bundle / "feats" / "splice_opts"),
    )
    rng = np.random.RandomState(3)
    wavs = [(rng.randn(int(16000 * s)) * 3000).astype(np.float64)
            for s in (0.61, 0.40, 0.83)]
    host = [compute_full_ppg_wrapper(w, 16000, deps.nnet, deps.lda, 10,
                                     dither=0.0) for w in wavs]
    dev = DeviceFeaturizer(deps, dither=0.0)(wavs, 16000)
    assert [d.shape for d in dev] == [h.shape for h in host]
    for h, d in zip(host, dev):
        np.testing.assert_allclose(d, h, atol=5e-5)
        # posteriors: rows still sum to 1
        np.testing.assert_allclose(d.sum(axis=1), 1.0, atol=1e-4)


def test_featurize_bench_harness(tmp_path):
    """eval/featurize_bench runs end-to-end and reports both paths (the
    PERF.md throughput number comes from this harness on the real chip)."""
    from fac_via_ppg_tpu.eval.featurize_bench import run_bench
    from fac_via_ppg_tpu.frontend.ppg import DependenciesPPG
    from fac_via_ppg_tpu.scripts.make_substitute_am import make_bundle

    bundle = tmp_path / "bundle"
    make_bundle(str(bundle), n_senones=24, n_phones=6, hidden_dim=8,
                num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(bundle / "am" / "final.raw.txt"),
        lda_path=str(bundle / "feats" / "final.mat"),
        reduce_dim_path=str(bundle / "feats" / "reduce_dim.mat"),
        splice_opts_path=str(bundle / "feats" / "splice_opts"),
    )
    out = run_bench(n_utts=4, seconds=0.5, deps=deps)
    assert out["host_utts_per_s"] > 0 and out["device_utts_per_s"] > 0
    assert out["max_abs_err"] < 5e-5
