"""FusedSynthesizer: the single-XLA-program serving path must agree
pointwise with the staged pipeline (sigma=0 so the vocoder draws no
noise whose values would depend on buffer length)."""

import numpy as np
from scipy.io import wavfile

import jax
import jax.numpy as jnp

from fac_via_ppg_tpu.configs.hparams import Tacotron2Config, WaveGlowConfig
from fac_via_ppg_tpu.eval.fused import FusedSynthesizer
from fac_via_ppg_tpu.frontend import ppg as ppg_mod
from fac_via_ppg_tpu.frontend.ppg import DependenciesPPG
from fac_via_ppg_tpu.models.denoiser import Denoiser
from fac_via_ppg_tpu.models.tacotron2 import init_tacotron2
from fac_via_ppg_tpu.models.waveglow import init_waveglow, remove_weightnorm
from fac_via_ppg_tpu.scripts.make_substitute_am import make_bundle
from fac_via_ppg_tpu.utils.inference import get_inference, waveglow_audio


def test_fused_matches_staged_pipeline(tmp_path, rng):
    make_bundle(str(tmp_path / "bundle"), n_senones=16, n_phones=4,
                hidden_dim=8, num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(tmp_path / "bundle" / "am" / "final.raw.txt"),
        lda_path=str(tmp_path / "bundle" / "feats" / "final.mat"),
        reduce_dim_path=str(tmp_path / "bundle" / "feats" / "reduce_dim.mat"),
        splice_opts_path=str(tmp_path / "bundle" / "feats" / "splice_opts"),
    )
    t2_cfg = Tacotron2Config(
        n_symbols=16, symbols_embedding_dim=16, encoder_embedding_dim=16,
        decoder_rnn_dim=12, prenet_dim=8, attention_rnn_dim=12,
        attention_dim=8, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=16,
        max_decoder_steps=20,
    )
    t2_params, t2_state = init_tacotron2(jax.random.PRNGKey(0), t2_cfg)
    wg_cfg = WaveGlowConfig(
        n_mel_channels=80, hop_length=160, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )
    wg_params = remove_weightnorm(init_waveglow(jax.random.PRNGKey(1), wg_cfg))

    t = np.arange(9600) / 16000.0
    path = str(tmp_path / "u.wav")
    wavfile.write(path, 16000,
                  (np.sin(2 * np.pi * 180 * t) * 9000).astype(np.int16))

    key = jax.random.PRNGKey(5)
    fused = FusedSynthesizer(
        t2_cfg, t2_params, t2_state, wg_cfg, wg_params, deps=deps,
        sigma=0.0, denoiser_strength=0.005, serving_dtype=None,
        max_frames=20,
    )
    pcm = fused(path, key=key)
    assert pcm.dtype == np.int16 and len(pcm) > 0
    assert np.isfinite(pcm.astype(np.float64)).all()

    # staged replay with the identical key split
    k_mel, k_wg = jax.random.split(key)
    ppg = ppg_mod.get_ppg(path, deps)
    mel = get_inference(ppg, t2_cfg, t2_params, t2_state, k_mel,
                        pad_to_frames=64)
    audio = waveglow_audio(mel, wg_cfg, wg_params, 0.0, k_wg,
                           pad_to_frames=100)
    den = Denoiser(wg_cfg, wg_params)
    staged = np.asarray(den(audio, strength=0.005))[0, 0]

    # number of frames must agree (same decode), hence same trimmed length
    n = len(pcm)
    assert n == mel.shape[-1] * wg_cfg.hop_length or n == len(staged[:n])
    # interior agreement: exclude STFT edges and the conv tail near the cut
    lo, hi = 600, max(601, n - 2048)
    np.testing.assert_allclose(
        pcm[lo:hi] / 32767.0, staged[lo:hi], atol=2e-3,
        err_msg="fused program diverged from the staged pipeline",
    )


def test_fused_batch_matches_single(tmp_path, rng):
    """synthesize_batch must reproduce per-utterance fused results (dropout
    disabled so the always-on prenet draws can't differ with batch size;
    sigma=0 so vocoder noise can't)."""
    from fac_via_ppg_tpu.models import tacotron2 as t2mod

    make_bundle(str(tmp_path / "bundle"), n_senones=16, n_phones=4,
                hidden_dim=8, num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(tmp_path / "bundle" / "am" / "final.raw.txt"),
        lda_path=str(tmp_path / "bundle" / "feats" / "final.mat"),
        reduce_dim_path=str(tmp_path / "bundle" / "feats" / "reduce_dim.mat"),
        splice_opts_path=str(tmp_path / "bundle" / "feats" / "splice_opts"),
    )
    t2_cfg = Tacotron2Config(
        n_symbols=16, symbols_embedding_dim=16, encoder_embedding_dim=16,
        decoder_rnn_dim=12, prenet_dim=8, attention_rnn_dim=12,
        attention_dim=8, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=16,
        max_decoder_steps=16,
    )
    t2_params, t2_state = init_tacotron2(jax.random.PRNGKey(2), t2_cfg)
    wg_cfg = WaveGlowConfig(
        n_mel_channels=80, hop_length=160, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )
    wg_params = remove_weightnorm(init_waveglow(jax.random.PRNGKey(3), wg_cfg))

    paths = []
    for i, hz in enumerate((160.0, 240.0)):
        t = np.arange(8000 + 1600 * i) / 16000.0
        p = str(tmp_path / f"u{i}.wav")
        wavfile.write(p, 16000,
                      (np.sin(2 * np.pi * hz * t) * 9000).astype(np.int16))
        paths.append(p)

    synth = FusedSynthesizer(
        t2_cfg, t2_params, t2_state, wg_cfg, wg_params, deps=deps,
        sigma=0.0, denoiser_strength=0.005, serving_dtype=None,
        max_frames=16,
    )
    key = jax.random.PRNGKey(11)
    orig_dropout = t2mod.dropout
    t2mod.__dict__["dropout"] = lambda key, x, rate, enabled: x
    try:
        batch_out = synth.synthesize_batch(paths, key=key)
        singles = [synth(p, key=key) for p in paths]
    finally:
        t2mod.__dict__["dropout"] = orig_dropout

    assert len(batch_out) == 2
    for got, want in zip(batch_out, singles):
        assert got.dtype == np.int16
        assert len(got) == len(want), "per-sequence stop step diverged"
        n = len(got)
        lo, hi = 600, max(601, n - 2048)
        np.testing.assert_allclose(
            got[lo:hi] / 32767.0, want[lo:hi] / 32767.0, atol=2e-3,
            err_msg="batched fused output diverged from single-utterance",
        )


def test_fused_batch_data_parallel_matches(tmp_path, rng):
    """data_parallel=True (batch sharded over the 8-device CPU mesh, padded
    to the mesh) must reproduce the single-device batched outputs exactly
    (partitionable RNG draws are sharding-invariant; sigma=0 besides)."""
    import pytest

    if jax.device_count() < 2:
        pytest.skip("needs a multi-device mesh")

    make_bundle(str(tmp_path / "bundle"), n_senones=16, n_phones=4,
                hidden_dim=8, num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(tmp_path / "bundle" / "am" / "final.raw.txt"),
        lda_path=str(tmp_path / "bundle" / "feats" / "final.mat"),
        reduce_dim_path=str(tmp_path / "bundle" / "feats" / "reduce_dim.mat"),
        splice_opts_path=str(tmp_path / "bundle" / "feats" / "splice_opts"),
    )
    t2_cfg = Tacotron2Config(
        n_symbols=16, symbols_embedding_dim=16, encoder_embedding_dim=16,
        decoder_rnn_dim=12, prenet_dim=8, attention_rnn_dim=12,
        attention_dim=8, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=16,
        max_decoder_steps=16,
    )
    t2_params, t2_state = init_tacotron2(jax.random.PRNGKey(2), t2_cfg)
    wg_cfg = WaveGlowConfig(
        n_mel_channels=80, hop_length=160, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )
    wg_params = remove_weightnorm(init_waveglow(jax.random.PRNGKey(3), wg_cfg))

    paths = []
    for i, hz in enumerate((160.0, 240.0, 320.0)):  # 3 utts, mesh of 8:
        t = np.arange(8000 + 1600 * i) / 16000.0    # exercises padding
        p = str(tmp_path / f"u{i}.wav")
        wavfile.write(p, 16000,
                      (np.sin(2 * np.pi * hz * t) * 9000).astype(np.int16))
        paths.append(p)

    common = dict(sigma=0.0, denoiser_strength=0.005, serving_dtype=None,
                  max_frames=16)
    key = jax.random.PRNGKey(11)
    single = FusedSynthesizer(t2_cfg, t2_params, t2_state, wg_cfg,
                              wg_params, deps=deps, **common)
    dp = FusedSynthesizer(t2_cfg, t2_params, t2_state, wg_cfg,
                          wg_params, deps=deps, data_parallel=True, **common)
    # dropout off: DP pads the batch 3 -> 8, and the always-on prenet
    # dropout draws depend on the padded batch shape (same reason the
    # batch-vs-single test above disables it).
    from fac_via_ppg_tpu.models import tacotron2 as t2mod

    orig_dropout = t2mod.dropout
    t2mod.__dict__["dropout"] = lambda key, x, rate, enabled: x
    try:
        want = single.synthesize_batch(paths, key=key)
        got = dp.synthesize_batch(paths, key=key)
    finally:
        t2mod.__dict__["dropout"] = orig_dropout

    assert len(got) == 3
    for g, w in zip(got, want):
        assert g.dtype == np.int16
        assert len(g) == len(w), "per-sequence stop step diverged under DP"
        np.testing.assert_allclose(g, w, atol=1,
                                   err_msg="DP sharding changed the audio")


def test_fused_batch_model_parallel_matches(tmp_path, rng):
    """data_parallel + model_parallel=2: the mesh becomes (4 data x
    2 model) with the WaveGlow WN hidden channel sharded over 'model'
    (parallel/sharding.py) — outputs must still match the single-device
    batched serve exactly."""
    import pytest

    if jax.device_count() < 8:
        pytest.skip("needs an 8-device mesh")

    make_bundle(str(tmp_path / "bundle"), n_senones=16, n_phones=4,
                hidden_dim=8, num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(tmp_path / "bundle" / "am" / "final.raw.txt"),
        lda_path=str(tmp_path / "bundle" / "feats" / "final.mat"),
        reduce_dim_path=str(tmp_path / "bundle" / "feats" / "reduce_dim.mat"),
        splice_opts_path=str(tmp_path / "bundle" / "feats" / "splice_opts"),
    )
    t2_cfg = Tacotron2Config(
        n_symbols=16, symbols_embedding_dim=16, encoder_embedding_dim=16,
        decoder_rnn_dim=12, prenet_dim=8, attention_rnn_dim=12,
        attention_dim=8, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=16,
        max_decoder_steps=16,
    )
    t2_params, t2_state = init_tacotron2(jax.random.PRNGKey(2), t2_cfg)
    wg_cfg = WaveGlowConfig(
        n_mel_channels=80, hop_length=160, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )
    wg_params = remove_weightnorm(init_waveglow(jax.random.PRNGKey(3), wg_cfg))

    paths = []
    for i, hz in enumerate((160.0, 240.0, 320.0)):
        t = np.arange(8000 + 1600 * i) / 16000.0
        p = str(tmp_path / f"u{i}.wav")
        wavfile.write(p, 16000,
                      (np.sin(2 * np.pi * hz * t) * 9000).astype(np.int16))
        paths.append(p)

    common = dict(sigma=0.0, denoiser_strength=0.005, serving_dtype=None,
                  max_frames=16)
    key = jax.random.PRNGKey(11)
    single = FusedSynthesizer(t2_cfg, t2_params, t2_state, wg_cfg,
                              wg_params, deps=deps, **common)
    tp = FusedSynthesizer(t2_cfg, t2_params, t2_state, wg_cfg,
                          wg_params, deps=deps, data_parallel=True,
                          model_parallel=2, **common)
    from fac_via_ppg_tpu.models import tacotron2 as t2mod

    orig_dropout = t2mod.dropout
    t2mod.__dict__["dropout"] = lambda key, x, rate, enabled: x
    try:
        want = single.synthesize_batch(paths, key=key)
        got = tp.synthesize_batch(paths, key=key)
    finally:
        t2mod.__dict__["dropout"] = orig_dropout

    assert len(got) == 3
    for g, w in zip(got, want):
        assert len(g) == len(w), "stop step diverged under DPxTP"
        np.testing.assert_allclose(g, w, atol=1,
                                   err_msg="TP sharding changed the audio")


def test_fused_cond_impl_int8_close_to_dense(tmp_path, rng):
    """cond_impl='int8' must track the dense fused path closely.  Init
    WaveGlow end layers are zero (the cond projections can't reach the
    audio), so perturb them first; sigma=0 keeps the draws deterministic.
    """
    import pytest

    make_bundle(str(tmp_path / "bundle"), n_senones=16, n_phones=4,
                hidden_dim=8, num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(tmp_path / "bundle" / "am" / "final.raw.txt"),
        lda_path=str(tmp_path / "bundle" / "feats" / "final.mat"),
        reduce_dim_path=str(tmp_path / "bundle" / "feats" / "reduce_dim.mat"),
        splice_opts_path=str(tmp_path / "bundle" / "feats" / "splice_opts"),
    )
    t2_cfg = Tacotron2Config(
        n_symbols=16, symbols_embedding_dim=16, encoder_embedding_dim=16,
        decoder_rnn_dim=12, prenet_dim=8, attention_rnn_dim=12,
        attention_dim=8, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=16,
        max_decoder_steps=16,
    )
    t2_params, t2_state = init_tacotron2(jax.random.PRNGKey(2), t2_cfg)
    wg_cfg = WaveGlowConfig(
        n_mel_channels=80, hop_length=160, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )
    wg_params = remove_weightnorm(init_waveglow(jax.random.PRNGKey(3), wg_cfg))
    k = jax.random.PRNGKey(5)
    for wn in wg_params["wn"]:
        k, sub = jax.random.split(k)
        wn["end"]["weight"] = 0.05 * jax.random.normal(
            sub, wn["end"]["weight"].shape, jnp.float32
        )

    t = np.arange(8000) / 16000.0
    p = str(tmp_path / "u.wav")
    wavfile.write(p, 16000,
                  (np.sin(2 * np.pi * 200.0 * t) * 9000).astype(np.int16))

    kwargs = dict(sigma=0.0, denoiser_strength=0.005, serving_dtype=None,
                  max_frames=16, deps=deps)
    dense = FusedSynthesizer(t2_cfg, t2_params, t2_state, wg_cfg,
                             wg_params, **kwargs)
    int8 = FusedSynthesizer(t2_cfg, t2_params, t2_state, wg_cfg,
                            wg_params, cond_impl="int8", **kwargs)
    key = jax.random.PRNGKey(11)
    want = dense(p, key=key).astype(np.float64) / 32767.0
    got = int8(p, key=key).astype(np.float64) / 32767.0
    assert len(got) == len(want), "stop step diverged under int8 cond"
    err = got - want
    snr = 10 * np.log10(np.sum(want**2) / max(np.sum(err**2), 1e-30))
    assert snr > 30.0, f"int8 fused SNR too low: {snr:.1f} dB"

    # int8 composes with tensor parallelism: the packed cond stack shards
    # column-parallel over the 'model' axis (parallel/sharding.
    # int8cond_shardings); the int32 MXU accumulation has an unsplit
    # contraction dim, so the TP program must reproduce the single-device
    # int8 audio to int16 rounding.
    int8_tp = FusedSynthesizer(t2_cfg, t2_params, t2_state, wg_cfg,
                               wg_params, cond_impl="int8",
                               model_parallel=2, **kwargs)
    got_tp = int8_tp(p, key=key).astype(np.float64) / 32767.0
    assert len(got_tp) == len(got), "stop step diverged under int8 TP"
    np.testing.assert_allclose(
        got_tp, got, atol=1.5 / 32767.0,
        err_msg="int8 TP sharding changed the audio",
    )

    with pytest.raises(ValueError):
        FusedSynthesizer(t2_cfg, t2_params, t2_state, wg_cfg, wg_params,
                         cond_impl="nope", **kwargs)


def test_fused_cond_impl_auto_gate(tmp_path, rng):
    """cond_impl='auto' in the serving stack: a healthy checkpoint selects
    int8, a deliberately quantization-hostile one falls back to dense, and
    the decision + measured worst-utterance SNR are exposed on the
    synthesizer.  Wired through StreamingAccentConverter too."""
    import pytest

    from fac_via_ppg_tpu.eval.streaming import StreamingAccentConverter

    make_bundle(str(tmp_path / "bundle"), n_senones=16, n_phones=4,
                hidden_dim=8, num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(tmp_path / "bundle" / "am" / "final.raw.txt"),
        lda_path=str(tmp_path / "bundle" / "feats" / "final.mat"),
        reduce_dim_path=str(tmp_path / "bundle" / "feats" / "reduce_dim.mat"),
        splice_opts_path=str(tmp_path / "bundle" / "feats" / "splice_opts"),
    )
    t2_cfg = Tacotron2Config(
        n_symbols=16, symbols_embedding_dim=16, encoder_embedding_dim=16,
        decoder_rnn_dim=12, prenet_dim=8, attention_rnn_dim=12,
        attention_dim=8, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=16,
        max_decoder_steps=16,
    )
    t2_params, t2_state = init_tacotron2(jax.random.PRNGKey(2), t2_cfg)
    wg_cfg = WaveGlowConfig(
        n_mel_channels=80, hop_length=160, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )
    wg_params = remove_weightnorm(
        init_waveglow(jax.random.PRNGKey(3), wg_cfg)
    )
    k = jax.random.PRNGKey(4)
    for wn in wg_params["wn"]:
        k, sub = jax.random.split(k)
        wn["end"]["weight"] = 0.05 * jax.random.normal(
            sub, wn["end"]["weight"].shape, jnp.float32
        )
    cal_mel = jnp.asarray(rng.randn(2, 80, 12) * 0.5 - 5.0, jnp.float32)

    healthy = FusedSynthesizer(
        t2_cfg, t2_params, t2_state, wg_cfg, wg_params, deps=deps,
        max_frames=16, cond_impl="auto", calibration_mel=cal_mel,
        snr_budget_db=20.0,
    )
    assert healthy.requested_cond_impl == "auto"
    assert healthy.cond_impl == "int8"
    assert healthy.calibration_snr_db > 20.0
    assert healthy._packed_cond is not None

    # Hostile profile: strongly scaling couplings (×24 end-conv gain)
    # amplify the int8 rounding error, and per-row outliers (126× the
    # weight max) blow the per-out-channel scales so every other entry
    # quantizes to ~zero — measured -5 dB worst-utterance at this config
    # vs 47.8 dB healthy.
    hostile_params = jax.tree_util.tree_map(np.array, wg_params)
    for wn in hostile_params["wn"]:
        wn["end"]["weight"] = wn["end"]["weight"] * 24.0
        for p in wn["cond_layers"]:
            p["weight"][:, 0, 0] = 126.0 * np.abs(p["weight"]).max()
    hostile = FusedSynthesizer(
        t2_cfg, t2_params, t2_state, wg_cfg, hostile_params, deps=deps,
        max_frames=16, cond_impl="auto", calibration_mel=cal_mel,
        snr_budget_db=20.0,
    )
    assert hostile.cond_impl == "dense"
    assert hostile.calibration_snr_db < 20.0
    assert hostile._packed_cond is None

    # the gate refuses to run blind
    with pytest.raises(ValueError, match="calibration_mel"):
        FusedSynthesizer(
            t2_cfg, t2_params, t2_state, wg_cfg, wg_params, deps=deps,
            max_frames=16, cond_impl="auto",
        )

    # streaming stack passthrough (the CLI's construction path)
    conv = StreamingAccentConverter(
        t2_cfg, t2_params, t2_state, wg_cfg, wg_params, deps=deps,
        fused=True, batch_size=2, cond_impl="auto",
        calibration_mel=cal_mel, snr_budget_db=20.0,
    )
    assert conv.fused.cond_impl == "int8"


def test_round_batch_to_grid():
    """Off-grid batches (>8, not a multiple of 8) round up to the 8-grid;
    small and on-grid batches pass through (the measured B=12 crater —
    docs/PERF.md serving frontier)."""
    from fac_via_ppg_tpu.utils.numeric import round_batch_to_grid

    assert [round_batch_to_grid(b) for b in (1, 4, 8)] == [1, 4, 8]
    assert [round_batch_to_grid(b) for b in (9, 12, 15)] == [16, 16, 16]
    assert [round_batch_to_grid(b) for b in (16, 17, 24)] == [16, 24, 24]


def _fake_synth(pad_to_grid=True):
    """A FusedSynthesizer shell whose device program is a shape spy —
    exercises the batch-assembly/padding/trimming logic in
    launch_feature_pairs without compiling a model."""
    syn = FusedSynthesizer.__new__(FusedSynthesizer)
    syn.mesh = None
    syn.pad_to_grid = pad_to_grid
    syn.t2_params = syn.t2_state = syn.wg_params = None
    syn._packed_cond = syn._bias = None
    syn.wg_cfg = WaveGlowConfig(hop_length=4)
    seen = []

    def fake_fn(t2p, t2s, wgp, pc, bias, feats, n_frames, key):
        seen.append(int(feats.shape[0]))
        b = feats.shape[0]
        return (jnp.zeros((b, 8), jnp.int16), jnp.ones((b,), jnp.int32))

    syn._fn_batch = fake_fn
    return syn, seen


def test_fused_pads_off_grid_micro_batch_to_tile_grid():
    """9 real utterances dispatch as one 16-row program (off-grid batch
    axes are slower in ABSOLUTE audio/s — measured B=12 crater), and the
    outputs trim back to the 9 real rows."""
    pairs = [(np.zeros((5, 3), np.float32), 5)] * 9
    syn, seen = _fake_synth()
    out = syn.synthesize_feature_pairs(pairs)
    assert seen == [16]
    assert len(out) == 9

    # pad_batch_to (the streaming partial-drain path) grid-rounds too:
    # a 5-row drain under batch_size=12 runs the same 16-row program
    syn2, seen2 = _fake_synth()
    out2 = syn2.synthesize_feature_pairs(pairs[:5], pad_batch_to=12)
    assert seen2 == [16]
    assert len(out2) == 5

    # opt-out restores exact shapes
    syn3, seen3 = _fake_synth(pad_to_grid=False)
    syn3.synthesize_feature_pairs(pairs)
    assert seen3 == [9]
