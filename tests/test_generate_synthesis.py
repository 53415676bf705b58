"""generate_synthesis CLI regression: the real main() end to end on the
CPU mesh with tiny checkpoints (reference surface:
src/script/generate_synthesis.py:86-98), plus denoiser strength
monotonicity."""

import os
import sys

import numpy as np
from scipy.io import wavfile

import jax
import jax.numpy as jnp

from fac_via_ppg_tpu.configs.hparams import (
    Tacotron2Config,
    WaveGlowConfig,
    create_hparams_stage,
)
from fac_via_ppg_tpu.frontend.ppg import DependenciesPPG
from fac_via_ppg_tpu.models.denoiser import Denoiser
from fac_via_ppg_tpu.models.tacotron2 import init_tacotron2
from fac_via_ppg_tpu.models.waveglow import init_waveglow, remove_weightnorm
from fac_via_ppg_tpu.scripts import generate_synthesis as gs
from fac_via_ppg_tpu.scripts.make_substitute_am import make_bundle
from fac_via_ppg_tpu.train import checkpoint as ckpt

TINY_T2 = dict(
    n_symbols=16, symbols_embedding_dim=16, encoder_embedding_dim=16,
    decoder_rnn_dim=12, prenet_dim=8, attention_rnn_dim=12, attention_dim=8,
    attention_location_n_filters=4, attention_location_kernel_size=7,
    postnet_embedding_dim=16, max_decoder_steps=20,
)


def test_generate_synthesis_cli_end_to_end(tmp_path, monkeypatch):
    # tiny AM bundle for the PPG front-end
    make_bundle(str(tmp_path / "bundle"), n_senones=16, n_phones=4,
                hidden_dim=8, num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(tmp_path / "bundle" / "am" / "final.raw.txt"),
        lda_path=str(tmp_path / "bundle" / "feats" / "final.mat"),
        reduce_dim_path=str(tmp_path / "bundle" / "feats" / "reduce_dim.mat"),
        splice_opts_path=str(tmp_path / "bundle" / "feats" / "splice_opts"),
    )

    # tiny checkpoints in the CLI's native (orbax) format
    hp = create_hparams_stage(**TINY_T2)
    t2_cfg = Tacotron2Config.from_hparams(hp)
    t2_params, t2_state = init_tacotron2(jax.random.PRNGKey(0), t2_cfg)
    t2_path = str(tmp_path / "ckpt_t2")
    ckpt.save_checkpoint(t2_path, t2_params, {}, 1e-3, 0,
                         model_state=t2_state)

    wg_cfg = WaveGlowConfig(
        n_mel_channels=80, hop_length=160, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )
    wg_params = init_waveglow(jax.random.PRNGKey(1), wg_cfg)
    wg_path = str(tmp_path / "ckpt_wg")
    ckpt.save_checkpoint(wg_path, wg_params, {}, 1e-4, 0)

    # teacher utterance
    t = np.arange(6400) / 16000.0
    teacher = str(tmp_path / "teacher.wav")
    wavfile.write(
        teacher, 16000,
        (np.sin(2 * np.pi * 220 * t) * 9000).astype(np.int16),
    )

    monkeypatch.setattr(gs, "create_hparams_stage", lambda **kw: hp)
    monkeypatch.setattr(gs, "WaveGlowConfig", lambda: wg_cfg)
    monkeypatch.setattr(gs.ppg_mod, "DependenciesPPG", lambda: deps)
    for extra in ([], ["--fused"]):
        out_dir = str(tmp_path / ("out_fused" if extra else "out"))
        monkeypatch.setattr(sys, "argv", [
            "generate_synthesis",
            "--ppg2mel_model", t2_path,
            "--waveglow_model", wg_path,
            "--teacher_utterance_path", teacher,
            "--output_dir", out_dir,
        ] + extra)
        gs.main()

        out_wav = os.path.join(out_dir, "ac.wav")
        assert os.path.exists(out_wav), "CLI must write ac.wav"
        fs, audio = wavfile.read(out_wav)
        assert fs == 16000
        assert audio.dtype == np.int16
        assert len(audio) > 0 and np.isfinite(audio.astype(np.float64)).all()
        assert np.abs(audio).max() > 0, "synthesized audio is all zeros"
        assert os.path.exists(os.path.join(out_dir, "debug.log"))


def test_denoiser_strength_monotonic(rng):
    """Higher strength must remove more of the bias spectrum: the residual
    magnitude in the bias template's direction decreases monotonically
    (reference denoiser.py:64-68 semantics)."""
    wg_cfg = WaveGlowConfig(
        n_mel_channels=80, hop_length=32, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )
    params = remove_weightnorm(init_waveglow(jax.random.PRNGKey(2), wg_cfg))
    # a fresh init has zero-initialized WN end layers (so zero bias, like
    # the reference); randomize them to emulate a trained model's bias
    for wn in params["wn"]:
        wn["end"]["weight"] = jnp.asarray(
            rng.randn(*np.shape(wn["end"]["weight"])) * 0.3, jnp.float32
        )
        wn["end"]["bias"] = jnp.asarray(
            rng.randn(*np.shape(wn["end"]["bias"])) * 0.3, jnp.float32
        )
    den = Denoiser(wg_cfg, params, mode="zeros")
    assert np.isfinite(np.asarray(den.bias_spec)).all()
    assert np.asarray(den.bias_spec).max() > 0

    audio = jnp.asarray((rng.randn(1, 4000) * 0.2).astype(np.float32))
    mags = []
    for strength in (0.0, 0.5, 2.0):
        out = den(audio, strength=strength)
        assert np.isfinite(np.asarray(out)).all()
        spec, _ = den.stft.transform(out[:, 0, :])
        # energy along the bias template
        bias = np.asarray(den.bias_spec)[0, :, 0]
        bias = bias / np.linalg.norm(bias)
        mags.append(float(np.mean(np.asarray(spec)[0].T @ bias)))
    assert mags[0] > mags[1] > mags[2], (
        f"bias-direction energy must fall with strength, got {mags}"
    )
    # strength 0 must be a (near-)identity apart from STFT edge handling
    out0 = np.asarray(den(audio, strength=0.0))[0, 0]
    n = min(len(out0), audio.shape[-1])
    interior = slice(600, n - 600)
    np.testing.assert_allclose(
        out0[interior], np.asarray(audio)[0, interior], atol=1e-3
    )


def test_generate_synthesis_cli_batch_dir(tmp_path, monkeypatch):
    """Directory input: the CLI converts every wav through the batched
    fused program (with --data_parallel sharding over the CPU mesh)."""
    make_bundle(str(tmp_path / "bundle"), n_senones=16, n_phones=4,
                hidden_dim=8, num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(tmp_path / "bundle" / "am" / "final.raw.txt"),
        lda_path=str(tmp_path / "bundle" / "feats" / "final.mat"),
        reduce_dim_path=str(tmp_path / "bundle" / "feats" / "reduce_dim.mat"),
        splice_opts_path=str(tmp_path / "bundle" / "feats" / "splice_opts"),
    )
    hp = create_hparams_stage(**TINY_T2)
    t2_cfg = Tacotron2Config.from_hparams(hp)
    t2_params, t2_state = init_tacotron2(jax.random.PRNGKey(0), t2_cfg)
    t2_path = str(tmp_path / "ckpt_t2")
    ckpt.save_checkpoint(t2_path, t2_params, {}, 1e-3, 0,
                         model_state=t2_state)
    wg_cfg = WaveGlowConfig(
        n_mel_channels=80, hop_length=160, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )
    wg_params = init_waveglow(jax.random.PRNGKey(1), wg_cfg)
    wg_path = str(tmp_path / "ckpt_wg")
    ckpt.save_checkpoint(wg_path, wg_params, {}, 1e-4, 0)

    wav_dir = tmp_path / "utts"
    wav_dir.mkdir()
    for i, hz in enumerate((180.0, 220.0, 300.0)):
        t = np.arange(6400 + 800 * i) / 16000.0
        wavfile.write(str(wav_dir / f"u{i}.wav"), 16000,
                      (np.sin(2 * np.pi * hz * t) * 9000).astype(np.int16))

    monkeypatch.setattr(gs, "create_hparams_stage", lambda **kw: hp)
    monkeypatch.setattr(gs, "WaveGlowConfig", lambda: wg_cfg)
    monkeypatch.setattr(gs.ppg_mod, "DependenciesPPG", lambda: deps)
    out_dir = str(tmp_path / "out_batch")
    monkeypatch.setattr(sys, "argv", [
        "generate_synthesis",
        "--ppg2mel_model", t2_path,
        "--waveglow_model", wg_path,
        "--teacher_utterance_path", str(wav_dir),
        "--output_dir", out_dir,
        "--batch_size", "2",      # 3 utts -> 2 fused calls
        "--data_parallel",
    ])
    gs.main()

    for i in range(3):
        out_wav = os.path.join(out_dir, f"ac_u{i}.wav")
        assert os.path.exists(out_wav), out_wav
        fs, audio = wavfile.read(out_wav)
        assert fs == 16000 and audio.dtype == np.int16
        assert len(audio) > 0 and np.isfinite(audio.astype(np.float64)).all()


def test_generate_synthesis_cli_cond_impl_auto(tmp_path, monkeypatch,
                                               capsys):
    """--cond_impl auto through the real main(): the gate calibrates on
    the input wavs' analysis mels at startup, logs the decision, and the
    batch converts end to end under the resolved impl."""
    make_bundle(str(tmp_path / "bundle"), n_senones=16, n_phones=4,
                hidden_dim=8, num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(tmp_path / "bundle" / "am" / "final.raw.txt"),
        lda_path=str(tmp_path / "bundle" / "feats" / "final.mat"),
        reduce_dim_path=str(tmp_path / "bundle" / "feats" / "reduce_dim.mat"),
        splice_opts_path=str(tmp_path / "bundle" / "feats" / "splice_opts"),
    )
    hp = create_hparams_stage(**TINY_T2)
    t2_cfg = Tacotron2Config.from_hparams(hp)
    t2_params, t2_state = init_tacotron2(jax.random.PRNGKey(0), t2_cfg)
    t2_path = str(tmp_path / "ckpt_t2")
    ckpt.save_checkpoint(t2_path, t2_params, {}, 1e-3, 0,
                         model_state=t2_state)
    wg_cfg = WaveGlowConfig(
        n_mel_channels=80, hop_length=160, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )
    wg_params = init_waveglow(jax.random.PRNGKey(1), wg_cfg)
    wg_path = str(tmp_path / "ckpt_wg")
    ckpt.save_checkpoint(wg_path, wg_params, {}, 1e-4, 0)

    wav_dir = tmp_path / "utts"
    wav_dir.mkdir()
    for i, hz in enumerate((180.0, 260.0)):
        t = np.arange(6400) / 16000.0
        wavfile.write(str(wav_dir / f"u{i}.wav"), 16000,
                      (np.sin(2 * np.pi * hz * t) * 9000).astype(np.int16))

    monkeypatch.setattr(gs, "create_hparams_stage", lambda **kw: hp)
    monkeypatch.setattr(gs, "WaveGlowConfig", lambda: wg_cfg)
    monkeypatch.setattr(gs.ppg_mod, "DependenciesPPG", lambda: deps)
    out_dir = str(tmp_path / "out_auto")
    monkeypatch.setattr(sys, "argv", [
        "generate_synthesis",
        "--ppg2mel_model", t2_path,
        "--waveglow_model", wg_path,
        "--teacher_utterance_path", str(wav_dir),
        "--output_dir", out_dir,
        "--batch_size", "2",
        "--cond_impl", "auto",
        "--snr_budget_db", "20.0",  # random-init ckpt passes this easily
    ])
    gs.main()
    printed = capsys.readouterr().out
    assert "cond_impl=auto" in printed and "serving cond_impl=" in printed

    for i in range(2):
        out_wav = os.path.join(out_dir, f"ac_u{i}.wav")
        assert os.path.exists(out_wav), out_wav
        _, audio = wavfile.read(out_wav)
        assert len(audio) > 0 and np.isfinite(
            audio.astype(np.float64)
        ).all()
