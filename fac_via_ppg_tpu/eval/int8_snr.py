"""Quality ladder for reduced-precision WaveGlow inference modes.

Measures the SNR of each serving configuration (bf16-dense, bf16-int8,
f32-int8) against the f32-dense output on a TRAINED checkpoint with real
corpus mel and matched noise — the numbers docs/PERF.md "int8 cond
matmuls" quotes (bf16-dense 40.4 dB / bf16-int8 39.4 dB / f32-int8
41.3 dB on the r3 study checkpoint).  Reference surface being
characterized: the is_fp16 inference mode of
reference src/waveglow/inference.py:40-49 — the reference never
measures its precision trade; this tool does.

Usage:
    python -m fac_via_ppg_tpu.eval.int8_snr \
        --waveglow_model CKPT_DIR --wav a.wav b.wav [--config config.json]

Runs wherever JAX runs (CPU mesh or the real chip); the int8 matmul
semantics are identical, only speed differs.
"""

from __future__ import annotations

import argparse
import json

import numpy as np
import jax
import jax.numpy as jnp

from fac_via_ppg_tpu.configs.hparams import WaveGlowConfig
from fac_via_ppg_tpu.dsp.stft import TacotronSTFT


def waveglow_config_from_json(path: str) -> WaveGlowConfig:
    """config.json (reference waveglow/config.json schema) -> WaveGlowConfig."""
    return WaveGlowConfig.from_dict(json.load(open(path))["waveglow_config"])


def matched_noise(cfg: WaveGlowConfig, batch: int, n_frames: int,
                  seed: int = 0):
    """Unit gaussians in waveglow_infer draw order, shared across paths."""
    from fac_via_ppg_tpu.models.waveglow import flow_channels

    chans = flow_channels(cfg)
    G = n_frames * cfg.hop_length // cfg.n_group
    rng = np.random.default_rng(seed)
    shapes = [(batch, chans[-1], G)] + [
        (batch, cfg.n_early_size, G)
        for k in reversed(range(cfg.n_flows))
        if k % cfg.n_early_every == 0 and k > 0
    ]
    return [rng.standard_normal(s).astype(np.float32) for s in shapes]


def run_ladder(cfg: WaveGlowConfig, params, mel: jnp.ndarray,
               sigma: float = 0.6, seed: int = 0) -> dict:
    """{name: SNR dB vs f32-dense} for each reduced-precision mode."""
    from fac_via_ppg_tpu.models.waveglow import (
        pack_waveglow_int8cond, waveglow_infer,
    )

    noise = matched_noise(cfg, mel.shape[0], mel.shape[2], seed)
    packed = pack_waveglow_int8cond(cfg, params)

    def run(dtype, cond_impl, cond_quant="column"):
        fn = jax.jit(lambda p, m: waveglow_infer(
            cfg, p, m, sigma, None, dtype=dtype, noise=noise,
            cond_impl=cond_impl, cond_quant=cond_quant,
            packed_cond=(packed if cond_impl == "int8" else None)))
        return np.asarray(fn(params, mel), np.float64)

    ref = run(jnp.float32, "dense")
    out = {}
    for name, dtype, ci, cq in [
        ("bf16_dense", jnp.bfloat16, "dense", "column"),
        ("bf16_int8", jnp.bfloat16, "int8", "column"),
        ("f32_int8", jnp.float32, "int8", "column"),
        # per-tensor activation scales: the pre-round-3 int8 mode, kept
        # measurable so the per-column win is an A/B on one checkpoint
        ("bf16_int8_tensorscale", jnp.bfloat16, "int8", "tensor"),
        ("f32_int8_tensorscale", jnp.float32, "int8", "tensor"),
    ]:
        got = run(dtype, ci, cq)
        err = got - ref
        out[name] = round(float(
            10 * np.log10(np.sum(ref ** 2) / max(np.sum(err ** 2), 1e-30))
        ), 2)
    return out


def main(argv=None):
    from scipy.io import wavfile

    from fac_via_ppg_tpu.utils.inference import (
        get_mel, load_waveglow_model,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("--waveglow_model", required=True,
                        help="orbax checkpoint dir (trainer output)")
    parser.add_argument("--config", default=None,
                        help="trainer config.json (waveglow_config block); "
                             "defaults to the full reference architecture")
    parser.add_argument("--wav", nargs="+", required=True,
                        help="wav files providing the conditioning mel")
    parser.add_argument("--sigma", type=float, default=0.6)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    cfg = (waveglow_config_from_json(args.config) if args.config
           else WaveGlowConfig())
    params = load_waveglow_model(args.waveglow_model, cfg)

    stft = TacotronSTFT(filter_length=1024, hop_length=cfg.hop_length,
                        win_length=1024, sampling_rate=16000,
                        n_mel_channels=cfg.n_mel_channels,
                        mel_fmin=0.0, mel_fmax=8000.0)
    mels = []
    for p in args.wav:
        _, wav = wavfile.read(p)
        mels.append(get_mel(wav, stft)[0])
    F = min(m.shape[1] for m in mels)
    mel = jnp.asarray(np.stack([m[:, :F] for m in mels]))

    ladder = run_ladder(cfg, params, mel, args.sigma, args.seed)
    print(json.dumps({"snr_db_vs_f32_dense": ladder,
                      "mel_shape": list(mel.shape),
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
