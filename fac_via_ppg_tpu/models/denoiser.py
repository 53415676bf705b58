"""WaveGlow bias denoiser (reference src/waveglow/denoiser.py:35-68).

Runs the vocoder on a zero (or random) mel at sigma=0 to capture the model's
bias spectrum, then subtracts `strength * bias` in the magnitude-STFT domain
and inverts.  Pure functions over the jitted STFT from dsp/.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fac_via_ppg_tpu.configs.hparams import WaveGlowConfig
from fac_via_ppg_tpu.dsp.stft import STFT
from fac_via_ppg_tpu.models.waveglow import waveglow_infer


class Denoiser:
    def __init__(
        self,
        cfg: WaveGlowConfig,
        waveglow_params,
        filter_length: int = 1024,
        hop_length: int = 160,
        win_length: int = 1024,
        mode: str = "zeros",
        key=None,
    ):
        self.stft = STFT(filter_length, hop_length, win_length)
        key = key if key is not None else jax.random.PRNGKey(0)
        if mode == "zeros":
            mel_input = jnp.zeros((1, cfg.n_mel_channels, 88), jnp.float32)
        elif mode == "normal":
            key, sub = jax.random.split(key)
            mel_input = jax.random.normal(
                sub, (1, cfg.n_mel_channels, 88), jnp.float32
            )
        else:
            raise ValueError(f"unsupported denoiser mode {mode!r}; "
                             f"choose 'zeros' or 'normal'")

        bias_audio = jax.jit(
            lambda p, m, k: waveglow_infer(cfg, p, m, 0.0, k)
        )(waveglow_params, mel_input, key)
        bias_spec, _ = self.stft.transform(bias_audio)
        # first frame's magnitude column is the bias template
        self.bias_spec = bias_spec[:, :, 0][:, :, None]

    def __call__(self, audio: jnp.ndarray, strength: float = 0.1) -> jnp.ndarray:
        """(B, T) -> (B, 1, T') denoised audio (reference layout)."""
        audio_spec, audio_angles = self.stft.transform(audio)
        denoised = jnp.clip(audio_spec - self.bias_spec * strength, min=0.0)
        return self.stft.inverse(denoised, audio_angles)
