"""Inference helpers (reference src/common/utils.py:39-181).

Same public surface: get_mask_from_lengths, load_filepaths, notch_filtering,
get_mel, waveglow_audio, get_inference, load_waveglow_model — re-based on
the JAX models and orbax checkpoints.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal

from fac_via_ppg_tpu.configs.hparams import Tacotron2Config, WaveGlowConfig
from fac_via_ppg_tpu.dsp.stft import TacotronSTFT
from fac_via_ppg_tpu.models.tacotron2 import tacotron2_inference
from fac_via_ppg_tpu.models.waveglow import remove_weightnorm, waveglow_infer
from fac_via_ppg_tpu.train import checkpoint as ckpt
from fac_via_ppg_tpu.utils.numeric import round_up as _round_up


def get_mask_from_lengths(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) -> (B, max_len) bool, True at valid positions (utils.py:39-43)."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def load_filepaths(filename: str):
    with open(filename) as f:
        return [line.strip() for line in f]


def notch_filtering(wav: np.ndarray, fs: float, w0: float, Q: float):
    """Band-stop filter (utils.py:115-129)."""
    b, a = signal.iirnotch(2 * w0 / fs, Q)
    return signal.lfilter(b, a, wav)


def get_mel(wav: np.ndarray, stft: TacotronSTFT) -> np.ndarray:
    """(S,) int16-scale wav -> (1, n_mel, T) log-mel (utils.py:132-139)."""
    audio_norm = (np.asarray(wav, np.float32) / 32768.0)[None, :]
    return np.asarray(stft.mel_spectrogram(jnp.asarray(audio_norm)))


# jit caches: dispatching these model functions eagerly would round-trip
# the host per primitive (ruinous over the tunneled TPU: an unjitted
# 1000-step decoder while_loop was measured at ~21 s vs 0.1 s jitted).
@functools.lru_cache(maxsize=8)
def _jitted_waveglow_infer(cfg: WaveGlowConfig, sigma: float, dtype):
    return jax.jit(
        lambda p, m, k: waveglow_infer(cfg, p, m, sigma, k, dtype=dtype)
    )


@functools.lru_cache(maxsize=8)
def _jitted_tacotron2_inference(cfg: Tacotron2Config):
    return jax.jit(functools.partial(tacotron2_inference, cfg))


def waveglow_audio(mel, cfg: WaveGlowConfig, waveglow_params, sigma: float,
                   key=None, is_int16_output: bool = False, dtype=None,
                   pad_to_frames: int = 0):
    """mel (1, 80, T) -> waveform (utils.py:142-152).

    `pad_to_frames` rounds the mel length up with silence (log 1e-5) so one
    compiled vocoder shape serves many utterance lengths; the padded tail
    is trimmed from the audio.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    mel = jnp.asarray(mel)
    t = mel.shape[-1]
    if pad_to_frames:
        t_pad = _round_up(t, pad_to_frames)
        mel = jnp.pad(
            mel, ((0, 0), (0, 0), (0, t_pad - t)),
            constant_values=float(np.log(1e-5)),
        )
    audio = _jitted_waveglow_infer(cfg, sigma, dtype)(
        waveglow_params, mel, key
    )
    audio = audio[:, : t * cfg.hop_length]
    if is_int16_output:
        return np.asarray(32768.0 * audio).astype("int16")
    return audio


def get_inference(seq: np.ndarray, cfg: Tacotron2Config, params, model_state,
                  key=None, is_clip: bool = False, pad_to_frames: int = 0):
    """(T, D) PPG -> (1, 80, T_out) synthesized mel (utils.py:155-174).

    `pad_to_frames` zero-pads the PPG to a length bucket (with the true
    length passed to the attention masks) so one compiled decoder serves
    many utterance lengths.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    t_in = seq.shape[0]
    x = jnp.asarray(seq.T[None, :, :], jnp.float32)
    lengths = None
    if pad_to_frames:
        t_pad = _round_up(t_in, pad_to_frames)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t_in)))
        lengths = jnp.asarray([t_in], jnp.int32)
    _, mel_post, _, _, t_end = _jitted_tacotron2_inference(cfg)(
        params, model_state, x, key, lengths
    )
    t_end = int(t_end)
    mel_post = mel_post[:, :, :t_end]
    if is_clip:
        return mel_post[:, :, 10 : t_in - 10]
    return mel_post


def load_tacotron2_model(path: str, cfg: Tacotron2Config) -> Tuple[dict, dict]:
    """Checkpoint -> (params, model_state).

    A freshly-initialized pytree serves as the restore template so
    containers keep their exact structure.  torch .pt checkpoints go
    through train.import_torch first.
    """
    from fac_via_ppg_tpu.models.tacotron2 import init_tacotron2

    t_params, t_state = jax.eval_shape(
        lambda k: init_tacotron2(k, cfg), jax.random.PRNGKey(0)
    )
    restored = ckpt.load_checkpoint(
        path, like={"params": t_params, "model_state": t_state}, partial=True
    )
    return restored["params"], restored.get("model_state")


def load_waveglow_model(path: str, cfg: Optional[WaveGlowConfig] = None):
    """Checkpoint -> inference params with weight-norm folded
    (utils.py:177-181)."""
    from fac_via_ppg_tpu.models.waveglow import init_waveglow

    cfg = cfg or WaveGlowConfig()
    t_params = jax.eval_shape(
        lambda k: init_waveglow(k, cfg), jax.random.PRNGKey(0)
    )
    restored = ckpt.load_checkpoint(
        path, like={"params": t_params}, partial=True
    )
    return remove_weightnorm(restored["params"])
