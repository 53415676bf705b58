"""Parity harness: mel-MSE between this framework and reference checkpoints.

BASELINE.md's fidelity target is mel-MSE delta <= 1e-3 vs the reference
PyTorch checkpoints.  The comparison path is the deterministic
teacher-forced forward (autoregressive synthesis injects prenet-dropout
randomness by design, reference model.py:134, so it cannot be compared
pointwise).

Given a reference .pt checkpoint and wavs:
  1. import the checkpoint (train/import_torch),
  2. extract PPG + ground-truth mel per utterance,
  3. run the JAX teacher-forced forward with dropout disabled,
  4. optionally run the reference torch model the same way (CPU oracle),
  5. report per-utterance and mean mel-MSE.

CLI: python -m fac_via_ppg_tpu.eval.parity --checkpoint ckpt.pt \
        --filelist wavs.txt [--against-torch-oracle]
"""

from __future__ import annotations

import argparse
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fac_via_ppg_tpu.configs.hparams import Tacotron2Config, create_hparams_stage
from fac_via_ppg_tpu.dsp.stft import TacotronSTFT
from fac_via_ppg_tpu.frontend import ppg as ppg_mod
from fac_via_ppg_tpu.models import tacotron2 as t2


def mel_mse(a: np.ndarray, b: np.ndarray) -> float:
    """MSE over the overlapping frames of two (n_mel, T) log-mels."""
    n = min(a.shape[-1], b.shape[-1])
    return float(np.mean((a[..., :n] - b[..., :n]) ** 2))


def teacher_forced_mel(cfg: Tacotron2Config, params, model_state,
                       ppg: np.ndarray, mel: np.ndarray) -> np.ndarray:
    """Deterministic (dropout-free) teacher-forced postnet mel (80, T)."""
    orig = t2.dropout
    t2.__dict__["dropout"] = lambda key, x, rate, enabled: x
    try:
        (mel_out, mel_post, _, _), _ = t2.tacotron2_forward(
            cfg, params, model_state,
            jnp.asarray(ppg.T[None]), jnp.asarray([ppg.shape[0]]),
            jnp.asarray(mel[None]), jnp.asarray([mel.shape[1]]),
            jax.random.PRNGKey(0), training=False,
        )
    finally:
        t2.__dict__["dropout"] = orig
    return np.asarray(mel_post[0])


def extract_features(wav_path: str, hparams, deps) -> Tuple[np.ndarray, np.ndarray]:
    from fac_via_ppg_tpu.frontend import feat as feat_mod

    fs, wav = feat_mod.read_wav(wav_path)
    ppg = ppg_mod.get_ppg(wav_path, deps, dither=0.0)
    stft = TacotronSTFT(
        hparams.filter_length, hparams.hop_length, hparams.win_length,
        hparams.n_acoustic_feat_dims, hparams.sampling_rate,
        hparams.mel_fmin, hparams.mel_fmax,
    )
    audio_norm = (np.asarray(wav, np.float32) / hparams.max_wav_value)[None]
    mel = np.asarray(stft.mel_spectrogram(jnp.asarray(audio_norm)))[0]
    return ppg, mel


def run_parity(checkpoint: str, filelist: str,
               against_torch_oracle: bool = False,
               t2_kw: Optional[dict] = None,
               deps: Optional[ppg_mod.DependenciesPPG] = None) -> dict:
    """`t2_kw` — size overrides applied to BOTH sides (this framework's
    config and the torch oracle's create_hparams_stage); empty = the
    full-size stage configuration.  `deps` — an already-loaded AM bundle
    (defaults to the repo data/ bundle)."""
    hparams = create_hparams_stage(**(t2_kw or {}))
    cfg = Tacotron2Config.from_hparams(hparams)

    if checkpoint.endswith(".pt") or checkpoint.endswith(".pth"):
        from fac_via_ppg_tpu.train.import_torch import (
            load_reference_tacotron2_checkpoint,
        )

        params, model_state, _, _ = load_reference_tacotron2_checkpoint(
            checkpoint, cfg
        )
    else:
        from fac_via_ppg_tpu.utils.inference import load_tacotron2_model

        params, model_state = load_tacotron2_model(checkpoint, cfg)

    deps = deps or ppg_mod.DependenciesPPG()
    with open(filelist) as f:
        wavs = [line.strip() for line in f if line.strip()]

    per_utt: List[dict] = []
    for wav_path in wavs:
        ppg, mel = extract_features(wav_path, hparams, deps)
        mine = teacher_forced_mel(cfg, params, model_state, ppg, mel)
        entry = {"wav": wav_path, "mse_vs_target": mel_mse(mine, mel)}
        if against_torch_oracle:
            ref = _torch_oracle_mel(checkpoint, hparams, ppg, mel)
            entry["mse_vs_reference_model"] = mel_mse(mine, ref)
        per_utt.append(entry)

    out = {"per_utterance": per_utt}
    for key in ("mse_vs_target", "mse_vs_reference_model"):
        vals = [u[key] for u in per_utt if key in u]
        if vals:
            out["mean_" + key] = float(np.mean(vals))
    return out


def _torch_oracle_mel(checkpoint: str, hparams, ppg: np.ndarray,
                      mel: np.ndarray) -> np.ndarray:
    """Teacher-forced mel from the reference torch model (CPU)."""
    import os
    import sys

    tests_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..", "tests"
    )
    sys.path.insert(0, os.path.abspath(tests_dir))
    from torch_oracle import (  # noqa: E402
        load_reference_module,
        no_dropout,
        patch_model_module_for_cpu,
    )
    import torch

    model_mod = patch_model_module_for_cpu(load_reference_module("common.model"))
    ref_model = model_mod.Tacotron2(hparams)
    payload = torch.load(checkpoint, map_location="cpu", weights_only=False)
    ref_model.load_state_dict(payload["state_dict"])
    ref_model.eval()
    # The reference's parse_decoder_outputs crashes at batch size 1 (the
    # per-step gate_output.squeeze() drops the batch dim, model.py:481);
    # duplicate the utterance to batch 2 and keep the first output.
    ppg2 = np.repeat(ppg.T[None], 2, axis=0)
    mel2 = np.repeat(mel[None], 2, axis=0)
    with no_dropout(), torch.no_grad():
        outputs = ref_model(
            (
                torch.tensor(ppg2).float(),
                torch.tensor([ppg.shape[0]] * 2),
                torch.tensor(mel2).float(),
                ppg.shape[0],
                torch.tensor([mel.shape[1]] * 2),
            )
        )
    return outputs[1][0].numpy()


if __name__ == "__main__":
    import json

    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--filelist", required=True)
    parser.add_argument("--against-torch-oracle", action="store_true")
    args = parser.parse_args()
    result = run_parity(args.checkpoint, args.filelist,
                        args.against_torch_oracle)
    print(json.dumps(result, indent=2))
