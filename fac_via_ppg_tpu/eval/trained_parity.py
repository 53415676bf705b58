"""Trained-checkpoint fidelity loop (the BASELINE north-star acceptance).

The BASELINE fidelity target — mel-MSE <= 1e-3 vs the reference PyTorch
implementation — is defined on TRAINED checkpoints.  No trained reference
checkpoint exists in this environment (the Kaldi AM `final.raw` is a
missing LFS blob and there is no L2-ARCTIC corpus), so this harness
manufactures the missing half of the comparison:

  1. train Tacotron2 + WaveGlow in THIS framework (any corpus),
  2. export both checkpoints to the reference's torch formats
     (train/export_torch),
  3. run the REFERENCE code as the oracle — the accent-conversion serve
     path of src/script/generate_synthesis.py:86-98: Tacotron2.inference
     (model.py:489-535) -> WaveGlow.infer (glow.py:252-293) ->
     Denoiser (denoiser.py:35-68) — on torch CPU over the exported
     weights,
  4. run this framework's serve path on the same utterances,
  5. report per-utterance mel-MSE, stop-step agreement, pointwise audio
     error, and an audio log-spectral distance.

Prenet dropout is disabled on BOTH sides (it is the only injected
randomness in the decoder, reference model.py:134) and the vocoder's
gaussian draws are matched pointwise, so the whole pipeline is
deterministic and the comparison is pointwise.

The PPG front end is shared input (this framework computes it); the
reference's pykaldi front end is not runnable here, and the comparison
target is the model serve path, not the frozen AM.

CLI (full-size):
  python -m fac_via_ppg_tpu.eval.trained_parity \
      --ppg2mel_model CKPT_DIR --waveglow_model CKPT_DIR \
      --filelist wavs.txt [--output out.json]
"""

from __future__ import annotations

import os
import sys
import tempfile
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from fac_via_ppg_tpu.configs.hparams import (
    Tacotron2Config,
    WaveGlowConfig,
    create_hparams_stage,
)
from fac_via_ppg_tpu.frontend import ppg as ppg_mod


def _oracle_helpers():
    """Import tests/torch_oracle.py (the reference-code loader with
    librosa/pykaldi stubbed) from package code, as eval/parity.py does."""
    tests_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..", "tests"
    )
    sys.path.insert(0, os.path.abspath(tests_dir))
    import torch_oracle  # noqa: E402

    return torch_oracle


def _log_spectral_distance(a: np.ndarray, b: np.ndarray,
                           n_fft: int = 1024, hop: int = 160) -> float:
    """RMS distance between log-magnitude STFTs (dB), a standard
    audio-domain closeness measure; the harness quotes it next to the
    pointwise max error."""
    n = min(len(a), len(b))
    fa = np.abs(np.fft.rfft(np.lib.stride_tricks.sliding_window_view(
        a[:n], n_fft)[::hop] * np.hanning(n_fft), axis=-1))
    fb = np.abs(np.fft.rfft(np.lib.stride_tricks.sliding_window_view(
        b[:n], n_fft)[::hop] * np.hanning(n_fft), axis=-1))
    la, lb = (20 * np.log10(np.maximum(x, 1e-8)) for x in (fa, fb))
    return float(np.sqrt(np.mean((la - lb) ** 2)))


def _matched_noise(torch, wg_cfg: WaveGlowConfig, n_frames: int, seed: int):
    """The exact gaussian sequence WaveGlow.infer draws (glow.py:252-293):
    one (B, remaining, G) tensor plus one per early output, in draw
    order.  Returned as numpy for waveglow_infer(noise=...)."""
    from fac_via_ppg_tpu.models.waveglow import flow_channels

    G = n_frames * wg_cfg.hop_length // wg_cfg.n_group
    shapes = [(1, flow_channels(wg_cfg)[-1], G)] + [
        (1, wg_cfg.n_early_size, G)
        for k in reversed(range(wg_cfg.n_flows))
        if k % wg_cfg.n_early_every == 0 and k > 0
    ]
    torch.manual_seed(seed)
    return [torch.FloatTensor(*s).normal_().numpy() for s in shapes]


def reference_serve(torch, oracle, ref_t2, ref_wg, ref_denoiser,
                    ppg: np.ndarray, sigma: float, strength: float,
                    seed: int):
    """The reference serve path (generate_synthesis.py:86-98) on CPU."""
    with oracle.no_dropout(), torch.no_grad():
        _, mel_post, _, _ = ref_t2.inference(torch.tensor(ppg))
        torch.manual_seed(seed)
        audio = ref_wg.infer(mel_post, sigma=sigma)
        if ref_denoiser is not None and strength > 0:
            audio = ref_denoiser(audio, strength)[:, 0]
    return mel_post.numpy(), audio.numpy()


def framework_serve(t2_cfg, t2_params, t2_state, wg_cfg, wg_params,
                    denoiser, ppg: np.ndarray, sigma: float,
                    strength: float, noise):
    """This framework's serve path with dropout off and injected noise."""
    from fac_via_ppg_tpu.models import tacotron2 as t2
    from fac_via_ppg_tpu.models.waveglow import waveglow_infer

    orig = t2.dropout
    t2.__dict__["dropout"] = lambda key, x, rate, enabled: x
    try:
        _, mel_post, _, _, t_end = t2.tacotron2_inference(
            t2_cfg, t2_params, t2_state, jnp.asarray(ppg),
            jax.random.PRNGKey(0),
        )
    finally:
        t2.__dict__["dropout"] = orig
    t_end = int(t_end)
    mel_post = np.asarray(mel_post)[:, :, :t_end]
    audio = waveglow_infer(
        wg_cfg, wg_params, jnp.asarray(mel_post), sigma, key=None,
        noise=noise(t_end),
    )
    if denoiser is not None and strength > 0:
        audio = denoiser(audio, strength=strength)[:, 0]
    return mel_post, np.asarray(audio), t_end


def run_trained_parity(
    t2_ckpt: str, wg_ckpt: str, wav_paths: List[str],
    t2_kw: Optional[dict] = None, wg_cfg: Optional[WaveGlowConfig] = None,
    deps: Optional[ppg_mod.DependenciesPPG] = None,
    sigma: float = 0.6, denoiser_strength: float = 0.005,
    max_decoder_steps: Optional[int] = None,
) -> Dict:
    """Export trained checkpoints to the reference formats, run both
    implementations' serve paths, and report fidelity metrics.

    `t2_kw` — size overrides applied identically to this framework's
    Tacotron2Config and the reference's create_hparams (empty = the
    full-size stage configuration); `wg_cfg` analogous (None = reference
    config.json sizes, which the exported pickle carries by itself).
    """
    import torch

    from fac_via_ppg_tpu.models.denoiser import Denoiser
    from fac_via_ppg_tpu.models.waveglow import (
        init_waveglow,
        remove_weightnorm,
    )
    from fac_via_ppg_tpu.train import checkpoint as ckpt
    from fac_via_ppg_tpu.train.export_torch import (
        save_reference_tacotron2_checkpoint,
        save_reference_waveglow_checkpoint,
    )
    from fac_via_ppg_tpu.utils.inference import load_tacotron2_model

    oracle = _oracle_helpers()
    t2_kw = dict(t2_kw or {})
    if max_decoder_steps is not None:
        t2_kw["max_decoder_steps"] = max_decoder_steps

    # --- our models -------------------------------------------------------
    # Checkpoints may be this framework's orbax dirs OR the reference's
    # torch formats (.pt/.pth): bring-your-own-artifacts deployments hand
    # us reference-trained checkpoints directly (docs/RUNBOOK.md).
    t2_cfg = Tacotron2Config.from_hparams(create_hparams_stage(**t2_kw))
    wg_cfg = wg_cfg or WaveGlowConfig()
    if t2_ckpt.endswith((".pt", ".pth")):
        from fac_via_ppg_tpu.train.import_torch import (
            load_reference_tacotron2_checkpoint,
        )

        t2_params, t2_state, _, _ = load_reference_tacotron2_checkpoint(
            t2_ckpt, t2_cfg
        )
    else:
        t2_params, t2_state = load_tacotron2_model(t2_ckpt, t2_cfg)
    if wg_ckpt.endswith((".pt", ".pth")):
        from fac_via_ppg_tpu.train.import_torch import (
            load_reference_waveglow_checkpoint,
        )

        wg_train_params = load_reference_waveglow_checkpoint(wg_ckpt, wg_cfg)
    else:
        wg_template = jax.eval_shape(
            lambda k: init_waveglow(k, wg_cfg), jax.random.PRNGKey(0)
        )
        wg_train_params = ckpt.load_checkpoint(
            wg_ckpt, like={"params": wg_template}, partial=True
        )["params"]
    wg_params = remove_weightnorm(wg_train_params)
    denoiser = Denoiser(wg_cfg, wg_params)

    # --- export to the reference formats, load through reference code ----
    with tempfile.TemporaryDirectory() as td:
        t2_pt = os.path.join(td, "t2.pt")
        wg_pt = os.path.join(td, "wg.pt")
        save_reference_tacotron2_checkpoint(
            t2_pt, t2_params, t2_state, t2_cfg, iteration=0,
            learning_rate=0.0,
        )
        save_reference_waveglow_checkpoint(wg_pt, wg_train_params, wg_cfg)

        oracle.patch_cuda_to_cpu()
        hparams_mod = oracle.load_reference_module("common.hparams")
        model_mod = oracle.patch_model_module_for_cpu(
            oracle.load_reference_module("common.model")
        )
        ref_hp = hparams_mod.create_hparams_stage(**t2_kw)
        ref_t2 = model_mod.Tacotron2(ref_hp)
        payload = torch.load(t2_pt, map_location="cpu", weights_only=False)
        ref_t2.load_state_dict(payload["state_dict"], strict=True)
        ref_t2.eval()

        glow = oracle.load_reference_module("waveglow.glow")
        prev = sys.modules.get("glow")
        sys.modules["glow"] = glow
        try:
            ref_wg = torch.load(
                wg_pt, map_location="cpu", weights_only=False
            )["model"]
        finally:
            if prev is not None:
                sys.modules["glow"] = prev
            else:
                del sys.modules["glow"]
        # the reference serve path folds weight norm before inference,
        # calling it exactly as utils.py:177-181 does
        ref_wg = ref_wg.remove_weightnorm(ref_wg)
        ref_wg.eval()
        ref_denoiser_mod = oracle.load_reference_module("waveglow.denoiser")
        with oracle.no_dropout(), torch.no_grad():
            ref_den = ref_denoiser_mod.Denoiser(ref_wg, mode="zeros") \
                if denoiser_strength > 0 else None

    # --- per-utterance comparison ----------------------------------------
    deps = deps or ppg_mod.DependenciesPPG()
    per_utt = []
    for i, wav_path in enumerate(wav_paths):
        ppg = ppg_mod.get_ppg(wav_path, deps, dither=0.0)
        ppg_b = ppg.T[None].astype(np.float32)
        seed = 16807 + i

        mine_mel, mine_audio, t_end = framework_serve(
            t2_cfg, t2_params, t2_state, wg_cfg, wg_params, denoiser,
            ppg_b, sigma, denoiser_strength,
            noise=lambda f: _matched_noise(torch, wg_cfg, f, seed),
        )
        ref_mel, ref_audio = reference_serve(
            torch, oracle, ref_t2, ref_wg, ref_den, ppg_b, sigma,
            denoiser_strength, seed,
        )
        n_ref = ref_mel.shape[-1]

        entry = {
            "wav": wav_path,
            "frames": t_end,
            "frames_reference": n_ref,
            "stop_step_match": bool(t_end == n_ref),
            "mel_mse": float(np.mean(
                (mine_mel[..., :min(t_end, n_ref)]
                 - ref_mel[..., :min(t_end, n_ref)]) ** 2
            )),
        }
        if entry["stop_step_match"]:
            a, b = mine_audio[0], ref_audio[0]
            entry["audio_max_abs"] = float(np.abs(a - b).max())
            entry["audio_lsd_db"] = _log_spectral_distance(a, b)
        per_utt.append(entry)

    mses = [u["mel_mse"] for u in per_utt]
    out = {
        "per_utterance": per_utt,
        "mean_mel_mse": float(np.mean(mses)),
        "max_mel_mse": float(np.max(mses)),
        "all_stop_steps_match": all(u["stop_step_match"] for u in per_utt),
        "passes_baseline": bool(np.max(mses) <= 1e-3
                                and all(u["stop_step_match"]
                                        for u in per_utt)),
        "target": "mel-MSE <= 1e-3 vs reference implementation "
                  "(BASELINE north star), trained checkpoints",
    }
    lsds = [u["audio_lsd_db"] for u in per_utt if "audio_lsd_db" in u]
    if lsds:
        out["mean_audio_lsd_db"] = float(np.mean(lsds))
    return out


def main():
    import argparse
    import json

    parser = argparse.ArgumentParser()
    parser.add_argument("--ppg2mel_model", required=True)
    parser.add_argument("--waveglow_model", required=True)
    parser.add_argument("--filelist", required=True)
    parser.add_argument("--sigma", type=float, default=0.6)
    parser.add_argument("--denoiser_strength", type=float, default=0.005)
    parser.add_argument("--max_decoder_steps", type=int, default=None)
    parser.add_argument("--output", default=None)
    parser.add_argument("--cpu", action="store_true",
                        help="run the JAX side on CPU (the torch oracle "
                             "is CPU regardless); avoids per-shape "
                             "accelerator compiles for one-off runs")
    args = parser.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    with open(args.filelist) as f:
        wavs = [line.strip() for line in f if line.strip()]
    result = run_trained_parity(
        args.ppg2mel_model, args.waveglow_model, wavs,
        sigma=args.sigma, denoiser_strength=args.denoiser_strength,
        max_decoder_steps=args.max_decoder_steps,
    )
    text = json.dumps(result, indent=2)
    print(text)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
