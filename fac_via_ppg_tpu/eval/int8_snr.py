"""Quality ladder for reduced-precision WaveGlow inference modes.

Measures the SNR of each serving configuration (bf16-dense, bf16-int8,
f32-int8, plus opt-in per-tensor and WN-quantization rungs) against the
f32-dense output on a TRAINED checkpoint with real corpus mel and
matched noise — the docs/PERF.md quality-ladder numbers (round-5
re-measure under the per-column default, worst-utterance: bf16-dense
43.6-43.8 dB / bf16-int8 43.5-43.8 dB / f32-int8 48.8-50.7 dB across
the two study checkpoints).  Reference surface being
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


# Default worst-utterance SNR budget (dB, bf16+int8 vs f32-dense) for the
# cond_impl='auto' serving gate: the healthy trained checkpoints measure
# ~43.5 dB worst-utterance (docs/PERF.md quality ladder, per-column
# default — bf16's own rounding dominates), so 35 dB flags only genuinely
# quantization-hostile checkpoints while leaving ~8 dB of corpus headroom.
DEFAULT_SNR_BUDGET_DB = 35.0


def stack_calibration_mels(mels, max_frames: int = 400) -> jnp.ndarray:
    """[(n_mel, T)] arrays -> one (B, n_mel, F) calibration batch, trimmed
    to the shortest utterance and capped at `max_frames` (bounds the two
    full-program compiles select_cond_impl pays at serving startup)."""
    mels = list(mels)
    if not mels:
        raise ValueError("calibration needs at least one mel "
                         "(cond_impl='auto' cannot gate on an empty "
                         "input list)")
    F = min(min(int(m.shape[-1]) for m in mels), int(max_frames))
    return jnp.asarray(np.stack([np.asarray(m)[:, :F] for m in mels]))


def calibration_mel_from_wavs(wav_paths, cfg: WaveGlowConfig,
                              max_utts: int = 4,
                              max_frames: int = 400) -> jnp.ndarray:
    """Calibration batch for cond_impl='auto' from deployment wavs: the
    TacotronSTFT analysis mel of the first `max_utts` inputs — the same
    mel family the vocoder trains on (reference mel2samp.py:61-72), so the
    gate measures the deployment's own amplitude statistics."""
    from scipy.io import wavfile

    from fac_via_ppg_tpu.utils.inference import get_mel

    stft = TacotronSTFT(filter_length=1024, hop_length=cfg.hop_length,
                        win_length=1024, sampling_rate=16000,
                        n_mel_channels=cfg.n_mel_channels,
                        mel_fmin=0.0, mel_fmax=8000.0)
    mels = []
    for p in list(wav_paths)[:max_utts]:
        _, wav = wavfile.read(p)
        mels.append(np.asarray(get_mel(wav, stft)[0]))
    if not mels:
        raise ValueError("cond_impl='auto' needs at least one input wav "
                         "to calibrate on")
    return stack_calibration_mels(mels, max_frames)


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


def _snr_db(ref: np.ndarray, got: np.ndarray) -> float:
    err = got - ref
    return round(float(
        10 * np.log10(np.sum(ref ** 2) / max(np.sum(err ** 2), 1e-30))
    ), 2)


def run_ladder(cfg: WaveGlowConfig, params, mel: jnp.ndarray,
               sigma: float = 0.6, seed: int = 0,
               include_tensorscale: bool = False,
               include_wn_int8: bool = False,
               detailed: bool = False) -> dict:
    """{name: SNR dB vs f32-dense} for each reduced-precision mode.

    include_tensorscale adds the pre-round-3 per-tensor activation-scale
    int8 rungs for A/B measurement — opt-in because each rung compiles a
    full WaveGlow program (~3 min on the real chip's tunnel).

    include_wn_int8 adds the experimental WN in_conv quantization rungs
    (bf16 + int8 cond + wn_int8_flows of 4/8/12 — the SNR-vs-flows-
    quantized curve the round-4 verdict asked to measure rather than
    assert away); same opt-in compile cost caveat.

    detailed=True returns {name: {"db", "per_utt_db", "worst_utt_db"}}
    instead of bare floats: per_utt_db is the SNR of each batch row
    (utterance) separately, worst_utt_db its minimum — the quality gate
    should be judged on the worst utterance, not the batch mean.
    """
    from fac_via_ppg_tpu.models.waveglow import (
        pack_waveglow_int8cond, pack_waveglow_wn_int8, waveglow_infer,
    )

    noise = matched_noise(cfg, mel.shape[0], mel.shape[2], seed)
    packed = pack_waveglow_int8cond(cfg, params)

    def run(dtype, cond_impl, cond_quant="column", wn_flows=0, wn8=None,
            rs_flows=0, wn_quant="column"):
        fn = jax.jit(lambda p, m: waveglow_infer(
            cfg, p, m, sigma, None, dtype=dtype, noise=noise,
            cond_impl=cond_impl, cond_quant=cond_quant,
            packed_cond=(packed if cond_impl == "int8" else None),
            wn_int8_flows=wn_flows, packed_wn_int8=wn8,
            wn_int8_quant=wn_quant,
            wn_int8_rs_flows=rs_flows))
        return np.asarray(fn(params, mel), np.float64)

    ref = run(jnp.float32, "dense")
    rungs = [
        ("bf16_dense", jnp.bfloat16, "dense", "column", 0, 0),
        ("bf16_int8", jnp.bfloat16, "int8", "column", 0, 0),
        ("f32_int8", jnp.float32, "int8", "column", 0, 0),
    ]
    if include_tensorscale:
        # per-tensor activation scales: the pre-round-3 int8 mode, kept
        # measurable so the per-column win is an A/B on one checkpoint
        rungs += [
            ("bf16_int8_tensorscale", jnp.bfloat16, "int8", "tensor",
             0, 0),
            ("f32_int8_tensorscale", jnp.float32, "int8", "tensor", 0, 0),
        ]
    wn8_pack = None
    if include_wn_int8:
        wn8_pack = pack_waveglow_wn_int8(cfg, params)
        rungs += [
            (f"bf16_int8_wn{n}", jnp.bfloat16, "int8", "column", n, 0)
            for n in (4, 8, cfg.n_flows)
            if n <= cfg.n_flows
        ]
        # the stacked per-tensor in_conv variant at all flows (the
        # docs/PERF.md "measured, loses" table's second implementation)
        rungs += [(f"bf16_int8_wn{cfg.n_flows}t", jnp.bfloat16, "int8",
                   "column", -cfg.n_flows, 0)]
        # static-scale int8 res_skip rung (all flows): the gate output is
        # in (-1, 1), so this measures the 1/127-grid activation code
        rungs += [(f"bf16_int8_rs{cfg.n_flows}", jnp.bfloat16, "int8",
                   "column", 0, cfg.n_flows)]
    out = {}
    for name, dtype, ci, cq, wn_n, rs_n in rungs:
        # negative wn_n encodes the per-tensor (stacked) in_conv variant
        got = run(dtype, ci, cq, wn_flows=abs(wn_n),
                  wn8=(wn8_pack if (wn_n or rs_n) else None),
                  rs_flows=rs_n,
                  wn_quant=("tensor" if wn_n < 0 else "column"))
        if detailed:
            per_utt = [_snr_db(ref[b], got[b]) for b in range(ref.shape[0])]
            out[name] = {"db": _snr_db(ref, got), "per_utt_db": per_utt,
                         "worst_utt_db": min(per_utt)}
        else:
            out[name] = _snr_db(ref, got)
    return out


def select_cond_impl(cfg: WaveGlowConfig, params, mel: jnp.ndarray,
                     budget_db: float, sigma: float = 0.6,
                     seed: int = 0) -> tuple:
    """Automatic dense fallback for the int8 serving mode.

    Measures the bf16+int8 serving path's worst-utterance SNR against
    f32-dense on the given calibration mel; returns ("int8", snr) when it
    meets budget_db, ("dense", snr) otherwise.  A deployment whose
    checkpoint/corpus quantizes worse than the docs/PERF.md study (39.4 dB)
    degrades to the dense path instead of shipping out-of-budget audio —
    the safety rail the reference's own lossy fp16 serving mode
    (src/waveglow/inference.py:38-41) never had.
    """
    from fac_via_ppg_tpu.models.waveglow import (
        pack_waveglow_int8cond, waveglow_infer,
    )

    noise = matched_noise(cfg, mel.shape[0], mel.shape[2], seed)
    packed = pack_waveglow_int8cond(cfg, params)

    def run(dtype, cond_impl):
        fn = jax.jit(lambda p, m: waveglow_infer(
            cfg, p, m, sigma, None, dtype=dtype, noise=noise,
            cond_impl=cond_impl,
            packed_cond=(packed if cond_impl == "int8" else None)))
        return np.asarray(fn(params, mel), np.float64)

    ref = run(jnp.float32, "dense")
    got = run(jnp.bfloat16, "int8")
    worst = min(_snr_db(ref[b], got[b]) for b in range(ref.shape[0]))
    return ("int8" if worst >= budget_db else "dense"), worst


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
    parser.add_argument("--include_tensorscale", action="store_true",
                        help="add the per-tensor-scale A/B rungs (two "
                             "extra full-program compiles)")
    parser.add_argument("--include_wn_int8", action="store_true",
                        help="add the experimental WN in_conv int8 rungs "
                             "(wn_int8_flows 4/8/12; one full-program "
                             "compile each)")
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

    ladder = run_ladder(cfg, params, mel, args.sigma, args.seed,
                        include_tensorscale=args.include_tensorscale,
                        include_wn_int8=args.include_wn_int8,
                        detailed=True)
    print(json.dumps({"snr_db_vs_f32_dense": ladder,
                      "mel_shape": list(mel.shape),
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
