"""Batched WaveGlow vocoder inference CLI.

Mirrors the reference (src/waveglow/inference.py:33-73): a filelist of mel
.npy files -> wavs, sigma / denoiser options.  BASELINE config 2 surface
("Batched WaveGlow vocoder inference").

Mels are `.npy` (n_mel, T) arrays as produced by scripts/mel2samp_dump.py,
or the reference's torch-saved `.pt` tensors (its filelist format works
unchanged — see load_mel).  Same-length mels are stacked into true device
batches; `--mel_bucket` lets distinct lengths share batches.

Usage:
  python -m fac_via_ppg_tpu.scripts.waveglow_inference -f mels.txt \
      -w waveglow_ckpt -o outdir [-s 1.0] [-d 0.0] [-b 8]
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np
from scipy.io import wavfile

from fac_via_ppg_tpu.configs.hparams import WaveGlowConfig
from fac_via_ppg_tpu.data.mel2samp import MAX_WAV_VALUE, files_to_list
from fac_via_ppg_tpu.models.denoiser import Denoiser
from fac_via_ppg_tpu.models.waveglow import waveglow_infer
from fac_via_ppg_tpu.utils.inference import load_waveglow_model
from fac_via_ppg_tpu.utils.numeric import round_batch_to_grid, round_up


def load_mel(path: str) -> np.ndarray:
    """Load one (n_mel, T) mel file: .npy (scripts/mel2samp_dump.py) or
    the reference's torch-saved .pt tensors (its inference filelist
    format, src/waveglow/inference.py:46-48 / mel2samp.py saves with
    torch.save) — so a reference deployment's existing mel dumps serve
    unchanged."""
    if path.endswith((".pt", ".pth")):
        import torch

        m = torch.load(path, map_location="cpu", weights_only=True)
        return np.asarray(m.detach().numpy() if hasattr(m, "detach")
                          else m, np.float32)
    return np.load(path)


def bucket_mels(mels, mel_bucket: int):
    """(file, (n_mel, T) mel) pairs -> (file, padded mel, true_frames).

    `mel_bucket` > 0 pads each mel's time axis up to a multiple of
    `mel_bucket` frames by edge-repeating the last frame, so a corpus of
    distinct utterance lengths still collapses into a few padded-length
    groups that form full device batches (audio is trimmed back to
    true_frames * hop after synthesis).  This is the bucket-pad + trim
    semantic the fused serving path already uses
    (eval/fused.py featurize / collect_feature_pairs); the edge-repeat
    keeps the pad region spectrally continuous so the conv receptive
    field doesn't drag a hard boundary into the real tail.  0 = exact
    lengths (reference semantics: one program per distinct length).
    """
    out = []
    for f, m in mels:
        t = m.shape[-1]
        if mel_bucket:
            t_pad = round_up(t, mel_bucket)
            if t_pad != t:
                m = np.concatenate(
                    [m, np.repeat(m[:, -1:], t_pad - t, axis=1)], axis=1
                )
        out.append((f, m, t))
    return out


def main(mel_files, waveglow_path, output_dir, sigma, denoiser_strength,
         batch_size=1, sampling_rate=16000, data_parallel=False,
         compute_dtype="float32", wn_impl="xla", model_parallel=1,
         cond_impl="dense", config_path=None, snr_budget_db=None,
         wn_int8_flows=0, pad_batches="grid", mel_bucket=0):
    if cond_impl in ("int8", "auto") and wn_impl == "pallas":
        raise SystemExit("--cond_impl int8/auto requires --wn_impl xla "
                         "or flow")
    # cheap flag validation before the (potentially minutes-long over
    # this link) checkpoint restore
    if pad_batches not in ("grid", "full", "none"):
        raise SystemExit(f"--pad_batches must be grid/full/none, "
                         f"got {pad_batches!r}")
    # The reference CLI recovers the architecture from the pickled model
    # object (waveglow/inference.py:40); our checkpoints are bare param
    # pytrees, so non-default sizes are named explicitly via the same
    # config.json schema the reference trains from (waveglow/config.json).
    if config_path is not None:
        import json

        with open(config_path) as fh:
            cfg = WaveGlowConfig.from_dict(
                json.load(fh)["waveglow_config"]
            )
    else:
        cfg = WaveGlowConfig()
    params = load_waveglow_model(waveglow_path, cfg)
    denoiser = Denoiser(cfg, params) if denoiser_strength > 0 else None

    if batch_size > 8 and batch_size % 8 and pad_batches == "none":
        import warnings

        warnings.warn(
            f"batch_size {batch_size} is off the TPU tile grid "
            "(multiples of 8): the vocoder at batch 12 measured 213.8x "
            "RT vs 325x at batch 8 (docs/PERF.md).  Prefer 8/16/24, or "
            "drop --pad_batches none (the default pads off-grid batches "
            "up to the grid).",
            stacklevel=2,
        )
    files = files_to_list(mel_files)
    os.makedirs(output_dir, exist_ok=True)
    key = jax.random.PRNGKey(0)

    # Group same-shaped mels into batches to amortize compiles + fill MXU.
    # --mel_bucket pads time axes to a frame bucket first, so distinct
    # utterance lengths still form full batches (see bucket_mels).
    mels = [(f, load_mel(f)) for f in files]
    by_len = {}
    for f, m, t in bucket_mels(mels, mel_bucket):
        by_len.setdefault(m.shape[-1], []).append((f, m, t))
    import jax.numpy as jnp

    if cond_impl == "auto":
        # int8 serving gate, calibrated on the deployment's own inputs:
        # these mel files ARE the vocoder's serving distribution, so the
        # first few are the calibration batch (worst-utterance SNR of the
        # bf16+int8 path vs f32-dense; dense fallback below budget)
        from fac_via_ppg_tpu.eval.int8_snr import (
            DEFAULT_SNR_BUDGET_DB,
            select_cond_impl,
            stack_calibration_mels,
        )

        budget = (DEFAULT_SNR_BUDGET_DB if snr_budget_db is None
                  else float(snr_budget_db))
        cal = stack_calibration_mels(
            [m.astype(np.float32) for _, m in mels[:4]]
        )
        cond_impl, worst = select_cond_impl(cfg, params, cal, budget,
                                            sigma=sigma)
        print(f"cond_impl=auto: bf16+int8 worst-utterance SNR "
              f"{worst:.1f} dB vs budget {budget:.1f} dB -> serving "
              f"cond_impl='{cond_impl}'")

    dtype = None if compute_dtype == "float32" else jnp.dtype(compute_dtype)
    packed_wn = None
    if wn_impl == "flow":
        from fac_via_ppg_tpu.models.waveglow import pack_waveglow_flow

        # kernel weights in the serving dtype (biases stay f32): without
        # this a bf16 serve would run mixed f32xbf16 dots in the kernel
        packed_wn = pack_waveglow_flow(cfg, params, dtype=dtype)
    elif wn_impl != "xla":
        from fac_via_ppg_tpu.models.waveglow import pack_waveglow_pallas

        packed_wn = pack_waveglow_pallas(cfg, params)
    packed_cond = None
    if cond_impl == "int8":
        # pack from the f32 params, before any cast/sharding (the
        # docs/PERF.md quality ladder is measured in this configuration)
        from fac_via_ppg_tpu.models.waveglow import pack_waveglow_int8cond

        packed_cond = pack_waveglow_int8cond(cfg, params)
    packed_wn8 = None
    if wn_int8_flows:
        from fac_via_ppg_tpu.models.waveglow import pack_waveglow_wn_int8

        packed_wn8 = pack_waveglow_wn_int8(cfg, params)
    # packed_cond/packed_wn are passed as explicit jit arguments (not
    # closure captures) so the sharded/replicated versions bound below are
    # used by construction, not by Python late-binding timing.
    infer = jax.jit(
        lambda p, pk, pc, m, k: waveglow_infer(cfg, p, m, sigma, k,
                                               dtype=dtype,
                                               wn_impl=wn_impl, packed_wn=pk,
                                               cond_impl=cond_impl,
                                               packed_cond=pc,
                                               wn_int8_flows=wn_int8_flows,
                                               packed_wn_int8=packed_wn8)
    )
    mesh = None
    if (data_parallel or model_parallel > 1) and jax.device_count() > 1:
        # serving fan-out: shard the batch over the chip mesh; params
        # replicate (or, with model_parallel > 1, shard the WN hidden
        # channel over the 'model' axis) — GSPMD partitions the program.
        from fac_via_ppg_tpu.parallel.mesh import (
            batch_sharding, make_mesh, replicate,
        )

        mesh = make_mesh(model=int(model_parallel))
        if model_parallel > 1:
            from fac_via_ppg_tpu.parallel.sharding import (
                apply_shardings,
                waveglow_param_shardings,
            )

            params = apply_shardings(
                params, waveglow_param_shardings(mesh, params)
            )
            if packed_cond is not None:
                from fac_via_ppg_tpu.parallel.sharding import (
                    int8cond_shardings,
                )

                packed_cond = apply_shardings(
                    packed_cond, int8cond_shardings(mesh, packed_cond)
                )
        else:
            params = replicate(mesh, params)
            if packed_cond is not None:
                packed_cond = replicate(mesh, packed_cond)
        batch_size = max(batch_size, mesh.shape["data"])
        print(f"vocoder mesh: {mesh.shape['data']} data x "
              f"{mesh.shape['model']} model")

    # after the mesh bump, so --data_parallel with the default -b 1
    # (effective batch = mesh width) also gets the hint
    if (batch_size > 1 and not mel_bucket and len(files) > 1
            and len(by_len) > len(files) // 2):
        import warnings

        warnings.warn(
            f"batching requested (effective batch {batch_size}) but the "
            f"{len(files)} mels have {len(by_len)} distinct lengths, so "
            "exact-length grouping leaves most batches near size 1 (one "
            "XLA compile per distinct length).  Pass --mel_bucket 64 to "
            "pad lengths into shared buckets and form full batches.",
            stacklevel=2,
        )

    hop = cfg.hop_length

    def write_batch(chunk, audio_dev):
        # the only host sync: np.asarray blocks on the device buffers.
        # Clip before the int16 cast: a sample past full scale would
        # WRAP (1.01 -> -32441, an audible polarity flip), not saturate
        # (eval/fused.py clips the same way, fused.py int16 emit)
        audio = np.clip(
            np.asarray(audio_dev), -MAX_WAV_VALUE, MAX_WAV_VALUE - 1
        ).astype(np.int16)
        for (f, _, t), wav in zip(chunk, audio):
            out = os.path.join(
                output_dir, os.path.basename(f) + "_synthesis.wav"
            )
            # trim mel-bucket padding back to the true length
            wavfile.write(out, sampling_rate, wav[: t * hop])
            print(out)

    # One batch stays in flight (JAX async dispatch): batch N+1's device
    # execution overlaps batch N's audio readback + wav writes — the
    # same overlap eval/streaming.py measures at ~1.5x on this link.
    inflight = None
    try:
        # Under grid/full, chunk at the grid-rounded batch size directly:
        # with -b 12 over 24 files, chunks of [16, 8] dispatch 24 device
        # rows total, vs [12->16, 12->16] = 32 rows if we chunked at the
        # off-grid 12 and padded each chunk.
        chunk_size = (batch_size if pad_batches == "none"
                      else round_batch_to_grid(batch_size))
        for length, group in by_len.items():
            for i in range(0, len(group), chunk_size):
                chunk = group[i : i + chunk_size]
                mel_batch = np.stack(
                    [m for _, m, _ in chunk]
                ).astype(np.float32)
                # batch padding policy (rows repeat the last mel; outputs
                # are trimmed to the real rows):
                #   grid (default) — round off-grid chunks (>8, % 8) up
                #     to the 8-grid: the off-grid program is SLOWER in
                #     absolute audio/s (measured B=12 crater, docs/PERF.md)
                #   full — additionally pad partial tail chunks to the
                #     full chunk size, so each mel length compiles exactly
                #     one program (serving: compile time dominates)
                #   none — exact chunk sizes (old behavior)
                if pad_batches == "none":
                    target = len(chunk)
                else:
                    target = (chunk_size if pad_batches == "full"
                              else len(chunk))
                    target = round_batch_to_grid(target)
                if mesh is not None:
                    target = round_up(target, mesh.shape["data"])
                if target > len(chunk):
                    mel_batch = np.concatenate(
                        [mel_batch,
                         np.repeat(mel_batch[-1:], target - len(chunk), 0)]
                    )
                if mesh is not None:
                    mel_batch = jax.device_put(
                        mel_batch, batch_sharding(mesh)
                    )
                key, sub = jax.random.split(key)
                audio = infer(params, packed_wn, packed_cond,
                              mel_batch, sub)[: len(chunk)]
                if denoiser is not None:
                    audio = denoiser(
                        audio, strength=denoiser_strength
                    )[:, 0, :]
                audio = audio * MAX_WAV_VALUE  # still on device, async
                if inflight is not None:
                    write_batch(*inflight)
                inflight = (chunk, audio)
        if inflight is not None:
            write_batch(*inflight)
            inflight = None
    finally:
        # a bad mel file later in the list must not lose the finished
        # in-flight batch
        if inflight is not None:
            write_batch(*inflight)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-f", "--filelist_path", required=True)
    parser.add_argument("-w", "--waveglow_path", required=True,
                        help="Path to waveglow checkpoint")
    parser.add_argument("-o", "--output_dir", required=True)
    parser.add_argument("-s", "--sigma", default=1.0, type=float)
    parser.add_argument("-d", "--denoiser_strength", default=0.0, type=float,
                        help="Removes model bias. Start with 0.1 and adjust")
    parser.add_argument("-b", "--batch_size", default=1, type=int)
    parser.add_argument("--sampling_rate", default=16000, type=int)
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard batches over all devices in the mesh")
    parser.add_argument("--model_parallel", type=int, default=1,
                        help="shard the WN hidden channel over a 'model' "
                             "mesh axis of this size (composes with "
                             "--data_parallel)")
    parser.add_argument("--compute_dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="serving dtype (bf16: ~1.5x faster; ~43.6 dB "
                             "worst-utterance SNR vs f32 on the trained "
                             "ckpts — docs/PERF.md quality ladder)")
    parser.add_argument("--cond_impl", default="dense",
                        choices=["dense", "int8", "auto"],
                        help="int8: cond matmuls on the int8 MXU (~10%% "
                             "faster; ~-1 dB SNR vs the bf16 mode).  "
                             "auto: measure the int8 worst-utterance SNR "
                             "on this checkpoint + the first input mels "
                             "at startup, fall back to dense below "
                             "--snr_budget_db")
    parser.add_argument("--snr_budget_db", type=float, default=None,
                        help="worst-utterance SNR budget (dB) for "
                             "--cond_impl auto; default "
                             "eval/int8_snr.DEFAULT_SNR_BUDGET_DB")
    parser.add_argument("--wn_int8_flows", type=int, default=0,
                        help="run the WN in_conv dilated convs of the N "
                             "narrowest flows on the int8 MXU "
                             "(experimental rung; measure the ladder "
                             "first: eval/int8_snr --include_wn_int8)")
    parser.add_argument("--wn_impl", default="xla",
                        choices=["xla", "pallas", "flow"],
                        help="coupling-net impl; flow = cross-layer Pallas "
                             "kernel (whole WN chain in VMEM per tile, one "
                             "Mosaic compile); pallas = round-2 per-layer "
                             "kernel (one compile per dilation)")
    parser.add_argument("-c", "--config", default=None,
                        help="config.json naming a non-default architecture "
                             "(reference waveglow/config.json schema); "
                             "default: the reference 12-flow model")
    parser.add_argument("--mel_bucket", type=int, default=0,
                        help="pad each mel's time axis up to a multiple "
                             "of N frames (edge-repeat; audio trimmed to "
                             "the true length), so distinct utterance "
                             "lengths still form full device batches — "
                             "without this, batching only groups "
                             "IDENTICAL lengths and a real corpus "
                             "degenerates to batch 1.  64 is a good "
                             "serving value (the fused path's feature "
                             "bucket); 0 = exact lengths (default, "
                             "reference semantics)")
    parser.add_argument("--pad_batches", default="grid",
                        choices=["grid", "full", "none"],
                        help="batch padding: grid (default) rounds "
                             "off-grid chunks (>8, not a multiple of 8) "
                             "up to the TPU 8-grid — the off-grid "
                             "program is slower in ABSOLUTE audio/s "
                             "(measured b=12: 213.8x vs 338x at b=16); "
                             "full also pads partial tail chunks to the "
                             "full batch_size so each mel length "
                             "compiles one program; none = exact sizes")
    parser.add_argument("--compilation_cache_dir", default="",
                        help="persistent XLA compilation cache: restarted "
                             "replicas skip the ~3 min WaveGlow first "
                             "compile (real TPU hosts; no-op over the axon "
                             "tunnel — see utils/compilation_cache.py)")
    args = parser.parse_args()
    from fac_via_ppg_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache(args.compilation_cache_dir or None)
    main(args.filelist_path, args.waveglow_path, args.output_dir, args.sigma,
         args.denoiser_strength, args.batch_size, args.sampling_rate,
         args.data_parallel, args.compute_dtype, args.wn_impl,
         args.model_parallel, args.cond_impl, args.config,
         args.snr_budget_db, args.wn_int8_flows, args.pad_batches,
         args.mel_bucket)
