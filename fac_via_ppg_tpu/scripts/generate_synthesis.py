"""End-to-end accent-conversion synthesis CLI.

Mirrors the reference (src/script/generate_synthesis.py:29-103): same
argparse surface (--ppg2mel_model, --waveglow_model,
--teacher_utterance_path, --output_dir), same operating point (sigma 0.6,
denoiser strength 0.005 mode 'zeros', gate 0.5, fs 16000), same debug.log,
same output name `ac.wav`.

Pipeline: wav -> PPG (Kaldi-convention front-end + TDNN) -> Tacotron2
autoregressive mel -> WaveGlow -> Denoiser -> 16 kHz wav — each stage one
jitted XLA program on the TPU.
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
from scipy.io import wavfile

from fac_via_ppg_tpu.configs.hparams import (
    Tacotron2Config,
    WaveGlowConfig,
    create_hparams_stage,
)
from fac_via_ppg_tpu.dsp.stft import TacotronSTFT
from fac_via_ppg_tpu.frontend import ppg as ppg_mod
from fac_via_ppg_tpu.models.denoiser import Denoiser
from fac_via_ppg_tpu.utils.compilation_cache import enable_compilation_cache
from fac_via_ppg_tpu.utils.inference import (
    get_inference,
    load_tacotron2_model,
    load_waveglow_model,
    waveglow_audio,
)


def main():
    parser = argparse.ArgumentParser(
        description="Generate accent conversion speech using pre-trained"
        "models."
    )
    parser.add_argument("--ppg2mel_model", type=str, required=True,
                        help="Path to the PPG-to-Mel model.")
    parser.add_argument("--waveglow_model", type=str, required=True,
                        help="Path to the WaveGlow model.")
    parser.add_argument("--teacher_utterance_path", type=str, required=True,
                        help="Path to a native speaker recording.")
    parser.add_argument("--output_dir", type=str, required=True,
                        help="Output dir, will save the audio and log info.")
    parser.add_argument("--fused", action="store_true",
                        help="serve through the single-XLA-program path "
                             "(eval/fused.py): one device round trip per "
                             "utterance, ~5x lower latency; one-off compile")
    parser.add_argument("--batch_size", type=int, default=8,
                        help="utterances per fused device call when "
                             "--teacher_utterance_path is a directory or "
                             ".txt filelist (throughput serving)")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard fused batches over every chip on the "
                             "'data' mesh axis (multi-chip serving)")
    parser.add_argument("--cond_impl", default="dense",
                        choices=["dense", "int8", "auto"],
                        help="int8: vocoder cond matmuls on the int8 MXU "
                             "(~10%% faster vocoder, ~0-0.2 dB below the "
                             "bf16 mode on the trained ckpt; needs --fused "
                             "or a batch input).  auto: measure the int8 "
                             "worst-utterance SNR on this checkpoint + "
                             "input at startup, fall back to dense below "
                             "--snr_budget_db")
    parser.add_argument("--snr_budget_db", type=float, default=None,
                        help="worst-utterance SNR budget (dB) for "
                             "--cond_impl auto; default "
                             "eval/int8_snr.DEFAULT_SNR_BUDGET_DB")
    parser.add_argument("--compilation_cache_dir", default="",
                        help="persistent XLA compilation cache: replicas "
                             "restarting with the same programs skip the "
                             "multi-minute first compile (real TPU hosts; "
                             "no-op over the axon tunnel — see "
                             "utils/compilation_cache.py)")
    args = parser.parse_args()
    enable_compilation_cache(args.compilation_cache_dir or None)

    output_dir = args.output_dir
    os.makedirs(output_dir, exist_ok=True)
    logging.basicConfig(
        filename=os.path.join(output_dir, "debug.log"), level=logging.DEBUG,
        force=True,  # write the file even if a host app configured logging
    )
    logging.info("Output dir: %s", output_dir)

    teacher_utt_path = args.teacher_utterance_path
    checkpoint_path = args.ppg2mel_model
    waveglow_path = args.waveglow_model
    is_clip = False
    fs = 16000
    waveglow_sigma = 0.6
    denoiser_mode = "zeros"
    denoiser_strength = 0.005

    logging.debug("Tacotron: %s", checkpoint_path)
    logging.debug("Waveglow: %s", waveglow_path)
    logging.debug("AM: SI model")
    logging.debug("is_clip: %d", is_clip)
    logging.debug("Fs: %d", fs)
    logging.debug("Sigma: %f", waveglow_sigma)
    logging.debug("Denoiser strength: %f", denoiser_strength)
    logging.debug("Denoiser mode: %s", denoiser_mode)

    hparams = create_hparams_stage()
    taco_stft = TacotronSTFT(
        hparams.filter_length, hparams.hop_length, hparams.win_length,
        hparams.n_acoustic_feat_dims, hparams.sampling_rate,
        hparams.mel_fmin, hparams.mel_fmax,
    )
    del taco_stft  # parity with the reference; mel analysis is not needed

    t2_cfg = Tacotron2Config.from_hparams(hparams)
    wg_cfg = WaveGlowConfig()
    tacotron_params, tacotron_state = load_tacotron2_model(
        checkpoint_path, t2_cfg
    )
    waveglow_params = load_waveglow_model(waveglow_path, wg_cfg)

    deps = ppg_mod.DependenciesPPG()
    key = jax.random.PRNGKey(hparams.seed)
    serving_dtype = (
        None if hparams.compute_dtype == "float32"
        else jnp.dtype(hparams.compute_dtype)
    )

    # Batch serving extension (beyond the reference's single-file surface,
    # generate_synthesis.py:86-98): a directory of wavs or a .txt filelist
    # converts through the batched fused program, optionally sharded over
    # the chip mesh with --data_parallel.
    batch_paths = None
    if os.path.isdir(teacher_utt_path):
        batch_paths = sorted(
            os.path.join(teacher_utt_path, f)
            for f in os.listdir(teacher_utt_path)
            if f.lower().endswith(".wav")
        )
    elif teacher_utt_path.endswith(".txt") and os.path.isfile(teacher_utt_path):
        with open(teacher_utt_path) as f:
            batch_paths = [ln.strip() for ln in f if ln.strip()]

    if batch_paths is not None and not batch_paths:
        logging.warning("No .wav files under %s", teacher_utt_path)
        print("No .wav files under", teacher_utt_path)
        return

    calibration_mel = None
    if args.cond_impl == "auto":
        # the int8 serving gate calibrates on this deployment's own input
        from fac_via_ppg_tpu.eval.int8_snr import calibration_mel_from_wavs

        cal_wavs = (batch_paths if batch_paths is not None
                    else ([teacher_utt_path]
                          if os.path.isfile(teacher_utt_path) else []))
        if cal_wavs:
            calibration_mel = calibration_mel_from_wavs(cal_wavs, wg_cfg)

    if batch_paths is not None:
        from fac_via_ppg_tpu.eval.fused import FusedSynthesizer

        logging.info("Batch AC on %d utterances", len(batch_paths))
        synth = FusedSynthesizer(
            t2_cfg, tacotron_params, tacotron_state, wg_cfg,
            waveglow_params, deps=deps, sigma=waveglow_sigma,
            denoiser_strength=denoiser_strength,
            serving_dtype=serving_dtype,
            max_frames=t2_cfg.max_decoder_steps,
            data_parallel=args.data_parallel,
            cond_impl=args.cond_impl,
            calibration_mel=calibration_mel,
            snr_budget_db=args.snr_budget_db,
        )
        # one chunk stays in flight (launch/collect split): chunk N+1's
        # featurization + device execution overlap chunk N's PCM readback
        # and wav writing — same PRNG split order as a synchronous loop,
        # so output is unchanged (eval/streaming.py measures this overlap
        # at ~1.5x throughput on the tunnel)
        def write_chunk(chunk, handle):
            for p, pcm in zip(chunk, synth.collect_feature_pairs(handle)):
                name = os.path.splitext(os.path.basename(p))[0]
                out = os.path.join(output_dir, f"ac_{name}.wav")
                wavfile.write(out, fs, pcm)
                print("Wrote", out)

        inflight = None
        try:
            for start in range(0, len(batch_paths), args.batch_size):
                chunk = batch_paths[start : start + args.batch_size]
                key, sub = jax.random.split(key)
                pairs = [synth.featurize(p) for p in chunk]
                handle = synth.launch_feature_pairs(pairs, sub)
                if inflight is not None:
                    write_chunk(*inflight)
                inflight = (chunk, handle)
            if inflight is not None:
                write_chunk(*inflight)
                inflight = None
        finally:
            # a bad wav in chunk N+1 must not lose chunk N's finished
            # audio: land the in-flight chunk before propagating
            if inflight is not None:
                write_chunk(*inflight)
        logging.info("Done!")
        return

    if os.path.isfile(teacher_utt_path):
        logging.info("Perform AC on %s", teacher_utt_path)
        if args.fused:
            from fac_via_ppg_tpu.eval.fused import FusedSynthesizer

            synth = FusedSynthesizer(
                t2_cfg, tacotron_params, tacotron_state, wg_cfg,
                waveglow_params, deps=deps, sigma=waveglow_sigma,
                denoiser_strength=denoiser_strength,
                serving_dtype=serving_dtype,
                max_frames=t2_cfg.max_decoder_steps,
                data_parallel=args.data_parallel,
                cond_impl=args.cond_impl,
                calibration_mel=calibration_mel,
                snr_budget_db=args.snr_budget_db,
            )
            key, sub = jax.random.split(key)
            pcm = synth(teacher_utt_path, key=sub)
        else:
            if args.cond_impl != "dense":
                raise SystemExit("--cond_impl int8/auto needs --fused "
                                 "(or a directory/.txt batch input)")
            teacher_ppg = ppg_mod.get_ppg(teacher_utt_path, deps)
            key, k_mel, k_wg = jax.random.split(key, 3)
            ac_mel = get_inference(
                teacher_ppg, t2_cfg, tacotron_params, tacotron_state, k_mel,
                is_clip,
            )
            ac_wav = waveglow_audio(
                ac_mel, wg_cfg, waveglow_params, waveglow_sigma, k_wg,
                dtype=serving_dtype,
            )
            # built here, not up front: the fused/batch paths build their
            # own bias program inside FusedSynthesizer
            denoiser = Denoiser(wg_cfg, waveglow_params, mode=denoiser_mode)
            ac_wav = np.asarray(
                denoiser(ac_wav, strength=denoiser_strength)
            )[0, 0]
            pcm = (np.clip(ac_wav, -1.0, 1.0) * 32767).astype(np.int16)

        output_file = os.path.join(output_dir, "ac.wav")
        wavfile.write(output_file, fs, pcm)
        print("Wrote", output_file)
    else:
        logging.warning("Missing %s", teacher_utt_path)

    logging.info("Done!")


if __name__ == "__main__":
    main()
