"""Single-program accent-conversion serving.

The staged pipeline (generate_synthesis.py / eval/streaming.py) syncs the
host between every stage: PPG readback, decoder stop-step readback, mel
hand-off, vocoder audio readback, denoiser readback.  Stage compute is
milliseconds; on serving hosts the round trips dominate single-utterance
latency (measured 0.8-0.9 s of which <0.15 s is device compute).

`FusedSynthesizer` compiles the whole device side into ONE XLA program —
nnet3 AM forward -> autoregressive Tacotron2 decode -> WaveGlow ->
spectral denoiser -> int16 PCM — so serving one utterance is exactly one
host->device transfer (the spliced LDA features) and one device->host
readback (PCM + produced-frame count).  The decoder's dynamic stop is
handled with the fixed `max_frames` buffer: frames past the gate are
log(1e-5) silence into the vocoder, and the host trims the PCM to
`t_end * hop` samples.

Reference behavior covered: generate_synthesis.py:86-98 (same operating
point), with identical numerics to the staged path (the CPU-mesh test
checks pointwise agreement at sigma=0).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fac_via_ppg_tpu.configs.hparams import Tacotron2Config, WaveGlowConfig
from fac_via_ppg_tpu.frontend import feat as feat_mod
from fac_via_ppg_tpu.frontend import ppg as ppg_mod
from fac_via_ppg_tpu.models.denoiser import Denoiser
from fac_via_ppg_tpu.models.tacotron2 import (
    tacotron2_inference,
    tacotron2_inference_batched,
)
from fac_via_ppg_tpu.models.waveglow import cast_params, waveglow_infer
from fac_via_ppg_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from fac_via_ppg_tpu.utils.numeric import round_batch_to_grid, round_up


class FusedSynthesizer:
    def __init__(
        self,
        t2_cfg: Tacotron2Config,
        tacotron_params,
        tacotron_state,
        wg_cfg: WaveGlowConfig,
        waveglow_params,
        deps: Optional[ppg_mod.DependenciesPPG] = None,
        sigma: float = 0.6,
        denoiser_strength: float = 0.005,
        serving_dtype=jnp.bfloat16,
        max_frames: int = 1000,
        feat_bucket: int = 64,
        data_parallel: bool = False,
        model_parallel: int = 1,
        cond_impl: str = "dense",
        calibration_mel=None,
        snr_budget_db: Optional[float] = None,
        pad_to_grid: bool = True,
    ):
        """`data_parallel=True` spreads `synthesize_batch` over every chip:
        params replicate onto a 1-D 'data' mesh, the utterance batch is
        sharded on its leading axis, and GSPMD partitions the one fused
        program (the batched decoder's all-done stop check becomes an ICI
        all-reduce).  Batches that don't divide the mesh are padded with
        repeats and trimmed after.  Multi-chip throughput serving — a
        capability the reference's single-GPU serve path lacks
        (generate_synthesis.py:86-98).

        `model_parallel` > 1 additionally shards the WaveGlow WN hidden
        channel over a 'model' mesh axis (parallel/sharding.py): the mesh
        becomes (devices/model_parallel data, model_parallel model) and
        each vocoder matmul runs as a local shard + ICI collective.

        `cond_impl='int8'` runs the vocoder's stacked cond matmuls on the
        int8 MXU (models/waveglow.py pack_waveglow_int8cond): ~10% more
        vocoder throughput at ~0.2 dB below the bf16 serving mode on the
        trained checkpoints (43.5 vs 43.6 dB worst-utterance SNR vs
        f32-dense under the per-column default; docs/PERF.md quality
        ladder).  Composes with
        model_parallel>1: the packed stack shards column-parallel over
        the 'model' axis (parallel/sharding.int8cond_shardings), the
        same placement the dense cond_layers get.

        `cond_impl='auto'` is the production gate for the lossy int8
        mode: at startup the bf16+int8 path's worst-utterance SNR vs
        f32-dense is measured on `calibration_mel` (a small (B, n_mel, F)
        batch from the deployment's own corpus —
        eval/int8_snr.calibration_mel_from_wavs) and serving proceeds as
        'int8' only if it meets `snr_budget_db` (default
        eval/int8_snr.DEFAULT_SNR_BUDGET_DB), else falls back to 'dense'.
        A checkpoint that quantizes badly cannot silently ship
        out-of-budget audio — the safety rail the reference's analogous
        lossy fp16 serving flag never had (src/waveglow/inference.py:38-41).
        The resolved decision and measured SNR are exposed as
        `.cond_impl` / `.calibration_snr_db`."""
        self.requested_cond_impl = cond_impl
        self.calibration_snr_db = None
        self.snr_budget_db = None
        if cond_impl == "auto":
            from fac_via_ppg_tpu.eval.int8_snr import (
                DEFAULT_SNR_BUDGET_DB,
                select_cond_impl,
            )

            if calibration_mel is None:
                raise ValueError(
                    "cond_impl='auto' needs calibration_mel: a small "
                    "(B, n_mel, F) mel batch from the deployment's own "
                    "corpus (eval/int8_snr.calibration_mel_from_wavs)"
                )
            budget = (DEFAULT_SNR_BUDGET_DB if snr_budget_db is None
                      else float(snr_budget_db))
            # gate on the UN-cast params (the ladder's measurement
            # configuration) before any bf16 cast below
            cond_impl, worst = select_cond_impl(
                wg_cfg, waveglow_params, jnp.asarray(calibration_mel),
                budget, sigma=float(sigma),
            )
            self.calibration_snr_db = worst
            self.snr_budget_db = budget
            print(
                f"cond_impl=auto: bf16+int8 worst-utterance SNR "
                f"{worst:.1f} dB vs budget {budget:.1f} dB -> serving "
                f"cond_impl='{cond_impl}'"
            )
        if cond_impl not in ("dense", "int8"):
            raise ValueError(f"unknown cond_impl {cond_impl!r}")
        self.deps = deps or ppg_mod.DependenciesPPG()
        self.t2_cfg = dataclasses.replace(
            t2_cfg, max_decoder_steps=max_frames
        )
        self.wg_cfg = wg_cfg
        self.t2_params = tacotron_params
        self.t2_state = tacotron_state
        self.sigma = float(sigma)
        self.strength = float(denoiser_strength)
        self.serving_dtype = serving_dtype
        self.max_frames = max_frames
        self.feat_bucket = feat_bucket
        # pad off-grid micro-batches (>8, not a multiple of 8) up to the
        # TPU tile grid: the measured B=12 crater (docs/PERF.md serving
        # frontier) makes the 12-row program SLOWER in absolute audio/s
        # than a padded 16-row one — utils/numeric.round_batch_to_grid
        self.pad_to_grid = bool(pad_to_grid)

        self.cond_impl = cond_impl
        self._packed_cond = None
        if cond_impl == "int8":
            # pack from the UN-cast params: quantizing bf16-rounded
            # weights would add a second rounding the docs/PERF.md
            # quality ladder never measured
            from fac_via_ppg_tpu.models.waveglow import pack_waveglow_int8cond

            self._packed_cond = pack_waveglow_int8cond(
                wg_cfg, waveglow_params
            )

        # bias spectrum once (its own tiny one-off program)
        den = Denoiser(wg_cfg, waveglow_params)
        self._stft = den.stft
        self._bias = den.bias_spec
        if serving_dtype is not None:
            inv = [p.get("weight_inverse") for p in waveglow_params["convinv"]]
            waveglow_params = cast_params(waveglow_params, serving_dtype)
            for p, w in zip(waveglow_params["convinv"], inv):
                if w is not None:
                    p["weight_inverse"] = w
        self.wg_params = waveglow_params

        self.mesh = None
        if data_parallel or model_parallel > 1:
            self.mesh = make_mesh(model=int(model_parallel))
            self.t2_params = replicate(self.mesh, self.t2_params)
            self.t2_state = replicate(self.mesh, self.t2_state)
            if model_parallel > 1:
                from fac_via_ppg_tpu.parallel.sharding import (
                    apply_shardings,
                    waveglow_param_shardings,
                )

                self.wg_params = apply_shardings(
                    self.wg_params,
                    waveglow_param_shardings(self.mesh, self.wg_params),
                )
            else:
                self.wg_params = replicate(self.mesh, self.wg_params)
            self._bias = replicate(self.mesh, self._bias)
            if self._packed_cond is not None:
                if model_parallel > 1:
                    from fac_via_ppg_tpu.parallel.sharding import (
                        apply_shardings,
                        int8cond_shardings,
                    )

                    self._packed_cond = apply_shardings(
                        self._packed_cond,
                        int8cond_shardings(self.mesh, self._packed_cond),
                    )
                else:
                    self._packed_cond = replicate(self.mesh, self._packed_cond)

        self._fn = jax.jit(self._device_program)
        self._fn_batch = jax.jit(self._device_program_batch)

    def _device_program(self, t2_params, t2_state, wg_params, packed_cond,
                        bias, feats, n_frames, key):
        """(T_pad, lda_dim) features -> (int16 PCM (S,), t_end)."""
        k_mel, k_wg = jax.random.split(key)
        ppg = self.deps.nnet.forward(feats)            # (T_pad, n_senones)
        x = ppg.T[None, :, :].astype(jnp.float32)      # (1, D, T_pad)
        lengths = n_frames[None].astype(jnp.int32)
        _, mel_post, _, _, t_end = tacotron2_inference(
            self.t2_cfg, t2_params, t2_state, x, k_mel, lengths
        )
        produced = jnp.arange(self.max_frames)[None, None, :] < t_end
        silence = jnp.float32(np.log(1e-5))
        mel_in = jnp.where(produced, mel_post, silence)
        audio = waveglow_infer(
            self.wg_cfg, wg_params,
            mel_in.astype(self.serving_dtype or jnp.float32),
            self.sigma, k_wg,
            cond_impl=self.cond_impl, packed_cond=packed_cond,
        ).astype(jnp.float32)                          # (1, M*hop)
        spec, angles = self._stft.transform(audio)
        spec = jnp.clip(spec - bias * self.strength, min=0.0)
        denoised = self._stft.inverse(spec, angles)[:, 0, :]
        pcm = jnp.clip(denoised[0], -1.0, 1.0) * 32767.0
        return pcm.astype(jnp.int16), t_end

    def _device_program_batch(self, t2_params, t2_state, wg_params,
                              packed_cond, bias, feats, n_frames, key):
        """(B, T_pad, lda_dim) -> (int16 PCM (B, M*hop), mel_lengths (B,)).

        The batched decoder (per-sequence gate stopping) amortizes the
        latency-bound autoregressive step loop over B utterances — the
        throughput serving mode.
        """
        k_mel, k_wg = jax.random.split(key)
        ppg = jax.vmap(self.deps.nnet.forward)(feats)
        x = ppg.transpose(0, 2, 1).astype(jnp.float32)    # (B, D, T_pad)
        lengths = n_frames.astype(jnp.int32)
        _, mel_post, _, _, mel_lens = tacotron2_inference_batched(
            self.t2_cfg, t2_params, t2_state, x, lengths, k_mel
        )
        produced = (
            jnp.arange(self.max_frames)[None, None, :]
            < mel_lens[:, None, None]
        )
        silence = jnp.float32(np.log(1e-5))
        mel_in = jnp.where(produced, mel_post, silence)
        audio = waveglow_infer(
            self.wg_cfg, wg_params,
            mel_in.astype(self.serving_dtype or jnp.float32),
            self.sigma, k_wg,
            cond_impl=self.cond_impl, packed_cond=packed_cond,
        ).astype(jnp.float32)                             # (B, M*hop)
        spec, angles = self._stft.transform(audio)
        spec = jnp.clip(spec - bias * self.strength, min=0.0)
        denoised = self._stft.inverse(spec, angles)[:, 0, :]
        pcm = jnp.clip(denoised, -1.0, 1.0) * 32767.0
        return pcm.astype(jnp.int16), mel_lens

    def synthesize_batch(self, wav_paths, key=None, dither: float = 1.0,
                         seed: int = 0):
        """wav files -> list of int16 PCM arrays, one fused device call.

        All features pad to the batch's max bucket; B is whatever the
        caller sends (one compile per (B, T_bucket) pair — group
        same-sized requests for best reuse).
        """
        key = key if key is not None else jax.random.PRNGKey(0)
        pairs = [self.featurize(p, dither=dither, seed=seed)
                 for p in wav_paths]
        return self.synthesize_feature_pairs(pairs, key)

    def synthesize_feature_pairs(self, pairs, key=None,
                                 pad_batch_to: Optional[int] = None):
        """(featurized, n_frames) pairs -> list of int16 PCM arrays, one
        fused device call.  `pad_batch_to` pads the batch dimension with
        repeats (outputs trimmed) so a partially-filled micro-batch reuses
        the full-batch compiled program instead of compiling a new shape.
        """
        return self.collect_feature_pairs(
            self.launch_feature_pairs(pairs, key, pad_batch_to=pad_batch_to)
        )

    def launch_feature_pairs(self, pairs, key=None,
                             pad_batch_to: Optional[int] = None):
        """Assemble + dispatch one fused micro-batch WITHOUT blocking on
        the result: JAX's async dispatch returns device buffers that are
        still executing.  `collect_feature_pairs` blocks on the readback.
        Splitting launch from collect lets a serving loop keep the chip
        busy on batch N+1 while batch N's PCM drains back over the host
        link (eval/streaming.py pipeline_depth)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        n_real = len(pairs)
        t_max = max(f.shape[0] for f, _ in pairs)
        feats = np.stack([
            np.concatenate(
                [f, np.repeat(f[-1:], t_max - f.shape[0], axis=0)], axis=0
            ) if f.shape[0] != t_max else f
            for f, _ in pairs
        ])
        n_frames = np.array([t for _, t in pairs], np.int32)
        b_pad = len(pairs)
        if pad_batch_to is not None:
            b_pad = max(b_pad, pad_batch_to)
        if self.pad_to_grid:
            # off-grid batch axes (>8, % 8) retile the serving tensors so
            # badly the program is slower in ABSOLUTE terms than the next
            # grid point (measured B=12 crater, docs/PERF.md) — pad up
            b_pad = round_batch_to_grid(b_pad)
        if self.mesh is not None:
            # batch rows shard over the 'data' axis only
            b_pad = round_up(b_pad, self.mesh.shape["data"])
        if b_pad != len(pairs):
            reps = b_pad - len(pairs)
            feats = np.concatenate(
                [feats, np.repeat(feats[-1:], reps, axis=0)], axis=0
            )
            n_frames = np.concatenate(
                [n_frames, np.repeat(n_frames[-1:], reps)], axis=0
            )
        if self.mesh is not None:
            feats, n_frames = shard_batch(self.mesh, (feats, n_frames))
        else:
            feats, n_frames = jnp.asarray(feats), jnp.asarray(n_frames)
        pcm, mel_lens = self._fn_batch(
            self.t2_params, self.t2_state, self.wg_params,
            self._packed_cond, self._bias, feats, n_frames, key,
        )
        return pcm, mel_lens, n_real

    def collect_feature_pairs(self, handle):
        """Block on an in-flight `launch_feature_pairs` handle and return
        the list of trimmed int16 PCM arrays."""
        pcm, mel_lens, n_real = handle
        pcm = np.asarray(pcm)
        mel_lens = np.asarray(mel_lens)
        hop = self.wg_cfg.hop_length
        return [
            pcm[i, : min(int(mel_lens[i]) * hop, pcm.shape[1])]
            for i in range(n_real)
        ]

    def featurize(self, wav_path: str, dither: float = 1.0,
                  seed: int = 0):
        """Host-side front end: wav file -> (bucket-padded AM features,
        true frame count).  Safe to run on a worker thread."""
        fs, wav = feat_mod.read_wav(wav_path)
        feats = ppg_mod.compute_feat_for_nnet_internal(
            wav, fs, self.deps.lda, dither=dither, seed=seed
        )
        t = feats.shape[0]
        t_pad = round_up(t, self.feat_bucket)
        if t_pad != t:
            feats = np.concatenate(
                [feats, np.repeat(feats[-1:], t_pad - t, axis=0)], axis=0
            )
        return feats.astype(np.float32), t

    def synthesize_features(self, feats, n_frames: int, key=None) -> np.ndarray:
        """Device side: padded features -> trimmed int16 PCM (one program)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        pcm, t_end = self._fn(
            self.t2_params, self.t2_state, self.wg_params,
            self._packed_cond, self._bias,
            jnp.asarray(feats), jnp.int32(n_frames), key,
        )
        t_end = int(t_end)
        pcm = np.asarray(pcm)
        return pcm[: min(t_end * self.wg_cfg.hop_length, len(pcm))]

    def __call__(self, wav_path: str, key=None, dither: float = 1.0,
                 seed: int = 0) -> np.ndarray:
        """wav file -> int16 PCM of the converted utterance."""
        feats, t = self.featurize(wav_path, dither=dither, seed=seed)
        return self.synthesize_features(feats, t, key)
