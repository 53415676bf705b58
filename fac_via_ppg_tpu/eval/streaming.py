"""Streaming end-to-end accent conversion (BASELINE config 5).

A three-stage pipeline over a stream of utterances:

  stage 1 (host threads): wav read + Kaldi-convention front-end (native
            C++ MFCC) -> AM input features
  stage 2 (device): TDNN PPG forward + Tacotron2 autoregressive mel
  stage 3 (device): WaveGlow vocoder (+ optional denoiser)

Stages are connected by bounded queues so utterance N's host feature
extraction overlaps utterance N-1's device synthesis — the TPU analogue of
the reference's sequential generate_synthesis loop.

CLI: python -m fac_via_ppg_tpu.eval.streaming --ppg2mel_model CKPT \
        --waveglow_model CKPT --filelist wavs.txt --output_dir out/
"""

from __future__ import annotations

import os
import queue
import threading
import time
from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np
from scipy.io import wavfile

from fac_via_ppg_tpu.configs.hparams import (
    Tacotron2Config,
    WaveGlowConfig,
    create_hparams_stage,
)
from fac_via_ppg_tpu.frontend import ppg as ppg_mod
from fac_via_ppg_tpu.models.denoiser import Denoiser
from fac_via_ppg_tpu.utils.inference import (
    get_inference,
    load_tacotron2_model,
    load_waveglow_model,
    waveglow_audio,
)


@dataclass
class StreamResult:
    wav_path: str
    audio: np.ndarray
    audio_seconds: float
    # attributed cost: front-end seconds + this utterance's share of the
    # device call (device wall / micro-batch size) — sums to pipeline cost
    wall_seconds: float
    # service latency: front-end START -> audio ready.  For micro-batched
    # serving this includes the wait for the batch to fill and the FULL
    # device call (an utterance isn't done until its batch is), i.e. the
    # latency price of throughput batching — quote p50/p95 of this.
    latency_seconds: float = 0.0
    # on_error='skip': the front-end failure for this utterance (audio is
    # empty); None for successful conversions
    error: Optional[str] = None


_FRONTEND_ERROR = object()


def _frontend_pool(wav_paths, featurize_fn, n_workers: int,
                   queue_depth: int):
    """Lazily yields (path, payload, frontend_seconds, t_start) from a
    pool of host featurization threads (t_start: perf_counter when the
    utterance's front-end processing began — the latency clock origin).

    `wav_paths` may be any iterable — including a live/unbounded
    generator: a feeder thread pulls paths one at a time through a
    bounded queue, so production overlaps consumption and nothing is
    drained eagerly.  Yield order follows featurization completion, not
    input order.

    A featurization failure does NOT kill the worker: the item is
    yielded with `payload is _FRONTEND_ERROR` and the exception in the
    frontend_seconds slot — the consumer decides (raise vs skip).  A
    failure of the source iterable itself is re-raised at stream end.
    """
    path_q: queue.Queue = queue.Queue(maxsize=max(queue_depth, 1))
    feat_q: queue.Queue = queue.Queue(maxsize=max(queue_depth, 1))
    _PSENT = object()
    _SENT = object()
    errors = []
    live = [n_workers]
    live_lock = threading.Lock()

    def feeder():
        try:
            for p in wav_paths:
                path_q.put(p)
        except BaseException as e:
            errors.append(e)
        finally:
            for _ in range(n_workers):
                path_q.put(_PSENT)

    def worker():
        try:
            while True:
                path = path_q.get()
                if path is _PSENT:
                    break
                t0 = time.perf_counter()
                try:
                    payload = featurize_fn(path)
                except Exception as e:  # per-utterance: worker survives
                    feat_q.put((path, _FRONTEND_ERROR, e, t0))
                    continue
                feat_q.put((path, payload, time.perf_counter() - t0, t0))
        except BaseException as e:
            errors.append(e)
        finally:
            with live_lock:
                live[0] -= 1
                if live[0] == 0:
                    feat_q.put(_SENT)

    threading.Thread(target=feeder, daemon=True).start()
    for _ in range(n_workers):
        threading.Thread(target=worker, daemon=True).start()

    while True:
        item = feat_q.get()
        if item is _SENT:
            if errors:
                raise errors[0]
            return
        yield item


class StreamingAccentConverter:
    def __init__(self, t2_cfg: Tacotron2Config, tacotron_params,
                 tacotron_state, wg_cfg: WaveGlowConfig, waveglow_params,
                 deps: Optional[ppg_mod.DependenciesPPG] = None,
                 sigma: float = 0.6, denoiser_strength: float = 0.005,
                 queue_depth: int = 4, serving_dtype=None,
                 fused: bool = False, batch_size: int = 1,
                 frontend_threads: int = 1, data_parallel: bool = False,
                 model_parallel: int = 1, pipeline_depth: int = 2,
                 on_error: str = "raise", cond_impl: str = "dense",
                 calibration_mel=None, snr_budget_db=None,
                 pad_to_grid: bool = True):
        self.t2_cfg = t2_cfg
        self.tacotron_params = tacotron_params
        self.tacotron_state = tacotron_state
        self.wg_cfg = wg_cfg
        self.waveglow_params = waveglow_params
        self.deps = deps or ppg_mod.DependenciesPPG()
        self.sigma = sigma
        self.denoiser = (
            Denoiser(wg_cfg, waveglow_params)
            if denoiser_strength > 0 else None
        )
        self.denoiser_strength = denoiser_strength
        if batch_size > 8 and batch_size % 8:
            import warnings
            from fac_via_ppg_tpu.utils.numeric import round_batch_to_grid

            mitigation = (
                f"Micro-batches are auto-padded to "
                f"{round_batch_to_grid(batch_size)} rows on the device "
                "(FusedSynthesizer pad_to_grid), so throughput is "
                f"{batch_size}/{round_batch_to_grid(batch_size)} of that "
                "grid point; prefer 8/16/24 to not waste the pad rows."
                if pad_to_grid else
                "pad_to_grid=False runs the off-grid program as-is; "
                "prefer 8/16/24."
            )
            warnings.warn(
                f"batch_size {batch_size} is off the TPU tile grid "
                "(multiples of 8): the off-grid batch axis retiles the "
                "serving tensors — batch 12 measured 1.6-1.9x SLOWER "
                "than both neighbors (docs/PERF.md serving frontier).  "
                + mitigation,
                stacklevel=2,
            )
        self.queue_depth = max(queue_depth, 2 * batch_size)
        self.serving_dtype = serving_dtype
        self.batch_size = batch_size
        self.frontend_threads = frontend_threads
        # max micro-batches in flight on the device (batch_size > 1 only):
        # depth 2 overlaps batch N+1's device execution with batch N's PCM
        # readback + host work; depth 1 is the old synchronous behavior.
        self.pipeline_depth = max(int(pipeline_depth), 1)
        # per-utterance front-end failures: 'raise' aborts the stream,
        # 'skip' yields an error-annotated StreamResult and keeps serving
        # the rest (production isolation: one bad wav can't take down the
        # stream)
        if on_error not in ("raise", "skip"):
            raise ValueError(f"on_error must be 'raise' or 'skip', "
                             f"got {on_error!r}")
        self.on_error = on_error
        self.fused = None
        if fused:
            # device side becomes one XLA program per utterance
            # (eval/fused.py); the host front end still overlaps on the
            # worker thread, feeding features instead of PPGs.  With
            # batch_size > 1 the consumer drains up to that many
            # featurized utterances per fused call (micro-batching: the
            # latency-bound decode loop is amortized over the batch), and
            # data_parallel shards those batches over every chip.
            from fac_via_ppg_tpu.eval.fused import FusedSynthesizer

            self.fused = FusedSynthesizer(
                t2_cfg, tacotron_params, tacotron_state, wg_cfg,
                waveglow_params, deps=self.deps, sigma=sigma,
                denoiser_strength=denoiser_strength,
                serving_dtype=serving_dtype,
                max_frames=t2_cfg.max_decoder_steps,
                data_parallel=data_parallel,
                model_parallel=model_parallel,
                cond_impl=cond_impl,
                calibration_mel=calibration_mel,
                snr_budget_db=snr_budget_db,
                pad_to_grid=pad_to_grid,
            )
        elif batch_size > 1 or data_parallel or model_parallel > 1:
            raise ValueError(
                "batch_size > 1 / data_parallel / model_parallel "
                "require fused=True"
            )
        elif cond_impl != "dense":
            raise ValueError("cond_impl needs fused=True")

    def prewarm(self, utt_seconds: float = 4.0, key=None):
        """Compile + warm the fused device program(s) before serving.

        Without this, the first real micro-batch pays XLA compilation
        inside its service window, and — because the front-end pool has
        already timestamped every queued utterance — that compile time
        leaks into the latency clock of *every* utterance featurized
        while the compile runs.  Benchmarks that quote latency
        percentiles must prewarm so p50/p95 measure service + queueing,
        not compilation.  Output is discarded; fused mode only (the
        staged path compiles per-stage on first use and is not the
        latency-quoted path)."""
        if self.fused is None:
            return
        key = key if key is not None else jax.random.PRNGKey(0x9e3779)
        n_frames = max(int(utt_seconds * 100), 1)
        t_pad = -(-n_frames // self.fused.feat_bucket) * self.fused.feat_bucket
        feats = np.zeros((t_pad, int(self.deps.lda.shape[0])), np.float32)
        if self.batch_size == 1:
            self.fused.synthesize_features(feats, n_frames, key)
        else:
            self.fused.synthesize_feature_pairs(
                [(feats, n_frames)] * self.batch_size, key,
                pad_batch_to=self.batch_size,
            )

    def _error_result(self, path, exc, t_arr) -> StreamResult:
        """on_error='skip': an empty, error-annotated result; 'raise':
        abort the stream with the front-end failure."""
        if self.on_error == "raise":
            raise RuntimeError(
                f"front-end failed for {path!r} (on_error='skip' serves "
                f"past per-utterance failures)"
            ) from exc
        return StreamResult(
            wav_path=path,
            audio=np.zeros(0, np.float32),
            audio_seconds=0.0,
            wall_seconds=0.0,
            latency_seconds=time.perf_counter() - t_arr,
            error=f"{type(exc).__name__}: {exc}",
        )

    def run(self, wav_paths, key=None):
        """Yields StreamResult per utterance, with stage overlap."""
        if self.fused is not None:
            yield from self._run_fused(wav_paths, key)
            return
        key = key if key is not None else jax.random.PRNGKey(0)
        stream = _frontend_pool(
            wav_paths, lambda p: ppg_mod.get_ppg(p, self.deps),
            n_workers=max(1, self.frontend_threads),
            queue_depth=self.queue_depth,
        )
        for path, teacher_ppg, frontend_s, t_arr in stream:
            if teacher_ppg is _FRONTEND_ERROR:
                yield self._error_result(path, frontend_s, t_arr)
                continue
            t0 = time.perf_counter()
            key, k_mel, k_wg = jax.random.split(key, 3)
            # Length-bucketed shapes throughout: one compiled decoder /
            # vocoder / denoiser serves every utterance length.
            mel = get_inference(
                teacher_ppg, self.t2_cfg, self.tacotron_params,
                self.tacotron_state, k_mel, pad_to_frames=64,
            )
            t_mel = mel.shape[-1]
            bucket = 100
            t_pad = ((t_mel + bucket - 1) // bucket) * bucket
            mel = np.pad(
                np.asarray(mel), ((0, 0), (0, 0), (0, t_pad - t_mel)),
                constant_values=float(np.log(1e-5)),
            )
            audio = waveglow_audio(
                mel, self.wg_cfg, self.waveglow_params, self.sigma, k_wg,
                dtype=self.serving_dtype,
            )
            if self.denoiser is not None:
                audio = self.denoiser(
                    audio, strength=self.denoiser_strength
                )[:, 0, :]
            audio = np.asarray(audio)[0][: t_mel * self.wg_cfg.hop_length]
            t_done = time.perf_counter()
            yield StreamResult(
                wav_path=path,
                audio=audio,
                audio_seconds=len(audio) / 16000.0,
                wall_seconds=t_done - t0 + frontend_s,
                latency_seconds=t_done - t_arr,
            )

    def _run_fused(self, wav_paths, key=None):
        """Fused-device-program streaming: host featurization on worker
        thread(s), one XLA call + one readback per micro-batch of
        `batch_size` utterances (1 = per utterance).  Micro-batches block
        until full (the stream tail flushes partial, padded to the
        compiled batch shape) — a throughput mode; for lowest
        per-utterance latency use batch_size=1.

        Up to `pipeline_depth` micro-batches stay in flight: batch N+1 is
        dispatched (JAX async) before batch N's PCM readback, so device
        execution overlaps the device->host drain and the host-side batch
        assembly instead of idling between calls."""
        key = key if key is not None else jax.random.PRNGKey(0)
        stream = _frontend_pool(
            wav_paths, self.fused.featurize,
            n_workers=max(1, self.frontend_threads),
            queue_depth=self.queue_depth,
        )

        pending = []
        inflight: list = []  # FIFO of (batch, handle, t_launch)
        last_done = [0.0]

        def launch():
            nonlocal key, pending
            batch, pending = pending, []
            key, sub = jax.random.split(key)
            handle = self.fused.launch_feature_pairs(
                [pair for _, pair, _, _ in batch], sub,
                pad_batch_to=self.batch_size,
            )
            inflight.append((batch, handle, time.perf_counter()))

        def collect():
            batch, handle, t0 = inflight.pop(0)
            pcms = self.fused.collect_feature_pairs(handle)
            t_done = time.perf_counter()
            # Critical-path attribution: when batches overlap, this
            # batch's pipeline cost is the time it advanced the stream
            # past the previous collect, not its full launch->done span.
            device_s = (t_done - max(t0, last_done[0])) / len(batch)
            last_done[0] = t_done
            for (path, _, frontend_s, t_arr), pcm in zip(batch, pcms):
                yield StreamResult(
                    wav_path=path,
                    audio=pcm.astype(np.float32) / 32767.0,
                    audio_seconds=len(pcm) / 16000.0,
                    wall_seconds=device_s + frontend_s,
                    latency_seconds=t_done - t_arr,
                )

        for item in stream:
            if item[1] is _FRONTEND_ERROR:
                path, _, exc, t_arr = item
                yield self._error_result(path, exc, t_arr)
                continue
            if self.batch_size == 1:
                # single-utterance program (scalar stop step readback):
                # the lowest-latency path, unchanged from before
                path, (feats, t), frontend_s, t_arr = item
                t0 = time.perf_counter()
                key, sub = jax.random.split(key)
                pcm = self.fused.synthesize_features(feats, t, sub)
                t_done = time.perf_counter()
                yield StreamResult(
                    wav_path=path,
                    audio=pcm.astype(np.float32) / 32767.0,
                    audio_seconds=len(pcm) / 16000.0,
                    wall_seconds=t_done - t0 + frontend_s,
                    latency_seconds=t_done - t_arr,
                )
                continue
            pending.append(item)
            if len(pending) >= self.batch_size:
                launch()
                if len(inflight) >= self.pipeline_depth:
                    yield from collect()
        if pending:
            launch()
        while inflight:
            yield from collect()


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--ppg2mel_model", required=True)
    parser.add_argument("--waveglow_model", required=True)
    parser.add_argument("--filelist", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--sigma", type=float, default=0.6)
    parser.add_argument("--denoiser_strength", type=float, default=0.005)
    parser.add_argument("--compute_dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="WaveGlow serving dtype (bf16: ~1.5x faster)")
    parser.add_argument("--fused", action="store_true",
                        help="single-XLA-program device side (eval/fused.py)")
    parser.add_argument("--batch_size", type=int, default=1,
                        help="fused micro-batch: utterances per device call "
                             "(throughput mode; needs --fused)")
    parser.add_argument("--frontend_threads", type=int, default=1,
                        help="host front-end worker threads")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard fused micro-batches over all chips")
    parser.add_argument("--model_parallel", type=int, default=1,
                        help="shard the WaveGlow WN channel over a "
                             "'model' mesh axis of this size (needs "
                             "--fused; composes with --data_parallel)")
    parser.add_argument("--pipeline_depth", type=int, default=2,
                        help="micro-batches in flight on the device "
                             "(batch_size > 1): 2 overlaps execution "
                             "with PCM readback; 1 = synchronous")
    parser.add_argument("--on_error", default="raise",
                        choices=["raise", "skip"],
                        help="per-utterance front-end failures: abort "
                             "the stream, or log + keep serving")
    parser.add_argument("--cond_impl", default="dense",
                        choices=["dense", "int8", "auto"],
                        help="int8: vocoder cond matmuls on the int8 MXU "
                             "(~10%% faster vocoder at ~0-0.2 dB below the "
                             "bf16 mode; needs --fused).  auto: measure "
                             "the int8 worst-utterance SNR on this "
                             "deployment's own checkpoint + first inputs "
                             "at startup and fall back to dense below "
                             "--snr_budget_db")
    parser.add_argument("--snr_budget_db", type=float, default=None,
                        help="worst-utterance SNR budget (dB) for "
                             "--cond_impl auto; default "
                             "eval/int8_snr.DEFAULT_SNR_BUDGET_DB")
    parser.add_argument("--compilation_cache_dir", default="",
                        help="persistent XLA compilation cache: restarted "
                             "replicas skip the multi-minute first compile "
                             "(real TPU hosts; no-op over the axon tunnel "
                             "— see utils/compilation_cache.py)")
    args = parser.parse_args()
    from fac_via_ppg_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache(args.compilation_cache_dir or None)

    hparams = create_hparams_stage()
    t2_cfg = Tacotron2Config.from_hparams(hparams)
    wg_cfg = WaveGlowConfig()
    t2_params, t2_state = load_tacotron2_model(args.ppg2mel_model, t2_cfg)
    wg_params = load_waveglow_model(args.waveglow_model, wg_cfg)

    with open(args.filelist) as f:
        wavs = [line.strip() for line in f if line.strip()]
    os.makedirs(args.output_dir, exist_ok=True)

    import jax.numpy as jnp

    calibration_mel = None
    if args.cond_impl == "auto":
        # calibrate the int8 gate on this deployment's own first inputs
        from fac_via_ppg_tpu.eval.int8_snr import calibration_mel_from_wavs

        calibration_mel = calibration_mel_from_wavs(wavs, wg_cfg)

    converter = StreamingAccentConverter(
        t2_cfg, t2_params, t2_state, wg_cfg, wg_params,
        sigma=args.sigma, denoiser_strength=args.denoiser_strength,
        serving_dtype=(None if args.compute_dtype == "float32"
                       else jnp.dtype(args.compute_dtype)),
        fused=args.fused, batch_size=args.batch_size,
        frontend_threads=args.frontend_threads,
        data_parallel=args.data_parallel,
        model_parallel=args.model_parallel,
        pipeline_depth=args.pipeline_depth,
        on_error=args.on_error,
        cond_impl=args.cond_impl,
        calibration_mel=calibration_mel,
        snr_budget_db=args.snr_budget_db,
    )
    total_audio = total_wall = 0.0
    steady_audio = steady_wall = 0.0
    latencies = []
    n = 0
    # With micro-batching every result of the first flush shares the
    # compile-laden device time, so the whole first batch is warmup.
    warm = args.batch_size if args.batch_size > 1 else 1
    t_start = time.perf_counter()
    for result in converter.run(wavs):
        if result.error is not None:
            # not counted toward the warm window (an error result isn't a
            # served utterance, and bumping n would let the compile-laden
            # first micro-batch leak into the steady-state numbers)
            print(f"SKIPPED {result.wav_path}: {result.error}")
            continue
        out = os.path.join(
            args.output_dir,
            os.path.basename(result.wav_path).replace(".wav", "_ac.wav"),
        )
        wavfile.write(
            out, 16000,
            (np.clip(result.audio, -1, 1) * 32767).astype(np.int16),
        )
        total_audio += result.audio_seconds
        total_wall += result.wall_seconds
        if n >= warm:  # earlier results pay the jit compiles
            steady_audio += result.audio_seconds
            steady_wall += result.wall_seconds
            latencies.append(result.latency_seconds)
        n += 1
        print(
            f"{out}: {result.audio_seconds:.2f}s audio in "
            f"{result.wall_seconds:.2f}s"
        )
    pipeline_wall = time.perf_counter() - t_start
    if total_audio:
        print(
            f"stream RTF {total_audio / pipeline_wall:.2f}x incl. compile; "
            f"steady-state {steady_audio / max(steady_wall, 1e-9):.2f}x"
        )
    if latencies:
        print(
            "per-utterance latency p50 "
            f"{np.percentile(latencies, 50):.3f}s / p95 "
            f"{np.percentile(latencies, 95):.3f}s "
            "(front-end start -> audio ready, incl. micro-batch wait)"
        )


if __name__ == "__main__":
    main()
