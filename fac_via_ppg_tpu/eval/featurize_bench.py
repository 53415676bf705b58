"""Featurization throughput: host per-utterance vs batched device path.

VERDICT r3 #7 / docs/PERF.md "Host front-end": the training preload
(data/ppg_mel_dataset.py, reference data_utils.py:204-215) featurizes the
corpus before training starts.  This harness measures utterances/second
for

  * host:   `compute_feat_for_nnet_internal` (numpy/native MFCC) +
            per-utterance jitted TDNN — the default preload path, and the
            exact semantics of the reference's pykaldi front-end
            (compute_ppg.py:98-136);
  * device: `frontend.ppg.DeviceFeaturizer` — the whole batched
            MFCC->CMN->splice->LDA->TDNN chain as one XLA program per
            length bucket (`hparams.featurize_device`).

Run on the real chip for the PERF.md number:
    python -m fac_via_ppg_tpu.eval.featurize_bench [n_utts] [seconds]
"""

from __future__ import annotations

import time
from typing import List, Optional

import numpy as np

from fac_via_ppg_tpu.frontend.ppg import (
    DependenciesPPG,
    DeviceFeaturizer,
    compute_full_ppg_wrapper,
)


def synth_corpus(n: int, seconds: float, fs: int = 16000,
                 seed: int = 0) -> List[np.ndarray]:
    """Length-jittered noise utterances (int16 scale, like read_wav)."""
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        s = int(fs * seconds * (0.8 + 0.4 * rng.rand()))
        out.append((rng.randn(s) * 3000.0).astype(np.float64))
    return out


def run_bench(n_utts: int = 32, seconds: float = 4.0,
              deps: Optional[DependenciesPPG] = None,
              dither: float = 0.0, check: bool = True) -> dict:
    deps = deps or DependenciesPPG()
    wavs = synth_corpus(n_utts, seconds)
    fs = 16000

    # warm the per-utterance jit cache like a real preload would
    host_warm = compute_full_ppg_wrapper(
        wavs[0], fs, deps.nnet, deps.lda, 10, dither=dither
    )
    t0 = time.perf_counter()
    host = [
        compute_full_ppg_wrapper(w, fs, deps.nnet, deps.lda, 10,
                                 dither=dither)
        for w in wavs
    ]
    host_s = time.perf_counter() - t0

    featurizer = DeviceFeaturizer(deps, dither=dither)
    featurizer(wavs[:2], fs)  # compile the bucket shapes
    t0 = time.perf_counter()
    dev = featurizer(wavs, fs)
    dev_s = time.perf_counter() - t0

    out = {
        "n_utts": n_utts,
        "utt_seconds": seconds,
        "host_utts_per_s": round(n_utts / host_s, 2),
        "device_utts_per_s": round(n_utts / dev_s, 2),
        "speedup": round(host_s / dev_s, 2),
    }
    if check and dither == 0.0:
        errs = [float(np.abs(h - d).max()) for h, d in zip(host, dev)]
        out["max_abs_err"] = max(errs)
        assert host_warm.shape[1] == dev[0].shape[1]
    return out


if __name__ == "__main__":
    import json
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    sec = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    print(json.dumps(run_bench(n, sec)))
