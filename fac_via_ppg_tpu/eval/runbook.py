"""Bring-your-own-artifacts runbook: the BASELINE acceptance chain.

This environment ships neither the real Kaldi acoustic model (the
reference's data/am/final.raw is a missing LFS blob), the L2-ARCTIC
corpus, nor reference-trained checkpoints.  The day those artifacts
exist, ONE command runs the full acceptance chain against them
(docs/RUNBOOK.md walks through it):

  stage "am"      AM import + PPG invariants — load the acoustic model
                  bundle and assert, per utterance, the contract the
                  reference's own tests encode (test_ppg.py:48-73):
                  full PPG has one row per frame and n_senones columns,
                  every row is a probability (sums to 1), and the
                  monophone reduction (40-dim) preserves the mass.
  stage "parity"  teacher-forced mel-MSE vs the reference torch model
                  run as a CPU oracle on the SAME checkpoint
                  (eval/parity), the deterministic comparison path.
  stage "serve"   trained-checkpoint serve-path fidelity
                  (eval/trained_parity): both implementations serve the
                  same utterances end to end (autoregressive decode ->
                  WaveGlow.infer -> Denoiser, matched noise, dropout
                  off); reports mel-MSE (target <= 1e-3), stop-step
                  agreement, audio LSD.
  stage "bench"   the five BASELINE.json configs through bench.py
                  (single-utterance e2e, batched vocoder, PPG2Mel
                  training, WaveGlow training, streaming e2e) — run on
                  the real chip.

Checkpoints may be reference torch formats (.pt — the
bring-your-own-artifacts case) or this framework's orbax dirs; both
parity stages import/export as needed.

CLI:
  python -m fac_via_ppg_tpu.eval.runbook \
      --am_dir DIR            # final.raw[.txt] + final.mat +
                              # reduce_dim.mat + splice_opts (flat or
                              # the reference's am/ + feats/ layout)
      --filelist wavs.txt     # one wav path per line (L2-ARCTIC)
      --ppg2mel_model t2.pt   # reference or orbax checkpoint
      --waveglow_model wg.pt  # reference or orbax checkpoint
      [--stages am,parity,serve,bench] [--output report.json]

The whole chain is itself exercised in-suite on the substitute artifacts
(tests/test_runbook.py) so it cannot rot while the real artifacts are
awaited.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from typing import Dict, List, Optional

import numpy as np

from fac_via_ppg_tpu.frontend import ppg as ppg_mod

BENCH_CONFIGS = ("e2e", "waveglow", "train_ppg2mel", "train_waveglow",
                 "streaming_fused")


def find_am_paths(am_dir: str) -> Dict[str, str]:
    """Locate the four AM-bundle files under `am_dir`.

    Accepts the reference repo layout (am/final.raw + feats/{final.mat,
    reduce_dim.mat,splice_opts}, compute_ppg.py:205-255), a flat
    directory, or a substitute bundle (final.raw.txt).
    """
    def find(*names):
        for name in names:
            for sub in ("", "am", "feats"):
                p = os.path.join(am_dir, sub, name)
                if os.path.exists(p):
                    return p
        raise FileNotFoundError(
            f"none of {names} under {am_dir} (searched ., am/, feats/)"
        )

    return {
        "nnet_path": find("final.raw", "final.raw.txt"),
        "lda_path": find("final.mat", "lda.mat"),
        "reduce_dim_path": find("reduce_dim.mat"),
        "splice_opts_path": find("splice_opts"),
    }


def run_am_stage(deps: ppg_mod.DependenciesPPG,
                 wav_paths: List[str]) -> Dict:
    """AM import + the reference's PPG invariants on every utterance."""
    # the reduce_dim matrix's column count IS the senone count
    # (reference data/feats/reduce_dim.mat is 40 x 5816)
    n_mono, n_senones = (int(d) for d in deps.monophone_trans.shape)
    per_utt = []
    for wav_path in wav_paths:
        full = ppg_mod.get_ppg(wav_path, deps, dither=0.0)
        mono = ppg_mod.reduce_ppg_dim(full, deps.monophone_trans)
        # test_ppg.py:48-54: one row per frame, n_senones columns,
        # each row a probability distribution
        assert full.ndim == 2 and full.shape[1] == n_senones, full.shape
        row_sums = np.asarray(full, np.float64).sum(axis=1)
        assert np.allclose(row_sums, 1.0, atol=1e-3), (
            wav_path, float(np.abs(row_sums - 1).max())
        )
        # test_ppg.py:56-73: the monophone reduction preserves the mass
        assert mono.shape == (full.shape[0], n_mono), mono.shape
        mono_sums = np.asarray(mono, np.float64).sum(axis=1)
        assert np.allclose(mono_sums, 1.0, atol=1e-3), (
            wav_path, float(np.abs(mono_sums - 1).max())
        )
        per_utt.append({
            "wav": wav_path,
            "frames": int(full.shape[0]),
            "max_row_sum_err": float(np.abs(row_sums - 1).max()),
            "max_mono_sum_err": float(np.abs(mono_sums - 1).max()),
        })
    return {
        "n_senones": n_senones,
        "n_monophones": n_mono,
        "per_utterance": per_utt,
        "invariants_ok": True,  # asserts above raise otherwise
    }


def run_bench_stage(configs=BENCH_CONFIGS, extra_args=()) -> Dict:
    """Drive bench.py (repo root) once per BASELINE config; collects each
    run's one-line JSON.  Run this on the real chip — the tunnel allows
    one device process at a time, so each config is a fresh process."""
    bench = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..", "bench.py"
    )
    out = {}
    for config in configs:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(bench), "--config", config,
             *extra_args],
            capture_output=True, text=True,
        )
        line = next(
            (ln for ln in reversed(proc.stdout.strip().splitlines())
             if ln.startswith("{")), None,
        )
        if proc.returncode != 0 or line is None:
            out[config] = {"error": (proc.stderr or proc.stdout)[-2000:]}
        else:
            out[config] = json.loads(line)
    return out


def run_runbook(
    am_dir: str,
    wav_paths: List[str],
    ppg2mel_model: Optional[str] = None,
    waveglow_model: Optional[str] = None,
    stages: tuple = ("am", "parity", "serve"),
    t2_kw: Optional[dict] = None,
    wg_cfg=None,
    max_decoder_steps: Optional[int] = None,
    bench_args: tuple = (),
) -> Dict:
    """Run the requested acceptance stages; returns the combined report.

    `t2_kw` / `wg_cfg` override model sizes for both sides of every
    comparison (tests drive the chain at toy scale; real artifacts use
    the defaults = the reference stage configuration).
    """
    report: Dict = {"stages": list(stages)}
    paths = find_am_paths(am_dir)
    report["am_paths"] = paths
    deps = ppg_mod.DependenciesPPG(**paths)

    if "am" in stages:
        report["am"] = run_am_stage(deps, wav_paths)

    if "parity" in stages or "serve" in stages:
        if not (ppg2mel_model and waveglow_model):
            raise ValueError(
                "parity/serve stages need --ppg2mel_model/--waveglow_model"
            )

    if "parity" in stages:
        from fac_via_ppg_tpu.eval.parity import run_parity

        with tempfile.NamedTemporaryFile("w", suffix=".txt",
                                         delete=False) as f:
            f.write("\n".join(wav_paths))
            filelist = f.name
        try:
            # teacher-forced vs the torch oracle needs a .pt checkpoint
            # (the oracle loads it); orbax checkpoints are covered by the
            # serve stage, which exports them to the torch format itself.
            if ppg2mel_model.endswith((".pt", ".pth")):
                report["parity"] = run_parity(
                    ppg2mel_model, filelist, against_torch_oracle=True,
                    t2_kw=t2_kw, deps=deps,
                )
            else:
                report["parity"] = {
                    "skipped": "teacher-forced oracle parity needs a "
                               "reference .pt checkpoint; serve-stage "
                               "fidelity covers orbax checkpoints"
                }
        finally:
            os.unlink(filelist)

    if "serve" in stages:
        from fac_via_ppg_tpu.eval.trained_parity import run_trained_parity

        report["serve"] = run_trained_parity(
            ppg2mel_model, waveglow_model, wav_paths,
            t2_kw=t2_kw, wg_cfg=wg_cfg, deps=deps,
            max_decoder_steps=max_decoder_steps,
        )
        report["passes_baseline"] = report["serve"]["passes_baseline"]

    if "bench" in stages:
        report["bench"] = run_bench_stage(extra_args=bench_args)

    return report


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--am_dir", required=True,
                        help="acoustic-model bundle dir (reference "
                             "data/ layout, flat, or substitute)")
    parser.add_argument("--filelist",
                        help="text file of wav paths (L2-ARCTIC)")
    parser.add_argument("--wavs", nargs="*", default=[])
    parser.add_argument("--ppg2mel_model",
                        help="reference .pt or orbax checkpoint dir")
    parser.add_argument("--waveglow_model",
                        help="reference .pt or orbax checkpoint dir")
    parser.add_argument("--stages", default="am,parity,serve",
                        help="comma list of am,parity,serve,bench")
    parser.add_argument("--max_decoder_steps", type=int, default=None)
    parser.add_argument("--output", default=None)
    args = parser.parse_args(argv)

    wavs = list(args.wavs)
    if args.filelist:
        with open(args.filelist) as f:
            wavs += [line.strip() for line in f if line.strip()]
    if not wavs:
        raise SystemExit("no wavs: pass --filelist and/or --wavs")

    report = run_runbook(
        args.am_dir, wavs,
        ppg2mel_model=args.ppg2mel_model,
        waveglow_model=args.waveglow_model,
        stages=tuple(s.strip() for s in args.stages.split(",") if s.strip()),
        max_decoder_steps=args.max_decoder_steps,
    )
    text = json.dumps(report, indent=2)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text)
    print(text)


if __name__ == "__main__":
    main()
