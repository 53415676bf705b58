"""Per-kernel device roofline analysis from a jax.profiler trace.

The reference has no profiling at all (SURVEY.md §5.1); this tool turns a
captured TPU device trace into the %-of-binding-floor tables that
docs/PERF.md quotes (round-3 inference breakdown; round-4 training
roofline).  Works over the axon tunnel: jax.profiler.trace writes full
device traces with per-kernel `bytes_accessed` / `model_flops` into
<dir>/plugins/profile/*/<host>.trace.json.gz.

Usage (as a library):
    with jax.profiler.trace(td):
        run_the_program_n_times()
    rows = kernel_table(td, calls=n)
    print(format_table(group_families(rows)))

Or CLI over an existing trace dir:
    python -m fac_via_ppg_tpu.eval.roofline TRACE_DIR --calls N

Peaks default to TPU v5e: 819 GB/s HBM, 197 TFLOP/s bf16 (394 int8).
The binding floor of a kernel is max(bytes/BW, flops/FLOPS); a kernel at
~100% of floor cannot be made faster without changing its bytes or
flops.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
from typing import Dict, List, Optional

HBM_BW = 819e9          # v5e HBM bytes/s
PEAK_BF16 = 197e12      # v5e bf16 FLOP/s
PEAK_INT8 = 394e12


def _trace_files(trace_dir: str) -> List[str]:
    pats = [
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz"),
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json"),
    ]
    out: List[str] = []
    for p in pats:
        out += glob.glob(p)
    if not out:
        raise FileNotFoundError(f"no trace json under {trace_dir}")
    return sorted(out)


def load_events(trace_dir: str) -> List[dict]:
    events = []
    for path in _trace_files(trace_dir):
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt") as f:
            data = json.load(f)
        events += data.get("traceEvents", [])
    return events


def _device_pids(events) -> set:
    """pids whose process names look like TPU/device cores (not host
    threads): the kernel events carry device_duration on those tracks."""
    pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = str(e.get("args", {}).get("name", "")).lower()
            if any(k in name for k in ("tpu", "device", "xla", "/device",
                                       "core")):
                if "host" not in name:
                    pids.add(e["pid"])
    return pids


def _module_tids(events, dev_pids) -> set:
    """(pid, tid) pairs of 'XLA Modules' rows: whole-program spans that
    overlap every per-op event on the same device — summing them would
    exactly double device time (observed on the axon traces, where the
    device pid carries both an 'XLA Modules' and an 'XLA Ops' thread with
    identical total duration)."""
    tids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name" \
                and e.get("pid") in dev_pids:
            name = str(e.get("args", {}).get("name", "")).lower()
            if "module" in name or "step" in name:
                tids.add((e["pid"], e["tid"]))
    return tids


def kernel_table(trace_dir: str, calls: int = 1,
                 bw: float = HBM_BW, peak: float = PEAK_BF16) -> List[dict]:
    """Aggregate complete ('X') kernel events by name.

    Returns rows {name, ms (per call), count, bytes, flops, floor_ms,
    pct_of_floor, bound} sorted by time.  `calls`: number of identical
    program executions inside the trace window (durations divide by it).
    """
    events = load_events(trace_dir)
    dev_pids = _device_pids(events)
    mod_tids = _module_tids(events, dev_pids)
    kept: List[dict] = []
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        if (e.get("pid"), e.get("tid")) in mod_tids:
            continue
        args = e.get("args", {}) or {}
        # only hardware kernel events carry these counters; host-side
        # spans (dispatch, transfers bookkeeping) don't
        if "bytes_accessed" not in args and "model_flops" not in args \
                and not dev_pids:
            continue
        kept.append(e)

    # SELF time per event: `while`/`scan` spans contain their body ops'
    # events on the same thread, so summing raw durations double-counts
    # loop bodies (observed on the training-step traces: summed device
    # time exceeded wall time).  Flamegraph-style stack walk per thread;
    # a parent keeps only the time not covered by its children — for a
    # while-loop that is the genuine per-iteration scheduling overhead.
    by_tid: Dict[tuple, List[dict]] = collections.defaultdict(list)
    for e in kept:
        by_tid[(e.get("pid"), e.get("tid"))].append(e)
    self_us: Dict[int, float] = {}
    for lst in by_tid.values():
        lst.sort(key=lambda e: (float(e.get("ts", 0.0)),
                                -float(e.get("dur", 0.0))))
        stack: List[dict] = []
        for e in lst:
            ts, dur = float(e.get("ts", 0.0)), float(e.get("dur", 0.0))
            while stack and float(stack[-1].get("ts", 0.0)) + float(
                    stack[-1].get("dur", 0.0)) <= ts + 1e-9:
                stack.pop()
            self_us[id(e)] = dur
            if stack:
                self_us[id(stack[-1])] -= dur
            stack.append(e)

    agg: Dict[str, dict] = collections.defaultdict(
        lambda: {"us": 0.0, "count": 0, "bytes": 0.0, "flops": 0.0}
    )
    for e in kept:
        args = e.get("args", {}) or {}
        name = e.get("name", "?")
        a = agg[name]
        a["us"] += max(self_us[id(e)], 0.0)
        a["count"] += 1
        a["bytes"] += float(args.get("bytes_accessed", 0.0) or 0.0)
        a["flops"] += float(args.get("model_flops", 0.0) or 0.0)

    rows = []
    for name, a in agg.items():
        ms = a["us"] / 1e3 / calls
        byt = a["bytes"] / calls
        fl = a["flops"] / calls
        floor_bw = byt / bw * 1e3
        floor_fl = fl / peak * 1e3
        floor = max(floor_bw, floor_fl)
        rows.append({
            "name": name,
            "ms": ms,
            "count": a["count"] // max(calls, 1),
            "gb": byt / 1e9,
            "gflops": fl / 1e9,
            "floor_ms": floor,
            "pct_of_floor": (100.0 * floor / ms) if ms > 0 else 0.0,
            "bound": ("flops" if floor_fl > floor_bw else "bytes"),
        })
    rows.sort(key=lambda r: -r["ms"])
    return rows


def group_families(rows: List[dict], patterns: Optional[dict] = None):
    """Group kernels into named families by substring match (first hit
    wins); default families match the WaveGlow/Tacotron2 programs."""
    patterns = patterns or {
        "convolution": ("convolution",),
        "matmul/dot": ("dot", "einsum"),
        "while/scan": ("while",),
        "fusion (elementwise)": ("fusion", "multiply", "add", "tanh"),
        "copy/reshape": ("copy", "reshape", "transpose", "bitcast",
                         "concatenate", "slice"),
        "rng": ("rng",),
    }
    fams: Dict[str, dict] = collections.defaultdict(
        lambda: {"ms": 0.0, "floor_ms": 0.0, "kernels": 0, "gb": 0.0,
                 "gflops": 0.0}
    )
    for r in rows:
        fam = "other"
        for name, pats in patterns.items():
            if any(p in r["name"] for p in pats):
                fam = name
                break
        f = fams[fam]
        f["ms"] += r["ms"]
        f["floor_ms"] += r["floor_ms"]
        f["kernels"] += max(r["count"], 1)
        f["gb"] += r["gb"]
        f["gflops"] += r["gflops"]
    for f in fams.values():
        f["pct_of_floor"] = (100.0 * f["floor_ms"] / f["ms"]
                             if f["ms"] > 0 else 0.0)
    return dict(sorted(fams.items(), key=lambda kv: -kv[1]["ms"]))


def totals(rows: List[dict]) -> dict:
    ms = sum(r["ms"] for r in rows)
    floor = sum(r["floor_ms"] for r in rows)
    return {
        "device_ms_per_call": ms,
        "sum_kernel_floor_ms": floor,
        "pct_of_perkernel_sol": 100.0 * floor / ms if ms else 0.0,
    }


def format_table(fams: dict, top: int = 12) -> str:
    lines = [f"{'family':<28}{'ms':>9}{'GB':>8}{'GFLOP':>9}"
             f"{'%floor':>8}  kernels"]
    for name, f in list(fams.items())[:top]:
        lines.append(
            f"{name:<28}{f['ms']:>9.2f}{f['gb']:>8.2f}{f['gflops']:>9.1f}"
            f"{f['pct_of_floor']:>8.1f}  {f['kernels']}"
        )
    return "\n".join(lines)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--calls", type=int, default=1)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)

    rows = kernel_table(args.trace_dir, calls=args.calls)
    if args.json:
        print(json.dumps({"kernels": rows[:args.top],
                          "families": group_families(rows),
                          "totals": totals(rows)}))
        return
    print(format_table(group_families(rows)))
    t = totals(rows)
    print(f"\ndevice {t['device_ms_per_call']:.1f} ms/call; per-kernel SoL "
          f"{t['sum_kernel_floor_ms']:.1f} ms "
          f"({t['pct_of_perkernel_sol']:.1f}% of SoL)")
    print(f"\n{'kernel':<64}{'ms':>8}{'%floor':>8}  bound")
    for r in rows[:args.top]:
        print(f"{r['name'][:63]:<64}{r['ms']:>8.3f}"
              f"{r['pct_of_floor']:>8.1f}  {r['bound']}")


if __name__ == "__main__":
    main()
