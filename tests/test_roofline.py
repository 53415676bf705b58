"""eval/roofline: per-kernel device roofline analysis.

The tool parses jax.profiler chrome traces (the reference has no
profiling subsystem at all, SURVEY.md §5.1 — this is net-new TPU-side
capability).  The critical regression these tests pin: the device pid
carries both an 'XLA Modules' thread (whole-program spans) and an
'XLA Ops' thread (per-kernel events) with identical total duration —
counting both double-counts device time exactly 2x (the round-3
docs/PERF.md program totals had this bug; see the round-4
re-measurement section).
"""

import gzip
import json
import os

from fac_via_ppg_tpu.eval.roofline import (
    group_families,
    kernel_table,
    totals,
)


def _write_trace(tmp_path, events):
    d = os.path.join(tmp_path, "plugins", "profile", "2026_08_19")
    os.makedirs(d)
    with gzip.open(os.path.join(d, "host.trace.json.gz"), "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def _synthetic_events():
    ev = [
        # device pid 3 with a Modules thread (tid 2) and an Ops thread
        # (tid 3), exactly as the axon tunnel traces lay them out
        {"ph": "M", "name": "process_name", "pid": 3,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 701,
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "name": "thread_name", "pid": 3, "tid": 2,
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "name": "thread_name", "pid": 3, "tid": 3,
         "args": {"name": "XLA Ops"}},
        # one whole-program module span covering both kernels
        {"ph": "X", "name": "jit_f", "pid": 3, "tid": 2,
         "ts": 0, "dur": 3000.0, "args": {}},
        # two kernels: a bandwidth-bound fusion and a flops-bound conv
        {"ph": "X", "name": "fusion.1", "pid": 3, "tid": 3, "ts": 0,
         "dur": 1000.0,  # us
         "args": {"bytes_accessed": 819e6 * 0.5, "model_flops": 0}},
        {"ph": "X", "name": "convolution.2", "pid": 3, "tid": 3,
         "ts": 1000, "dur": 2000.0,
         "args": {"bytes_accessed": 1e6, "model_flops": 197e9 * 1.8}},
        # a host-side span that must be ignored
        {"ph": "X", "name": "dispatch", "pid": 701, "tid": 1, "ts": 0,
         "dur": 9999.0, "args": {}},
    ]
    return ev


def test_module_thread_not_double_counted(tmp_path):
    td = _write_trace(tmp_path, _synthetic_events())
    rows = kernel_table(td, calls=1)
    t = totals(rows)
    # 1.0 + 2.0 ms of kernels; the 3.0 ms module span and the host span
    # must NOT be added on top
    assert abs(t["device_ms_per_call"] - 3.0) < 1e-6
    names = {r["name"] for r in rows}
    assert names == {"fusion.1", "convolution.2"}


def test_floor_model_and_bounds(tmp_path):
    td = _write_trace(tmp_path, _synthetic_events())
    rows = {r["name"]: r for r in kernel_table(td, calls=1)}
    fus = rows["fusion.1"]
    # 0.5 ms of bytes at peak BW in a 1.0 ms kernel -> 50% of floor
    assert fus["bound"] == "bytes"
    assert abs(fus["pct_of_floor"] - 50.0) < 0.5
    conv = rows["convolution.2"]
    # 1.8 ms of bf16 flops in a 2.0 ms kernel -> 90% of floor
    assert conv["bound"] == "flops"
    assert abs(conv["pct_of_floor"] - 90.0) < 0.5


def test_calls_divides_and_families(tmp_path):
    ev = _synthetic_events()
    # simulate 2 identical calls: duplicate the kernel events
    ev += [dict(e, ts=e["ts"] + 5000) for e in ev
           if e.get("ph") == "X" and e.get("tid") == 3]
    td = _write_trace(tmp_path, ev)
    rows = kernel_table(td, calls=2)
    t = totals(rows)
    assert abs(t["device_ms_per_call"] - 3.0) < 1e-6
    fams = group_families(rows)
    assert "convolution" in fams and "fusion (elementwise)" in fams
    assert abs(sum(f["ms"] for f in fams.values()) - 3.0) < 1e-6


def test_while_span_self_time(tmp_path):
    """`while` spans contain their body ops' events on the same thread
    (training-step traces); raw summation double-counts the bodies.
    Self-time attribution keeps only the loop's scheduling overhead on
    the parent."""
    ev = [
        {"ph": "M", "name": "process_name", "pid": 3,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "thread_name", "pid": 3, "tid": 3,
         "args": {"name": "XLA Ops"}},
        # a 10 ms while span with two 4 ms body fusions inside
        {"ph": "X", "name": "while.1", "pid": 3, "tid": 3,
         "ts": 0, "dur": 10000.0, "args": {"bytes_accessed": 1e3}},
        {"ph": "X", "name": "fusion.b", "pid": 3, "tid": 3,
         "ts": 500, "dur": 4000.0, "args": {"bytes_accessed": 819e6}},
        {"ph": "X", "name": "fusion.b", "pid": 3, "tid": 3,
         "ts": 5500, "dur": 4000.0, "args": {"bytes_accessed": 819e6}},
        # a leaf after the loop
        {"ph": "X", "name": "fusion.c", "pid": 3, "tid": 3,
         "ts": 11000, "dur": 2000.0, "args": {"bytes_accessed": 1e3}},
    ]
    td = _write_trace(tmp_path, ev)
    rows = {r["name"]: r for r in kernel_table(td, calls=1)}
    t = totals(rows.values() if isinstance(rows, dict) else rows)
    # total = 10 (while incl. bodies) + 2 (leaf) = 12 ms, NOT 20
    assert abs(sum(r["ms"] for r in rows.values()) - 12.0) < 1e-6
    assert abs(rows["while.1"]["ms"] - 2.0) < 1e-6  # self time only
    assert abs(rows["fusion.b"]["ms"] - 8.0) < 1e-6
    assert rows["fusion.b"]["count"] == 2
