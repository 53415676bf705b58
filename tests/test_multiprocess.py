"""Multi-host execution test: 2 and 4 real OS processes, gloo CPU
collectives.

Exercises the capability the reference gets from multiproc.py:38-55 +
distributed.py:145-170 (multi-process data-parallel training with a TCP
rendezvous), generalized to every strategy this framework ships: N
localhost JAX processes (2 devices each) initialize through
`scripts.multiproc.initialize_distributed` and run (a) the jitted
Tacotron2 DP train step, (b) the same step DP x TP on an (N data x
2 model) mesh whose data axis crosses the process boundaries, and (c)
one fused DP serving call (batched gate-stopped decode -> vocoder) with
the utterance batch sharded across all processes.  Every phase must
agree across workers AND with a single-process replay.  Both variants
are slow-tier (the 2-process variant alone measures ~6 min on the CI
box — N concurrent XLA compiles plus the replay); the default tier
guards sharded execution through the single-process smoke tests in
tests/test_smoke_families.py instead.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _load(path, prefix=""):
    data = np.load(path, allow_pickle=False)
    n = int(data[f"{prefix}n_leaves"])
    return (
        [data[f"{prefix}leaf_{i}"] for i in range(n)],
        str(data[f"{prefix}treedef"]),
        data[f"{prefix}losses"],
    )


@pytest.mark.parametrize(
    "nproc",
    [2, pytest.param(4, marks=pytest.mark.slow)],
)
def test_multi_process_dp_matches_single_process(tmp_path, nproc):
    from tests.mp_worker import N_LOCAL_DEVICES

    ndev = nproc * N_LOCAL_DEVICES
    if ndev > 8:
        pytest.skip("replay needs the 8-device test mesh")
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = "/root/repo"
    outs = [str(tmp_path / f"proc{i}.npz") for i in range(nproc)]
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tests.mp_worker", str(i), str(nproc),
             str(port), outs[i]],
            cwd="/root/repo", env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(nproc)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=840 * max(1, nproc // 2))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        logs.append(out)
    for i, p in enumerate(procs):
        assert p.returncode == 0, (
            f"worker {i} failed:\n{logs[i][-4000:]}"
        )

    loaded = [_load(out) for out in outs]
    leaves0, tree0, losses0 = loaded[0]

    # Every process must hold the identical replicated result.
    for leaves_i, tree_i, losses_i in loaded[1:]:
        assert tree0 == tree_i
        np.testing.assert_array_equal(losses0, losses_i)
        for a, b in zip(leaves0, leaves_i):
            np.testing.assert_array_equal(a, b)

    # Single-process oracle over the SAME global batches: concatenate the
    # shards' per-step local batches in process order (the row order
    # make_array_from_process_local_data assembles) and replay.
    import jax

    from tests.mp_worker import STEPS, flatten_params, make_batcher, run_training

    shard_iters = [iter(make_batcher(s, nproc)) for s in range(nproc)]
    global_batches = []
    for _ in range(STEPS):
        parts = [next(it) for it in shard_iters]
        global_batches.append(tuple(
            np.concatenate([np.asarray(p[f]) for p in parts], axis=0)
            for f in range(len(parts[0]))
        ))

    from fac_via_ppg_tpu.parallel.mesh import make_mesh

    # global batch (BATCH_PER_SHARD rows per process) -> data mesh of the
    # same width on the test process.
    params, losses_ref = run_training(
        jax, global_batches, mesh=make_mesh(data=len(global_batches[0][0]))
    )
    leaves_ref, tree_ref = flatten_params(params)

    assert tree0 == tree_ref
    np.testing.assert_allclose(losses0, losses_ref, atol=1e-5)
    for a, b in zip(leaves0, leaves_ref):
        np.testing.assert_allclose(a, b, atol=1e-5)

    # --- phase 2: DP x TP train step across the process boundary ---
    tps = [_load(out, prefix="tp_") for out in outs]
    tp0 = tps[0]
    for tp_i in tps[1:]:
        assert tp0[1] == tp_i[1]
        np.testing.assert_allclose(tp0[2], tp_i[2], atol=1e-6)
        for a, b in zip(tp0[0], tp_i[0]):
            np.testing.assert_allclose(a, b, atol=1e-6)

    from tests.mp_worker import TP_D_IN as _tp_d_in

    tp_shard_iters = [
        iter(make_batcher(s, nproc, d_in=_tp_d_in)) for s in range(nproc)
    ]
    tp_global = []
    for _ in range(STEPS):
        parts = [next(it) for it in tp_shard_iters]
        tp_global.append(tuple(
            np.concatenate([np.asarray(p[f]) for p in parts], axis=0)
            for f in range(len(parts[0]))
        ))
    tp_params, tp_losses_ref = run_training(
        jax, tp_global, mesh=make_mesh(data=nproc, model=N_LOCAL_DEVICES),
        tensor_parallel=True,
    )
    tp_leaves_ref, tp_tree_ref = flatten_params(tp_params)
    assert tp0[1] == tp_tree_ref
    np.testing.assert_allclose(tp0[2], tp_losses_ref, atol=1e-5)
    for a, b in zip(tp0[0], tp_leaves_ref):
        np.testing.assert_allclose(a, b, atol=1e-5)

    # --- phase 3: fused DP serving call across all processes ---
    from tests.mp_worker import run_serving

    audio_ref, lens_ref, seen_ref = run_serving(
        jax, make_mesh(data=ndev), serve_batch=ndev
    )
    assert seen_ref.all()  # single-process sees the whole batch
    for i, out in enumerate(outs):
        data = np.load(out, allow_pickle=False)
        seen = data["serve_seen"]
        assert seen.any(), f"worker {i} owned no serving rows"
        np.testing.assert_array_equal(
            data["serve_mel_lens"][seen], lens_ref[seen],
            err_msg="stop step diverged across processes",
        )
        np.testing.assert_allclose(
            data["serve_audio"][seen], audio_ref[seen], atol=1e-5,
            err_msg="served audio diverged across processes",
        )
        # --- phase 4: preemption allgather — ANY rank's notice stops
        # every process: [nobody requested, rank 1 only requested]
        np.testing.assert_array_equal(
            data["preempt_votes"], [False, True],
            err_msg=f"worker {i} preemption votes wrong",
        )
