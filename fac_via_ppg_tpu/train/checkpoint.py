"""Checkpoint save / load / warm-start.

Reference semantics (train_ppg2mel.py:122-149, train_waveglow.py:45-64):
dicts of {iteration, model weights, optimizer state, learning_rate}, saved
every `iters_per_checkpoint` on rank 0, resumable with `iteration + 1` and
`epoch_offset = iteration // len(train_loader)`; `warm_start` loads weights
only.  The WaveGlow trainer pickled the entire torch module; here both
models use the same pytree format (orbax), and a converter imports the two
torch formats for parity testing (train/import_torch.py).

Orbax writes sharding-aware, async-capable checkpoints — the TPU-native
replacement for torch.save.
"""

from __future__ import annotations

import os
import threading
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    params,
    opt_state,
    learning_rate: float,
    iteration: int,
    model_state=None,
):
    """Save {iteration, state_dict, optimizer, learning_rate} (+BN state)."""
    path = os.path.abspath(path)
    payload = {
        "iteration": np.asarray(iteration, np.int64),
        "learning_rate": np.asarray(learning_rate, np.float64),
        "params": _to_host(params),
        "opt_state": _to_host(opt_state),
    }
    if model_state is not None:
        payload["model_state"] = _to_host(model_state)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


class AsyncCheckpointSaver:
    """Non-blocking checkpoint saves.

    `save()` snapshots the pytrees with a cheap on-device copy (fresh
    buffers, so later donating train steps can't invalidate them — JAX
    orders the copy before any subsequent donation of the same buffers)
    and hands the device->host readback plus the orbax write to a
    background thread.  Training dispatches its next step immediately
    instead of stalling for the readback (~2 min for a full WaveGlow
    params+opt payload over this session's tunnel; seconds on real
    hosts).

    At most one save is in flight: a new `save()` joins the previous one
    first, bounding extra device memory at one snapshot.  A failed
    background save re-raises on the next `save()`/`wait()`.  Call
    `wait()` before process exit so the final checkpoint lands.
    """

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def _join(self) -> Optional[BaseException]:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        err, self._error = self._error, None
        return err

    def save(self, path: str, params, opt_state, learning_rate: float,
             iteration: int, model_state=None):
        # A failed PREVIOUS save must not abort training here — the
        # current state would be lost too (neither checkpoint lands).
        # Warn at the blame site and proceed with the new save; a failure
        # of the LAST save still raises from wait().
        prev_err = self._join()
        if prev_err is not None:
            print(
                "WARNING: previous async checkpoint save failed "
                f"({prev_err!r}); continuing with the current save"
            )
        snap_params, snap_opt, snap_model = jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x,
            (params, opt_state, model_state),
        )

        def _job():
            try:
                save_checkpoint(path, snap_params, snap_opt, learning_rate,
                                iteration, model_state=snap_model)
            except BaseException as e:  # surfaced on next save()/wait()
                self._error = e

        self._thread = threading.Thread(target=_job, daemon=True)
        self._thread.start()

    def wait(self):
        err = self._join()
        if err is not None:
            raise err


def _restructure(raw, template):
    """Re-impose `template`'s container types onto orbax's raw restore.

    Orbax (without a typed target) returns plain dicts for every mapping —
    NamedTuples (optax states) and lists come back as dicts keyed by field
    name / stringified index.  Walk the template structure and rebuild.
    """
    if isinstance(template, dict):
        return {k: _restructure(raw[k], v) for k, v in template.items()}
    if isinstance(template, tuple) and hasattr(template, "_fields"):
        values = (
            _restructure(
                raw[f] if isinstance(raw, dict) else raw[i],
                getattr(template, f),
            )
            for i, f in enumerate(template._fields)
        )
        return type(template)(*values)
    if isinstance(template, (list, tuple)):
        if isinstance(raw, dict):
            raw = [raw[str(i)] for i in range(len(template))]
        seq = [_restructure(r, t) for r, t in zip(raw, template)]
        return type(template)(seq) if isinstance(template, tuple) else seq
    if raw is None or template is None:
        return raw
    return np.asarray(raw)


def load_checkpoint(path: str, like: Optional[Dict[str, Any]] = None,
                    partial: bool = False) -> Dict[str, Any]:
    """Load a checkpoint into host numpy pytrees.

    `like` supplies target pytree structures for a subset of the payload
    ({"params": .., "opt_state": .., "model_state": ..}); without it,
    NamedTuple-typed containers (e.g. optax states) come back as plain
    dicts and cannot be fed back to the optimizer.  Leaves of `like` may be
    ShapeDtypeStructs (jax.eval_shape) — only structure matters.
    `partial` permits the checkpoint to carry keys absent from `like`.
    """
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path)
    restored = dict(restored)
    if like is not None:
        for k, template in like.items():
            if k in restored:
                restored[k] = _restructure(restored[k], template)
            elif not partial:
                raise KeyError(f"Checkpoint {path} lacks key {k!r}.")
    restored["iteration"] = int(restored["iteration"])
    restored["learning_rate"] = float(restored["learning_rate"])
    return restored


def warm_start(path: str):
    """Weights-only restore (reference warm_start_model)."""
    return load_checkpoint(path)["params"]


def find_latest_checkpoint(output_directory: str,
                           prefix: str = "checkpoint_") -> Optional[str]:
    """Highest-iteration checkpoint under a run directory, or None.

    Enables `checkpoint_path='auto'` crash recovery: the reference requires
    a manually-specified resume path (train_ppg2mel.py:217), so an
    interrupted job restarts from scratch unless babysat.
    """
    import re

    if not os.path.isdir(output_directory):
        return None
    best_iter, best_path = -1, None
    for name in os.listdir(output_directory):
        m = re.fullmatch(re.escape(prefix) + r"(\d+)", name)
        if m:
            path = os.path.join(output_directory, name)
            if os.path.isdir(path) and int(m.group(1)) > best_iter:
                best_iter, best_path = int(m.group(1)), path
    return best_path
