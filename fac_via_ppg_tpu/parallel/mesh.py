"""Device mesh + sharding helpers.

The reference scales with one NCCL process per GPU (src/waveglow/
distributed.py:43-142: rank-0 param broadcast, per-parameter backward hooks
feeding a bucketed flat allreduce, a TCP rendezvous URL).  The TPU-native
replacement is single-controller JAX: build a `jax.sharding.Mesh`, annotate
the batch as sharded on the 'data' axis and the params as replicated, and
XLA compiles the gradient reduction onto ICI — no hooks, no buckets, no
rendezvous.  The same code path runs single-chip (mesh of 1), multi-chip,
and on the CPU test mesh.

Two mesh axes are exposed:
  data  — batch sharding (DP); the only strategy the reference has.
  model — tensor sharding for the wide PPG layers (TP); a natural pjit
          extension the reference lacks (SURVEY.md section 2.4).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None, model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    use = data * model
    dev_array = np.array(devices[:use]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis 'data' sharding for batch pytrees."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree with the leading axis sharded on 'data'.

    Single-process: `batch` is the global batch; device_put scatters it.
    Multi-process: `batch` is this process's shard (what EpochBatcher
    yields), and the global array is assembled from the per-process local
    data — each host feeds only its own rows, nothing crosses DCN.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, x), batch
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch
    )


def replicate(mesh: Mesh, tree):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def normalize_tree_placement(mesh: Mesh, tree):
    """Re-place any leaf that does not span `mesh` onto it, replicated.

    `optax`'s `init` on already-sharded params gives moments that inherit
    the param layout, but freshly created scalars (step count, injected
    hyperparams) land committed to the default device only — a mix jit
    rejects ("incompatible devices").  Leaves already laid out across the
    full mesh keep their sharding; everything else is replicated.
    """
    rep = replicated(mesh)
    n = mesh.devices.size

    def fix(x):
        try:
            if len(x.devices()) == n:
                return x
        except Exception:
            pass
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(fix, tree)
