"""Parameter sharding rules (tensor parallelism over the 'model' axis).

The reference has only data parallelism (SURVEY.md section 2.4).  On TPU,
tensor sharding of the wide PPG-facing layers is a natural pjit extension:
annotate the big matrices with a 'model'-axis PartitionSpec and let GSPMD
insert the collectives.  The dominant weights are the encoder prenet
(600 x 5816: ~3.5M params, 55% of the Tacotron2 total) — sharding their
contraction dimension turns the per-step matmul into a local matmul +
psum over ICI.

Everything else stays replicated: at reference model scale, further TP
would trade cheap FLOPs for latency.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tacotron2_param_shardings(mesh: Mesh, params) -> dict:
    """NamedSharding pytree for Tacotron2 params: TP on the PPG prenet."""
    model_axis = mesh.shape.get("model", 1)

    def spec_for(path: str, leaf) -> P:
        if model_axis <= 1:
            return P()
        # encoder prenet layer 0: weight (embed, n_symbols) — shard the
        # 5816-wide contraction dim.
        if "encoder" in path and "prenet" in path and "layers'][0" in path \
                and leaf.ndim == 2 and leaf.shape[1] % model_axis == 0 \
                and leaf.shape[1] >= 1024:
            return P(None, "model")
        # encoder prenet layer 1 / decoder projection-sized matrices: shard
        # the output dim when divisible.
        if leaf.ndim == 2 and leaf.shape[0] % model_axis == 0 \
                and leaf.shape[0] * leaf.shape[1] >= 256 * 256:
            return P("model", None)
        return P()

    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = [
        NamedSharding(mesh, spec_for(jax.tree_util.keystr(path), leaf))
        for path, leaf in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, specs)


def apply_shardings(tree, shardings):
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(np.asarray(x), s), tree, shardings
    )
