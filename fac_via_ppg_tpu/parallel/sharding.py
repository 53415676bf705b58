"""Parameter and optimizer-state sharding rules (TP over the 'model'
axis; ZeRO-1 optimizer sharding over the 'data' axis).

The reference has only data parallelism (SURVEY.md section 2.4).  On TPU,
tensor sharding of the wide layers is a natural pjit extension: annotate
the big matrices with a 'model'-axis PartitionSpec and let GSPMD insert
the collectives.

Tacotron2: the encoder prenet's PPG-facing matrix (600 x 5816: ~3.5M
params) shards its contraction dimension — a local matmul + psum over
ICI.  The other big matrices (BLSTM / attention / decoder LSTM gate
stacks, projections) shard their output dim (column-parallel), and the
encoder/postnet conv stacks shard their out-channel (each Conv1d is an
(out, in*k) matmul on the MXU, so a shard computes its out-channel
block locally) — together ~97% of the parameter mass at the full
operating point.  Small vectors (biases, BN scales, gate layers) stay
replicated: GSPMD slices a replicated operand locally, so mixing them
with sharded activations costs no collectives.

WaveGlow: virtually all FLOPs live in the WN coupling nets' 256-wide
hidden channel (reference glow.py:105-176), so the model axis shards
that channel: start / in_layers / cond_layers / res_skip_layers shard
their OUT-channel dim (column-parallel), and the tiny `end` projection
shards its IN-channel (row-parallel: local matmul + psum back to the
replicated 2*n_half coupling output).  The packed 2C gate dim places
the tanh and sigmoid halves on different shards, so GSPMD inserts one
C-wide activation reshard per WN layer before the gate — cheap on ICI
next to the layer's three 2C-wide matmuls.  The 8x8 invertible 1x1
convs and the upsampler stay replicated (slogdet/inverse are
scalar-ish ops on tiny matrices).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _tacotron2_spec(model_axis: int, wide_threshold: int,
                    big_threshold: int, path: str, leaf) -> P:
    """TP PartitionSpec for one Tacotron2 param leaf (see module doc)."""
    if model_axis <= 1:
        return P()
    # encoder prenet layer 0: weight (embed, n_symbols) — shard the
    # 5816-wide contraction dim.
    if "encoder" in path and "prenet" in path and "layers'][0" in path \
            and leaf.ndim == 2 and leaf.shape[1] % model_axis == 0 \
            and leaf.shape[1] >= wide_threshold:
        return P(None, "model")
    # encoder prenet layer 1 / LSTM gate stacks / projections: shard
    # the output dim when divisible.
    if leaf.ndim == 2 and leaf.shape[0] % model_axis == 0 \
            and leaf.shape[0] * leaf.shape[1] >= big_threshold:
        return P("model", None)
    # encoder/postnet Conv1d kernels (out, in, k): column-parallel on
    # the out-channel.
    if leaf.ndim == 3 and leaf.shape[0] % model_axis == 0 \
            and leaf.size >= big_threshold:
        return P("model", None, None)
    return P()


def tacotron2_param_shardings(mesh: Mesh, params,
                              wide_threshold: int = 1024,
                              big_threshold: int = 256 * 256) -> dict:
    """NamedSharding pytree for Tacotron2 params: TP on the PPG prenet.

    The thresholds gate which matrices are worth sharding (below them TP
    trades cheap FLOPs for collective latency); tests pass smaller values
    to exercise the sharded program at toy scale.
    """
    model_axis = mesh.shape.get("model", 1)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = [
        NamedSharding(mesh, _tacotron2_spec(
            model_axis, wide_threshold, big_threshold,
            jax.tree_util.keystr(path), leaf))
        for path, leaf in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, specs)


def tacotron2_spec_fn(mesh: Mesh, wide_threshold: int = 1024,
                      big_threshold: int = 256 * 256):
    """(path, leaf) -> P closure for composing Tacotron2 TP placements
    with ZeRO-1 (optimizer_state_shardings param_spec_fn)."""
    model_axis = mesh.shape.get("model", 1)
    return lambda path, leaf: _tacotron2_spec(
        model_axis, wide_threshold, big_threshold, path, leaf)


def _waveglow_spec(model_axis: int, path: str, leaf) -> P:
    """TP PartitionSpec for one WaveGlow param leaf (see module doc)."""
    if model_axis <= 1 or "'wn'" not in path:
        return P()  # upsample / convinv replicated

    def div(dim):
        return leaf.shape[dim] % model_axis == 0 and leaf.shape[dim] > 1

    if "'end'" in path:
        # row-parallel: contract over the sharded hidden channel
        if leaf.ndim == 3 and div(1):
            return P(None, "model", None)
        return P()  # end bias (tiny) replicated
    # start / in_layers / cond_layers / res_skip_layers: column-parallel
    # on the hidden (or stacked-gate 2C) out-channel.  Weight-norm form
    # has v (out, in, k) and g (out,); folded form has weight (out, in,
    # k) and bias (out,).
    if leaf.ndim == 3 and div(0):
        return P("model", None, None)
    if leaf.ndim == 1 and div(0):
        return P("model")
    return P()


def waveglow_param_shardings(mesh: Mesh, params) -> dict:
    """NamedSharding pytree for WaveGlow params: TP on the WN hidden
    channel (see module docstring).  Leaves that don't divide the model
    axis stay replicated, so tiny test configs degrade gracefully."""
    model_axis = mesh.shape.get("model", 1)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = [
        NamedSharding(mesh, _waveglow_spec(
            model_axis, jax.tree_util.keystr(path), leaf))
        for path, leaf in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, specs)


def waveglow_spec_fn(mesh: Mesh):
    """(path, leaf) -> P closure for composing WaveGlow TP placements
    with ZeRO-1 (optimizer_state_shardings param_spec_fn)."""
    model_axis = mesh.shape.get("model", 1)
    return lambda path, leaf: _waveglow_spec(model_axis, path, leaf)


def int8cond_shardings(mesh: Mesh, packed) -> list:
    """NamedSharding pytree for pack_waveglow_int8cond output under TP.

    The packed cond weights stack every WN layer's (2C, 640) matrix into
    one (L*2C, 640) int8 matrix per flow; under a 'model' mesh axis the
    stacked OUT-channel shards column-parallel, like the dense
    cond_layers — but note the mapping differs: dense sharding splits
    each layer's 2C block across devices, while the stacked split
    partitions the flat L*2C dim contiguously (whole layers per device
    when L divides the axis), so GSPMD inserts one reshard before the
    per-layer split feeding the in_conv add.  Numerically equivalent;
    shard per-layer-block instead if that reshard ever shows in TP
    traces.  Scales and biases follow the out-channel.  Leaves whose
    leading dim doesn't divide the axis stay replicated (tiny test
    configs degrade gracefully)."""
    model_axis = mesh.shape.get("model", 1)

    def spec_for(leaf) -> P:
        shape = getattr(leaf, "shape", ())
        if model_axis <= 1 or not shape or shape[0] % model_axis or \
                shape[0] <= 1:
            return P()
        return P(*(["model"] + [None] * (len(shape) - 1)))

    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, spec_for(leaf)), packed
    )


def optimizer_state_shardings(mesh: Mesh, opt_state, axis: str = "data",
                              param_spec_fn=None):
    """ZeRO-1: shard optimizer state over the data axis.

    The reference replicates optimizer state per GPU (SURVEY.md §2.4:
    FSDP/ZeRO absent).  On a mesh the Adam moments are pure elementwise
    state, so sharding them over 'data' cuts optimizer memory by the DP
    degree — for Adam, two-thirds of the (param + m + v) training
    footprint beyond activations.  GSPMD keeps the moment update local
    to each shard and all-gathers only the final param delta into the
    replicated params (ZeRO stage 1 semantics, compiler-derived rather
    than hand-bucketed).

    Each array leaf shards its first dimension divisible by the axis
    size; scalars (step count, injected learning rate) and indivisible
    leaves stay replicated.

    Composing with TP: pass param_spec_fn = waveglow_spec_fn(mesh) /
    tacotron2_spec_fn(mesh) — the moments first inherit the TP param
    placement (a moment must never be laid out differently from its
    param's 'model' split), then the 'data' axis is added on the first
    still-unsharded divisible dimension.  Adam moment paths contain the
    param path as a suffix (optax's state mirrors the param tree), so the
    same path-matching spec functions apply.
    """
    n = mesh.shape.get(axis, 1)

    def spec_for(path: str, leaf) -> P:
        shape = getattr(leaf, "shape", ())
        base = param_spec_fn(path, leaf) if param_spec_fn is not None \
            else P()
        entries = list(base) + [None] * (len(shape) - len(base))
        if n <= 1 or len(shape) == 0:
            return P(*entries)
        for d, s in enumerate(shape):
            if entries[d] is None and s >= n and s % n == 0:
                entries[d] = axis
                break
        return P(*entries)

    leaves, treedef = jax.tree_util.tree_flatten_with_path(opt_state)
    specs = [
        NamedSharding(mesh, spec_for(jax.tree_util.keystr(path), leaf))
        for path, leaf in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, specs)


def apply_shardings(tree, shardings):
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(np.asarray(x), s), tree, shardings
    )
