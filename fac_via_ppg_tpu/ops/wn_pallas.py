"""Pallas TPU kernel for the WaveGlow WN layer.

One WN layer is: dilated conv k=3 (C -> 2C) + conditioning add + fused
tanh*sigmoid gate + 1x1 res/skip conv (C -> 2C), with a residual add.  The
XLA lowering round-trips the (T, 2C) pre-activation and the gate output
through HBM between the two matmuls; this kernel keeps the whole layer in
VMEM per time-tile:

  per (batch, tile): DMA the (tile + 2*dilation) halo window of the audio
  activations HBM->VMEM once, then
    z    = [x(t-d) | x(t) | x(t+d)] @ W_in (one (T, 3C) @ (3C, 2C) MXU op)
           + cond_tile
    acts = tanh(z[:, :C]) * sigmoid(z[:, C:])
    rs   = acts @ W_rs
    audio_out = x(t) + rs[:, :C]     skip_out = rs[:, C:]

All 96 inner layer applications (12 flows x 8 layers) share this kernel:
the inner WN shapes are flow-independent (C=256).  The dilated conv is
expressed as a single concatenated matmul, not a conv — on the MXU a k=3
dilated conv IS three shifted matmuls.

Status: correctness-verified (interpret mode; exact match vs the XLA
formulation for every dilation incl. the last-layer variant) but OFF by
default — on this session's tunneled TPU the Mosaic AOT compile of the
kernel takes several minutes per (dilation, last) variant, which makes it
a poor trade against the XLA path that already sustains ~50% of bf16 peak
on the same layer.  Enable explicitly via `wn_layer_pallas(...)` on
hardware with local compilation.  Sub-sublane dilations (d < 8 f32 /
d < 16 bf16) always use the XLA path: Mosaic cannot concatenate vectors at
misaligned sublane offsets and the required in-kernel relayout negates the
fusion win.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_HALO = 128  # dilation reaches 2**7 for the 8-layer reference config


def _wn_layer_kernel(dilation: int, tile_t: int, c: int, last: bool,
                     x_hbm, cond_ref, w_in_ref, b_in_ref, w_rs_ref, b_rs_ref,
                     audio_out_ref, skip_out_ref, x_scratch, sem):
    b = pl.program_id(0)
    t = pl.program_id(1)
    d = dilation

    x_halo = x_scratch

    # One halo DMA (start t*tile_t is tile-aligned).  The three shifted
    # views are sliced at sublane-aligned offsets (d % 8 == 0 is enforced by
    # the wrapper — Mosaic cannot concatenate vectors at misaligned sublane
    # offsets, so sub-8 dilations take the XLA path instead).
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * tile_t, tile_t + 2 * d), :],
        x_halo.at[pl.ds(0, tile_t + 2 * d), :],
        sem,
    )
    copy.start()
    copy.wait()

    x_m = x_halo[pl.ds(0, tile_t), :]
    x_0 = x_halo[pl.ds(d, tile_t), :]
    x_p = x_halo[pl.ds(2 * d, tile_t), :]
    x_cat = jnp.concatenate([x_m, x_0, x_p], axis=1)  # (tile_t, 3C)

    z = jnp.dot(x_cat, w_in_ref[:], preferred_element_type=jnp.float32)
    z = z + b_in_ref[:].astype(jnp.float32)
    z = z + cond_ref[0].astype(jnp.float32)

    acts = (jnp.tanh(z[:, :c]) * jax.nn.sigmoid(z[:, c:])).astype(
        x_halo.dtype
    )
    rs = jnp.dot(acts, w_rs_ref[:], preferred_element_type=jnp.float32)
    rs = rs + b_rs_ref[:].astype(jnp.float32)

    if last:
        # final layer: res_skip produces only the skip channels
        audio_out_ref[0] = x_0  # passthrough (unused by caller)
        skip_out_ref[0] = rs.astype(x_halo.dtype)
    else:
        audio_out_ref[0] = x_0 + rs[:, :c].astype(x_halo.dtype)
        skip_out_ref[0] = rs[:, c:].astype(x_halo.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("dilation", "last", "tile_t", "interpret"),
)
def wn_layer_pallas(
    x: jnp.ndarray,      # (B, T, C) audio activations, channels-last
    cond: jnp.ndarray,   # (B, T, 2C) conditioning projection for this layer
    w_in: jnp.ndarray,   # (3C, 2C): [W(t-d); W(t); W(t+d)] stacked
    b_in: jnp.ndarray,   # (2C,)
    w_rs: jnp.ndarray,   # (C, 2C) or (C, C) for the last layer
    b_rs: jnp.ndarray,
    dilation: int,
    last: bool = False,
    tile_t: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (audio_out, skip_out); audio_out is the residual-updated
    activations ((B, T, C); passthrough for last=True)."""
    B, T, C = x.shape
    if T % tile_t:
        raise ValueError(f"T={T} must be a multiple of tile_t={tile_t}")
    d = dilation
    sublane = 8 if x.dtype == jnp.float32 else 16
    if d % sublane != 0 and not interpret:
        # Misaligned-sublane dilations would need in-kernel relayouts (slow
        # Mosaic path); XLA handles those small-dilation layers.
        return wn_layer_reference(x, cond, w_in, b_in, w_rs, b_rs, dilation,
                                  last=last)
    x_pad = jnp.pad(x, ((0, 0), (d, d), (0, 0)))

    rs_out = w_rs.shape[1]
    skip_c = rs_out if last else rs_out - C

    grid = (B, T // tile_t)
    kernel = functools.partial(_wn_layer_kernel, d, tile_t, C, last)

    audio_out, skip_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # x_pad stays in HBM
            pl.BlockSpec((1, tile_t, cond.shape[2]),
                         lambda b, t: (b, t, 0)),
            pl.BlockSpec((w_in.shape[0], w_in.shape[1]), lambda b, t: (0, 0)),
            pl.BlockSpec((b_in.shape[0],), lambda b, t: (0,)),
            pl.BlockSpec((w_rs.shape[0], w_rs.shape[1]), lambda b, t: (0, 0)),
            pl.BlockSpec((b_rs.shape[0],), lambda b, t: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_t, C), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, tile_t, skip_c), lambda b, t: (b, t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), x.dtype),
            jax.ShapeDtypeStruct((B, T, skip_c), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_t + 2 * MAX_HALO, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_pad, cond, w_in, b_in, w_rs, b_rs)
    return audio_out, skip_out


def pack_in_weight(conv_weight: jnp.ndarray) -> jnp.ndarray:
    """torch conv weight (2C, C, 3) -> stacked matmul form (3C, 2C)."""
    # tap j contributes x[t + (j-1)*d] @ W[:, :, j].T
    taps = [conv_weight[:, :, j].T for j in range(conv_weight.shape[2])]
    return jnp.concatenate(taps, axis=0)


def wn_layer_reference(x, cond, w_in, b_in, w_rs, b_rs, dilation,
                       last=False):
    """Pure-XLA channels-last equivalent (used for testing / fallback)."""
    B, T, C = x.shape
    d = dilation
    x_pad = jnp.pad(x, ((0, 0), (d, d), (0, 0)))
    x_cat = jnp.concatenate(
        [x_pad[:, :T], x_pad[:, d : d + T], x_pad[:, 2 * d : 2 * d + T]],
        axis=2,
    )
    z = jnp.dot(x_cat, w_in, preferred_element_type=jnp.float32) + b_in
    z = z + cond.astype(jnp.float32)
    acts = (jnp.tanh(z[:, :, :C]) * jax.nn.sigmoid(z[:, :, C:])).astype(x.dtype)
    rs = jnp.dot(acts, w_rs, preferred_element_type=jnp.float32) + b_rs
    if last:
        return x, rs.astype(x.dtype)
    return (x + rs[:, :, :C].astype(x.dtype),
            rs[:, :, C:].astype(x.dtype))
