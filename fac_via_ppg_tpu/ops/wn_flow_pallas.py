"""Cross-layer Pallas TPU kernel: one WaveGlow WN coupling net per call.

The round-4 trace analysis (docs/PERF.md "Round-4 re-measurement") showed
the XLA inference program is HBM-saturated at ~350 GB/call and that
re-drawing kernel fusion boundaries cannot move the wall: the remaining
single-chip lever is reducing the traffic itself.  This kernel does that
by keeping the WHOLE 8-layer WN residual chain in VMEM per time-tile:

    HBM traffic per flow     XLA path                this kernel
    ------------------------------------------------------------------
    audio activations        ~16 round-trips (C=256)  1 read (n_half<=4)
    in_act / acts / res_skip ~24 tensor round-trips   never materialized
    cond projections         1 read                   1 read
    skip accumulator         8 round-trips            1 write (via end conv)

Layout is channels-first (C sublanes, time lanes) so the dilated-conv
shifts are static LANE-offset slices, which Mosaic compiles at every
dilation — the round-2 per-layer kernel (ops/wn_pallas.py) was stuck on
sublane-misaligned shifts in its channels-last layout and lost end-to-end.
(`pltpu.roll` was bisected on this chip: it fails Mosaic compilation for
bf16 operands, so the residual stream instead carries a `guard`-lane
band on each side and every shifted read is an in-bounds static slice.)
One Mosaic compile serves all 12 flows: the inner WN shapes are
flow-independent (C=256), and the flow-dependent start/end projections are
zero-padded to a common `p_ch` channel count.

Overlap-save tiling: each (batch, tile) kernel instance computes on a
`tile + 2*halo` window where `halo >= sum(dilations) = 2**n_layers - 1`,
carried inside a `tile + 2*(halo + guard)` residual buffer
(`guard >= max dilation`, lane-aligned).  The guard lanes never receive
residual updates, so they and the buffer edges hold stale values — but
staleness spreads inward by exactly one dilation per layer, reaching at
most `guard + sum(dilations) < guard + halo`, one lane short of the
interior.  Zero-masking the residual stream at every layer reproduces
the XLA conv path's zero padding at the sequence edges.  Per-layer
conditioning tiles are double-buffered HBM->VMEM DMAs overlapped with
the matmuls.

Reference being re-designed: the WN hot loop, glow.py:133-152 (CUDA/torch
runs it layer-by-layer with every intermediate in global memory).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def flow_buf_geometry(t: int, tile: int,
                      n_layers: int) -> Tuple[int, int, int]:
    """(t_pad, halo, guard) for the overlap-save tiling.

    `halo` covers the cumulative receptive-field growth of the layer
    stack (sum of dilations); `guard` covers the largest single-layer
    shift (max dilation) so every shifted read of the residual buffer is
    an in-bounds static lane slice.  Both are lane-aligned."""
    if tile % 128:
        raise ValueError(f"tile={tile} must be a multiple of 128 lanes")
    halo = _cdiv(2 ** n_layers - 1, 128) * 128
    guard = _cdiv(2 ** (n_layers - 1), 128) * 128
    t_pad = _cdiv(t, tile) * tile
    return t_pad, halo, guard


def _wn_flow_kernel(nl, tile, lbuf, halo, guard, c, p_ch, t_total,
                    tap_concat,
                    a_hbm, cond_hbm,
                    w_start_ref, b_start_ref, w_in_ref, b_in_ref,
                    w_rs_ref, b_rs_ref, w_end_ref, b_end_ref,
                    out_ref,
                    a_buf, cond_buf, cat_buf, sems):
    b = pl.program_id(0)
    t = pl.program_id(1)
    f32 = jnp.float32
    dn = (((1,), (0,)), ((), ()))  # (m, k) @ (k, n)
    w = lbuf + 2 * guard  # residual-buffer width (x coordinates)

    cp_a = pltpu.make_async_copy(
        a_hbm.at[b, :, pl.ds(t * tile, w)], a_buf, sems.at[2]
    )
    cp_a.start()

    def cond_dma(slot, layer):
        return pltpu.make_async_copy(
            cond_hbm.at[b, pl.ds(layer * 2 * c, 2 * c),
                        pl.ds(t * tile, lbuf)],
            cond_buf.at[slot],
            sems.at[slot],
        )

    cond_dma(0, 0).start()

    # residual-buffer column j holds global sample
    # t*tile - halo - guard + j; zero-mask out-of-sequence columns to
    # reproduce conv zero padding
    pos = (t * tile - halo - guard) + jax.lax.broadcasted_iota(
        jnp.int32, (1, w), 1
    )
    mask = jnp.logical_and(pos >= 0, pos < t_total)

    cp_a.wait()
    dt = a_buf.dtype
    m = mask.astype(dt)
    x0 = jax.lax.dot_general(
        w_start_ref[:], a_buf[:], dn, preferred_element_type=f32
    )
    x = ((x0 + b_start_ref[:].astype(f32)[:, None]).astype(dt)) * m

    zeros_g = jnp.zeros((c, guard), dt)
    skip = jnp.zeros((c, lbuf), dt)
    for l in range(nl):
        d = 1 << l
        if l + 1 < nl:
            cond_dma((l + 1) % 2, l + 1).start()
        cond_dma(l % 2, l).wait()
        cond = cond_buf[l % 2]

        # three static lane-offset views of the residual buffer; z
        # column j' is x column guard + j'
        def view(off):
            return jax.lax.slice(x, (0, guard + off),
                                 (c, guard + off + lbuf))

        if tap_concat:
            # ONE (2C, 3C) @ (3C, lbuf) MXU op per layer: the K=3C
            # contraction keeps the systolic array busy across all three
            # taps instead of three shallow-K dispatches (measured: the
            # split form ran at ~46% MXU efficiency).  The taps are
            # staged through a VMEM scratch — Mosaic rejects a direct
            # sublane concat of lane-misaligned slices (bisected; the
            # scratch round-trip compiles and is VMEM-bandwidth noise).
            cat_buf[0:c] = view(-d)
            cat_buf[c:2 * c] = view(0)
            cat_buf[2 * c:3 * c] = view(d)
            z = jax.lax.dot_general(
                w_in_ref[l], cat_buf[:], dn, preferred_element_type=f32,
            )
            z += b_in_ref[l].astype(f32)[:, None]
            z += cond.astype(f32)
            acts = (jnp.tanh(z[:c]) * jax.nn.sigmoid(z[c:])).astype(dt)
        else:
            # gate halves separately: the (2C, lbuf) pre-activation never
            # exists, halving the live f32 footprint
            def half(lo):
                z = jax.lax.dot_general(
                    w_in_ref[l, 0, lo:lo + c, :], view(-d), dn,
                    preferred_element_type=f32,
                )
                z += jax.lax.dot_general(
                    w_in_ref[l, 1, lo:lo + c, :], view(0), dn,
                    preferred_element_type=f32,
                )
                z += jax.lax.dot_general(
                    w_in_ref[l, 2, lo:lo + c, :], view(d), dn,
                    preferred_element_type=f32,
                )
                z += b_in_ref[l, lo:lo + c].astype(f32)[:, None]
                z += cond[lo:lo + c].astype(f32)
                return z

            acts = (jnp.tanh(half(0))
                    * jax.nn.sigmoid(half(c))).astype(dt)
        rs = jax.lax.dot_general(
            w_rs_ref[l], acts, dn, preferred_element_type=f32
        ) + b_rs_ref[l].astype(f32)[:, None]
        # bf16 adds, like the XLA path (conv f32-accum -> cast -> add);
        # the guard lanes go stale here — see the module docstring
        if l + 1 < nl:
            res = jnp.concatenate(
                [zeros_g, rs[:c].astype(dt), zeros_g], axis=1
            )
            x = (x + res) * m
        skip = skip + rs[c:].astype(dt)

    out = jax.lax.dot_general(
        w_end_ref[:], skip[:, halo:halo + tile], dn,
        preferred_element_type=f32,
    ) + b_end_ref[:].astype(f32)[:, None]
    out_ref[0] = out.astype(dt)


@functools.partial(
    jax.jit,
    static_argnames=("n_layers", "t_valid", "tile", "interpret",
                     "tap_concat"),
)
def wn_flow_pallas(
    packed: dict,
    audio_half: jnp.ndarray,   # (B, n_half, T)
    cond_padded: jnp.ndarray,  # (B, L*2C, t_pad + 2*halo), layer l at l*2C
    n_layers: int,
    t_valid: int,
    tile: int = 4096,
    interpret: bool = False,
    tap_concat: bool = True,
) -> jnp.ndarray:
    """One full WN coupling net -> (B, p_ch, t_pad); caller slices
    [:, :2*n_half, :T].  `cond_padded` must be laid out in the padded
    time coordinates (see flow_buf_geometry / pad_time_for_flow)."""
    B, n_half, T = audio_half.shape
    if T != t_valid:
        raise ValueError(f"audio_half time {T} != t_valid {t_valid}")
    t_pad, halo, guard = flow_buf_geometry(t_valid, tile, n_layers)
    lbuf = tile + 2 * halo
    c = packed["w_rs"].shape[2]
    p_ch = packed["w_start"].shape[1]

    a_pad = jnp.zeros(
        (B, p_ch, t_pad + 2 * (halo + guard)), audio_half.dtype
    )
    a_pad = jax.lax.dynamic_update_slice(
        a_pad, audio_half, (0, 0, halo + guard)
    )

    if cond_padded.shape[2] != t_pad + 2 * halo:
        raise ValueError(
            f"cond time {cond_padded.shape[2]} != t_pad+2*halo "
            f"{t_pad + 2 * halo}"
        )

    w_in = packed["w_in"]  # (L, 3, 2C, C)
    if tap_concat:
        # (L, 2C, 3C): tap j in K columns [j*C, (j+1)*C)
        w_in = jnp.concatenate(
            [w_in[:, 0], w_in[:, 1], w_in[:, 2]], axis=2
        )

    grid = (B, t_pad // tile)
    kernel = functools.partial(
        _wn_flow_kernel, n_layers, tile, lbuf, halo, guard, c, p_ch,
        t_valid, tap_concat,
    )
    wspec = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, t: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # a_pad (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),  # cond (manual DMA)
            wspec(*packed["w_start"].shape),
            wspec(*packed["b_start"].shape),
            wspec(*w_in.shape),
            wspec(*packed["b_in"].shape),
            wspec(*packed["w_rs"].shape),
            wspec(*packed["b_rs"].shape),
            wspec(*packed["w_end"].shape),
            wspec(*packed["b_end"].shape),
        ],
        out_specs=pl.BlockSpec(
            (1, p_ch, tile), lambda b, t: (b, 0, t),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, p_ch, t_pad), audio_half.dtype),
        scratch_shapes=[
            pltpu.VMEM((p_ch, lbuf + 2 * guard), audio_half.dtype),
            pltpu.VMEM((2, 2 * c, lbuf), audio_half.dtype),  # cond slots
            pltpu.VMEM(((3 * c if tap_concat else 1), lbuf),
                       audio_half.dtype),                    # tap staging
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        a_pad, cond_padded,
        packed["w_start"], packed["b_start"],
        w_in, packed["b_in"],
        packed["w_rs"], packed["b_rs"],
        packed["w_end"], packed["b_end"],
    )
    return out


def pad_time_for_flow(x: jnp.ndarray, t_pad: int, halo: int) -> jnp.ndarray:
    """(..., T) -> (..., t_pad + 2*halo) with the valid range at
    [halo, halo + T); zeros elsewhere."""
    T = x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 1) + [(halo, t_pad - T + halo)]
    return jnp.pad(x, pad)


def pack_wn_flow(wn: dict, n_layers: int, p_ch: int = None) -> dict:
    """One flow's folded WN params (remove_weightnorm form) -> the stacked
    padded arrays the kernel wants.  Precompute ONCE outside jit
    (pack_waveglow_flow for all flows); biases are kept f32.

    Layout notes:
      * w_start (C, p_ch): start 1x1 conv, input channels zero-padded
        from n_half to p_ch.
      * w_in (L, 3, 2C, C): tap j of the dilated conv applies to
        x[t + (j-1)*d] (torch Conv1d weight (2C, C, 3), tap axis first).
      * w_rs (L, 2C, C): the last layer's skip-only (C, C) projection
        sits in rows [C:2C] with zero res rows, so the kernel's layer
        loop is uniform.
      * w_end (p_ch, C): end 1x1 conv, output rows zero-padded from
        2*n_half to p_ch.
    """
    C = wn["start"]["weight"].shape[0]
    n_half = wn["start"]["weight"].shape[1]
    if p_ch is None:
        # smallest sublane-aligned (x8) count holding the 2*n_half coupling
        # output — configs with n_group > 8 pack (and run) instead of
        # failing with a broadcast error in w_end.at[:n_out].set
        p_ch = max(8, -(-2 * n_half // 8) * 8)

    def f32(x):
        return jnp.asarray(x, jnp.float32)

    w_start = jnp.zeros((C, p_ch), jnp.float32)
    w_start = w_start.at[:, :n_half].set(f32(wn["start"]["weight"][:, :, 0]))

    w_in = jnp.stack(
        [f32(p["weight"]).transpose(2, 0, 1) for p in wn["in_layers"]]
    )  # (L, 3, 2C, C)
    b_in = jnp.stack([f32(p["bias"]) for p in wn["in_layers"]])

    w_rs = jnp.zeros((n_layers, 2 * C, C), jnp.float32)
    b_rs = jnp.zeros((n_layers, 2 * C), jnp.float32)
    for l, p in enumerate(wn["res_skip_layers"]):
        w = f32(p["weight"][:, :, 0])
        if w.shape[0] == 2 * C:
            w_rs = w_rs.at[l].set(w)
            b_rs = b_rs.at[l].set(f32(p["bias"]))
        else:  # last layer: skip-only, placed in the skip rows
            w_rs = w_rs.at[l, C:].set(w)
            b_rs = b_rs.at[l, C:].set(f32(p["bias"]))

    n_out = wn["end"]["weight"].shape[0]
    w_end = jnp.zeros((p_ch, C), jnp.float32)
    w_end = w_end.at[:n_out].set(f32(wn["end"]["weight"][:, :, 0]))
    b_end = jnp.zeros((p_ch,), jnp.float32)
    b_end = b_end.at[:n_out].set(f32(wn["end"]["bias"]))

    return {
        "w_start": w_start, "b_start": f32(wn["start"]["bias"]),
        "w_in": w_in, "b_in": b_in,
        "w_rs": w_rs, "b_rs": b_rs,
        "w_end": w_end, "b_end": b_end,
    }


def cast_pack(packed: dict, dtype) -> dict:
    """Cast the matmul weights to the serving dtype; biases stay f32
    (they add into the f32 accumulators)."""
    out = dict(packed)
    for k in ("w_start", "w_in", "w_rs", "w_end"):
        out[k] = packed[k].astype(dtype)
    return out
