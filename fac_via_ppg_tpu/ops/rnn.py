"""Recurrent sequence ops as `lax.scan`s.

The reference runs cuDNN LSTMs with `pack_padded_sequence` for the encoder
(reference src/common/model.py:211-235) and a per-frame Python loop of
LSTMCells for the decoder (model.py:444-487).  On TPU both become scans that
XLA compiles into a single fused while-loop: no per-step dispatch, static
shapes, and the packed-sequence semantics are reproduced with masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fac_via_ppg_tpu.ops.initializers import lstm_cell


def unidirectional_lstm(params: dict, xs: jnp.ndarray, lengths=None,
                        unroll: int = 1):
    """(B, T, D) -> (B, T, H) LSTM outputs, zeroed past `lengths`.

    When `lengths` is given the carried state freezes at each sequence's end
    (equivalent to pack_padded: padding never contaminates the state) and
    outputs at padding positions are 0 (equivalent to pad_packed).

    `unroll` feeds lax.scan's unroll factor (identical semantics, fewer
    loop iterations — measured ~9% faster Tacotron2 training steps at 4).
    """
    B, T, _ = xs.shape
    H = params["weight_hh"].shape[1]
    h0 = jnp.zeros((B, H), xs.dtype)
    c0 = jnp.zeros((B, H), xs.dtype)

    def step(carry, inp):
        h, c = carry
        x_t, valid_t = inp
        h_new, c_new = lstm_cell(params, x_t, h, c)
        m = valid_t[:, None]
        h = jnp.where(m, h_new, h)
        c = jnp.where(m, c_new, c)
        out = jnp.where(m, h_new, 0.0)
        return (h, c), out

    if lengths is None:
        valid = jnp.ones((T, B), bool)
    else:
        valid = (jnp.arange(T)[:, None] < lengths[None, :])
    xs_t = xs.transpose(1, 0, 2)  # scan over time
    _, outs = jax.lax.scan(step, (h0, c0), (xs_t, valid), unroll=unroll)
    return outs.transpose(1, 0, 2)


def bidirectional_lstm(fwd_params: dict, bwd_params: dict, xs: jnp.ndarray,
                       lengths=None, unroll: int = 1):
    """(B, T, D) -> (B, T, 2H) with per-sequence-length-aware reversal.

    The backward direction runs on each sequence reversed within its own
    valid region (index len-1-t), exactly like packed sequences: the
    backward state starts fresh at each sequence's true end.
    """
    B, T, _ = xs.shape
    out_f = unidirectional_lstm(fwd_params, xs, lengths, unroll=unroll)

    if lengths is None:
        rev = jnp.flip(xs, axis=1)
        out_b = unidirectional_lstm(bwd_params, rev, None, unroll=unroll)
        out_b = jnp.flip(out_b, axis=1)
    else:
        t_idx = jnp.arange(T)[None, :]
        rev_idx = jnp.clip(lengths[:, None] - 1 - t_idx, 0, T - 1)
        rev = jnp.take_along_axis(xs, rev_idx[:, :, None], axis=1)
        out_rev = unidirectional_lstm(bwd_params, rev, lengths, unroll=unroll)
        # map back: position t (original) <- rev position len-1-t
        out_b = jnp.take_along_axis(out_rev, rev_idx[:, :, None], axis=1)
        out_b = jnp.where((t_idx < lengths[:, None])[:, :, None], out_b, 0.0)

    return jnp.concatenate([out_f, out_b], axis=-1)
