"""Parameter initializers matching the reference's torch conventions.

The reference initializes every Linear/Conv with xavier_uniform scaled by
`torch.nn.init.calculate_gain(w_init_gain)` (reference src/common/layers.py:
40-71) and leaves biases / LSTMs at torch defaults.  Matching the init
distributions keeps training dynamics comparable; matching the *layouts*
(Linear weight (out, in); Conv1d weight (out, in, k); LSTM gates packed
(i, f, g, o) along dim 0) makes the torch-checkpoint importer a pure
key-rename.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

GAINS = {
    "linear": 1.0,
    "relu": math.sqrt(2.0),
    "tanh": 5.0 / 3.0,
    "sigmoid": 1.0,
}


def xavier_uniform(key, shape, gain: float = 1.0, dtype=jnp.float32):
    """torch.nn.init.xavier_uniform_ for (out, in[, k]) weight layouts."""
    if len(shape) == 2:
        fan_out, fan_in = shape
    elif len(shape) == 3:  # conv1d (out, in, k)
        receptive = shape[2]
        fan_out = shape[0] * receptive
        fan_in = shape[1] * receptive
    else:
        raise ValueError(f"Unsupported shape {shape}")
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def linear_params(key, in_dim: int, out_dim: int, bias: bool = True,
                  w_init_gain: str = "linear") -> dict:
    """LinearNorm params (reference layers.py:40-50)."""
    kw, kb = jax.random.split(key)
    p = {"weight": xavier_uniform(kw, (out_dim, in_dim), GAINS[w_init_gain])}
    if bias:
        bound = 1.0 / math.sqrt(in_dim)
        p["bias"] = jax.random.uniform(
            kb, (out_dim,), jnp.float32, minval=-bound, maxval=bound
        )
    return p


def linear_apply(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    out = x @ p["weight"].T
    if "bias" in p:
        out = out + p["bias"]
    return out


def conv1d_params(key, in_ch: int, out_ch: int, kernel_size: int,
                  bias: bool = True, w_init_gain: str = "linear") -> dict:
    """ConvNorm params (reference layers.py:53-71)."""
    kw, kb = jax.random.split(key)
    p = {
        "weight": xavier_uniform(
            kw, (out_ch, in_ch, kernel_size), GAINS[w_init_gain]
        )
    }
    if bias:
        bound = 1.0 / math.sqrt(in_ch * kernel_size)
        p["bias"] = jax.random.uniform(
            kb, (out_ch,), jnp.float32, minval=-bound, maxval=bound
        )
    return p


def conv1d_apply(p: dict, x: jnp.ndarray, padding: int = 0,
                 dilation: int = 1, stride: int = 1) -> jnp.ndarray:
    """(B, C_in, T) -> (B, C_out, T'), torch Conv1d semantics."""
    out = jax.lax.conv_general_dilated(
        x,
        p["weight"],
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if "bias" in p:
        out = out + p["bias"][None, :, None]
    return out


def conv_transpose1d_params(key, in_ch: int, out_ch: int, kernel_size: int,
                            bias: bool = True) -> dict:
    """torch ConvTranspose1d default init: weight (in, out, k), kaiming-style
    uniform bound 1/sqrt(out_ch * k) — torch uses fan computed on (in, out, k)
    layout where groups=1: bound = 1/sqrt(in_ch * k) for weight and bias."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_ch * kernel_size)
    p = {
        "weight": jax.random.uniform(
            kw, (in_ch, out_ch, kernel_size), jnp.float32,
            minval=-bound, maxval=bound,
        )
    }
    if bias:
        p["bias"] = jax.random.uniform(
            kb, (out_ch,), jnp.float32, minval=-bound, maxval=bound
        )
    return p


def conv_transpose1d_apply(p: dict, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """(B, C_in, T) -> (B, C_out, (T-1)*stride + k), torch semantics."""
    # torch ConvTranspose1d == gradient of conv1d: implement via
    # conv_general_dilated with lhs_dilation and flipped kernel.
    k = p["weight"].shape[2]
    out = jax.lax.conv_general_dilated(
        x,
        jnp.flip(p["weight"], 2).transpose(1, 0, 2),  # (out, in, k)
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if "bias" in p:
        out = out + p["bias"][None, :, None]
    return out


def batchnorm_params(dim: int) -> dict:
    return {
        "weight": jnp.ones((dim,), jnp.float32),
        "bias": jnp.zeros((dim,), jnp.float32),
    }


def batchnorm_state(dim: int) -> dict:
    return {
        "running_mean": jnp.zeros((dim,), jnp.float32),
        "running_var": jnp.ones((dim,), jnp.float32),
    }


def batchnorm_apply(
    p: dict,
    state: dict,
    x: jnp.ndarray,
    training: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
):
    """BatchNorm1d over (B, C, T), torch semantics.

    Returns (y, new_state).  Train mode normalizes with biased batch stats
    and updates running stats with the unbiased variance, like torch.
    """
    if training:
        # Batch statistics always in float32: under a bf16 compute policy a
        # bf16 mean/var would both degrade normalization and poison the
        # float32 running stats carried in `state`.
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=(0, 2))
        var = ((xf - mean[None, :, None]) ** 2).mean(axis=(0, 2))
        n = x.shape[0] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "running_mean": (1 - momentum) * state["running_mean"] + momentum * mean,
            "running_var": (1 - momentum) * state["running_var"] + momentum * unbiased,
        }
    else:
        mean, var = state["running_mean"], state["running_var"]
        new_state = state
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    scale = (inv * p["weight"].astype(jnp.float32))[None, :, None]
    y = (x - mean.astype(x.dtype)[None, :, None]) * scale.astype(x.dtype)
    y = y + p["bias"][None, :, None]
    return y.astype(x.dtype), new_state


def lstm_params(key, input_dim: int, hidden_dim: int) -> dict:
    """torch LSTM/LSTMCell default init: U(-1/sqrt(H), 1/sqrt(H)) everywhere.

    Gate packing along dim 0: (input, forget, cell, output) — torch order.
    """
    bound = 1.0 / math.sqrt(hidden_dim)
    ks = jax.random.split(key, 4)
    u = lambda k, shape: jax.random.uniform(
        k, shape, jnp.float32, minval=-bound, maxval=bound
    )
    return {
        "weight_ih": u(ks[0], (4 * hidden_dim, input_dim)),
        "weight_hh": u(ks[1], (4 * hidden_dim, hidden_dim)),
        "bias_ih": u(ks[2], (4 * hidden_dim,)),
        "bias_hh": u(ks[3], (4 * hidden_dim,)),
    }


def lstm_cell(p: dict, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
    """One LSTMCell step, torch gate order (i, f, g, o).  (B, ...) -> (h', c')."""
    gates = x @ p["weight_ih"].T + p["bias_ih"] + h @ p["weight_hh"].T + p["bias_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def dropout(key, x: jnp.ndarray, rate: float, enabled: bool) -> jnp.ndarray:
    """torch F.dropout semantics: scale kept units by 1/(1-rate)."""
    if not enabled or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
