"""WaveGlow normalizing-flow vocoder, pure-functional JAX.

Re-design of the reference model (src/waveglow/glow.py:62-311) for XLA/TPU:

  * The 12 flows have statically-known, heterogeneous channel counts
    (8,8,8,8,6,6,6,6,4,4,4,4 after early outputs), so the flow loop is
    unrolled at trace time — each iteration is a fused XLA region.
  * WN coupling nets: dilated convs expressed as lax.conv_general_dilated.
    The conditioning 1x1 convs depend only on the mel spectrogram, so all 8
    layer projections per flow are precomputed as one big (640 -> 8*512)
    matmul before the layer loop — a TPU-friendly re-association the
    per-frame CUDA code never does (reference glow.py:158-162 recomputes
    cond inside the loop).
  * fused_add_tanh_sigmoid_multiply (glow.py:33-40, a TorchScript kernel)
    is a plain expression here: XLA fuses it into the surrounding convs.
  * Weight normalization is explicit (g, v) parameters; `remove_weightnorm`
    folds them for inference and caches the 1x1-conv inverses
    (glow.py:89-96, 295-311).
  * Invertible1x1Conv log-determinants via jnp.linalg.slogdet.

Parameter layouts are torch-shaped (Conv1d weight (out, in, k);
ConvTranspose1d weight (in, out, k)) so reference checkpoints import by key
renaming.
"""

from __future__ import annotations

import math
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fac_via_ppg_tpu.configs.hparams import WaveGlowConfig
from fac_via_ppg_tpu.ops.initializers import (
    conv1d_apply,
    conv_transpose1d_apply,
    conv_transpose1d_params,
)


# ==========================================================================
# helpers
# ==========================================================================

def flow_channels(cfg: WaveGlowConfig) -> List[int]:
    """Audio channels entering each flow (reference glow.py:199-206)."""
    chans = []
    remaining = cfg.n_group
    for k in range(cfg.n_flows):
        if k % cfg.n_early_every == 0 and k > 0:
            remaining -= cfg.n_early_size
        chans.append(remaining)
    return chans


def _torch_conv1d_params(key, in_ch, out_ch, kernel_size):
    """torch Conv1d default (kaiming_uniform a=sqrt(5)) init."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_ch * kernel_size)
    return {
        "weight": jax.random.uniform(
            kw, (out_ch, in_ch, kernel_size), jnp.float32, -bound, bound
        ),
        "bias": jax.random.uniform(
            kb, (out_ch,), jnp.float32, -bound, bound
        ),
    }


def _weight_norm_init(p: dict) -> dict:
    """Split a conv weight into weight-norm (g, v) like torch.nn.utils.
    weight_norm(dim=0): g = ||w|| per output channel, v = w."""
    w = p["weight"]
    g = jnp.sqrt(jnp.sum(w**2, axis=(1, 2)))
    return {"g": g, "v": w, "bias": p["bias"]}


def _weight_norm_fold(p: dict) -> dict:
    v = p["v"]
    # Norm in float32: a bf16 sum-of-squares over C*k elements distorts the
    # reparameterized weight under a bf16 compute policy.
    vf = v.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(vf**2, axis=(1, 2), keepdims=True))
    w = p["g"].astype(jnp.float32)[:, None, None] * vf / norm
    return {"weight": w.astype(v.dtype), "bias": p["bias"]}


def _wn_conv_apply(p: dict, x, padding=0, dilation=1):
    if "v" in p:
        p = _weight_norm_fold(p)
    return conv1d_apply(p, x, padding=padding, dilation=dilation)


# ==========================================================================
# init
# ==========================================================================

def init_waveglow(key, cfg: WaveGlowConfig):
    """Returns the params pytree (train form, with weight-norm (g, v))."""
    keys = iter(jax.random.split(key, 4 + cfg.n_flows * (4 + 3 * cfg.wn_n_layers)))
    nk = lambda: next(keys)
    n_mel_grouped = cfg.n_mel_channels * cfg.n_group
    C = cfg.wn_n_channels

    params = {
        "upsample": conv_transpose1d_params(
            nk(), cfg.n_mel_channels, cfg.n_mel_channels,
            cfg.upsample_kernel_size,
        ),
        "convinv": [],
        "wn": [],
    }

    for k, audio_ch in enumerate(flow_channels(cfg)):
        # Invertible 1x1: random orthonormal with det +1 (glow.py:73-80).
        w, _ = jnp.linalg.qr(jax.random.normal(nk(), (audio_ch, audio_ch)))
        w = jnp.where(jnp.linalg.det(w) < 0, w.at[:, 0].mul(-1.0), w)
        params["convinv"].append({"weight": w.astype(jnp.float32)})

        n_half = audio_ch // 2
        wn = {
            "start": _weight_norm_init(_torch_conv1d_params(nk(), n_half, C, 1)),
            "end": {  # zero init: couplings start as identity (glow.py:127-131)
                "weight": jnp.zeros((2 * n_half, C, 1), jnp.float32),
                "bias": jnp.zeros((2 * n_half,), jnp.float32),
            },
            "in_layers": [],
            "cond_layers": [],
            "res_skip_layers": [],
        }
        for i in range(cfg.wn_n_layers):
            wn["in_layers"].append(
                _weight_norm_init(
                    _torch_conv1d_params(nk(), C, 2 * C, cfg.wn_kernel_size)
                )
            )
            wn["cond_layers"].append(
                _weight_norm_init(_torch_conv1d_params(nk(), n_mel_grouped, 2 * C, 1))
            )
            res_skip_ch = 2 * C if i < cfg.wn_n_layers - 1 else C
            wn["res_skip_layers"].append(
                _weight_norm_init(_torch_conv1d_params(nk(), C, res_skip_ch, 1))
            )
        params["wn"].append(wn)
    return params


# ==========================================================================
# upsampler
# ==========================================================================

def _upsample_phases(p: dict, spect: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Core of the phase-decomposed transpose conv: (B, C_in, F) ->
    (B, F, hop, C_out) f32-accumulated phases (see upsample_phase_matmul)."""
    weight = p["weight"]  # (C_in, C_out, K) torch layout
    c_in, c_out, k = weight.shape
    j_taps = -(-k // hop)  # ceil
    # (J, hop, C_in, C_out), zero beyond kernel length
    w = jnp.zeros((j_taps * hop, c_in, c_out), weight.dtype)
    w = w.at[:k].set(weight.transpose(2, 0, 1))
    w = w.reshape(j_taps, hop, c_in, c_out)
    # (J*C_in, hop*C_out)
    w_mat = w.transpose(0, 2, 1, 3).reshape(j_taps * c_in, hop * c_out)

    B, _, F = spect.shape
    x = spect.transpose(0, 2, 1)  # (B, F, C_in)
    x_pad = jnp.pad(x, ((0, 0), (j_taps - 1, 0), (0, 0)))
    # stacked shifts: x_shift[:, q, j, :] = x[q - j]
    shifts = [x_pad[:, j_taps - 1 - j : j_taps - 1 - j + F]
              for j in range(j_taps)]
    x_cat = jnp.concatenate(shifts, axis=-1)  # (B, F, J*C_in)

    out = jnp.dot(x_cat, w_mat, preferred_element_type=jnp.float32)
    out = out.reshape(B, F, hop, c_out)
    if "bias" in p:
        out = out + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)  # fp32 accumulation, compute-dtype output


def upsample_grouped(p: dict, spect: jnp.ndarray, hop: int, n_group: int,
                     t_samples: int = None) -> jnp.ndarray:
    """upsample_phase_matmul + group_spect fused at the layout level.

    The phase matmul's natural (B, F, hop, C) output goes straight into
    the grouped (B, C*n_group, G) layout with ONE transpose, never
    materializing the intermediate (B, C, F*hop) that group_spect would
    immediately re-shuffle — the round-4 training trace attributes
    ~13 ms/call of the WaveGlow step to exactly this group/ungroup copy
    family (docs/PERF.md training roofline).  Output sample
    t = f*hop + q*n_group + n lands at grouped[b, m*n_group + n,
    f*(hop/n_group) + q] — identical values to
    group_spect(upsample_phase_matmul(...)[:, :, :t_samples], n_group).

    Requires hop % n_group == 0 (callers fall back to the two-step path
    otherwise); a t_samples that isn't a multiple of n_group truncates
    to the last whole group, exactly like group_spect.
    """
    if hop % n_group:
        raise ValueError(f"hop {hop} not a multiple of n_group {n_group}")
    out = _upsample_phases(p, spect, hop)        # (B, F, hop, C)
    B, F, _, C = out.shape
    q = hop // n_group
    x = out.reshape(B, F, q, n_group, C)
    x = x.transpose(0, 4, 3, 1, 2)               # (B, C, n_group, F, q)
    x = x.reshape(B, C * n_group, F * q)
    if t_samples is not None:
        x = x[:, :, : t_samples // n_group]
    return x


def upsample_phase_matmul(p: dict, spect: jnp.ndarray, hop: int) -> jnp.ndarray:
    """ConvTranspose1d(k=1024, stride=hop) as one phase-decomposed matmul.

    A transpose conv expressed via lhs_dilation makes XLA slide the dense
    1024-tap kernel over a 160x zero-dilated input — three orders of
    magnitude of wasted MACs (measured 886 ms of a 1050 ms inference call).
    Subpixel decomposition writes output sample t = q*hop + p as

        out[b, q*hop + p, o] = sum_{j, i} spect[b, q - j, i] * W[i, o, j*hop + p]

    i.e. ONE (B, F, J*C_in) @ (J*C_in, hop*C_out) MXU matmul, where
    J = ceil(k / hop) shifted copies of the mel frames.  Covers output
    samples [0, F*hop) — exactly what both the training path (sliced to
    audio length <= F*hop) and the inference path (artifact cutoff k - hop)
    consume.

    Returns (B, C_out, F*hop).
    """
    out = _upsample_phases(p, spect, hop)  # (B, F, hop, C_out)
    B, F, _, c_out = out.shape
    return out.reshape(B, F * hop, c_out).transpose(0, 2, 1)


# ==========================================================================
# WN coupling network
# ==========================================================================

def quantize_per_tensor_int8(x: jnp.ndarray):
    """Dynamic symmetric per-tensor int8: (q, scale) with x ~= q * scale."""
    scale = jnp.maximum(
        jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-8
    ) / 127.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int8)
    return q, scale


def quantize_per_column_int8(x: jnp.ndarray):
    """Dynamic symmetric int8 per (batch, position) column of a (B, C, G)
    activation: (q, scale (B, G)) with x[b, :, g] ~= q[b, :, g] * s[b, g].

    For a matmul that contracts the C axis the column scale sits OUTSIDE
    the int32 accumulation, so dequantization stays exact while the
    quantization step adapts to each position's local amplitude — quiet
    spectrogram regions keep ~42 dB of quantization SNR instead of
    inheriting the loudest frame's step size (per-tensor scaling)."""
    scale = jnp.maximum(
        jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1), 1e-8
    ) / 127.0                                            # (B, G)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[:, None, :]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def pack_waveglow_int8cond(cfg: WaveGlowConfig, params: dict) -> list:
    """Per-flow int8 packing of the stacked cond matmul (per-OUT-CHANNEL
    symmetric weight scales).  Precompute ONCE outside jit; feed to
    waveglow_infer(cond_impl='int8', packed_cond=...).

    Rationale (docs/PERF.md per-kernel breakdown): the 12 stacked cond
    matmuls are the only FLOP-bound kernels of the inference program
    (96.7% of bf16 MXU peak, 38% of all FLOPs); the v5e MXU runs int8 at
    2x the bf16 rate, so quantizing exactly this matmul buys throughput
    where no scheduling win remains.  Opt-in: it is a lossy change —
    measure SNR before serving with it.
    """
    fold = lambda p: _weight_norm_fold(p) if "v" in p else p  # noqa: E731
    packed = []
    for wn in params["wn"]:
        cond = [fold(p) for p in wn["cond_layers"]]
        w = jnp.concatenate(
            [p["weight"] for p in cond], axis=0
        )[:, :, 0].astype(jnp.float32)                     # (L*2C, 640)
        b = jnp.concatenate([p["bias"] for p in cond], axis=0)
        w_scale = jnp.maximum(
            jnp.max(jnp.abs(w), axis=1), 1e-8
        ) / 127.0                                           # (L*2C,)
        wq = jnp.clip(
            jnp.round(w / w_scale[:, None]), -127, 127
        ).astype(jnp.int8)
        packed.append({"wq": wq, "w_scale": w_scale,
                       "bias": b.astype(jnp.float32)})
    return packed


def pack_waveglow_wn_int8(cfg: WaveGlowConfig, params: dict) -> list:
    """Per-flow int8 packing of the WN in_layer dilated convs (per-OUT-
    CHANNEL symmetric weight scales shared across the 3 taps).  Precompute
    ONCE outside jit; feed to waveglow_infer(wn_int8_flows=n,
    packed_wn_int8=...).

    This is the round-4 verdict's "next quantization rung": the 96 dilated
    in_convs are the largest kernel family of the inference program
    (297.9 ms of 647 ms, docs/PERF.md per-kernel breakdown) and the
    program is HBM-saturated — int8 halves both their MXU time and the
    hidden-state read bytes.  Unlike the cond matmul (whose input is
    constant across flows), the in_conv consumes the flow's own hidden
    state, so the error feeds back through the remaining couplings —
    quantize a flow SUFFIX (the narrow, late-in-inference flows k <
    wn_int8_flows) and measure the SNR-vs-flows-quantized ladder before
    serving with it.  Reference hot loop: glow.py:133-152.
    """
    fold = lambda p: _weight_norm_fold(p) if "v" in p else p  # noqa: E731
    packed = []
    for wn in params["wn"]:
        layers = []
        for p, rs in zip(wn["in_layers"], wn["res_skip_layers"]):
            p = fold(p)
            w = p["weight"].astype(jnp.float32)            # (2C, C, 3)
            w_scale = jnp.maximum(
                jnp.max(jnp.abs(w), axis=(1, 2)), 1e-8
            ) / 127.0                                       # (2C,)
            wq = jnp.clip(
                jnp.round(w / w_scale[:, None, None]), -127, 127
            ).astype(jnp.int8)
            # stacked form for the per-tensor-quant variant: tap-major
            # (2C, 3C) so ONE int8 matmul covers all taps
            wq_stacked = wq.transpose(0, 2, 1).reshape(wq.shape[0], -1)
            # res_skip 1x1 conv (per-out-channel int8): its input is the
            # gate output tanh*sigmoid in (-1, 1), so the activation
            # quantizes with the STATIC scale 1/127 — no dynamic max, no
            # taps, one int32 accumulator (_rs_conv_int8)
            rs = fold(rs)
            rw = rs["weight"][:, :, 0].astype(jnp.float32)  # (2C|C, C)
            rs_scale = jnp.maximum(
                jnp.max(jnp.abs(rw), axis=1), 1e-8
            ) / 127.0
            rs_q = jnp.clip(
                jnp.round(rw / rs_scale[:, None]), -127, 127
            ).astype(jnp.int8)
            layers.append({
                "wq": wq.transpose(2, 0, 1),                # (3, 2C, C)
                "wq_stacked": wq_stacked,                   # (2C, 3*C)
                "w_scale": w_scale,
                "bias": p["bias"].astype(jnp.float32),
                "rs_wq": rs_q,
                "rs_w_scale": rs_scale,
                "rs_bias": rs["bias"].astype(jnp.float32),
            })
        packed.append(layers)
    return packed


def _rs_conv_int8(pk: dict, acts: jnp.ndarray) -> jnp.ndarray:
    """The WN res_skip 1x1 conv on the int8 MXU with a STATIC activation
    scale: the gate output tanh(.)*sigmoid(.) lies strictly in (-1, 1),
    so round(acts * 127) is an exact-dequant int8 code with no dynamic
    reduction — the quantize fuses into the gate epilogue, the read
    bytes halve, and the matmul runs at the 2x int8 rate with one int32
    accumulator (no taps, no partials — the structural costs that sank
    the in_conv rung don't exist here)."""
    aq = jnp.clip(
        jnp.round(acts.astype(jnp.float32) * 127.0), -127, 127
    ).astype(jnp.int8)
    acc = jnp.einsum(
        "oc,bcg->bog", pk["rs_wq"], aq, preferred_element_type=jnp.int32,
    )
    out = (
        acc.astype(jnp.float32) * (pk["rs_w_scale"] / 127.0)[None, :, None]
        + pk["rs_bias"][None, :, None]
    )
    return out.astype(acts.dtype)


def _in_conv_int8(pk: dict, x: jnp.ndarray, dilation: int,
                  quant: str = "column") -> jnp.ndarray:
    """The WN in_layer dilated conv on the int8 MXU.

    The k=3 conv is decomposed into its 3 taps — out[t] = sum_j
    W[:, :, j] @ x[t + (j-1)*d].  Tap shifts use zero padding, matching
    the XLA conv's sequence-edge semantics exactly.  Two quantization
    variants (both measured in docs/PERF.md):

    quant='column': each tap is its own channel contraction so the
    PER-COLUMN activation scale (exact, locally adaptive:
    quantize_per_column_int8) sits outside its int32 accumulator; the
    three int32 partials dequantize through (x_scale[shifted column] *
    w_scale[out]) and sum in f32.  Quality-safest, but the partials cost
    traffic.

    quant='tensor': ONE stacked (2C, 3C) @ (3C, G) int8 matmul over the
    tap-concatenated activations with a single PER-TENSOR activation
    scale — exact dequant with one int32 accumulator and no partials.
    """
    G = x.shape[-1]

    def shift3(t, pad_spec_fn):
        outs = []
        for j in range(3):
            s = (j - 1) * dilation
            if s < 0:
                outs.append(pad_spec_fn(t, (-s, 0))[..., :G])
            elif s > 0:
                outs.append(pad_spec_fn(t, (0, s))[..., s:])
            else:
                outs.append(t)
        return outs

    if quant == "tensor":
        xq, xs = quantize_per_tensor_int8(x)
        xq_cat = jnp.concatenate(
            shift3(xq, lambda t, p: jnp.pad(t, ((0, 0), (0, 0), p))),
            axis=1,
        )                                                   # (B, 3C, G)
        acc = jnp.einsum(
            "oc,bcg->bog", pk["wq_stacked"], xq_cat,
            preferred_element_type=jnp.int32,
        )
        out = (
            acc.astype(jnp.float32)
            * (xs * pk["w_scale"])[None, :, None]
            + pk["bias"][None, :, None]
        )
        return out.astype(x.dtype)

    xq, xs = quantize_per_column_int8(x)                    # int8, (B, G)
    xq_shifts = shift3(xq, lambda t, p: jnp.pad(t, ((0, 0), (0, 0), p)))
    xs_shifts = shift3(xs, lambda t, p: jnp.pad(t, ((0, 0), p)))
    acc = None
    for j in range(3):
        part = jnp.einsum(
            "oc,bcg->bog", pk["wq"][j], xq_shifts[j],
            preferred_element_type=jnp.int32,
        )
        term = part.astype(jnp.float32) * xs_shifts[j][:, None, :]
        acc = term if acc is None else acc + term
    out = acc * pk["w_scale"][None, :, None] + pk["bias"][None, :, None]
    return out.astype(x.dtype)


def _cond_all(cfg: WaveGlowConfig, wn: dict, spect_grouped: jnp.ndarray,
              cond_int8, out_dtype) -> jnp.ndarray:
    """All wn_n_layers cond projections as ONE stacked (B, L*2C, G) matmul
    over the grouped spect (dense or int8 MXU) — spect is constant across
    the layer loop, so this hoists the reference's per-layer cond conv
    (glow.py:158-162) out of it."""
    if cond_int8 is not None:
        sq, s_scale, pk = cond_int8
        acc = jnp.einsum(
            "oc,bcg->bog", pk["wq"], sq,
            preferred_element_type=jnp.int32,
        )
        # s_scale: scalar (per-tensor) or (B, G) (per-column); either way
        # it sits outside the contracted axis so dequant is exact.
        s_bcast = (s_scale if jnp.ndim(s_scale) == 0
                   else s_scale[:, None, :])
        return (
            acc.astype(jnp.float32)
            * s_bcast * pk["w_scale"][None, :, None]
            + pk["bias"][None, :, None]
        ).astype(out_dtype)
    # Stack cond layers: (L*2C, 640, 1) applied once -> split per layer.
    cond_w = jnp.concatenate(
        [_weight_norm_fold(p)["weight"] if "v" in p else p["weight"]
         for p in wn["cond_layers"]], axis=0,
    )
    cond_b = jnp.concatenate(
        [p["bias"] for p in wn["cond_layers"]], axis=0
    )
    return conv1d_apply({"weight": cond_w, "bias": cond_b}, spect_grouped)


def wn_apply(cfg: WaveGlowConfig, wn: dict, audio_half: jnp.ndarray,
             spect_grouped: jnp.ndarray, cond_int8=None,
             in_int8=None, in_int8_quant: str = "column",
             rs_int8=None) -> jnp.ndarray:
    """(B, n_half, T) x (B, 640, T) -> (B, 2*n_half, T) coupling output.

    All cond-layer projections are computed in one stacked matmul up front —
    spect is constant across the layer loop.

    `cond_int8 = (spect_q int8, spect_scale, flow_pack)` replaces that
    dense matmul with the int8 MXU version (pack_waveglow_int8cond); the
    int32 accumulator dequantizes through scale_x * scale_w[out] straight
    into the compute dtype.

    `in_int8` (this flow's pack_waveglow_wn_int8 entry; k=3 convs only)
    runs the dilated in_layer convs on the int8 MXU via the tap
    decomposition (_in_conv_int8) — the experimental WN activation
    quantization rung; measure the SNR ladder before serving with it.
    """
    C = cfg.wn_n_channels
    audio = _wn_conv_apply(wn["start"], audio_half)
    cond_all = _cond_all(cfg, wn, spect_grouped, cond_int8, audio.dtype)
    cond_per_layer = jnp.split(cond_all, cfg.wn_n_layers, axis=1)

    output = None
    for i in range(cfg.wn_n_layers):
        dilation = 2**i
        pad = (cfg.wn_kernel_size * dilation - dilation) // 2
        if in_int8 is not None and cfg.wn_kernel_size == 3:
            in_act = _in_conv_int8(
                in_int8[i], audio, dilation, quant=in_int8_quant
            ) + cond_per_layer[i]
        else:
            in_act = _wn_conv_apply(
                wn["in_layers"][i], audio, padding=pad, dilation=dilation
            ) + cond_per_layer[i]
        # fused add-tanh-sigmoid-multiply (glow.py:33-40) — XLA fuses this.
        t_act = jnp.tanh(in_act[:, :C])
        s_act = jax.nn.sigmoid(in_act[:, C:])
        acts = t_act * s_act

        if rs_int8 is not None:
            res_skip = _rs_conv_int8(rs_int8[i], acts)
        else:
            res_skip = _wn_conv_apply(wn["res_skip_layers"][i], acts)
        if i < cfg.wn_n_layers - 1:
            audio = audio + res_skip[:, :C]
            skip = res_skip[:, C:]
        else:
            skip = res_skip
        output = skip if output is None else output + skip
    return _wn_conv_apply(wn["end"], output)


# --------------------------------------------------------------------------
# Pallas WN path (ops/wn_pallas.py): whole layer fused in VMEM per tile
# --------------------------------------------------------------------------

def pack_wn_pallas(cfg: WaveGlowConfig, wn: dict) -> dict:
    """One flow's WN params -> channels-last packed form for the Pallas
    kernel: 1x1 convs become (in, out) matmul weights, the dilated k=3
    convs become the stacked (3C, 2C) tap matrix."""
    from fac_via_ppg_tpu.ops.wn_pallas import pack_in_weight

    fold = lambda p: _weight_norm_fold(p) if "v" in p else p  # noqa: E731
    start = fold(wn["start"])
    cond = [fold(p) for p in wn["cond_layers"]]
    return {
        "start_w": start["weight"][:, :, 0].T,
        "start_b": start["bias"],
        "cond_w": jnp.concatenate(
            [p["weight"] for p in cond], axis=0
        )[:, :, 0].T,
        "cond_b": jnp.concatenate([p["bias"] for p in cond], axis=0),
        "in_w": [pack_in_weight(fold(p)["weight"]) for p in wn["in_layers"]],
        "in_b": [fold(p)["bias"] for p in wn["in_layers"]],
        "rs_w": [fold(p)["weight"][:, :, 0].T
                 for p in wn["res_skip_layers"]],
        "rs_b": [fold(p)["bias"] for p in wn["res_skip_layers"]],
        "end_w": wn["end"]["weight"][:, :, 0].T,
        "end_b": wn["end"]["bias"],
    }


def pack_waveglow_pallas(cfg: WaveGlowConfig, params: dict) -> list:
    """Precompute every flow's packed Pallas form ONCE (outside jit) —
    packing inside the jitted inference would re-fold/transpose the whole
    WN weight stack on every call."""
    return [pack_wn_pallas(cfg, wn) for wn in params["wn"]]


def wn_apply_pallas(cfg: WaveGlowConfig, packed: dict,
                    audio_half: jnp.ndarray, spect_grouped: jnp.ndarray,
                    tile_t: int = 512, interpret: bool = False) -> jnp.ndarray:
    """`wn_apply` on the fused Pallas layer kernel (channels-last).

    Numerically equivalent to `wn_apply`: time is padded to a tile
    multiple and re-zeroed after every layer so each dilated conv sees the
    same zero padding the XLA conv path applies.  Layers whose dilation is
    below the sublane size fall back to the XLA formulation inside
    wn_layer_pallas.
    """
    from fac_via_ppg_tpu.ops.wn_pallas import wn_layer_pallas

    C = cfg.wn_n_channels
    B, n_half, T = audio_half.shape
    dt = audio_half.dtype

    x_cl = audio_half.transpose(0, 2, 1)
    x = (
        jnp.dot(x_cl, packed["start_w"], preferred_element_type=jnp.float32)
        + packed["start_b"]
    ).astype(dt)
    cond_all = (
        jnp.dot(spect_grouped.transpose(0, 2, 1), packed["cond_w"],
                preferred_element_type=jnp.float32)
        + packed["cond_b"]
    ).astype(dt)

    t_pad = -(-T // tile_t) * tile_t
    if t_pad != T:
        # pad rows would hold the start-conv bias, not the zeros the XLA
        # conv padding implies — zero them now and after every layer.
        x = jnp.pad(x, ((0, 0), (0, t_pad - T), (0, 0)))
        cond_all = jnp.pad(cond_all, ((0, 0), (0, t_pad - T), (0, 0)))
        mask = (jnp.arange(t_pad) < T)[None, :, None].astype(dt)
        x = x * mask
    skip_sum = None
    for i in range(cfg.wn_n_layers):
        x, skip = wn_layer_pallas(
            x, cond_all[:, :, 2 * C * i : 2 * C * (i + 1)],
            packed["in_w"][i], packed["in_b"][i],
            packed["rs_w"][i], packed["rs_b"][i],
            dilation=2 ** i, last=(i == cfg.wn_n_layers - 1),
            tile_t=tile_t, interpret=interpret,
        )
        if t_pad != T:
            x = x * mask  # keep the XLA path's per-layer zero padding
        skip_sum = skip if skip_sum is None else skip_sum + skip
    out = (
        jnp.dot(skip_sum, packed["end_w"],
                preferred_element_type=jnp.float32)
        + packed["end_b"]
    ).astype(dt)
    return out[:, :T].transpose(0, 2, 1)


# --------------------------------------------------------------------------
# Cross-layer Pallas flow kernel path (ops/wn_flow_pallas.py): the whole
# 8-layer WN residual chain in VMEM per time-tile
# --------------------------------------------------------------------------

def pack_waveglow_flow(cfg: WaveGlowConfig, params: dict,
                       dtype=None) -> list:
    """Precompute every flow's packed kernel weights ONCE (outside jit).
    `dtype` casts the matmul weights (e.g. bf16 serving); biases stay
    f32 (they add into the kernel's f32 accumulators)."""
    from fac_via_ppg_tpu.ops.wn_flow_pallas import cast_pack, pack_wn_flow

    fold = lambda p: _weight_norm_fold(p) if "v" in p else p  # noqa: E731
    packs = []
    for wn in params["wn"]:
        folded = {
            "start": fold(wn["start"]),
            "end": wn["end"],
            "in_layers": [fold(p) for p in wn["in_layers"]],
            "res_skip_layers": [fold(p) for p in wn["res_skip_layers"]],
        }
        pk = pack_wn_flow(folded, cfg.wn_n_layers)
        packs.append(pk if dtype is None else cast_pack(pk, dtype))
    return packs


def wn_apply_flow(cfg: WaveGlowConfig, wn: dict, flow_pack: dict,
                  audio_half: jnp.ndarray, spect_g_padded: jnp.ndarray,
                  t_valid: int, cond_int8=None, tile: int = 4096,
                  interpret: bool = False) -> jnp.ndarray:
    """`wn_apply` on the cross-layer Pallas kernel.

    `spect_g_padded` is the grouped spect in padded time coordinates
    (pad_time_for_flow over t_pad/halo from flow_buf_geometry) — shared
    across all 12 flows; the cond projection runs over it (dense or int8)
    so the kernel's conditioning windows line up without re-padding the
    (much larger) cond tensor."""
    from fac_via_ppg_tpu.ops.wn_flow_pallas import wn_flow_pallas

    n_half = audio_half.shape[1]
    cond_padded = _cond_all(
        cfg, wn, spect_g_padded, cond_int8, audio_half.dtype
    )
    out = wn_flow_pallas(
        flow_pack, audio_half, cond_padded, cfg.wn_n_layers, t_valid,
        tile=tile, interpret=interpret,
    )
    return out[:, : 2 * n_half, :t_valid]


# ==========================================================================
# grouping
# ==========================================================================

def group_spect(spect_up: jnp.ndarray, n_group: int) -> jnp.ndarray:
    """(B, M, T_samp) -> (B, M*n_group, T_samp/n_group), mel-major per group
    (reference glow.py:221-222 unfold/permute/view)."""
    B, M, T = spect_up.shape
    G = T // n_group
    x = spect_up[:, :, : G * n_group].reshape(B, M, G, n_group)
    return x.transpose(0, 2, 1, 3).reshape(B, G, M * n_group).transpose(0, 2, 1)


def group_audio(audio: jnp.ndarray, n_group: int) -> jnp.ndarray:
    """(B, T) -> (B, n_group, T/n_group) (reference glow.py:224)."""
    B, T = audio.shape
    G = T // n_group
    return audio[:, : G * n_group].reshape(B, G, n_group).transpose(0, 2, 1)


def ungroup_audio(audio: jnp.ndarray) -> jnp.ndarray:
    """(B, n_group, G) -> (B, T) (reference glow.py:292)."""
    return audio.transpose(0, 2, 1).reshape(audio.shape[0], -1)


# ==========================================================================
# forward (training)
# ==========================================================================

def waveglow_forward(cfg: WaveGlowConfig, params, spect: jnp.ndarray,
                     audio: jnp.ndarray, remat: bool = False,
                     grouped_upsample: bool = False):
    """((B, 80, F) mel, (B, T) audio) -> (z, log_s_list, log_det_w_list).

    `remat=True` wraps each flow in `jax.checkpoint`: the backward pass
    recomputes the flow's WN internals instead of keeping ~8 layers x
    n_flows of (B, C, G) activations live — activation memory drops by
    ~the WN depth for ~1/3 extra backward FLOPs, unlocking training
    batches that otherwise exceed HBM (docs/PERF.md).  Numerically it
    replays the identical ops, so the loss/grads match the unremat step.

    `grouped_upsample=True` (hop % n_group == 0 only) emits the grouped
    spect straight from the upsampler's phase layout (upsample_grouped),
    skipping the (B, 80, T_samp) intermediate — the layout experiment for
    the train step's ~13 ms group/ungroup copy family (docs/PERF.md
    round-4 training roofline); identical values either way.
    """
    T = audio.shape[1]
    if grouped_upsample:
        spect_g = upsample_grouped(
            params["upsample"], spect, cfg.hop_length, cfg.n_group,
            t_samples=(T // cfg.n_group) * cfg.n_group,
        )
    else:
        spect_up = upsample_phase_matmul(
            params["upsample"], spect, cfg.hop_length
        )
        spect_g = group_spect(spect_up[:, :, :T], cfg.n_group)
    audio_g = group_audio(audio, cfg.n_group)
    B, _, G = audio_g.shape

    output_chunks = []
    log_s_list = []
    log_det_list = []
    for k, audio_ch in enumerate(flow_channels(cfg)):
        if k % cfg.n_early_every == 0 and k > 0:
            output_chunks.append(audio_g[:, : cfg.n_early_size])
            audio_g = audio_g[:, cfg.n_early_size :]

        def flow_body(flow_params, audio_g, spect_g,
                      n_half=audio_ch // 2):
            w = flow_params["convinv"]["weight"]
            # slogdet stays float32 even under a bf16 compute policy —
            # the log-determinant enters the loss directly and an 8x8
            # determinant in bf16 is garbage.
            _, logdet = jnp.linalg.slogdet(w.astype(jnp.float32))
            audio_mixed = jnp.einsum(
                "oc,bct->bot", w, audio_g,
                preferred_element_type=jnp.float32,
            ).astype(audio_g.dtype)

            audio_0 = audio_mixed[:, :n_half]
            audio_1 = audio_mixed[:, n_half:]
            wn_out = wn_apply(cfg, flow_params["wn"], audio_0, spect_g)
            log_s = wn_out[:, n_half:]
            b = wn_out[:, :n_half]
            audio_1 = jnp.exp(log_s) * audio_1 + b
            return (
                jnp.concatenate([audio_0, audio_1], axis=1), log_s, logdet
            )

        if remat:
            flow_body = jax.checkpoint(flow_body)
        flow_params = {"convinv": params["convinv"][k], "wn": params["wn"][k]}
        audio_g, log_s, logdet = flow_body(flow_params, audio_g, spect_g)
        log_det_list.append(B * G * logdet)
        log_s_list.append(log_s)

    output_chunks.append(audio_g)
    z = jnp.concatenate(output_chunks, axis=1)
    return z, log_s_list, log_det_list


# ==========================================================================
# inference
# ==========================================================================

def remove_weightnorm(params):
    """Fold (g, v) -> weight and cache 1x1 inverses (glow.py:89-96, 295-311)."""

    def fold_list(lst):
        return [_weight_norm_fold(p) if "v" in p else p for p in lst]

    out = {
        "upsample": params["upsample"],
        "convinv": [
            {
                "weight": p["weight"],
                "weight_inverse": jnp.linalg.inv(p["weight"]),
            }
            for p in params["convinv"]
        ],
        "wn": [],
    }
    for wn in params["wn"]:
        out["wn"].append(
            {
                "start": _weight_norm_fold(wn["start"]) if "v" in wn["start"] else wn["start"],
                "end": wn["end"],
                "in_layers": fold_list(wn["in_layers"]),
                "cond_layers": fold_list(wn["cond_layers"]),
                "res_skip_layers": fold_list(wn["res_skip_layers"]),
            }
        )
    return out


def cast_params(params, dtype):
    """Cast floating-point leaves (e.g. to bf16 for inference serving)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )


def waveglow_infer(cfg: WaveGlowConfig, params, spect: jnp.ndarray,
                   sigma: float, key, dtype=None, noise=None,
                   wn_impl: str = "xla", packed_wn=None,
                   cond_impl: str = "dense",
                   packed_cond=None,
                   cond_quant: str = "column",
                   wn_int8_flows: int = 0,
                   packed_wn_int8=None,
                   wn_int8_quant: str = "column",
                   wn_int8_rs_flows: int = 0,
                   grouped_upsample: bool = False,
                   flow_tile: int = 4096) -> jnp.ndarray:
    """(B, 80, F) mel -> (B, T) audio (reference glow.py:252-293).

    `params` should be the remove_weightnorm form; the train form also works
    (inverses computed on the fly).

    `dtype=jnp.bfloat16` runs the flows in bf16 with fp32 matmul
    accumulation — the TPU analogue of the reference's fp16 inference mode
    (inference.py:38-41, which likewise keeps the 1x1 inverses in fp32).
    Default (None) is full float32.

    `noise` optionally injects the unit-variance gaussian draws instead of
    sampling from `key`: a sequence in the reference's draw order — first
    the (B, n_remaining, G) seed (glow.py:261-268), then one
    (B, n_early_size, G) chunk per early output, visited k descending
    (glow.py:284-289).  Each is scaled by `sigma` here.  This is the hook
    that lets parity tests feed the exact z the reference torch model drew.

    `wn_impl` selects the coupling-network implementation: 'xla' (default,
    conv formulation), 'flow' (cross-layer Pallas kernel — the whole WN
    residual chain in VMEM per time-tile, ops/wn_flow_pallas.py; one
    Mosaic compile serves all flows; `flow_tile` sets the time tile),
    'pallas' (the round-2 per-layer VMEM kernel, ops/wn_pallas.py —
    budget the one-off Mosaic compile per dilation variant), or
    'flow_interpret' / 'pallas_interpret' (kernel semantics on the CPU
    interpreter, tests).

    `cond_impl='int8'` (xla path only) runs the stacked cond matmuls on
    the int8 MXU: the grouped spect quantizes ONCE per call (dynamic,
    per (batch, position) column), weights per-out-channel (pass `packed_cond` from
    pack_waveglow_int8cond to keep the weight quantization out of the
    per-call path).  Lossy — opt in only with a measured SNR budget
    (docs/PERF.md).

    `wn_int8_flows=n` (xla path, kernel_size 3 only) additionally runs
    the WN in_layer dilated convs of the n NARROWEST flows (k < n, the
    late-in-inference suffix) on the int8 MXU via the tap decomposition
    (_in_conv_int8; pass `packed_wn_int8` from pack_waveglow_wn_int8).
    Experimental quantization rung — unlike the cond matmul this error
    feeds back through the remaining couplings; measure the SNR ladder
    (eval/int8_snr.run_ladder include_wn_int8) before serving with it.
    """
    if dtype is not None:
        # 1x1 inverses stay fp32 like the reference's is_fp16 path.
        inv = [p.get("weight_inverse") for p in params["convinv"]]
        params = cast_params(params, dtype)
        for p, w in zip(params["convinv"], inv):
            if w is not None:
                p["weight_inverse"] = w
        spect = spect.astype(dtype)
    # Phase-decomposed transpose conv already yields exactly F*hop samples,
    # i.e. the reference's artifact cutoff (k - hop) is built in
    # (glow.py:254-256).  grouped_upsample: see waveglow_forward.
    if grouped_upsample:
        spect_g = upsample_grouped(
            params["upsample"], spect, cfg.hop_length, cfg.n_group
        )
    else:
        spect_up = upsample_phase_matmul(
            params["upsample"], spect, cfg.hop_length
        )
        spect_g = group_spect(spect_up, cfg.n_group)
    B, _, G = spect_g.shape

    chans = flow_channels(cfg)
    n_remaining = chans[-1]
    noise_iter = iter(noise) if noise is not None else None

    def draw(shape):
        nonlocal key
        if noise_iter is not None:
            return jnp.asarray(next(noise_iter), jnp.float32)
        key, sub = jax.random.split(key)
        # Noise is always drawn in fp32 so that a given key produces the
        # same z regardless of compute dtype, then cast.
        return jax.random.normal(sub, shape, jnp.float32)

    audio = (sigma * draw((B, n_remaining, G))).astype(spect_g.dtype)

    if wn_impl not in ("xla", "flow", "flow_interpret", "pallas",
                       "pallas_interpret"):
        raise ValueError(f"unknown wn_impl {wn_impl!r}")
    if cond_impl not in ("dense", "int8"):
        raise ValueError(f"unknown cond_impl {cond_impl!r}")
    is_flow = wn_impl in ("flow", "flow_interpret")
    packed = None
    if wn_impl in ("pallas", "pallas_interpret"):
        if cond_impl != "dense":
            raise ValueError("cond_impl='int8' requires wn_impl xla/flow")
        # prefer a caller-precomputed pack (pack_waveglow_pallas) so the
        # fold/transpose work stays out of the per-call path
        packed = packed_wn or pack_waveglow_pallas(cfg, params)
    flow_packs = spect_g_pad = None
    t_valid = G
    if is_flow:
        from fac_via_ppg_tpu.ops.wn_flow_pallas import (
            flow_buf_geometry,
            pad_time_for_flow,
        )

        flow_packs = packed_wn or pack_waveglow_flow(cfg, params)
        t_pad, halo, _ = flow_buf_geometry(G, flow_tile, cfg.wn_n_layers)
        # one shared time-padded spect: the per-flow cond projections run
        # over it so the kernel windows line up without re-padding the
        # 8x larger cond tensor (ops/wn_flow_pallas.py docstring)
        spect_g_pad = pad_time_for_flow(spect_g, t_pad, halo)
    wn8 = None
    if wn_int8_flows or wn_int8_rs_flows:
        if wn_impl != "xla":
            raise ValueError("wn_int8_flows/rs requires wn_impl='xla'")
        if wn_int8_flows and cfg.wn_kernel_size != 3:
            raise ValueError("wn_int8_flows supports wn_kernel_size=3 "
                             f"only, got {cfg.wn_kernel_size}")
        wn8 = packed_wn_int8 or pack_waveglow_wn_int8(cfg, params)
    cond_q = None
    if cond_impl == "int8":
        if cond_quant not in ("column", "tensor"):
            raise ValueError(f"unknown cond_quant {cond_quant!r}")
        pack_c = packed_cond or pack_waveglow_int8cond(cfg, params)
        # the spect is constant across flows: quantize it once per call,
        # per (batch, position) column — exact dequant, locally adaptive
        # step size (quantize_per_column_int8).  cond_quant='tensor' keeps
        # the per-tensor scale for A/B measurement (eval/int8_snr).
        q_src = spect_g_pad if is_flow else spect_g
        sq, s_scale = (quantize_per_column_int8(q_src)
                       if cond_quant == "column"
                       else quantize_per_tensor_int8(q_src))
        cond_q = (sq, s_scale, pack_c)

    for k in reversed(range(cfg.n_flows)):
        audio_ch = audio.shape[1]
        n_half = audio_ch // 2
        audio_0 = audio[:, :n_half]
        audio_1 = audio[:, n_half:]
        if packed is not None:
            wn_out = wn_apply_pallas(
                cfg, packed[k], audio_0, spect_g,
                interpret=(wn_impl == "pallas_interpret"),
            )
        elif is_flow:
            wn_out = wn_apply_flow(
                cfg, params["wn"][k], flow_packs[k], audio_0,
                spect_g_pad, t_valid,
                cond_int8=(None if cond_q is None
                           else (cond_q[0], cond_q[1], cond_q[2][k])),
                tile=flow_tile,
                interpret=(wn_impl == "flow_interpret"),
            )
        else:
            wn_out = wn_apply(
                cfg, params["wn"][k], audio_0, spect_g,
                cond_int8=(None if cond_q is None
                           else (cond_q[0], cond_q[1], cond_q[2][k])),
                in_int8=(wn8[k] if wn8 is not None
                         and k < wn_int8_flows else None),
                in_int8_quant=wn_int8_quant,
                rs_int8=(wn8[k] if wn8 is not None
                         and k < wn_int8_rs_flows else None),
            )
        s = wn_out[:, n_half:]
        b = wn_out[:, :n_half]
        audio_1 = (audio_1 - b) * jnp.exp(-s)
        audio = jnp.concatenate([audio_0, audio_1], axis=1)

        conv = params["convinv"][k]
        w_inv = conv.get("weight_inverse")
        if w_inv is None:
            w_inv = jnp.linalg.inv(conv["weight"].astype(jnp.float32))
        audio = jnp.einsum(
            "oc,bct->bot", w_inv, audio,
            preferred_element_type=jnp.float32,
        ).astype(spect_g.dtype)

        if k % cfg.n_early_every == 0 and k > 0:
            z = (sigma * draw((B, cfg.n_early_size, G))).astype(spect_g.dtype)
            audio = jnp.concatenate([z, audio], axis=1)

    return ungroup_audio(audio)
