"""Torch-checkpoint exporters: the reverse of train/import_torch.

Writes this framework's parameter pytrees back into the two reference
checkpoint formats so interchange is bidirectional:

  * PPG2Mel: {'iteration', 'state_dict', 'optimizer', 'learning_rate'}
    with torch-style state_dict keys (reference train_ppg2mel.py:143-149).
  * WaveGlow: {'model': <pickled nn.Module>, 'iteration', 'optimizer',
    'learning_rate'} (reference train_waveglow.py:56-64).  The pickled
    module is a structural torch twin whose classes are registered as
    module 'glow' (the path the reference's own checkpoints record), so
    the reference codebase can torch.load it directly; callers may also
    pass their own reference-layout module.

Params are already torch layout (Linear (out,in); Conv1d (out,in,k); LSTM
gates i,f,g,o), so exporting is key renaming plus, for WaveGlow, rebuilding
the weight-norm (weight_g/weight_v) parameterization.
"""

from __future__ import annotations

import contextlib
import sys
import types
from collections import OrderedDict
from typing import Dict, Optional, Tuple

import numpy as np

from fac_via_ppg_tpu.configs.hparams import Tacotron2Config, WaveGlowConfig
from fac_via_ppg_tpu.models.waveglow import flow_channels


def _t(x):
    import torch

    return torch.tensor(np.asarray(x, dtype=np.float32))


# ==========================================================================
# Tacotron2: state_dict naming (inverse of import_tacotron2_state_dict)
# ==========================================================================

def export_tacotron2_state_dict(
    params: dict, model_state: dict, cfg: Tacotron2Config
) -> "OrderedDict":
    """(params, model_state) -> torch state_dict the reference loads."""
    import torch

    sd = OrderedDict()

    def linear(prefix, p):
        sd[f"{prefix}.linear_layer.weight"] = _t(p["weight"])
        if "bias" in p:
            sd[f"{prefix}.linear_layer.bias"] = _t(p["bias"])

    def conv(prefix, p):
        sd[f"{prefix}.conv.weight"] = _t(p["weight"])
        if "bias" in p:
            sd[f"{prefix}.conv.bias"] = _t(p["bias"])

    def bn(prefix, p, s):
        sd[f"{prefix}.weight"] = _t(p["weight"])
        sd[f"{prefix}.bias"] = _t(p["bias"])
        sd[f"{prefix}.running_mean"] = _t(s["running_mean"])
        sd[f"{prefix}.running_var"] = _t(s["running_var"])
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)

    def lstm(prefix, p, suffix=""):
        for field in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            sd[f"{prefix}.{field}{suffix}"] = _t(p[field])

    enc = params["encoder"]
    for i, layer in enumerate(enc["prenet"]["layers"]):
        linear(f"encoder.prenet.layers.{i}", layer)
    for i, c in enumerate(enc["convolutions"]):
        conv(f"encoder.convolutions.{i}.0", c["conv"])
        bn(f"encoder.convolutions.{i}.1", c["bn"],
           model_state["encoder"]["convolutions"][i])
    lstm("encoder.lstm", enc["lstm_fwd"], "_l0")
    lstm("encoder.lstm", enc["lstm_bwd"], "_l0_reverse")

    dec = params["decoder"]
    for i, layer in enumerate(dec["prenet"]["layers"]):
        linear(f"decoder.prenet.layers.{i}", layer)
    lstm("decoder.attention_rnn", dec["attention_rnn"])
    att = dec["attention"]
    linear("decoder.attention_layer.query_layer", att["query"])
    linear("decoder.attention_layer.memory_layer", att["memory"])
    linear("decoder.attention_layer.v", att["v"])
    conv("decoder.attention_layer.location_layer.location_conv",
         att["location_conv"])
    linear("decoder.attention_layer.location_layer.location_dense",
           att["location_dense"])
    lstm("decoder.decoder_rnn", dec["decoder_rnn"])
    linear("decoder.linear_projection", dec["linear_projection"])
    linear("decoder.gate_layer", dec["gate_layer"])

    for i, c in enumerate(params["postnet"]["convolutions"]):
        conv(f"postnet.convolutions.{i}.0", c["conv"])
        bn(f"postnet.convolutions.{i}.1", c["bn"],
           model_state["postnet"]["convolutions"][i])
    return sd


def save_reference_tacotron2_checkpoint(
    path: str, params: dict, model_state: dict, cfg: Tacotron2Config,
    iteration: int = 0, learning_rate: float = 1e-3,
    optimizer_state: Optional[dict] = None,
):
    """Write the reference's .pt dict format (train_ppg2mel.py:143-149)."""
    import torch

    torch.save(
        {
            "iteration": int(iteration),
            "state_dict": export_tacotron2_state_dict(
                params, model_state, cfg
            ),
            "optimizer": optimizer_state if optimizer_state is not None else {},
            "learning_rate": float(learning_rate),
        },
        path,
    )


# ==========================================================================
# WaveGlow: pickled-module format (inverse of import_waveglow_state_dict)
# ==========================================================================

def export_waveglow_state_dict(params: dict, cfg: WaveGlowConfig) -> "OrderedDict":
    """params pytree -> torch state_dict (weight-norm or folded form,
    matching whichever form the pytree holds)."""
    sd = OrderedDict()

    def wn_conv(prefix, p):
        if "g" in p:
            sd[f"{prefix}.bias"] = _t(p["bias"])
            sd[f"{prefix}.weight_g"] = _t(
                np.asarray(p["g"]).reshape(-1, 1, 1)
            )
            sd[f"{prefix}.weight_v"] = _t(p["v"])
        else:
            sd[f"{prefix}.weight"] = _t(p["weight"])
            sd[f"{prefix}.bias"] = _t(p["bias"])

    sd["upsample.weight"] = _t(params["upsample"]["weight"])
    sd["upsample.bias"] = _t(params["upsample"]["bias"])
    for k in range(cfg.n_flows):
        w = np.asarray(params["convinv"][k]["weight"])
        sd[f"convinv.{k}.conv.weight"] = _t(w[:, :, None])
        wn = params["wn"][k]
        wn_conv(f"WN.{k}.start", wn["start"])
        sd[f"WN.{k}.end.weight"] = _t(wn["end"]["weight"])
        sd[f"WN.{k}.end.bias"] = _t(wn["end"]["bias"])
        for i in range(cfg.wn_n_layers):
            wn_conv(f"WN.{k}.in_layers.{i}", wn["in_layers"][i])
            wn_conv(f"WN.{k}.cond_layers.{i}", wn["cond_layers"][i])
            wn_conv(f"WN.{k}.res_skip_layers.{i}", wn["res_skip_layers"][i])
    return sd


_TWIN_GLOW: Optional[types.ModuleType] = None


def _twin_glow_module() -> types.ModuleType:
    """Classes named glow.WaveGlow / glow.WN / glow.Invertible1x1Conv so the
    pickled module resolves to the reference's own classes when ITS glow is
    on sys.path at load time."""
    global _TWIN_GLOW
    if _TWIN_GLOW is not None:
        return _TWIN_GLOW
    import torch

    mod = types.ModuleType("glow")
    for name in ("WaveGlow", "WN", "Invertible1x1Conv"):
        cls = type(name, (torch.nn.Module,), {"__module__": "glow"})
        setattr(mod, name, cls)
    _TWIN_GLOW = mod
    return mod


def build_waveglow_module(cfg: WaveGlowConfig, weight_norm: bool = True):
    """A torch nn.Module with the reference WaveGlow's exact submodule
    layout (glow.py:178-206), ready for load_state_dict + pickling."""
    import torch
    from torch import nn

    glow = _twin_glow_module()
    model = glow.WaveGlow()
    model.n_flows = cfg.n_flows
    model.n_group = cfg.n_group
    model.n_early_every = cfg.n_early_every
    model.n_early_size = cfg.n_early_size
    model.upsample = nn.ConvTranspose1d(
        cfg.n_mel_channels, cfg.n_mel_channels, cfg.upsample_kernel_size,
        stride=cfg.hop_length,
    )
    model.WN = nn.ModuleList()
    model.convinv = nn.ModuleList()
    chans = flow_channels(cfg)
    cond_ch = cfg.n_mel_channels * cfg.n_group

    def wn_norm(conv):
        return nn.utils.weight_norm(conv, name="weight") if weight_norm else conv

    for k in range(cfg.n_flows):
        inv = glow.Invertible1x1Conv()
        inv.conv = nn.Conv1d(chans[k], chans[k], 1, bias=False)
        model.convinv.append(inv)

        n_half = chans[k] // 2
        wn = glow.WN()
        wn.n_layers = cfg.wn_n_layers
        wn.n_channels = cfg.wn_n_channels
        wn.start = wn_norm(nn.Conv1d(n_half, cfg.wn_n_channels, 1))
        wn.end = nn.Conv1d(cfg.wn_n_channels, 2 * n_half, 1)
        wn.in_layers = nn.ModuleList()
        wn.cond_layers = nn.ModuleList()
        wn.res_skip_layers = nn.ModuleList()
        for i in range(cfg.wn_n_layers):
            dilation = 2 ** i
            pad = (cfg.wn_kernel_size * dilation - dilation) // 2
            wn.in_layers.append(wn_norm(nn.Conv1d(
                cfg.wn_n_channels, 2 * cfg.wn_n_channels, cfg.wn_kernel_size,
                dilation=dilation, padding=pad,
            )))
            wn.cond_layers.append(wn_norm(nn.Conv1d(
                cond_ch, 2 * cfg.wn_n_channels, 1
            )))
            res_ch = (
                2 * cfg.wn_n_channels if i < cfg.wn_n_layers - 1
                else cfg.wn_n_channels
            )
            wn.res_skip_layers.append(wn_norm(nn.Conv1d(
                cfg.wn_n_channels, res_ch, 1
            )))
        model.WN.append(wn)
    model.n_remaining_channels = chans[-1]
    return model


@contextlib.contextmanager
def _pickle_as_glow():
    """Expose the twin classes as sys.modules['glow'] for the duration of
    torch.save (pickle verifies class identity at save time)."""
    prev = sys.modules.get("glow")
    sys.modules["glow"] = _twin_glow_module()
    try:
        yield
    finally:
        if prev is not None:
            sys.modules["glow"] = prev
        else:
            del sys.modules["glow"]


def save_reference_waveglow_checkpoint(
    path: str, params: dict, cfg: WaveGlowConfig,
    iteration: int = 0, learning_rate: float = 1e-4,
    optimizer_state: Optional[dict] = None, module=None,
):
    """Write the reference's pickled-module checkpoint
    (train_waveglow.py:56-64).

    `module`: optional pre-built reference-layout torch module to load the
    exported weights into (e.g. the real glow.WaveGlow in a reference
    environment); default builds the structural twin.
    """
    import torch

    sd = export_waveglow_state_dict(params, cfg)
    if module is None:
        weight_norm = any("weight_g" in k for k in sd)
        module = build_waveglow_module(cfg, weight_norm=weight_norm)
    module.load_state_dict(sd)
    payload = {
        "model": module,
        "iteration": int(iteration),
        "optimizer": optimizer_state if optimizer_state is not None else {},
        "learning_rate": float(learning_rate),
    }
    # Install the twin module for pickle's class-identity check ONLY when
    # the module actually is the twin — a caller-supplied real glow module
    # must keep resolving to its own classes.
    if type(module) is _twin_glow_module().WaveGlow:
        with _pickle_as_glow():
            torch.save(payload, path)
    else:
        torch.save(payload, path)
