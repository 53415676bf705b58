"""Torch-checkpoint importers.

Converts the two reference checkpoint formats (SURVEY.md section 5.4) into
this framework's parameter pytrees:

  * PPG2Mel: {'iteration', 'state_dict', 'optimizer', 'learning_rate'}
    (reference train_ppg2mel.py:143-149) — `state_dict` keys are renamed
    onto the params/model_state trees (layouts already match torch).
  * WaveGlow: {'model': <pickled nn.Module>, ...} (train_waveglow.py:56-64)
    — unpickling needs the original `glow` module importable; a shim class
    registry satisfies pickle, then the module's state_dict is mapped.
    Both weight-norm (weight_g/weight_v) and folded (remove_weightnorm)
    checkpoints are handled.

Only torch-CPU is required (torch.load(map_location='cpu')).
"""

from __future__ import annotations

import sys
import types
from typing import Dict, Tuple

import numpy as np

from fac_via_ppg_tpu.configs.hparams import Tacotron2Config, WaveGlowConfig
from fac_via_ppg_tpu.models.waveglow import flow_channels


def _np(t):
    return np.ascontiguousarray(t.detach().cpu().numpy())


# ==========================================================================
# Tacotron2
# ==========================================================================

def _lstm_tree(sd: Dict, prefix: str, suffix: str = "") -> dict:
    return {
        "weight_ih": _np(sd[f"{prefix}.weight_ih{suffix}"]),
        "weight_hh": _np(sd[f"{prefix}.weight_hh{suffix}"]),
        "bias_ih": _np(sd[f"{prefix}.bias_ih{suffix}"]),
        "bias_hh": _np(sd[f"{prefix}.bias_hh{suffix}"]),
    }


def import_tacotron2_state_dict(
    state_dict: Dict, cfg: Tacotron2Config
) -> Tuple[dict, dict]:
    """torch state_dict -> (params, model_state)."""
    sd = state_dict

    def linear(prefix, bias=True):
        p = {"weight": _np(sd[f"{prefix}.linear_layer.weight"])}
        if bias:
            p["bias"] = _np(sd[f"{prefix}.linear_layer.bias"])
        return p

    def conv(prefix, bias=True):
        p = {"weight": _np(sd[f"{prefix}.conv.weight"])}
        if bias:
            p["bias"] = _np(sd[f"{prefix}.conv.bias"])
        return p

    def bn(prefix):
        return (
            {
                "weight": _np(sd[f"{prefix}.weight"]),
                "bias": _np(sd[f"{prefix}.bias"]),
            },
            {
                "running_mean": _np(sd[f"{prefix}.running_mean"]),
                "running_var": _np(sd[f"{prefix}.running_var"]),
            },
        )

    enc_convs, enc_bn_state = [], []
    for i in range(cfg.encoder_n_convolutions):
        bn_p, bn_s = bn(f"encoder.convolutions.{i}.1")
        enc_convs.append(
            {"conv": conv(f"encoder.convolutions.{i}.0"), "bn": bn_p}
        )
        enc_bn_state.append(bn_s)

    post_convs, post_bn_state = [], []
    for i in range(cfg.postnet_n_convolutions):
        bn_p, bn_s = bn(f"postnet.convolutions.{i}.1")
        post_convs.append(
            {"conv": conv(f"postnet.convolutions.{i}.0"), "bn": bn_p}
        )
        post_bn_state.append(bn_s)

    params = {
        "encoder": {
            "prenet": {
                "layers": [
                    linear("encoder.prenet.layers.0", bias=False),
                    linear("encoder.prenet.layers.1", bias=False),
                ]
            },
            "convolutions": enc_convs,
            "lstm_fwd": _lstm_tree(sd, "encoder.lstm", "_l0"),
            "lstm_bwd": _lstm_tree(sd, "encoder.lstm", "_l0_reverse"),
        },
        "decoder": {
            "prenet": {
                "layers": [
                    linear("decoder.prenet.layers.0", bias=False),
                    linear("decoder.prenet.layers.1", bias=False),
                ]
            },
            "attention_rnn": _lstm_tree(sd, "decoder.attention_rnn"),
            "attention": {
                "query": linear("decoder.attention_layer.query_layer",
                                bias=False),
                "memory": linear("decoder.attention_layer.memory_layer",
                                 bias=False),
                "v": linear("decoder.attention_layer.v", bias=False),
                "location_conv": conv(
                    "decoder.attention_layer.location_layer.location_conv",
                    bias=False,
                ),
                "location_dense": linear(
                    "decoder.attention_layer.location_layer.location_dense",
                    bias=False,
                ),
            },
            "decoder_rnn": _lstm_tree(sd, "decoder.decoder_rnn"),
            "linear_projection": linear("decoder.linear_projection"),
            "gate_layer": linear("decoder.gate_layer"),
        },
        "postnet": {"convolutions": post_convs},
    }
    model_state = {
        "encoder": {"convolutions": enc_bn_state},
        "postnet": {"convolutions": post_bn_state},
    }
    return params, model_state


def load_reference_tacotron2_checkpoint(
    path: str, cfg: Tacotron2Config
) -> Tuple[dict, dict, int, float]:
    """Reference .pt checkpoint -> (params, model_state, iteration, lr)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    params, model_state = import_tacotron2_state_dict(
        payload["state_dict"], cfg
    )
    return (
        params,
        model_state,
        int(payload.get("iteration", 0)),
        float(payload.get("learning_rate", 0.0)),
    )


# ==========================================================================
# WaveGlow
# ==========================================================================

def _install_glow_shims():
    """Register shim classes so pickled reference WaveGlow modules load.

    The reference saves the entire nn.Module (train_waveglow.py:59-64); its
    pickle references classes in modules 'glow' / 'waveglow.glow' /
    'waveglow.glow_old'.  Pickle only needs the classes to exist (it
    restores __dict__ directly), so empty nn.Module subclasses suffice.

    Returns the module names this call registered so the caller can
    remove them once torch.load returns: a shim left at
    sys.modules['waveglow.glow'] would shadow the REAL reference module
    for any later importlib.import_module of it (the torch-oracle parity
    harnesses load the reference from the mount by exactly that name).
    Names that were already present are never overwritten and never
    removed.
    """
    import torch

    def make_module(name):
        mod = types.ModuleType(name)

        class WaveGlow(torch.nn.Module):
            pass

        class WN(torch.nn.Module):
            pass

        class Invertible1x1Conv(torch.nn.Module):
            pass

        mod.WaveGlow = WaveGlow
        mod.WN = WN
        mod.Invertible1x1Conv = Invertible1x1Conv
        return mod

    installed = []
    for name in ("glow", "waveglow.glow", "waveglow.glow_old", "glow_old"):
        if name not in sys.modules:
            parent_name = name.rsplit(".", 1)[0] if "." in name else None
            if parent_name and parent_name not in sys.modules:
                sys.modules[parent_name] = types.ModuleType(parent_name)
                installed.append(parent_name)
            sys.modules[name] = make_module(name)
            installed.append(name)
    return installed


def _remove_glow_shims(installed):
    for name in installed:
        sys.modules.pop(name, None)


def import_waveglow_state_dict(sd: Dict, cfg: WaveGlowConfig) -> dict:
    """torch WaveGlow state_dict -> params pytree.

    Handles both weight-norm form (weight_g/weight_v) and folded form.
    """

    def wn_conv(prefix):
        if f"{prefix}.weight_g" in sd:
            g = _np(sd[f"{prefix}.weight_g"])
            return {
                "g": g.reshape(g.shape[0]),
                "v": _np(sd[f"{prefix}.weight_v"]),
                "bias": _np(sd[f"{prefix}.bias"]),
            }
        return {
            "weight": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"]),
        }

    params = {
        "upsample": {
            "weight": _np(sd["upsample.weight"]),
            "bias": _np(sd["upsample.bias"]),
        },
        "convinv": [],
        "wn": [],
    }
    for k in range(cfg.n_flows):
        params["convinv"].append(
            {"weight": _np(sd[f"convinv.{k}.conv.weight"])[:, :, 0]}
        )
        wn = {
            "start": wn_conv(f"WN.{k}.start"),
            "end": {
                "weight": _np(sd[f"WN.{k}.end.weight"]),
                "bias": _np(sd[f"WN.{k}.end.bias"]),
            },
            "in_layers": [
                wn_conv(f"WN.{k}.in_layers.{i}")
                for i in range(cfg.wn_n_layers)
            ],
            "cond_layers": [
                wn_conv(f"WN.{k}.cond_layers.{i}")
                for i in range(cfg.wn_n_layers)
            ],
            "res_skip_layers": [
                wn_conv(f"WN.{k}.res_skip_layers.{i}")
                for i in range(cfg.wn_n_layers)
            ],
        }
        params["wn"].append(wn)
    return params


def load_reference_waveglow_checkpoint(path: str, cfg: WaveGlowConfig) -> dict:
    """Reference pickled-module checkpoint -> params pytree."""
    import torch

    installed = _install_glow_shims()
    try:
        payload = torch.load(path, map_location="cpu", weights_only=False)
    finally:
        _remove_glow_shims(installed)
    model = payload["model"] if isinstance(payload, dict) else payload
    return import_waveglow_state_dict(model.state_dict(), cfg)
