"""Old-format WaveGlow checkpoint upgrade.

The original WaveGlow release used separate res_layers/skip_layers 1x1
convs; later checkpoints fuse them into res_skip_layers (reference
src/waveglow/convert_model.py:43-78 and glow_old.py).  This converter
performs the same fusion on imported torch state_dicts so that old
checkpoints load into this framework:

  new.res_skip.weight = concat([res.weight, skip.weight], axis=0)  (i < L-1)
  last layer keeps only the skip conv.

The reference fuses in-place on torch modules; here it is a pure function
on the params pytree.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from fac_via_ppg_tpu.configs.hparams import WaveGlowConfig


def _np(t):
    import torch

    if isinstance(t, torch.Tensor):
        return np.ascontiguousarray(t.detach().cpu().numpy())
    return np.asarray(t)


def import_old_waveglow_state_dict(sd: Dict, cfg: WaveGlowConfig) -> dict:
    """Old-format (res_layers + skip_layers) torch state_dict -> params."""
    from fac_via_ppg_tpu.train.import_torch import import_waveglow_state_dict

    import torch

    fused = {}
    for key, value in sd.items():
        if ".res_layers." in key or ".skip_layers." in key:
            continue  # handled below
        fused[key] = value

    def folded(prefix):
        """Fold weight-norm (g, v) -> weight like remove_weight_norm
        (reference convert_model.py:58-60)."""
        if f"{prefix}.weight_g" in sd:
            g = _np(sd[f"{prefix}.weight_g"]).reshape(-1, 1, 1)
            v = _np(sd[f"{prefix}.weight_v"])
            norm = np.sqrt((v**2).sum(axis=(1, 2), keepdims=True))
            return g * v / norm, _np(sd[f"{prefix}.bias"])
        return _np(sd[f"{prefix}.weight"]), _np(sd[f"{prefix}.bias"])

    # Fuse res+skip per WN block and layer (reference convert_model.py:52-67).
    n_layers = cfg.wn_n_layers
    for k in range(cfg.n_flows):
        for i in range(n_layers):
            if f"WN.{k}.skip_layers.{i}.weight" not in sd and \
                    f"WN.{k}.skip_layers.{i}.weight_v" not in sd:
                continue
            skip_w, skip_b = folded(f"WN.{k}.skip_layers.{i}")
            if i < n_layers - 1:
                res_w, res_b = folded(f"WN.{k}.res_layers.{i}")
                weight = np.concatenate([res_w, skip_w], axis=0)
                bias = np.concatenate([res_b, skip_b])
            else:
                weight, bias = skip_w, skip_b
            fused[f"WN.{k}.res_skip_layers.{i}.weight"] = torch.tensor(weight)
            fused[f"WN.{k}.res_skip_layers.{i}.bias"] = torch.tensor(bias)
    return import_waveglow_state_dict(fused, cfg)


def load_old_reference_waveglow_checkpoint(path: str,
                                           cfg: WaveGlowConfig) -> dict:
    """Old pickled-module checkpoint -> params (reference convert_model.py)."""
    import torch

    from fac_via_ppg_tpu.train.import_torch import (
        _install_glow_shims,
        _remove_glow_shims,
    )

    installed = _install_glow_shims()
    try:
        payload = torch.load(path, map_location="cpu", weights_only=False)
    finally:
        _remove_glow_shims(installed)
    model = payload["model"] if isinstance(payload, dict) else payload
    return import_old_waveglow_state_dict(model.state_dict(), cfg)
