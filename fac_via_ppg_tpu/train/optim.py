"""Optimizer matching the reference exactly.

The reference uses torch.optim.Adam(lr, weight_decay) with
clip_grad_norm_(1.0) applied before the step (train_ppg2mel.py:201-255,
train_waveglow.py:83).  torch-Adam order of operations:

  g <- clip_by_global_norm(g, thresh)       (clip_grad_norm_)
  g <- g + weight_decay * p                 (L2, NOT decoupled AdamW)
  m/v adam update with (0.9, 0.999), eps=1e-8

`learning_rate` is injected as mutable state because the reference rewrites
param_group['lr'] every iteration (train_ppg2mel.py:234-235).

The fp16 machinery (fp16_optimizer.py / loss_scaler.py) is intentionally
absent: bf16 shares float32's exponent range, so loss scaling and master
weights are dead weight on TPU; the mixed-precision policy lives in the
model's compute_dtype instead.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax


def make_optimizer(
    learning_rate: float,
    weight_decay: float = 0.0,
    grad_clip_thresh: Optional[float] = None,
) -> optax.GradientTransformation:
    def build(learning_rate):
        parts = []
        if grad_clip_thresh is not None and grad_clip_thresh > 0:
            parts.append(optax.clip_by_global_norm(grad_clip_thresh))
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        parts.append(optax.scale_by_learning_rate(learning_rate))
        return optax.chain(*parts)

    return optax.inject_hyperparams(build)(learning_rate=learning_rate)


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)
