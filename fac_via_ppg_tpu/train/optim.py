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

import jax
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


def make_lr_schedule(
    base_lr: float,
    schedule: str = "constant",
    warmup_steps: int = 0,
    decay_steps: int = 0,
    decay_rate: float = 1.0,
    min_factor: float = 0.0,
):
    """Step -> learning-rate callable (TPU extension; the reference keeps
    LR fixed and only rewrites param_group['lr'] with the same value,
    train_ppg2mel.py:234-235).

    schedule: 'constant' | 'exponential' (base * decay_rate^(t/decay_steps))
    | 'cosine' (decay to min_factor * base over decay_steps).  A linear
    warmup from 0 over `warmup_steps` precedes any of them.  Trainers
    evaluate this per iteration and inject the value through the
    optimizer's mutable `hyperparams['learning_rate']`, so resume
    recomputes the right LR from the restored iteration.
    """
    if schedule == "constant":
        main = optax.constant_schedule(base_lr)
    elif schedule == "exponential":
        if decay_steps <= 0:
            raise ValueError("exponential schedule needs decay_steps > 0")
        main = optax.exponential_decay(
            base_lr, transition_steps=decay_steps, decay_rate=decay_rate
        )
    elif schedule == "cosine":
        if decay_steps <= 0:
            raise ValueError("cosine schedule needs decay_steps > 0")
        main = optax.cosine_decay_schedule(
            base_lr, decay_steps=decay_steps, alpha=min_factor
        )
    else:
        raise ValueError(
            f"unknown lr schedule {schedule!r}; "
            f"choose constant/exponential/cosine"
        )
    if warmup_steps > 0:
        warm = optax.linear_schedule(0.0, base_lr, warmup_steps)
        main = optax.join_schedules([warm, main], [warmup_steps])

    def evaluate(step) -> float:
        # optax schedules compute with jnp: pin them to the CPU backend so
        # the per-iteration evaluation never round-trips the accelerator
        # (over this session's tunnel a single readback costs ~25 ms —
        # a third of a training step).
        with jax.default_device(jax.devices("cpu")[0]):
            return float(main(step))

    return evaluate


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)
