"""Mixed-precision policy + loss scaling.

The reference ships a 413-line fp16 apparatus — FP16_Optimizer with
flattened fp32 master weights (fp16_optimizer.py:83-413) and static/dynamic
loss scalers (loss_scaler.py:34-160) — which its own README declares broken
(README.md:53).  On TPU that machinery is structurally unnecessary:
bfloat16 shares float32's exponent range, so gradients cannot underflow the
way fp16 gradients do, and params/optimizer state stay float32 regardless.

What replaces it here:

  * `Policy`: cast-to-compute / keep-params-fp32 dtype policy for
    experiments on fp16-class hardware (training here is float32; the
    `compute_dtype` hparam selects the WaveGlow SERVING dtype).
  * `DynamicLossScaler`: a faithful functional port of the reference
    semantics (init scale 2**32, x2 after `scale_window` clean steps, /2 on
    non-finite grads, skip the step on overflow) for running this framework
    on fp16-class hardware or for experiments; it is OFF by default on TPU.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Policy(NamedTuple):
    """Dtype policy: params stay param_dtype; activations cast to compute."""

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )

    def cast_to_param(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.param_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )

    def cast_to_output(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.output_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )


def get_policy(compute_dtype: str = "bfloat16") -> Policy:
    return Policy(
        param_dtype=jnp.float32,
        compute_dtype=jnp.dtype(compute_dtype),
        output_dtype=jnp.float32,
    )


class LossScalerState(NamedTuple):
    scale: jnp.ndarray          # current loss scale
    good_steps: jnp.ndarray     # consecutive overflow-free steps


class DynamicLossScaler:
    """Functional dynamic loss scaling (reference loss_scaler.py:63-160).

    usage:
        state = scaler.init()
        scaled_loss = loss * state.scale
        grads = grad(scaled_loss_fn)(...)
        grads, state, ok = scaler.unscale(grads, state)
        # apply grads only where ok (jnp.where / lax.cond)
    """

    def __init__(self, init_scale: float = 2.0**32, scale_factor: float = 2.0,
                 scale_window: int = 1000):
        self.init_scale = init_scale
        self.scale_factor = scale_factor
        self.scale_window = scale_window

    def init(self) -> LossScalerState:
        return LossScalerState(
            scale=jnp.asarray(self.init_scale, jnp.float32),
            good_steps=jnp.asarray(0, jnp.int32),
        )

    @staticmethod
    def has_overflow(grads) -> jnp.ndarray:
        leaves = jax.tree_util.tree_leaves(grads)
        finite = jnp.asarray(True)
        for leaf in leaves:
            finite = finite & jnp.all(jnp.isfinite(leaf))
        return ~finite

    def unscale(self, grads, state: LossScalerState
                ) -> Tuple[object, LossScalerState, jnp.ndarray]:
        """Returns (unscaled_grads, new_state, step_ok)."""
        overflow = self.has_overflow(grads)
        inv = jnp.where(overflow, 0.0, 1.0 / state.scale)
        grads = jax.tree_util.tree_map(lambda g: g * inv, grads)

        new_scale = jnp.where(
            overflow,
            state.scale / self.scale_factor,
            jnp.where(
                state.good_steps + 1 >= self.scale_window,
                state.scale * self.scale_factor,
                state.scale,
            ),
        )
        new_good = jnp.where(
            overflow | (state.good_steps + 1 >= self.scale_window),
            0,
            state.good_steps + 1,
        )
        return grads, LossScalerState(new_scale, new_good), ~overflow


class StaticLossScaler:
    """Constant loss scale (reference loss_scaler.py:34-60)."""

    def __init__(self, scale: float = 1.0):
        self.scale = scale

    def init(self) -> LossScalerState:
        return LossScalerState(
            scale=jnp.asarray(self.scale, jnp.float32),
            good_steps=jnp.asarray(0, jnp.int32),
        )

    has_overflow = staticmethod(DynamicLossScaler.has_overflow)

    def unscale(self, grads, state):
        overflow = self.has_overflow(grads)
        inv = jnp.where(overflow, 0.0, 1.0 / state.scale)
        grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
        return grads, state, ~overflow
