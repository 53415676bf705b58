"""Jitted training steps: data-parallel over a jax mesh.

One function per model.  The step closes over static config and is jitted
with the batch sharded on the mesh 'data' axis and params replicated; XLA
inserts the ICI gradient reductions automatically (SURVEY.md section 5.8 —
this replaces the reference's per-parameter NCCL backward hooks,
distributed.py:90-142).  Loss is averaged over the global batch, so the
resulting update is identical to the reference's allreduce-mean-of-grads.

The same compiled step runs on 1 device (mesh of 1) or N chips.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from fac_via_ppg_tpu.configs.hparams import Tacotron2Config, WaveGlowConfig
from fac_via_ppg_tpu.models.tacotron2 import tacotron2_forward
from fac_via_ppg_tpu.models.waveglow import waveglow_forward
from fac_via_ppg_tpu.train.losses import tacotron2_loss, waveglow_loss
from fac_via_ppg_tpu.train.optim import global_norm


class StepOut(NamedTuple):
    params: object
    model_state: object
    opt_state: object
    loss: jnp.ndarray
    grad_norm: jnp.ndarray


def _cast_floats(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        tree,
    )


def _split_micro(batch, grad_accum: int):
    """(B, ...) batch pytree -> (grad_accum, B/grad_accum, ...) micro-batches.

    The split is STRIDED (micro-batch i takes samples i, i+accum, ...):
    with the batch sharded on a data mesh every device contributes
    B/(devices*accum) samples to every micro-batch, so each micro-batch
    stays fully local — a contiguous split would concentrate each
    micro-batch on a subset of devices and force a per-step all-to-all.
    """
    b = jax.tree_util.tree_leaves(batch)[0].shape[0]
    if b % grad_accum != 0:
        raise ValueError(
            f"grad_accum={grad_accum} must divide the batch size, got "
            f"batch dimension {b} (adjust batch_size or grad_accum_steps)"
        )
    return jax.tree_util.tree_map(
        lambda x: x.reshape(x.shape[0] // grad_accum, grad_accum,
                            *x.shape[1:]).swapaxes(0, 1),
        batch,
    )


def _accumulate_micro(vg_fn, params, model_state, micro, keys,
                      grad_accum: int):
    """Shared micro-batch gradient accumulation scan.

    `vg_fn(params, state, mb, key) -> ((loss, new_state), grads)`; state
    threads through the scan carry (batch-norm stats update per
    micro-batch, like sequential forwards).  Returns
    (new_state, mean_loss, mean_grads).
    """

    def acc(carry, inp):
        state, loss_sum, grad_sum = carry
        mb, k = inp
        (loss, state), grads = vg_fn(params, state, mb, k)
        grad_sum = jax.tree_util.tree_map(
            lambda a, g: a + g, grad_sum, grads
        )
        return (state, loss_sum + loss, grad_sum), None

    zeros = jax.tree_util.tree_map(
        lambda p: jnp.zeros(jnp.shape(p), jnp.float32), params
    )
    (new_state, loss, grads), _ = jax.lax.scan(
        acc, (model_state, jnp.zeros((), jnp.float32), zeros), (micro, keys)
    )
    inv = 1.0 / grad_accum
    return new_state, loss * inv, jax.tree_util.tree_map(
        lambda g: g * inv, grads
    )


def make_tacotron2_train_step(cfg: Tacotron2Config, optimizer,
                              mel_weight: float = 1.0,
                              gate_weight: float = 0.005,
                              donate: bool = True,
                              compute_dtype=None,
                              grad_accum: int = 1,
                              remat: bool = False):
    """Returns jitted (params, model_state, opt_state, batch, key) -> StepOut.

    batch = (ppg_padded, input_lengths, acoustic_padded, gate_padded,
             output_lengths) — the collate layout (data_utils.py:281-334).

    `compute_dtype` (e.g. jnp.bfloat16) runs the forward/backward pass in
    that dtype while params, gradients, optimizer state, batch-norm
    statistics and loss reductions stay float32 — the TPU replacement for
    the reference's fp16 master-weights apparatus (fp16_optimizer.py:83-413,
    which its own README declares broken, README.md:53).  bf16 shares
    float32's exponent range so no loss scaling is needed: the cast
    params -> bf16 happens INSIDE the differentiated function, so grads
    arrive float32 through the cast's transpose.  Default None = float32.

    `grad_accum` > 1 splits the leading batch axis into that many
    micro-batches evaluated sequentially under lax.scan, averaging the
    gradients into ONE optimizer update — a large effective batch at the
    device memory of a micro-batch (the reference has no equivalent).
    Batch-norm statistics thread through the scan carry, so running
    stats update per micro-batch exactly like sequential torch forwards.
    The micro-batch split is strided so data-parallel shards stay local
    (see _split_micro).  Semantics: the loss is the mean of
    per-micro-batch losses (each normalized by its own max length, like
    the reference's per-batch denominator), and each micro-batch draws
    its own dropout key — equal to the full-batch update in expectation,
    not bitwise (WaveGlow's RNG-free step IS bitwise-equal).

    `remat` rematerializes the decoder scan body in backward
    (jax.checkpoint): per-step attention/LSTM internals recompute from
    the carries instead of being stored for all T_out steps — the
    memory lever for batches past the HBM wall.
    """

    def loss_fn(params, model_state, batch, key):
        ppg, in_len, mel, gate, out_len = batch
        if compute_dtype is not None:
            params = _cast_floats(params, compute_dtype)
            ppg = ppg.astype(compute_dtype)
            mel_in = mel.astype(compute_dtype)
        else:
            mel_in = mel
        out, new_state = tacotron2_forward(
            cfg, params, model_state, ppg, in_len, mel_in, out_len, key,
            training=True, remat=remat,
        )
        loss = tacotron2_loss(out, (mel, gate), mel_weight, gate_weight,
                              output_lengths=out_len)
        return loss, new_state

    def step(params, model_state, opt_state, batch, key):
        if grad_accum == 1:
            (loss, new_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, model_state, batch, key)
        else:
            new_state, loss, grads = _accumulate_micro(
                jax.value_and_grad(loss_fn, has_aux=True),
                params, model_state, _split_micro(batch, grad_accum),
                jax.random.split(key, grad_accum), grad_accum,
            )
        gnorm = global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return StepOut(params, new_state, opt_state, loss, gnorm)

    donate_args = (0, 1, 2) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)


def make_tacotron2_eval_step(cfg: Tacotron2Config, mel_weight: float = 1.0,
                             gate_weight: float = 0.005):
    """Validation loss (+ outputs for logging images)."""

    def step(params, model_state, batch, key):
        ppg, in_len, mel, gate, out_len = batch
        out, _ = tacotron2_forward(
            cfg, params, model_state, ppg, in_len, mel, out_len, key,
            training=False,
        )
        loss = tacotron2_loss(out, (mel, gate), mel_weight, gate_weight,
                              output_lengths=out_len)
        return loss, out

    return jax.jit(step)


def make_waveglow_train_step(cfg: WaveGlowConfig, optimizer, sigma: float,
                             donate: bool = True, compute_dtype=None,
                             grad_accum: int = 1, remat: bool = False,
                             grouped_upsample: bool = False):
    """Returns jitted (params, opt_state, batch) -> StepOut.

    batch = (mel (B, 80, F), audio (B, T)).

    `compute_dtype` (e.g. jnp.bfloat16) runs the flows in that dtype with
    float32 params/grads/optimizer, float32 1x1-conv log-determinants and
    float32 loss reductions — see make_tacotron2_train_step.  `grad_accum`
    splits the batch into sequential micro-batches with averaged
    gradients (exactly the full-batch update: WaveGlow's loss is
    per-element-normalized over fixed-size segments).  `remat`
    rematerializes each flow in the backward pass (jax.checkpoint):
    ~WN-depth less activation memory for ~1/3 extra backward FLOPs —
    the lever for batches that otherwise exceed HBM.  `grouped_upsample`
    emits the grouped spect straight from the upsampler's phase layout
    (identical values; the layout A/B for the step's group/ungroup copy
    family — models/waveglow.upsample_grouped).
    """

    def loss_fn(params, batch):
        mel, audio = batch
        if compute_dtype is not None:
            params = _cast_floats(params, compute_dtype)
            mel = mel.astype(compute_dtype)
            audio = audio.astype(compute_dtype)
        out = waveglow_forward(cfg, params, mel, audio, remat=remat,
                               grouped_upsample=grouped_upsample)
        return waveglow_loss(out, sigma=sigma)

    def step(params, opt_state, batch):
        if grad_accum == 1:
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        else:
            vg = jax.value_and_grad(loss_fn)

            def vg_fn(p, state, mb, _key):
                loss, grads = vg(p, mb)
                return (loss, state), grads

            _, loss, grads = _accumulate_micro(
                vg_fn, params, None, _split_micro(batch, grad_accum),
                jnp.zeros((grad_accum,), jnp.uint32), grad_accum,
            )
        gnorm = global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return StepOut(params, None, opt_state, loss, gnorm)

    donate_args = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)
