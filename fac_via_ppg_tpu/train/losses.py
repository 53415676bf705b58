"""Loss functions (reference src/common/loss_function.py:36-53,
src/waveglow/glow.py:43-59)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable elementwise BCE, torch BCEWithLogitsLoss semantics."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def tacotron2_loss(
    model_output,
    targets,
    mel_weight: float = 1.0,
    gate_weight: float = 0.005,
    output_lengths=None,
) -> jnp.ndarray:
    """MSE(mel) + MSE(mel_postnet) + w_gate * BCE(gate).

    Means are taken over ALL elements including padding, exactly like the
    reference's nn.MSELoss/nn.BCEWithLogitsLoss on parse_output-masked
    tensors: padded mel positions are zero in both pred and target (0 error)
    and padded gate energies are forced to 1e3 against target 1 (~0 error).

    `output_lengths` matters when batches are bucket-padded beyond the batch
    max (TPU shape bucketing): the reference divides by B*D*max_len(batch),
    so the denominator is computed from max(output_lengths) instead of the
    padded tensor size — otherwise the bucket amount would scale the
    effective learning rate batch-to-batch.  Padded positions contribute
    exactly zero to the sums either way.
    """
    mel_target, gate_target = targets
    mel_out, mel_out_postnet, gate_out = model_output[0], model_output[1], \
        model_output[2]
    # Reductions always in float32: summing millions of squared errors in a
    # bf16 compute policy would lose the loss signal itself.
    f32 = jnp.float32
    mel_target, gate_target = mel_target.astype(f32), gate_target.astype(f32)
    mel_out, mel_out_postnet, gate_out = (
        mel_out.astype(f32), mel_out_postnet.astype(f32), gate_out.astype(f32)
    )
    B, D, T_pad = mel_target.shape
    if output_lengths is not None:
        t_ref = jnp.maximum(jnp.max(output_lengths), 1)
    else:
        t_ref = T_pad
    mel_denom = B * D * t_ref
    gate_denom = B * t_ref
    mel_loss = (
        jnp.sum((mel_out - mel_target) ** 2)
        + jnp.sum((mel_out_postnet - mel_target) ** 2)
    ) / mel_denom
    gate_loss = jnp.sum(bce_with_logits(gate_out, gate_target)) / gate_denom
    return mel_weight * mel_loss + gate_weight * gate_loss


def waveglow_loss(model_output, sigma: float = 1.0) -> jnp.ndarray:
    """z^2/(2 sigma^2) - sum(log_s) - sum(log_det_W), normalized by z.size."""
    z, log_s_list, log_det_w_list = model_output
    # Reductions always in float32 (see tacotron2_loss).
    zf = z.astype(jnp.float32)
    log_s_total = sum(
        jnp.sum(log_s.astype(jnp.float32)) for log_s in log_s_list
    )
    log_det_total = sum(
        ld.astype(jnp.float32) for ld in log_det_w_list
    )
    loss = (
        jnp.sum(zf * zf) / (2 * sigma * sigma) - log_s_total - log_det_total
    )
    return loss / (z.shape[0] * z.shape[1] * z.shape[2])
