"""Tacotron2-variant PPG->mel model, pure-functional JAX.

Re-design of the reference model (src/common/model.py:44-610) for XLA:

  * Encoder (model.py:187-249): Prenet on the 5816-dim PPG input (replaces
    the stock embedding lookup), 3 x [conv1d(600, k=5) + BN + relu +
    dropout], then a BiLSTM as two `lax.scan`s with packed-sequence
    semantics reproduced by masks (ops/rnn.py).
  * Decoder (model.py:252-535): the per-frame Python while-loop becomes ONE
    `lax.scan` over decoder steps carrying (att_h, att_c, dec_h, dec_c,
    attention_weights, attention_weights_cum, attention_context).  The
    +-window location-sensitive attention mask (model.py:471-477,
    utils.py:46-78) is computed inside the scan from the step counter —
    including the reference's documented end-of-sequence quirk where the
    last valid frame stays unmasked once the window passes the end.
  * Prenet dropout is ALWAYS on (model.py:132-135, training=True) — this is
    load-bearing for inference output variety and is reproduced via an
    explicit PRNG key.
  * Postnet (model.py:138-184): 5 convs with tanh + BN + dropout.
  * parse_output (model.py:566-578): padded mel positions zeroed, padded
    gate energies forced to 1e3.

Parameters are a nested-dict pytree whose leaf layout matches torch
(`Linear.weight` is (out, in), `Conv1d.weight` (out, in, k), LSTM gates
packed (i, f, g, o)) so the reference-checkpoint importer is a key renaming.

Inference uses `lax.while_loop` with a preallocated (max_decoder_steps)
output buffer: the data-dependent gate>threshold stop (model.py:524-528)
stays a device-side loop condition, so XLA stops early instead of always
running 1000 steps.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fac_via_ppg_tpu.configs.hparams import Tacotron2Config
from fac_via_ppg_tpu.ops.initializers import (
    batchnorm_apply,
    batchnorm_params,
    batchnorm_state,
    conv1d_apply,
    conv1d_params,
    dropout,
    linear_apply,
    linear_params,
    lstm_cell,
    lstm_params,
)
from fac_via_ppg_tpu.ops.rnn import bidirectional_lstm

MASK_VALUE = -1e9  # finite stand-in for the reference's -inf score mask


# ==========================================================================
# init
# ==========================================================================

def init_tacotron2(key, cfg: Tacotron2Config):
    """Returns (params, state) pytrees."""
    keys = iter(jax.random.split(key, 64))
    nk = lambda: next(keys)
    E, D = cfg.encoder_embedding_dim, cfg.n_acoustic_feat_dims
    A, R, P = cfg.attention_rnn_dim, cfg.decoder_rnn_dim, cfg.prenet_dim

    params = {
        "encoder": {
            "prenet": {
                "layers": [
                    linear_params(nk(), cfg.n_symbols, cfg.symbols_embedding_dim,
                                  bias=False),
                    linear_params(nk(), cfg.symbols_embedding_dim,
                                  cfg.symbols_embedding_dim, bias=False),
                ]
            },
            "convolutions": [
                {
                    "conv": conv1d_params(nk(), E, E, cfg.encoder_kernel_size,
                                          w_init_gain="relu"),
                    "bn": batchnorm_params(E),
                }
                for _ in range(cfg.encoder_n_convolutions)
            ],
            "lstm_fwd": lstm_params(nk(), E, E // 2),
            "lstm_bwd": lstm_params(nk(), E, E // 2),
        },
        "decoder": {
            "prenet": {
                "layers": [
                    linear_params(nk(), D, P, bias=False),
                    linear_params(nk(), P, P, bias=False),
                ]
            },
            "attention_rnn": lstm_params(nk(), P + E, A),
            "attention": {
                "query": linear_params(nk(), A, cfg.attention_dim, bias=False,
                                       w_init_gain="tanh"),
                "memory": linear_params(nk(), E, cfg.attention_dim, bias=False,
                                        w_init_gain="tanh"),
                "v": linear_params(nk(), cfg.attention_dim, 1, bias=False),
                "location_conv": conv1d_params(
                    nk(), 2, cfg.attention_location_n_filters,
                    cfg.attention_location_kernel_size, bias=False,
                ),
                "location_dense": linear_params(
                    nk(), cfg.attention_location_n_filters, cfg.attention_dim,
                    bias=False, w_init_gain="tanh",
                ),
            },
            "decoder_rnn": lstm_params(nk(), A + E, R),
            "linear_projection": linear_params(nk(), R + E, D),
            "gate_layer": linear_params(nk(), R + E, 1, w_init_gain="sigmoid"),
        },
        "postnet": {"convolutions": []},
    }

    pk, pe, pn = cfg.postnet_kernel_size, cfg.postnet_embedding_dim, \
        cfg.postnet_n_convolutions
    chans = [D] + [pe] * (pn - 1) + [D]
    for i in range(pn):
        gain = "linear" if i == pn - 1 else "tanh"
        params["postnet"]["convolutions"].append(
            {
                "conv": conv1d_params(nk(), chans[i], chans[i + 1], pk,
                                      w_init_gain=gain),
                "bn": batchnorm_params(chans[i + 1]),
            }
        )

    state = {
        "encoder": {
            "convolutions": [
                batchnorm_state(E) for _ in range(cfg.encoder_n_convolutions)
            ]
        },
        "postnet": {
            "convolutions": [batchnorm_state(c) for c in chans[1:]]
        },
    }
    return params, state


# ==========================================================================
# building blocks
# ==========================================================================

def prenet_apply(p: dict, x: jnp.ndarray, key) -> jnp.ndarray:
    """relu+dropout(0.5) MLP; dropout always on (model.py:132-135)."""
    for i, layer in enumerate(p["layers"]):
        key, sub = jax.random.split(key)
        x = dropout(sub, jax.nn.relu(linear_apply(layer, x)), 0.5, True)
    return x


def encoder_apply(params, state, ppg, input_lengths, key, training: bool,
                  mask_convs: bool = False, unroll: int = 1):
    """(B, n_symbols, T_in) -> memory (B, T_in, E), new encoder state.

    `mask_convs` zeroes activations beyond each sequence's length before
    every conv so a bucket-padded input reproduces the unpadded computation
    exactly (conv biases otherwise leak across the boundary through the
    receptive field).  Kept OFF for training to match the reference's
    padded-batch semantics (model.py:215-235 does not mask convs either);
    ON for bucketed serving.
    """
    p, s = params["encoder"], state["encoder"]
    key, kp = jax.random.split(key)
    x = prenet_apply(p["prenet"], ppg.transpose(0, 2, 1), kp)  # (B, T, E)
    x = x.transpose(0, 2, 1)  # (B, E, T)

    valid = None
    if mask_convs and input_lengths is not None:
        valid = (
            jnp.arange(x.shape[2])[None, None, :]
            < input_lengths[:, None, None]
        )

    new_bn = []
    for conv_p, bn_s in zip(p["convolutions"], s["convolutions"]):
        if valid is not None:
            x = jnp.where(valid, x, 0.0)
        k = conv_p["conv"]["weight"].shape[2]
        x = conv1d_apply(conv_p["conv"], x, padding=(k - 1) // 2)
        x, bn_new = batchnorm_apply(conv_p["bn"], bn_s, x, training)
        new_bn.append(bn_new)
        key, kd = jax.random.split(key)
        x = dropout(kd, jax.nn.relu(x), 0.5, training)

    x = x.transpose(0, 2, 1)  # (B, T, E)
    memory = bidirectional_lstm(p["lstm_fwd"], p["lstm_bwd"], x,
                                input_lengths, unroll=unroll)
    return memory, {"convolutions": new_bn}


def postnet_apply(params, state, mel, key, training: bool, valid_mask=None):
    """(B, 80, T) -> residual (B, 80, T), new postnet state.

    `valid_mask` (B, 1, T) emulates the reference's dynamically-sized
    inference sequence: zeroing each conv's input beyond the produced length
    reproduces torch's zero padding at the (shorter) sequence boundary.
    """
    p, s = params["postnet"], state["postnet"]
    x = mel
    n = len(p["convolutions"])
    new_bn = []
    for i, (conv_p, bn_s) in enumerate(zip(p["convolutions"], s["convolutions"])):
        if valid_mask is not None:
            x = jnp.where(valid_mask, x, 0.0)
        k = conv_p["conv"]["weight"].shape[2]
        x = conv1d_apply(conv_p["conv"], x, padding=(k - 1) // 2)
        x, bn_new = batchnorm_apply(conv_p["bn"], bn_s, x, training)
        new_bn.append(bn_new)
        if i < n - 1:
            x = jnp.tanh(x)
        key, kd = jax.random.split(key)
        x = dropout(kd, x, 0.5, training)
    return x, {"convolutions": new_bn}


def windowed_attention_mask(lengths, window: int, t, T_in: int):
    """Reference utils.py:46-78 semantics, vectorized; True = allowed.

    start = min(max(0, t-w), len-1); end = min(t+w, len-1) — including the
    quirk that keeps the last valid frame unmasked after the window passes
    the sequence end (documented at utils.py:65-69).
    """
    max_idx = lengths - 1
    start = jnp.minimum(jnp.maximum(0, t - window), max_idx)
    end = jnp.minimum(t + window, max_idx)
    ids = jnp.arange(T_in)[None, :]
    return (ids >= start[:, None]) & (ids <= end[:, None])


def attention_step(p, att_h, memory, processed_memory, att_weights,
                   att_weights_cum, allowed_mask):
    """Location-sensitive attention (model.py:63-121)."""
    att_cat = jnp.stack([att_weights, att_weights_cum], axis=1)  # (B, 2, T)
    k = p["location_conv"]["weight"].shape[2]
    loc = conv1d_apply(p["location_conv"], att_cat, padding=(k - 1) // 2)
    loc = linear_apply(p["location_dense"], loc.transpose(0, 2, 1))
    query = linear_apply(p["query"], att_h)[:, None, :]
    energies = linear_apply(p["v"], jnp.tanh(query + loc + processed_memory))
    energies = energies[..., 0]  # (B, T_in)
    energies = jnp.where(allowed_mask, energies, MASK_VALUE)
    weights = jax.nn.softmax(energies, axis=1)
    context = jnp.einsum("bt,bte->be", weights, memory)
    return context, weights


class DecoderState(NamedTuple):
    att_h: jnp.ndarray
    att_c: jnp.ndarray
    dec_h: jnp.ndarray
    dec_c: jnp.ndarray
    att_weights: jnp.ndarray
    att_weights_cum: jnp.ndarray
    att_context: jnp.ndarray


def init_decoder_state(cfg: Tacotron2Config, B: int, T_in: int, dtype):
    return DecoderState(
        att_h=jnp.zeros((B, cfg.attention_rnn_dim), dtype),
        att_c=jnp.zeros((B, cfg.attention_rnn_dim), dtype),
        dec_h=jnp.zeros((B, cfg.decoder_rnn_dim), dtype),
        dec_c=jnp.zeros((B, cfg.decoder_rnn_dim), dtype),
        att_weights=jnp.zeros((B, T_in), dtype),
        att_weights_cum=jnp.zeros((B, T_in), dtype),
        att_context=jnp.zeros((B, cfg.encoder_embedding_dim), dtype),
    )


def decode_step(cfg: Tacotron2Config, p_dec, ds: DecoderState, prenet_frame,
                memory, processed_memory, memory_lengths, t, key,
                training: bool):
    """One decoder step (model.py:387-442). Returns (state, mel, gate, att)."""
    T_in = memory.shape[1]
    cell_in = jnp.concatenate([prenet_frame, ds.att_context], axis=-1)
    att_h, att_c = lstm_cell(p_dec["attention_rnn"], cell_in, ds.att_h, ds.att_c)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    att_h = dropout(k1, att_h, cfg.p_attention_dropout, training)
    att_c = dropout(k2, att_c, cfg.p_attention_dropout, training)

    if cfg.attention_window_size >= 0:
        allowed = windowed_attention_mask(
            memory_lengths, cfg.attention_window_size, t, T_in
        )
    else:
        allowed = jnp.arange(T_in)[None, :] < memory_lengths[:, None]

    context, weights = attention_step(
        p_dec["attention"], att_h, memory, processed_memory,
        ds.att_weights, ds.att_weights_cum, allowed,
    )
    weights_cum = ds.att_weights_cum + weights

    dec_in = jnp.concatenate([att_h, context], axis=-1)
    dec_h, dec_c = lstm_cell(p_dec["decoder_rnn"], dec_in, ds.dec_h, ds.dec_c)
    dec_h = dropout(k3, dec_h, cfg.p_decoder_dropout, training)
    dec_c = dropout(k4, dec_c, cfg.p_decoder_dropout, training)

    proj_in = jnp.concatenate([dec_h, context], axis=-1)
    mel_frame = linear_apply(p_dec["linear_projection"], proj_in)
    gate = linear_apply(p_dec["gate_layer"], proj_in)[:, 0]

    new_state = DecoderState(att_h, att_c, dec_h, dec_c, weights, weights_cum,
                             context)
    return new_state, mel_frame, gate, weights


# ==========================================================================
# teacher-forced forward (training)
# ==========================================================================

def tacotron2_forward(
    cfg: Tacotron2Config,
    params,
    state,
    ppg_padded: jnp.ndarray,       # (B, n_symbols, T_in)
    input_lengths: jnp.ndarray,    # (B,)
    mel_targets: jnp.ndarray,      # (B, 80, T_out) teacher frames
    output_lengths: jnp.ndarray,   # (B,)
    key,
    training: bool = True,
    remat: bool = False,
):
    """Teacher-forced forward (model.py:580-595).

    Returns ((mel_out, mel_out_postnet, gate_out, alignments), new_state),
    padding-masked per parse_output (model.py:566-578).

    `remat=True` wraps the decoder scan body in `jax.checkpoint`
    (classic BPTT rematerialization): backward recomputes each step's
    attention/LSTM internals from the carried state instead of storing
    T_out of them — the decoder's activation pool drops to the carries,
    unlocking training batches past the HBM wall (docs/PERF.md).
    Numerically identical (the same ops replay).
    """
    B, _, T_out = mel_targets.shape
    key, k_enc = jax.random.split(key)
    memory, enc_state = encoder_apply(
        params, state, ppg_padded, input_lengths, k_enc, training,
        unroll=cfg.scan_unroll,
    )
    processed_memory = linear_apply(
        params["decoder"]["attention"]["memory"], memory
    )

    # Decoder inputs: go frame + teacher frames shifted right, prenet applied
    # to the whole sequence up-front (model.py:459-462).
    go = jnp.zeros((B, 1, cfg.n_acoustic_feat_dims), mel_targets.dtype)
    dec_in = jnp.concatenate([go, mel_targets.transpose(0, 2, 1)[:, :-1]], axis=1)
    key, k_pre = jax.random.split(key)
    dec_in = prenet_apply(params["decoder"]["prenet"], dec_in, k_pre)

    ds = init_decoder_state(cfg, B, memory.shape[1], memory.dtype)
    p_dec = params["decoder"]

    def step(carry, inp):
        ds, key = carry
        t, frame = inp
        key, sub = jax.random.split(key)
        ds, mel_f, gate_f, att_w = decode_step(
            cfg, p_dec, ds, frame, memory, processed_memory, input_lengths,
            t, sub, training,
        )
        return (ds, key), (mel_f, gate_f, att_w)

    if remat:
        # prevent_cse=False is safe (and faster) under scan: the loop
        # boundary already stops the cross-iteration CSE that the flag
        # guards against
        step = jax.checkpoint(step, prevent_cse=False)

    key, k_scan = jax.random.split(key)
    (_, _), (mels, gates, aligns) = jax.lax.scan(
        step, (ds, k_scan),
        (jnp.arange(T_out), dec_in.transpose(1, 0, 2)),
        unroll=cfg.scan_unroll,
    )
    mel_out = mels.transpose(1, 2, 0)        # (B, 80, T_out)
    gate_out = gates.transpose(1, 0)         # (B, T_out)
    alignments = aligns.transpose(1, 0, 2)   # (B, T_out, T_in)

    key, k_post = jax.random.split(key)
    residual, post_state = postnet_apply(params, state, mel_out, k_post, training)
    mel_out_postnet = mel_out + residual

    if cfg.mask_padding:
        valid = (jnp.arange(T_out)[None, :] < output_lengths[:, None])
        mel_mask = valid[:, None, :]
        mel_out = jnp.where(mel_mask, mel_out, 0.0)
        mel_out_postnet = jnp.where(mel_mask, mel_out_postnet, 0.0)
        gate_out = jnp.where(valid, gate_out, 1e3)

    new_state = {"encoder": enc_state, "postnet": post_state}
    return (mel_out, mel_out_postnet, gate_out, alignments), new_state


# ==========================================================================
# autoregressive inference
# ==========================================================================

def tacotron2_inference(
    cfg: Tacotron2Config,
    params,
    state,
    ppg: jnp.ndarray,   # (B, n_symbols, T_in); B=1 matches reference usage
    key,
    input_lengths=None,
):
    """Autoregressive decode (model.py:597-610, 489-535).

    Gate > threshold stops decoding (checked on element 0, like the
    reference's scalar check); hard cap at max_decoder_steps.  Runs as a
    `lax.while_loop` writing into preallocated buffers, so early stop saves
    real device time.  Prenet dropout stays ON (reference behavior).

    `input_lengths` defaults to the full T_in (reference model.py:599);
    passing true lengths lets callers bucket-pad the PPG so one compiled
    shape serves many utterance lengths.

    Returns (mel_out, mel_out_postnet, gate_out, alignments, n_steps).
    """
    B, _, T_in = ppg.shape
    if B != 1:
        raise ValueError(
            f"tacotron2_inference stops on sequence 0's gate only (the "
            f"reference's batch-1 semantics, model.py:524); got B={B}. "
            f"Use tacotron2_inference_batched for per-sequence stopping."
        )
    if input_lengths is None:
        input_lengths = jnp.full((B,), T_in, jnp.int32)
    key, k_enc = jax.random.split(key)
    memory, _ = encoder_apply(params, state, ppg, input_lengths, k_enc,
                              training=False, mask_convs=True,
                              unroll=cfg.scan_unroll)
    processed_memory = linear_apply(
        params["decoder"]["attention"]["memory"], memory
    )
    p_dec = params["decoder"]
    M = cfg.max_decoder_steps
    D = cfg.n_acoustic_feat_dims

    ds0 = init_decoder_state(cfg, B, T_in, memory.dtype)
    mel_buf = jnp.zeros((M, B, D), memory.dtype)
    gate_buf = jnp.full((M, B), 1e3, memory.dtype)
    align_buf = jnp.zeros((M, B, T_in), memory.dtype)

    def cond(loop):
        t, done, *_ = loop
        return (~done) & (t < M)

    def body(loop):
        t, done, ds, prev_frame, key, mel_buf, gate_buf, align_buf = loop
        key, k_pre, k_step = jax.random.split(key, 3)
        frame = prenet_apply(p_dec["prenet"], prev_frame, k_pre)
        ds, mel_f, gate_f, att_w = decode_step(
            cfg, p_dec, ds, frame, memory, processed_memory, input_lengths,
            t, k_step, training=False,
        )
        mel_buf = mel_buf.at[t].set(mel_f)
        gate_buf = gate_buf.at[t].set(gate_f)
        align_buf = align_buf.at[t].set(att_w)
        done = jax.nn.sigmoid(gate_f[0]) > cfg.gate_threshold
        return (t + 1, done, ds, mel_f, key, mel_buf, gate_buf, align_buf)

    init = (jnp.int32(0), jnp.bool_(False), ds0,
            jnp.zeros((B, D), memory.dtype), key, mel_buf, gate_buf, align_buf)
    t_end, _, _, _, _, mel_buf, gate_buf, align_buf = jax.lax.while_loop(
        cond, body, init
    )

    mel_out = mel_buf.transpose(1, 2, 0)       # (B, D, M)
    gate_out = gate_buf.transpose(1, 0)        # (B, M)
    alignments = align_buf.transpose(1, 0, 2)  # (B, M, T_in)

    produced = (jnp.arange(M)[None, None, :] < t_end)
    residual, _ = postnet_apply(params, state, mel_out, key, training=False,
                                valid_mask=produced)
    mel_out_postnet = jnp.where(produced, mel_out + residual, 0.0)

    return mel_out, mel_out_postnet, gate_out, alignments, t_end


def tacotron2_inference_batched(
    cfg: Tacotron2Config,
    params,
    state,
    ppg: jnp.ndarray,        # (B, n_symbols, T_in)
    input_lengths: jnp.ndarray,
    key,
):
    """Batched autoregressive decode with per-sequence gate stopping.

    A production-serving extension the reference lacks (its inference is
    strictly batch-1, model.py:597-610): every sequence carries its own
    done flag; the device loop exits when ALL sequences have fired their
    gate (or at max_decoder_steps); frames produced after a sequence's own
    stop are zeroed.

    Returns (mel_out, mel_out_postnet, gate_out, alignments,
    mel_lengths (B,)).
    """
    B, _, T_in = ppg.shape
    key, k_enc = jax.random.split(key)
    memory, _ = encoder_apply(params, state, ppg, input_lengths, k_enc,
                              training=False, mask_convs=True,
                              unroll=cfg.scan_unroll)
    processed_memory = linear_apply(
        params["decoder"]["attention"]["memory"], memory
    )
    p_dec = params["decoder"]
    M = cfg.max_decoder_steps
    D = cfg.n_acoustic_feat_dims

    ds0 = init_decoder_state(cfg, B, T_in, memory.dtype)
    mel_buf = jnp.zeros((M, B, D), memory.dtype)
    gate_buf = jnp.full((M, B), 1e3, memory.dtype)
    align_buf = jnp.zeros((M, B, T_in), memory.dtype)
    done0 = jnp.zeros((B,), bool)
    len0 = jnp.full((B,), M, jnp.int32)

    def cond(loop):
        t, done, *_ = loop
        return (~jnp.all(done)) & (t < M)

    def body(loop):
        (t, done, lengths, ds, prev_frame, key,
         mel_buf, gate_buf, align_buf) = loop
        key, k_pre, k_step = jax.random.split(key, 3)
        frame = prenet_apply(p_dec["prenet"], prev_frame, k_pre)
        ds, mel_f, gate_f, att_w = decode_step(
            cfg, p_dec, ds, frame, memory, processed_memory, input_lengths,
            t, k_step, training=False,
        )
        active = ~done
        mel_buf = mel_buf.at[t].set(
            jnp.where(active[:, None], mel_f, 0.0)
        )
        gate_buf = gate_buf.at[t].set(jnp.where(active, gate_f, 1e3))
        align_buf = align_buf.at[t].set(
            jnp.where(active[:, None], att_w, 0.0)
        )
        fired = jax.nn.sigmoid(gate_f) > cfg.gate_threshold
        newly_done = active & fired
        lengths = jnp.where(newly_done, t + 1, lengths)
        done = done | fired
        return (t + 1, done, lengths, ds, mel_f, key, mel_buf, gate_buf,
                align_buf)

    init = (jnp.int32(0), done0, len0, ds0,
            jnp.zeros((B, D), memory.dtype), key, mel_buf, gate_buf,
            align_buf)
    t_end, done, lengths, _, _, _, mel_buf, gate_buf, align_buf = (
        jax.lax.while_loop(cond, body, init)
    )
    lengths = jnp.where(done, lengths, t_end)

    mel_out = mel_buf.transpose(1, 2, 0)
    gate_out = gate_buf.transpose(1, 0)
    alignments = align_buf.transpose(1, 0, 2)

    produced = (jnp.arange(M)[None, None, :] < lengths[:, None, None])
    residual, _ = postnet_apply(params, state, mel_out, key, training=False,
                                valid_mask=produced)
    mel_out_postnet = jnp.where(produced, mel_out + residual, 0.0)

    return mel_out, mel_out_postnet, gate_out, alignments, lengths
