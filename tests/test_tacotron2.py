"""Tacotron2 model tests.

Beyond the reference's coverage (its torch model had zero tests): primitive
parity vs torch CPU (LSTM cell, conv1d, BiLSTM packed semantics), forward
shape/masking invariants from parse_output, windowed-attention quirk,
gradient flow to every parameter, and gate-based early stop at inference.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fac_via_ppg_tpu.configs.hparams import Tacotron2Config
from fac_via_ppg_tpu.models.tacotron2 import (
    init_tacotron2,
    tacotron2_forward,
    tacotron2_inference,
    windowed_attention_mask,
)
from fac_via_ppg_tpu.ops.initializers import (
    batchnorm_apply,
    batchnorm_params,
    batchnorm_state,
    conv1d_apply,
    conv_transpose1d_apply,
    lstm_cell,
)
from fac_via_ppg_tpu.ops.rnn import bidirectional_lstm, unidirectional_lstm
from fac_via_ppg_tpu.train.losses import bce_with_logits, tacotron2_loss

CFG = Tacotron2Config(
    n_symbols=64,
    symbols_embedding_dim=48,
    encoder_embedding_dim=48,
    decoder_rnn_dim=32,
    prenet_dim=24,
    attention_rnn_dim=32,
    attention_dim=16,
    attention_location_n_filters=8,
    attention_location_kernel_size=15,
    postnet_embedding_dim=32,
    max_decoder_steps=60,
)


@pytest.fixture(scope="module")
def model():
    params, state = jax.jit(
        functools.partial(init_tacotron2, cfg=CFG)
    )(jax.random.PRNGKey(0))
    return params, state


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(0)
    B, T_in, T_out = 3, 20, 24
    ppg = jnp.asarray(np.abs(rng.rand(B, CFG.n_symbols, T_in)), jnp.float32)
    in_len = jnp.array([20, 15, 10])
    mel = jnp.asarray(rng.randn(B, 80, T_out), jnp.float32)
    out_len = jnp.array([24, 18, 12])
    gate = (jnp.arange(T_out)[None, :] >= (out_len - 1)[:, None]).astype(
        jnp.float32
    )
    return ppg, in_len, mel, out_len, gate


# -------------------------------------------------------- primitive parity

def test_lstm_cell_matches_torch(rng):
    import torch

    H, D, B = 7, 5, 3
    cell = torch.nn.LSTMCell(D, H)
    p = {
        "weight_ih": jnp.asarray(cell.weight_ih.detach().numpy()),
        "weight_hh": jnp.asarray(cell.weight_hh.detach().numpy()),
        "bias_ih": jnp.asarray(cell.bias_ih.detach().numpy()),
        "bias_hh": jnp.asarray(cell.bias_hh.detach().numpy()),
    }
    x = rng.randn(B, D).astype(np.float32)
    h = rng.randn(B, H).astype(np.float32)
    c = rng.randn(B, H).astype(np.float32)
    ht, ct = cell(torch.tensor(x), (torch.tensor(h), torch.tensor(c)))
    hj, cj = lstm_cell(p, jnp.asarray(x), jnp.asarray(h), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(hj), ht.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cj), ct.detach().numpy(), atol=1e-5)


def test_conv1d_matches_torch(rng):
    import torch

    conv = torch.nn.Conv1d(4, 6, kernel_size=5, padding=2, dilation=1)
    p = {
        "weight": jnp.asarray(conv.weight.detach().numpy()),
        "bias": jnp.asarray(conv.bias.detach().numpy()),
    }
    x = rng.randn(2, 4, 11).astype(np.float32)
    out_t = conv(torch.tensor(x)).detach().numpy()
    out_j = np.asarray(conv1d_apply(p, jnp.asarray(x), padding=2))
    np.testing.assert_allclose(out_j, out_t, atol=1e-5)


def test_dilated_conv1d_matches_torch(rng):
    import torch

    conv = torch.nn.Conv1d(3, 8, kernel_size=3, padding=4, dilation=4)
    p = {
        "weight": jnp.asarray(conv.weight.detach().numpy()),
        "bias": jnp.asarray(conv.bias.detach().numpy()),
    }
    x = rng.randn(2, 3, 16).astype(np.float32)
    out_t = conv(torch.tensor(x)).detach().numpy()
    out_j = np.asarray(conv1d_apply(p, jnp.asarray(x), padding=4, dilation=4))
    np.testing.assert_allclose(out_j, out_t, atol=1e-5)


def test_conv_transpose1d_matches_torch(rng):
    import torch

    conv = torch.nn.ConvTranspose1d(4, 4, 16, stride=5)
    p = {
        "weight": jnp.asarray(conv.weight.detach().numpy()),
        "bias": jnp.asarray(conv.bias.detach().numpy()),
    }
    x = rng.randn(2, 4, 9).astype(np.float32)
    out_t = conv(torch.tensor(x)).detach().numpy()
    out_j = np.asarray(conv_transpose1d_apply(p, jnp.asarray(x), stride=5))
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, atol=1e-5)


def test_batchnorm_matches_torch(rng):
    import torch

    bn = torch.nn.BatchNorm1d(5)
    bn.train()
    x = rng.randn(4, 5, 7).astype(np.float32)
    out_t = bn(torch.tensor(x)).detach().numpy()
    p = batchnorm_params(5)
    s = batchnorm_state(5)
    out_j, new_s = batchnorm_apply(p, s, jnp.asarray(x), training=True)
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_s["running_mean"]),
        bn.running_mean.numpy(), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_s["running_var"]),
        bn.running_var.numpy(), atol=1e-5,
    )


def test_bilstm_packed_semantics_match_torch(rng):
    """BiLSTM with masks == torch pack_padded/pad_packed."""
    import torch

    D, H, B, T = 6, 4, 3, 8
    lstm = torch.nn.LSTM(D, H, 1, batch_first=True, bidirectional=True)
    sd = {k: v.detach().numpy() for k, v in lstm.state_dict().items()}
    fwd = {
        "weight_ih": jnp.asarray(sd["weight_ih_l0"]),
        "weight_hh": jnp.asarray(sd["weight_hh_l0"]),
        "bias_ih": jnp.asarray(sd["bias_ih_l0"]),
        "bias_hh": jnp.asarray(sd["bias_hh_l0"]),
    }
    bwd = {
        "weight_ih": jnp.asarray(sd["weight_ih_l0_reverse"]),
        "weight_hh": jnp.asarray(sd["weight_hh_l0_reverse"]),
        "bias_ih": jnp.asarray(sd["bias_ih_l0_reverse"]),
        "bias_hh": jnp.asarray(sd["bias_hh_l0_reverse"]),
    }
    x = rng.randn(B, T, D).astype(np.float32)
    lengths = np.array([8, 5, 3])
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), lengths, batch_first=True
    )
    out_t, _ = lstm(packed)
    out_t, _ = torch.nn.utils.rnn.pad_packed_sequence(out_t, batch_first=True)
    out_j = np.asarray(
        bidirectional_lstm(fwd, bwd, jnp.asarray(x), jnp.asarray(lengths))
    )
    np.testing.assert_allclose(out_j, out_t.detach().numpy(), atol=1e-5)


def test_bce_with_logits_matches_torch(rng):
    import torch

    logits = rng.randn(20).astype(np.float32) * 3
    targets = (rng.rand(20) > 0.5).astype(np.float32)
    ref = torch.nn.BCEWithLogitsLoss()(
        torch.tensor(logits), torch.tensor(targets)
    ).item()
    mine = float(jnp.mean(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets))))
    np.testing.assert_allclose(mine, ref, rtol=1e-5)


# ------------------------------------------------------------ window mask

def test_windowed_attention_mask_matches_reference_semantics():
    """Scalar replication of utils.py:46-78 including the end-of-seq quirk."""
    lengths = np.array([10, 6, 3])
    T_in, w = 10, 2
    for t in range(12):
        got = np.asarray(
            windowed_attention_mask(jnp.asarray(lengths), w, t, T_in)
        )
        for b, L in enumerate(lengths):
            expected = np.zeros(T_in, bool)
            max_idx = L - 1
            start = min(max(0, t - w), max_idx)
            end = min(t + w, max_idx)
            if start <= end:
                expected[start : end + 1] = True
            np.testing.assert_array_equal(got[b], expected, f"t={t} b={b}")
        # The quirk: once t passes the end, the last valid frame stays open.
        for b, L in enumerate(lengths):
            if t - w > L - 1:
                assert got[b, L - 1] and got[b].sum() == 1


# ----------------------------------------------------------- model forward

def test_forward_shapes_and_masking(model, batch):
    params, state = model
    ppg, in_len, mel, out_len, gate = batch
    out, new_state = jax.jit(
        functools.partial(tacotron2_forward, CFG, training=True)
    )(params, state, ppg, in_len, mel, out_len, jax.random.PRNGKey(1))
    mel_out, mel_post, gate_out, align = out
    B, T_out, T_in = 3, 24, 20
    assert mel_out.shape == (B, 80, T_out)
    assert mel_post.shape == (B, 80, T_out)
    assert gate_out.shape == (B, T_out)
    assert align.shape == (B, T_out, T_in)
    # parse_output semantics: padded mel zeroed, padded gate forced to 1e3.
    assert float(jnp.abs(mel_out[1, :, 18:]).max()) == 0.0
    assert float(jnp.abs(mel_post[2, :, 12:]).max()) == 0.0
    np.testing.assert_allclose(np.asarray(gate_out[1, 18:]), 1e3)
    # attention rows are distributions over the input.
    np.testing.assert_allclose(
        np.asarray(align.sum(-1)), 1.0, atol=1e-4
    )
    # BN state updated in training mode.
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state, new_state
    )
    assert max(jax.tree.leaves(diff)) > 0


def test_attention_respects_input_lengths(model, batch):
    params, state = model
    ppg, in_len, mel, out_len, _ = batch
    out, _ = jax.jit(
        functools.partial(tacotron2_forward, CFG, training=False)
    )(params, state, ppg, in_len, mel, out_len, jax.random.PRNGKey(1))
    align = np.asarray(out[3])
    # Sequence 2 has length 10: attention beyond index 9 must be ~0 except
    # for the documented last-frame quirk (index 9 is <= max_idx).
    assert align[2, :, 10:].max() < 1e-6


def test_gradients_flow_everywhere(model, batch):
    params, state = model
    ppg, in_len, mel, out_len, gate = batch

    def loss_fn(p):
        out, _ = tacotron2_forward(
            CFG, p, state, ppg, in_len, mel, out_len,
            jax.random.PRNGKey(2), training=True,
        )
        return tacotron2_loss(out, (mel, gate))

    g = jax.jit(jax.grad(loss_fn))(params)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(g)
    zero = [
        jax.tree_util.keystr(path)
        for path, leaf in leaves
        if float(jnp.abs(leaf).max()) == 0.0
    ]
    assert not zero, f"No gradient reached: {zero}"
    norm = jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree.leaves(g)))
    assert bool(jnp.isfinite(norm))


def test_deterministic_in_eval_except_prenet(model, batch):
    """Prenet dropout is always on (model.py:134) - different keys change
    outputs even in eval mode; same key is fully deterministic."""
    params, state = model
    ppg, in_len, mel, out_len, _ = batch
    fwd = jax.jit(functools.partial(tacotron2_forward, CFG, training=False))
    out1, _ = fwd(params, state, ppg, in_len, mel, out_len, jax.random.PRNGKey(5))
    out2, _ = fwd(params, state, ppg, in_len, mel, out_len, jax.random.PRNGKey(5))
    out3, _ = fwd(params, state, ppg, in_len, mel, out_len, jax.random.PRNGKey(6))
    np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out2[0]))
    assert np.abs(np.asarray(out1[0]) - np.asarray(out3[0])).max() > 0


def test_inference_early_stop(model, batch):
    params, state = model
    ppg, *_ = batch
    mo, mp, go, al, t_end = jax.jit(
        functools.partial(tacotron2_inference, CFG)
    )(params, state, ppg[:1], jax.random.PRNGKey(3))
    t_end = int(t_end)
    assert 1 <= t_end <= CFG.max_decoder_steps
    assert mp.shape == (1, 80, CFG.max_decoder_steps)
    # Frames beyond t_end are zero; gate buffer is 1e3 there.
    if t_end < CFG.max_decoder_steps:
        assert float(jnp.abs(mp[:, :, t_end:]).max()) == 0.0
        np.testing.assert_allclose(np.asarray(go[0, t_end:]), 1e3)
