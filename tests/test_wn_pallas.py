"""WN Pallas kernel equivalence (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fac_via_ppg_tpu.ops.wn_pallas import (
    pack_in_weight,
    wn_layer_pallas,
    wn_layer_reference,
)


@pytest.fixture
def layer(rng):
    B, T, C = 2, 1024, 256

    def mk(shape, s=0.05):
        return jnp.asarray(rng.randn(*shape) * s, jnp.float32)

    return dict(
        x=mk((B, T, C), 0.3),
        cond=mk((B, T, 2 * C), 0.3),
        w_in=mk((3 * C, 2 * C)),
        b_in=mk((2 * C,), 0.1),
        w_rs=mk((C, 2 * C)),
        b_rs=mk((2 * C,), 0.1),
    )


@pytest.mark.parametrize("dilation", [1, 4, 8, 64, 128])
def test_kernel_matches_xla(layer, dilation):
    a_ref, s_ref = wn_layer_reference(**layer, dilation=dilation)
    a_pl, s_pl = wn_layer_pallas(**layer, dilation=dilation, interpret=True)
    np.testing.assert_allclose(np.asarray(a_pl), np.asarray(a_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref), atol=1e-5)


def test_kernel_last_layer(layer, rng):
    C = 256
    layer = dict(layer)
    layer["w_rs"] = jnp.asarray(rng.randn(C, C) * 0.05, jnp.float32)
    layer["b_rs"] = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    _, s_ref = wn_layer_reference(**layer, dilation=32, last=True)
    _, s_pl = wn_layer_pallas(**layer, dilation=32, last=True, interpret=True)
    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref), atol=1e-5)


def test_pack_in_weight_matches_conv(rng):
    """Stacked-matmul weight layout == torch dilated conv."""
    import torch

    C = 8
    conv = torch.nn.Conv1d(C, 2 * C, 3, dilation=4, padding=4)
    x = rng.randn(1, C, 64).astype(np.float32)
    ref = conv(torch.tensor(x)).detach().numpy()

    w_in = pack_in_weight(jnp.asarray(conv.weight.detach().numpy()))
    b_in = jnp.asarray(conv.bias.detach().numpy())
    xt = jnp.asarray(x.transpose(0, 2, 1))
    zeros_rs = jnp.zeros((C, C), jnp.float32)
    # run reference layer with zero cond / identity-free path: reuse the
    # x_cat construction by calling with zero res_skip and reading z via a
    # manual replication here instead.
    T = 64
    x_pad = jnp.pad(xt, ((0, 0), (4, 4), (0, 0)))
    x_cat = jnp.concatenate(
        [x_pad[:, :T], x_pad[:, 4 : 4 + T], x_pad[:, 8 : 8 + T]], axis=2
    )
    z = x_cat @ w_in + b_in
    np.testing.assert_allclose(
        np.asarray(z.transpose(0, 2, 1)), ref, atol=1e-5
    )


def test_misaligned_dilation_falls_back(layer):
    """d=2 in compiled mode silently uses the XLA path (same results)."""
    a_ref, s_ref = wn_layer_reference(**layer, dilation=2)
    a_pl, s_pl = wn_layer_pallas(**layer, dilation=2, interpret=False)
    np.testing.assert_allclose(np.asarray(a_pl), np.asarray(a_ref), atol=1e-6)


def test_waveglow_infer_pallas_impl_matches_xla(rng):
    """The deployable wn_impl='pallas' path (here on the interpreter) must
    reproduce the XLA inference bit-for-bit-ish end to end, including the
    time padding to a tile multiple."""
    from fac_via_ppg_tpu.configs.hparams import WaveGlowConfig
    from fac_via_ppg_tpu.models.waveglow import (
        init_waveglow, remove_weightnorm, waveglow_infer,
    )

    cfg = WaveGlowConfig(
        n_mel_channels=16, hop_length=32, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=3, wn_n_channels=32,
        wn_kernel_size=3, upsample_kernel_size=256,
    )
    params = remove_weightnorm(init_waveglow(jax.random.PRNGKey(3), cfg))
    # make the couplings non-trivial (end layers are zero-initialized)
    for wn in params["wn"]:
        wn["end"]["weight"] = jnp.asarray(
            rng.randn(*np.shape(wn["end"]["weight"])) * 0.1, jnp.float32
        )
    mel = jnp.asarray(rng.randn(2, 16, 24), jnp.float32)  # G=96: pad to 512
    key = jax.random.PRNGKey(7)
    ref = waveglow_infer(cfg, params, mel, 0.8, key, wn_impl="xla")
    out = waveglow_infer(
        cfg, params, mel, 0.8, key, wn_impl="pallas_interpret"
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
