"""Cross-layer Pallas WN flow kernel (ops/wn_flow_pallas.py).

Interpret-mode (CPU) parity against the XLA `wn_apply` formulation —
the kernel must reproduce the coupling-net output including the dilated
convs' zero padding at sequence edges, the overlap-save halo discipline,
ragged (non-tile-multiple) lengths, and the heterogeneous flow channel
counts (n_half 4/3/2 behind the shared p_ch=8 padding).

Reference semantics being reproduced: the WN hot loop, glow.py:133-152.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fac_via_ppg_tpu.configs.hparams import WaveGlowConfig
from fac_via_ppg_tpu.models.waveglow import (
    init_waveglow,
    remove_weightnorm,
    wn_apply,
)
from fac_via_ppg_tpu.ops.initializers import conv1d_apply
from fac_via_ppg_tpu.ops.wn_flow_pallas import (
    cast_pack,
    flow_buf_geometry,
    pack_wn_flow,
    pad_time_for_flow,
    wn_flow_pallas,
)

CFG = WaveGlowConfig(
    n_mel_channels=16,
    n_flows=12,
    n_group=8,
    wn_n_layers=4,
    wn_n_channels=64,
    upsample_kernel_size=32,
)


@pytest.fixture(scope="module")
def params():
    p = remove_weightnorm(init_waveglow(jax.random.PRNGKey(0), CFG))
    # zero-init end convs would make the comparison vacuous
    k = jax.random.PRNGKey(1)
    for wn in p["wn"]:
        k, k1, k2 = jax.random.split(k, 3)
        wn["end"]["weight"] = 0.1 * jax.random.normal(
            k1, wn["end"]["weight"].shape, jnp.float32
        )
        wn["end"]["bias"] = 0.1 * jax.random.normal(
            k2, wn["end"]["bias"].shape, jnp.float32
        )
    return p


def _cond_padded(wn, spect_g, t_pad, halo, dtype=jnp.float32):
    """The stacked cond projection over time-padded spect — exactly how
    the integration layer feeds the kernel."""
    cond_w = jnp.concatenate(
        [p["weight"] for p in wn["cond_layers"]], axis=0
    ).astype(dtype)
    cond_b = jnp.concatenate(
        [p["bias"] for p in wn["cond_layers"]], axis=0
    ).astype(dtype)
    sp = pad_time_for_flow(spect_g.astype(dtype), t_pad, halo)
    return conv1d_apply({"weight": cond_w, "bias": cond_b}, sp)


def _run_flow(params, flow_idx, B, T, tile, dtype=jnp.float32):
    wn = params["wn"][flow_idx]
    n_half = wn["start"]["weight"].shape[1]
    k = jax.random.PRNGKey(flow_idx + 10)
    k1, k2 = jax.random.split(k)
    audio_half = jax.random.normal(k1, (B, n_half, T), jnp.float32)
    spect_g = jax.random.normal(
        k2, (B, CFG.n_mel_channels * CFG.n_group, T), jnp.float32
    )
    t_pad, halo, _ = flow_buf_geometry(T, tile, CFG.wn_n_layers)
    cond = _cond_padded(wn, spect_g, t_pad, halo, dtype)
    pack = cast_pack(pack_wn_flow(wn, CFG.wn_n_layers), dtype)
    got = wn_flow_pallas(
        pack, audio_half.astype(dtype), cond, CFG.wn_n_layers, T,
        tile=tile, interpret=True,
    )
    want = wn_apply(cfg=CFG, wn=wn, audio_half=audio_half,
                    spect_grouped=spect_g)
    return got[:, : 2 * n_half, :T], want, got


def test_matches_wn_apply_f32():
    """f32 interpret-mode output == XLA wn_apply to float tolerance,
    including a ragged T that exercises both the tile mask and the
    sequence-edge zero padding."""
    p = remove_weightnorm(init_waveglow(jax.random.PRNGKey(0), CFG))
    for wn in p["wn"]:
        wn["end"]["weight"] = 0.1 * jnp.ones_like(wn["end"]["weight"])
    got, want, _ = _run_flow(p, 0, B=2, T=300, tile=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-4)


def test_heterogeneous_flows_behind_shared_padding(params):
    """Flows with n_half 4, 3 and 2 all run through the SAME p_ch=8
    kernel shape; padded output rows are exactly zero."""
    seen = set()
    for flow_idx, wn in enumerate(params["wn"]):
        n_half = wn["start"]["weight"].shape[1]
        if n_half in seen:
            continue
        seen.add(n_half)
        got, want, raw = _run_flow(params, flow_idx, B=2, T=200, tile=128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-4)
        pad_rows = np.asarray(raw[:, 2 * n_half:, :200])
        np.testing.assert_array_equal(pad_rows, 0.0)
    assert seen == {4, 3, 2}


def test_tile_invariance(params):
    """The overlap-save tiling is an implementation detail: different
    tile sizes give identical results."""
    a = _run_flow(params, 0, B=1, T=260, tile=128)[0]
    b = _run_flow(params, 0, B=1, T=260, tile=256)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)


def test_bf16_close_to_f32(params):
    """bf16 serving dtype stays within bf16-scale error of the f32
    reference (matching the XLA path's mixed-precision contract)."""
    got, want, _ = _run_flow(params, 0, B=1, T=200, tile=128,
                             dtype=jnp.bfloat16)
    err = np.max(np.abs(np.asarray(got, np.float32) - np.asarray(want)))
    scale = np.max(np.abs(np.asarray(want)))
    assert err < 0.05 * max(scale, 1.0), (err, scale)


def test_geometry_validation():
    t_pad, halo, guard = flow_buf_geometry(300, 128, 4)
    assert t_pad == 384 and halo == 128 and guard == 128
    with pytest.raises(ValueError):
        flow_buf_geometry(300, 100, 4)  # tile not lane-aligned
    # halo covers the cumulative dilation for the full-size config
    t_pad8, halo8, guard8 = flow_buf_geometry(20000, 4096, 8)
    assert halo8 >= 2 ** 8 - 1 and guard8 >= 2 ** 7 and t_pad8 % 4096 == 0


def test_waveglow_infer_flow_impl(params):
    """Full 12-flow inference with wn_impl='flow_interpret' matches the
    XLA path, dense and int8-cond, sharing one padded spect across
    flows (models/waveglow.wn_apply_flow integration)."""
    from fac_via_ppg_tpu.models.waveglow import (
        pack_waveglow_flow,
        waveglow_infer,
    )

    B, F = 2, 20  # frames -> G = F*hop/n_group samples per group row
    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    spect = jax.random.normal(k1, (B, CFG.n_mel_channels, F)) * 0.5 - 1.0

    want = waveglow_infer(CFG, params, spect, 0.7, k2)
    packs = pack_waveglow_flow(CFG, params)
    got = waveglow_infer(CFG, params, spect, 0.7, k2,
                         wn_impl="flow_interpret", packed_wn=packs,
                         flow_tile=128)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)

    # int8 cond composes with the flow kernel; valid-column quantization
    # is identical to the XLA int8 path
    want8 = waveglow_infer(CFG, params, spect, 0.7, k2, cond_impl="int8")
    got8 = waveglow_infer(CFG, params, spect, 0.7, k2,
                          wn_impl="flow_interpret", packed_wn=packs,
                          cond_impl="int8", flow_tile=128)
    np.testing.assert_allclose(np.asarray(got8), np.asarray(want8),
                               atol=2e-4, rtol=1e-3)


def test_wide_group_derives_p_ch():
    """n_group > 8 (2*n_half wider than the old hard-coded p_ch=8):
    pack_wn_flow derives a sublane-aligned channel padding and the kernel
    still reproduces wn_apply, instead of failing at pack time with a
    broadcast error (round-4 advisor finding)."""
    cfg = WaveGlowConfig(
        n_mel_channels=16, n_flows=2, n_group=16, n_early_every=4,
        wn_n_layers=2, wn_n_channels=64, upsample_kernel_size=32,
    )
    p = remove_weightnorm(init_waveglow(jax.random.PRNGKey(2), cfg))
    wn = p["wn"][0]
    wn["end"]["weight"] = 0.1 * jnp.ones_like(wn["end"]["weight"])
    n_half = wn["start"]["weight"].shape[1]
    assert 2 * n_half == 16  # wider than the old default

    pack = pack_wn_flow(wn, cfg.wn_n_layers)
    assert pack["w_end"].shape[0] == 16 and pack["w_start"].shape[1] == 16

    B, T, tile = 2, 200, 128
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    audio_half = jax.random.normal(k1, (B, n_half, T), jnp.float32)
    spect_g = jax.random.normal(
        k2, (B, cfg.n_mel_channels * cfg.n_group, T), jnp.float32
    )
    t_pad, halo, _ = flow_buf_geometry(T, tile, cfg.wn_n_layers)
    cond = _cond_padded(wn, spect_g, t_pad, halo)
    got = wn_flow_pallas(pack, audio_half, cond, cfg.wn_n_layers, T,
                         tile=tile, interpret=True)
    want = wn_apply(cfg=cfg, wn=wn, audio_half=audio_half,
                    spect_grouped=spect_g)
    np.testing.assert_allclose(np.asarray(got[:, : 2 * n_half, :T]),
                               np.asarray(want), atol=2e-5, rtol=2e-4)
