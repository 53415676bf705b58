"""Extended nnet3 component coverage (TDNN-F and friends) + prefetch."""

import numpy as np
import pytest

import jax.numpy as jnp

from fac_via_ppg_tpu.frontend.nnet3 import Component, apply_component


def test_tdnn_component_offsets(rng):
    w = rng.randn(4, 6).astype(np.float32)  # out 4, in 2 x 3 offsets
    b = rng.randn(4).astype(np.float32)
    comp = Component(
        "TdnnComponent",
        {"TimeOffsets": np.array([-1, 0, 1]), "LinearParams": w,
         "BiasParams": b},
    )
    x = jnp.asarray(rng.randn(5, 2), jnp.float32)
    out = np.asarray(apply_component(comp, x))
    assert out.shape == (5, 4)
    # edge clamping: row 0's -1 offset reads row 0
    x_np = np.asarray(x)
    expected0 = np.concatenate([x_np[0], x_np[0], x_np[1]]) @ w.T + b
    np.testing.assert_allclose(out[0], expected0, atol=1e-5)
    expected2 = np.concatenate([x_np[1], x_np[2], x_np[3]]) @ w.T + b
    np.testing.assert_allclose(out[2], expected2, atol=1e-5)


def test_tdnn_component_flat_weights_no_bias(rng):
    flat = rng.randn(24).astype(np.float32)  # (4 out, 6 in) flattened
    comp = Component(
        "TdnnComponent",
        {"TimeOffsets": np.array([0, 3]), "LinearParams": flat},
    )
    x = jnp.asarray(rng.randn(7, 3), jnp.float32)  # in = 3 x 2 offsets = 6
    out = np.asarray(apply_component(comp, x))
    assert out.shape == (7, 4)  # flat 24 / in 6 = 4 outputs
    w = flat.reshape(4, 6)
    x_np = np.asarray(x)
    expected_row0 = np.concatenate([x_np[0], x_np[3]]) @ w.T
    np.testing.assert_allclose(out[0], expected_row0, atol=1e-5)


def test_sum_group_component(rng):
    comp = Component("SumGroupComponent", {"Sizes": np.array([2, 3, 1])})
    x = jnp.asarray(rng.randn(4, 6), jnp.float32)
    out = np.asarray(apply_component(comp, x))
    assert out.shape == (4, 3)
    x_np = np.asarray(x)
    np.testing.assert_allclose(out[:, 0], x_np[:, :2].sum(1), atol=1e-6)
    np.testing.assert_allclose(out[:, 1], x_np[:, 2:5].sum(1), atol=1e-6)
    np.testing.assert_allclose(out[:, 2], x_np[:, 5], atol=1e-6)


def test_scale_offset_permute(rng):
    x = jnp.asarray(rng.randn(3, 4), jnp.float32)
    so = Component(
        "ScaleAndOffsetComponent",
        {"Scales": np.array([1.0, 2.0, 3.0, 4.0], np.float32),
         "Offsets": np.array([0.5, 0, -0.5, 0], np.float32)},
    )
    out = np.asarray(apply_component(so, x))
    np.testing.assert_allclose(
        out, np.asarray(x) * [1, 2, 3, 4] + [0.5, 0, -0.5, 0], atol=1e-6
    )
    perm = Component("PermuteComponent", {"ColumnMap": np.array([3, 0, 1, 2])})
    out = np.asarray(apply_component(perm, x))
    np.testing.assert_allclose(out, np.asarray(x)[:, [3, 0, 1, 2]])


def test_prefetch_iterator():
    from fac_via_ppg_tpu.data.prefetch import prefetch

    items = list(range(10))
    seen = list(prefetch(items, place=lambda x: x * 2, depth=3))
    assert seen == [x * 2 for x in items]
    # re-iterable
    assert list(prefetch(items)) == items


def test_prefetch_propagates_errors():
    from fac_via_ppg_tpu.data.prefetch import prefetch

    def gen():
        yield 1
        raise RuntimeError("boom")

    it = iter(prefetch(gen()))
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)
