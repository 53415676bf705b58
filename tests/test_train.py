"""Training-stack tests: optimizer parity vs torch Adam, train-step loss
decrease, checkpoint round-trip, collate semantics, data-parallel
equivalence on the 8-device CPU mesh."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fac_via_ppg_tpu.configs.hparams import Tacotron2Config, WaveGlowConfig
from fac_via_ppg_tpu.data.ppg_mel_dataset import (
    EpochBatcher,
    compute_delta_acc_feat,
    ppg_acoustics_collate,
)
from fac_via_ppg_tpu.models.tacotron2 import init_tacotron2
from fac_via_ppg_tpu.models.waveglow import init_waveglow
from fac_via_ppg_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from fac_via_ppg_tpu.train import checkpoint as ckpt
from fac_via_ppg_tpu.train.optim import make_optimizer
from fac_via_ppg_tpu.train.step import (
    make_tacotron2_train_step,
    make_waveglow_train_step,
)

CFG = Tacotron2Config(
    n_symbols=32, symbols_embedding_dim=32, encoder_embedding_dim=32,
    decoder_rnn_dim=24, prenet_dim=16, attention_rnn_dim=24,
    attention_dim=12, attention_location_n_filters=4,
    attention_location_kernel_size=7, postnet_embedding_dim=24,
    max_decoder_steps=40,
)


def _batch(rng, B=4, T_in=12, T_out=16):
    ppg = np.abs(rng.rand(B, CFG.n_symbols, T_in)).astype(np.float32)
    in_len = np.array([T_in] * B, np.int64)
    mel = rng.randn(B, 80, T_out).astype(np.float32) * 0.1
    out_len = np.array([T_out] * B, np.int64)
    gate = (np.arange(T_out)[None, :] >= (out_len - 1)[:, None]).astype(
        np.float32
    )
    return ppg, in_len, mel, gate, out_len


def test_adam_matches_torch(rng):
    """clip -> L2 decay -> adam == torch clip_grad_norm_ + Adam(weight_decay)."""
    import torch

    w0 = rng.randn(5, 3).astype(np.float32)
    lr, wd, clip = 1e-2, 1e-2, 0.5

    # torch side
    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([p], lr=lr, weight_decay=wd)
    torch_grads = [rng.randn(5, 3).astype(np.float32) * 2 for _ in range(5)]
    for g in torch_grads:
        opt.zero_grad()
        p.grad = torch.tensor(g.copy())
        torch.nn.utils.clip_grad_norm_([p], clip)
        opt.step()

    # jax side
    optimizer = make_optimizer(lr, wd, clip)
    params = {"w": jnp.asarray(w0)}
    state = optimizer.init(params)
    for g in torch_grads:
        updates, state = optimizer.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), p.detach().numpy(), atol=1e-5
    )


def test_tacotron2_train_step_decreases_loss(rng):
    params, state = init_tacotron2(jax.random.PRNGKey(0), CFG)
    optimizer = make_optimizer(1e-3, 1e-6, 1.0)
    opt_state = optimizer.init(params)
    step = make_tacotron2_train_step(CFG, optimizer, donate=False)

    batch = tuple(map(jnp.asarray, _batch(rng)))
    # Fixed dropout key: deterministic objective so the decrease is not
    # drowned by fresh dropout noise over a short run.
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(20):
        out = step(params, state, opt_state, batch, key)
        params, state, opt_state = out.params, out.model_state, out.opt_state
        losses.append(float(out.loss))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses


def test_waveglow_train_step_decreases_loss(rng):
    cfg = WaveGlowConfig(
        n_mel_channels=8, hop_length=16, n_flows=4, n_group=4,
        n_early_every=2, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=32,
    )
    params = init_waveglow(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    step = make_waveglow_train_step(cfg, optimizer, sigma=0.7071, donate=False)

    mel = jnp.asarray(rng.randn(2, 8, 16), jnp.float32)
    audio = jnp.asarray(rng.randn(2, 256) * 0.1, jnp.float32)
    losses = []
    for _ in range(8):
        out = step(params, opt_state, (mel, audio))
        params, opt_state = out.params, out.opt_state
        losses.append(float(out.loss))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses


def test_lr_injection(rng):
    optimizer = make_optimizer(1e-3)
    params = {"w": jnp.zeros(3)}
    state = optimizer.init(params)
    state.hyperparams["learning_rate"] = 5e-4
    updates, _ = optimizer.update({"w": jnp.ones(3)}, state, params)
    # adam first step: update = -lr * sign-ish(grad)
    np.testing.assert_allclose(
        np.asarray(updates["w"]), -5e-4 * np.ones(3), rtol=1e-3
    )


def test_checkpoint_roundtrip(tmp_path, rng):
    params, state = init_tacotron2(jax.random.PRNGKey(0), CFG)
    optimizer = make_optimizer(1e-3, 1e-6, 1.0)
    opt_state = optimizer.init(params)
    path = str(tmp_path / "checkpoint_5")
    ckpt.save_checkpoint(path, params, opt_state, 1e-3, 5, state)
    restored = ckpt.load_checkpoint(
        path,
        like={"params": params, "opt_state": opt_state, "model_state": state},
    )
    assert restored["iteration"] == 5
    assert restored["learning_rate"] == 1e-3
    # optax NamedTuple structure survives (needed to resume the optimizer)
    assert hasattr(restored["opt_state"], "hyperparams")
    orig = jax.tree.leaves(params)
    back = jax.tree.leaves(restored["params"])
    assert len(orig) == len(back)
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # warm start returns weights only
    w = ckpt.warm_start(path)
    assert len(jax.tree.leaves(w)) == len(orig)


def test_collate_reference_semantics(rng):
    batch = [
        (rng.randn(10, 6).astype(np.float32), rng.randn(14, 5).astype(np.float32)),
        (rng.randn(7, 6).astype(np.float32), rng.randn(9, 5).astype(np.float32)),
        (rng.randn(12, 6).astype(np.float32), rng.randn(17, 5).astype(np.float32)),
    ]
    ppg, in_len, mel, gate, out_len = ppg_acoustics_collate(batch)
    # sorted by input length descending
    np.testing.assert_array_equal(in_len, [12, 10, 7])
    assert ppg.shape == (3, 6, 12)
    assert mel.shape == (3, 5, 17)
    # gate = 1 from last valid frame on (reference data_utils.py:327)
    np.testing.assert_array_equal(out_len, [17, 14, 9])
    assert gate[1, 13] == 1 and gate[1, 12] == 0 and gate[1, 16] == 1
    # zero padding beyond lengths
    assert np.abs(ppg[2, :, 7:]).max() == 0


def test_collate_bucketing(rng):
    batch = [
        (rng.randn(10, 6).astype(np.float32), rng.randn(14, 5).astype(np.float32)),
    ]
    ppg, in_len, mel, gate, out_len = ppg_acoustics_collate(batch, pad_to=16)
    assert ppg.shape[2] == 16
    assert mel.shape[2] == 16
    assert in_len[0] == 10 and out_len[0] == 14
    assert gate[0, 13] == 1 and gate[0, 15] == 1


def test_delta_acc_windows(rng):
    x = rng.randn(20, 3)
    out = compute_delta_acc_feat(x, True, True)
    assert out.shape == (20, 9)
    # interior: delta = 0.5*(x[t+1] - x[t-1])
    t = 10
    np.testing.assert_allclose(
        out[t, 3:6], 0.5 * (x[t + 1] - x[t - 1]), atol=1e-12
    )
    np.testing.assert_allclose(
        out[t, 6:9], 0.25 * x[t + 2] - 0.5 * x[t] + 0.25 * x[t - 2], atol=1e-12
    )
    with pytest.raises(ValueError):
        compute_delta_acc_feat(x, False, True)


def test_epoch_batcher_sharding():
    data = [(np.zeros((5, 2), np.float32), np.zeros((6, 3), np.float32))] * 16

    def fake_collate(b, pad_to=1):
        return len(b)

    shard_sizes = []
    for shard in range(2):
        b = EpochBatcher(data, 4, seed=0, collate_fn=fake_collate,
                         shard=shard, num_shards=2)
        shard_sizes.append(sum(1 for _ in b))
    assert shard_sizes == [2, 2]


def test_data_parallel_step_matches_single_device(rng):
    """The sharded step must produce the same update as unsharded.

    SGD is used so the comparison is linear in the gradients; Adam's
    first step is ~sign(g), which amplifies reduction-order noise on
    near-zero gradients into full +-lr flips.
    """
    import optax

    params, state = init_tacotron2(jax.random.PRNGKey(0), CFG)
    optimizer = optax.sgd(1e-2)
    opt_state = optimizer.init(params)
    step = make_tacotron2_train_step(CFG, optimizer, donate=False)
    batch = _batch(rng, B=8)
    key = jax.random.PRNGKey(2)

    out_single = step(params, state, opt_state,
                      tuple(map(jnp.asarray, batch)), key)

    mesh = make_mesh(data=8, model=1)
    p2 = replicate(mesh, params)
    s2 = replicate(mesh, state)
    o2 = replicate(mesh, opt_state)
    sharded = shard_batch(mesh, batch)
    out_sharded = step(p2, s2, o2, sharded, key)

    np.testing.assert_allclose(
        float(out_single.loss), float(out_sharded.loss), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(out_single.params),
                    jax.tree.leaves(out_sharded.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        )


def test_waveglow_tp_step_matches_single_device(rng):
    """DP x TP (4 data x 2 model) WaveGlow step == unsharded step.

    The WN-channel shardings (parallel/sharding.py) may only change the
    program layout, never the math.  SGD keeps the comparison linear in
    the gradients (see the DP test above).
    """
    import optax

    if jax.device_count() < 8:
        pytest.skip("needs an 8-device mesh")

    from jax.sharding import PartitionSpec as P

    from fac_via_ppg_tpu.parallel.sharding import (
        apply_shardings,
        waveglow_param_shardings,
    )

    cfg = WaveGlowConfig(
        n_mel_channels=8, hop_length=16, n_flows=4, n_group=8,
        n_early_every=2, n_early_size=2, wn_n_layers=3, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=32,
    )
    params = init_waveglow(jax.random.PRNGKey(0), cfg)
    optimizer = optax.sgd(1e-2)
    step = make_waveglow_train_step(cfg, optimizer, sigma=0.7071,
                                    donate=False)
    mel = rng.randn(8, 8, 16).astype(np.float32)
    audio = (rng.randn(8, 256) * 0.1).astype(np.float32)

    out_single = step(params, optimizer.init(params),
                      (jnp.asarray(mel), jnp.asarray(audio)))

    mesh = make_mesh(data=4, model=2)
    shardings = waveglow_param_shardings(mesh, params)
    specs = [s.spec for s in jax.tree.leaves(shardings)]
    assert any(s != P() for s in specs), "TP sharded nothing"
    p2 = apply_shardings(params, shardings)
    o2 = optimizer.init(p2)
    out_tp = step(p2, o2, shard_batch(mesh, (mel, audio)))

    np.testing.assert_allclose(
        float(out_single.loss), float(out_tp.loss), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(out_single.params),
                    jax.tree.leaves(out_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tacotron2_tp_step_matches_single_device(rng):
    """DP x TP (4 data x 2 model) Tacotron2 step == unsharded step.

    Lowered thresholds make the toy config exercise every sharding
    clause — prenet contraction split, column-parallel LSTM gate stacks
    and projections, AND the encoder/postnet Conv1d out-channel split —
    so the full-size TP program layout is covered structurally.  SGD
    keeps the comparison linear in the gradients (see the DP test)."""
    import optax

    if jax.device_count() < 8:
        pytest.skip("needs an 8-device mesh")

    from jax.sharding import PartitionSpec as P

    from fac_via_ppg_tpu.parallel.sharding import (
        apply_shardings,
        tacotron2_param_shardings,
    )

    params, state = init_tacotron2(jax.random.PRNGKey(0), CFG)
    optimizer = optax.sgd(1e-2)
    step = make_tacotron2_train_step(CFG, optimizer, donate=False)
    batch = _batch(rng, B=8)
    key = jax.random.PRNGKey(2)

    out_single = step(params, state, optimizer.init(params),
                      tuple(map(jnp.asarray, batch)), key)

    mesh = make_mesh(data=4, model=2)
    shardings = tacotron2_param_shardings(
        mesh, params, wide_threshold=16, big_threshold=64
    )
    flat = {
        jax.tree_util.keystr(path): s.spec
        for path, s in jax.tree_util.tree_flatten_with_path(shardings)[0]
    }
    assert any("conv" in k and s == P("model", None, None)
               for k, s in flat.items()), "conv out-channel TP missing"
    assert any(s == P(None, "model") for s in flat.values()), \
        "prenet contraction TP missing"
    assert any(s == P("model", None) for s in flat.values()), \
        "column-parallel matrix TP missing"
    p2 = apply_shardings(params, shardings)
    s2 = replicate(mesh, state)
    o2 = optimizer.init(p2)
    out_tp = step(p2, s2, o2, shard_batch(mesh, batch), key)

    np.testing.assert_allclose(
        float(out_single.loss), float(out_tp.loss), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(out_single.params),
                    jax.tree.leaves(out_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_zero_sharded_opt_state_matches_replicated(rng):
    """ZeRO-1 (Adam moments sharded over 'data') == replicated optimizer.

    The moment update is elementwise, so sharding it changes program
    layout only: GSPMD keeps the moment updates shard-local and
    all-gathers the param delta.  Verifies (a) multi-step param equality,
    (b) the moments are actually distributed (per-device shard strictly
    smaller than the leaf).

    Momentum-SGD, not Adam: like the DP/TP equivalence tests above, the
    cross-layout comparison must stay linear in the gradients — Adam's
    first update is ~lr*sign(g), so float reassociation between layouts
    on near-zero-gradient leaves flips it by O(lr) (observed 1.9e-4 at
    lr=1e-3), masking nothing but drowning the check.  Momentum state
    has the same shapes as Adam moments, so the ZeRO mechanics
    (shard-local state update + delta all-gather) are identical; the
    Adam+ZeRO composition itself runs in dryrun_multichip[waveglow]."""
    if jax.device_count() < 8:
        pytest.skip("needs an 8-device mesh")

    import optax
    from jax.sharding import PartitionSpec as P

    from fac_via_ppg_tpu.parallel.sharding import (
        apply_shardings,
        optimizer_state_shardings,
    )

    params, state = init_tacotron2(jax.random.PRNGKey(0), CFG)
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.sgd(1e-2, momentum=0.9)
    )
    step = make_tacotron2_train_step(CFG, optimizer, donate=False)
    batch = _batch(rng, B=8)
    key = jax.random.PRNGKey(2)

    mesh = make_mesh(data=8, model=1)
    sharded_batch = shard_batch(mesh, batch)

    # replicated reference trajectory (same DP program apart from layout)
    p_r = replicate(mesh, params)
    s_r = replicate(mesh, state)
    o_r = replicate(mesh, optimizer.init(params))

    # ZeRO trajectory
    p_z = replicate(mesh, params)
    s_z = replicate(mesh, state)
    o_z = optimizer.init(params)
    shardings = optimizer_state_shardings(mesh, o_z)
    specs = [s.spec for s in jax.tree_util.tree_leaves(shardings)]
    assert any(sp != P() for sp in specs), "ZeRO sharded nothing"
    o_z = apply_shardings(o_z, shardings)
    dist = [
        leaf for leaf in jax.tree_util.tree_leaves(o_z)
        if hasattr(leaf, "addressable_shards")
        and leaf.ndim > 0
        and leaf.addressable_shards[0].data.size < leaf.size
    ]
    assert dist, "no moment leaf is actually distributed"

    for _ in range(3):
        out_r = step(p_r, s_r, o_r, sharded_batch, key)
        p_r, s_r, o_r = out_r.params, out_r.model_state, out_r.opt_state
        out_z = step(p_z, s_z, o_z, sharded_batch, key)
        p_z, s_z, o_z = out_z.params, out_z.model_state, out_z.opt_state
    for a, b in zip(jax.tree.leaves(p_r), jax.tree.leaves(p_z)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_zero_sharded_opt_state_composes_with_tp(rng):
    """ZeRO-1 x TP on a (4 data x 2 model) mesh == the TP-only step.

    The moments inherit the TP 'model' split (a moment laid out
    differently from its param forces a reshard every step) and
    additionally shard over 'data' on an unsharded dim
    (optimizer_state_shardings param_spec_fn).  Verifies (a) multi-step
    param equality vs the TP run with mesh-replicated moments, (b) at
    least one moment leaf carries BOTH axes.  Momentum-SGD for the same
    linearity reason as the pure-ZeRO test above."""
    if jax.device_count() < 8:
        pytest.skip("needs an 8-device mesh")

    import optax
    from jax.sharding import PartitionSpec as P

    from fac_via_ppg_tpu.parallel.mesh import normalize_tree_placement
    from fac_via_ppg_tpu.parallel.sharding import (
        apply_shardings,
        optimizer_state_shardings,
        tacotron2_param_shardings,
        tacotron2_spec_fn,
    )

    params, state = init_tacotron2(jax.random.PRNGKey(0), CFG)
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.sgd(1e-2, momentum=0.9)
    )
    step = make_tacotron2_train_step(CFG, optimizer, donate=False)
    batch = _batch(rng, B=8)
    key = jax.random.PRNGKey(2)

    mesh = make_mesh(data=4, model=2)
    sharded_batch = shard_batch(mesh, batch)
    p_shardings = tacotron2_param_shardings(
        mesh, params, wide_threshold=16, big_threshold=64
    )

    # TP baseline: params TP-sharded, moments inherit the param layout
    p_t = apply_shardings(params, p_shardings)
    s_t = replicate(mesh, state)
    o_t = normalize_tree_placement(mesh, optimizer.init(p_t))

    # ZeRO-1 x TP: same params, moments composed 'model' + 'data'
    p_z = apply_shardings(params, p_shardings)
    s_z = replicate(mesh, state)
    o_z = normalize_tree_placement(mesh, optimizer.init(p_z))
    z_shardings = optimizer_state_shardings(
        mesh, o_z,
        param_spec_fn=tacotron2_spec_fn(mesh, wide_threshold=16,
                                        big_threshold=64),
    )
    specs = [s.spec for s in jax.tree_util.tree_leaves(z_shardings)]
    assert any(
        "model" in sp and "data" in sp
        for sp in (tuple(str(e) for e in s if e is not None) for s in specs)
    ), "no moment leaf composes both mesh axes"
    o_z = apply_shardings(o_z, z_shardings)

    for _ in range(3):
        out_t = step(p_t, s_t, o_t, sharded_batch, key)
        p_t, s_t, o_t = out_t.params, out_t.model_state, out_t.opt_state
        out_z = step(p_z, s_z, o_z, sharded_batch, key)
        p_z, s_z, o_z = out_z.params, out_z.model_state, out_z.opt_state
    for a, b in zip(jax.tree.leaves(p_t), jax.tree.leaves(p_z)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_tacotron2_bf16_train_step(rng):
    """bf16 compute policy: float32 params/opt/BN-stats throughout, finite
    loss tracking the float32 trajectory (train/step.py compute_dtype)."""
    params, state = init_tacotron2(jax.random.PRNGKey(0), CFG)
    optimizer = make_optimizer(1e-3, 1e-6, 1.0)
    opt_state = optimizer.init(params)
    step32 = make_tacotron2_train_step(CFG, optimizer, donate=False)
    step16 = make_tacotron2_train_step(CFG, optimizer, donate=False,
                                       compute_dtype=jnp.bfloat16)

    batch = tuple(map(jnp.asarray, _batch(rng)))
    key = jax.random.PRNGKey(1)

    p32, s32, o32 = params, state, opt_state
    p16, s16, o16 = params, state, opt_state
    l32, l16 = [], []
    for _ in range(10):
        out = step32(p32, s32, o32, batch, key)
        p32, s32, o32 = out.params, out.model_state, out.opt_state
        l32.append(float(out.loss))
        out = step16(p16, s16, o16, batch, key)
        p16, s16, o16 = out.params, out.model_state, out.opt_state
        l16.append(float(out.loss))
        assert np.isfinite(l16[-1])

    # everything the optimizer touches stays float32
    for leaf in jax.tree.leaves((p16, o16, s16)):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, leaf.dtype
    # the bf16 trajectory tracks the float32 one and still decreases
    assert l16[-1] < l16[0], l16
    np.testing.assert_allclose(l16[0], l32[0], rtol=0.05)
    np.testing.assert_allclose(l16[-1], l32[-1], rtol=0.15)


def test_waveglow_bf16_train_step(rng):
    """bf16 WaveGlow training: finite, decreasing, float32 state, and the
    first-step loss agrees with float32 (logdets/reductions stay f32)."""
    cfg = WaveGlowConfig(
        n_mel_channels=8, hop_length=16, n_flows=4, n_group=4,
        n_early_every=2, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=32,
    )
    params = init_waveglow(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    step32 = make_waveglow_train_step(cfg, optimizer, sigma=0.7071,
                                      donate=False)
    step16 = make_waveglow_train_step(cfg, optimizer, sigma=0.7071,
                                      donate=False,
                                      compute_dtype=jnp.bfloat16)

    mel = jnp.asarray(rng.randn(2, 8, 16), jnp.float32)
    audio = jnp.asarray(rng.randn(2, 256) * 0.1, jnp.float32)

    out32 = step32(params, opt_state, (mel, audio))
    out16 = step16(params, opt_state, (mel, audio))
    # The init loss is a near-zero difference of O(1) terms, so the right
    # comparison is absolute: bf16 log_s/z rounding contributes ~3e-3.
    np.testing.assert_allclose(
        float(out16.loss), float(out32.loss), atol=0.02
    )

    p16, o16 = params, opt_state
    losses = []
    for _ in range(8):
        out = step16(p16, o16, (mel, audio))
        p16, o16 = out.params, out.opt_state
        losses.append(float(out.loss))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses
    for leaf in jax.tree.leaves((p16, o16)):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, leaf.dtype


def test_async_checkpoint_saver(tmp_path, rng):
    """Async save == sync save payload; back-to-back saves serialize; a
    background failure surfaces on the next wait()."""
    params = {"w": jnp.asarray(rng.randn(4, 3), jnp.float32),
              "layers": [{"b": jnp.asarray(rng.randn(3), jnp.float32)}]}
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)

    sync_path = str(tmp_path / "sync")
    ckpt.save_checkpoint(sync_path, params, opt_state, 1e-3, 7)

    saver = ckpt.AsyncCheckpointSaver()
    async_path = str(tmp_path / "async")
    w_expect = np.asarray(params["w"]).copy()
    saver.save(async_path, params, opt_state, 1e-3, 7)
    # params are donated right after save() returns (the train steps use
    # donate_argnums) — the snapshot must be an independent buffer, so
    # actually donate the original here and check the payload survives
    donate_step = jax.jit(
        lambda p: jax.tree_util.tree_map(lambda x: x * 0.0, p),
        donate_argnums=0,
    )
    params = donate_step(params)
    saver.save(str(tmp_path / "async2"), params, opt_state, 1e-3, 8)
    saver.wait()

    like = {"params": {"w": None, "layers": [{"b": None}]},
            "opt_state": opt_state}
    a = ckpt.load_checkpoint(async_path, like=like)
    s = ckpt.load_checkpoint(sync_path, like=like)
    assert int(a["iteration"]) == 7
    np.testing.assert_array_equal(np.asarray(a["params"]["w"]), w_expect)
    for x, y in zip(jax.tree.leaves(a["params"]),
                    jax.tree.leaves(s["params"])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    b = ckpt.load_checkpoint(str(tmp_path / "async2"), like=like)
    np.testing.assert_array_equal(np.asarray(b["params"]["w"]), 0.0)

    # failure in the background thread surfaces on the next wait()
    bad = ckpt.AsyncCheckpointSaver()
    bad.save("/proc/definitely/not/writable", params, opt_state, 1e-3, 0)
    with pytest.raises(BaseException):
        bad.wait()


def test_train_waveglow_cli_end_to_end(tmp_path, rng):
    """The real train_waveglow.train() on the CPU mesh with a tiny model:
    finite decreasing loss, async checkpoints written, auto-resume
    continues from the saved iteration."""
    import glob
    import os

    from scipy.io import wavfile

    from fac_via_ppg_tpu.scripts.train_waveglow import train

    wavs = []
    for i in range(8):  # batch divides the 8-device CPU mesh
        t = np.arange(6000) / 16000.0
        p = str(tmp_path / f"w{i}.wav")
        wavfile.write(p, 16000, (np.sin(2 * np.pi * (200 + 20 * i) * t)
                                 * 9000).astype(np.int16))
        wavs.append(p)
    filelist = str(tmp_path / "files.txt")
    with open(filelist, "w") as f:
        f.write("\n".join(wavs) + "\n")

    data_config = dict(
        training_files=filelist, segment_length=2048, sampling_rate=16000,
        filter_length=256, hop_length=64, win_length=256,
        mel_fmin=0.0, mel_fmax=8000.0, n_mel_channels=16,
    )
    waveglow_config = dict(
        n_mel_channels=16, hop_length=64, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2,
        WN_config=dict(n_layers=2, n_channels=16, kernel_size=3),
    )
    out_dir = str(tmp_path / "run")
    params, opt_state, iteration = train(
        1, 0, "", out_dir, epochs=3, learning_rate=1e-4, sigma=0.7071,
        iters_per_checkpoint=2, batch_size=8, seed=1,
        checkpoint_path="", data_config=data_config,
        waveglow_config=waveglow_config,
    )
    assert iteration == 3  # 8 files / batch 8 = 1 iter per epoch
    cks = sorted(os.path.basename(p) for p in
                 glob.glob(os.path.join(out_dir, "waveglow_*")))
    assert "waveglow_0" in cks and "waveglow_2" in cks, cks

    # auto-resume picks up the newest checkpoint and continues
    params2, _, iteration2 = train(
        1, 0, "", out_dir, epochs=5, learning_rate=1e-4, sigma=0.7071,
        iters_per_checkpoint=100, batch_size=8, seed=1,
        checkpoint_path="auto", data_config=data_config,
        waveglow_config=waveglow_config,
    )
    assert iteration2 == 5
    for leaf in jax.tree.leaves(params2):
        assert np.isfinite(np.asarray(leaf)).all()


def test_train_ppg2mel_cli_end_to_end(tmp_path, rng, monkeypatch):
    """The real train_ppg2mel.train() on the CPU mesh: tiny AM + tiny
    model, finite loss, validation + async checkpoint written, resume."""
    import glob
    import os

    from scipy.io import wavfile

    from fac_via_ppg_tpu.configs.hparams import create_hparams
    from fac_via_ppg_tpu.data import ppg_mel_dataset as ds_mod
    from fac_via_ppg_tpu.frontend.ppg import DependenciesPPG
    from fac_via_ppg_tpu.scripts.make_substitute_am import make_bundle
    from fac_via_ppg_tpu.scripts.train_ppg2mel import train

    make_bundle(str(tmp_path / "bundle"), n_senones=16, n_phones=4,
                hidden_dim=8, num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(tmp_path / "bundle" / "am" / "final.raw.txt"),
        lda_path=str(tmp_path / "bundle" / "feats" / "final.mat"),
        reduce_dim_path=str(tmp_path / "bundle" / "feats" / "reduce_dim.mat"),
        splice_opts_path=str(tmp_path / "bundle" / "feats" / "splice_opts"),
    )
    monkeypatch.setattr(ds_mod, "DependenciesPPG", lambda: deps)

    wavs = []
    for i in range(9):  # 8 train (divides the mesh) + 1 validation
        t = np.arange(4800 + 160 * i) / 16000.0
        p = str(tmp_path / f"w{i}.wav")
        wavfile.write(p, 16000, (np.sin(2 * np.pi * (180 + 15 * i) * t)
                                 * 9000).astype(np.int16))
        wavs.append(p)
    train_list = str(tmp_path / "train.txt")
    val_list = str(tmp_path / "val.txt")
    with open(train_list, "w") as f:
        f.write("\n".join(wavs[:8]) + "\n")
    with open(val_list, "w") as f:
        f.write(wavs[8] + "\n")

    out_dir = str(tmp_path / "run")
    hp = create_hparams(
        training_files=train_list, validation_files=val_list,
        output_directory=out_dir, log_directory="log",
        checkpoint_path="", epochs=2, batch_size=8,
        iters_per_checkpoint=1, seed=1, length_bucket_size=32,
        n_symbols=16, symbols_embedding_dim=16, encoder_embedding_dim=16,
        decoder_rnn_dim=12, prenet_dim=8, attention_rnn_dim=12,
        attention_dim=8, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=16,
        max_decoder_steps=16,
    )
    os.makedirs(out_dir, exist_ok=True)
    params, model_state, opt_state, iteration = train(
        out_dir, "log", "", False, 1, 0, "", hp,
    )
    assert iteration == 2
    cks = sorted(os.path.basename(p) for p in
                 glob.glob(os.path.join(out_dir, "checkpoint_*")))
    assert "checkpoint_0" in cks, cks
    for leaf in jax.tree.leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()

    # auto-resume continues from the newest checkpoint
    hp2 = create_hparams(**{**hp.__dict__, "epochs": 3,
                            "checkpoint_path": "auto",
                            "iters_per_checkpoint": 100})
    _, _, _, iteration2 = train(out_dir, "log", "auto", False, 1, 0, "", hp2)
    assert iteration2 == 3


def test_grad_accum_matches_full_batch(rng):
    """grad_accum=2 must produce the same update as the full batch when
    micro-batches share shapes: exact for WaveGlow (per-element loss);
    Tacotron2 matches with uniform lengths (same denominator), BN stats
    threading through the micro-batch scan."""
    # --- WaveGlow: exact equivalence
    cfg = WaveGlowConfig(
        n_mel_channels=8, hop_length=16, n_flows=2, n_group=4,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=32,
    )
    params = init_waveglow(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    full = make_waveglow_train_step(cfg, optimizer, sigma=0.7071,
                                    donate=False)
    accum = make_waveglow_train_step(cfg, optimizer, sigma=0.7071,
                                     donate=False, grad_accum=2)
    mel = jnp.asarray(rng.randn(4, 8, 16), jnp.float32)
    audio = jnp.asarray(rng.randn(4, 256) * 0.1, jnp.float32)
    out_f = full(params, opt_state, (mel, audio))
    out_a = accum(params, opt_state, (mel, audio))
    np.testing.assert_allclose(float(out_a.loss), float(out_f.loss),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(out_a.params),
                    jax.tree.leaves(out_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    # --- Tacotron2: loss equivalence with uniform lengths + finite update
    params, state = init_tacotron2(jax.random.PRNGKey(0), CFG)
    optimizer = make_optimizer(1e-3, 1e-6, 1.0)
    opt_state = optimizer.init(params)
    accum_t2 = make_tacotron2_train_step(CFG, optimizer, donate=False,
                                         grad_accum=2)
    batch = tuple(map(jnp.asarray, _batch(rng, B=4)))
    out = accum_t2(params, state, opt_state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(out.loss))
    assert np.isfinite(float(out.grad_norm))
    # BN stats updated (scan carried the model state through micro-batches)
    before = jax.tree.leaves(state)
    after = jax.tree.leaves(out.model_state)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )


def test_dp_bf16_grad_accum_compose(rng):
    """bf16 compute + grad_accum=2 + batch sharded over the 8-device mesh
    compile and produce a finite update together (the production
    combination)."""
    params, state = init_tacotron2(jax.random.PRNGKey(0), CFG)
    optimizer = make_optimizer(1e-3, 1e-6, 1.0)
    opt_state = optimizer.init(params)
    step = make_tacotron2_train_step(CFG, optimizer, donate=False,
                                     compute_dtype=jnp.bfloat16,
                                     grad_accum=2)
    mesh = make_mesh(data=8, model=1)
    batch = _batch(rng, B=16)  # 2 micro-batches of 8, each sharded 8-way
    out = step(replicate(mesh, params), replicate(mesh, state),
               replicate(mesh, opt_state), shard_batch(mesh, batch),
               jax.random.PRNGKey(1))
    assert np.isfinite(float(out.loss))
    assert np.isfinite(float(out.grad_norm))
    for leaf in jax.tree.leaves(out.params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32


def test_grad_accum_rejects_indivisible_batch(rng):
    """batch_size % grad_accum != 0 fails fast with the real constraint."""
    cfg = WaveGlowConfig(
        n_mel_channels=8, hop_length=16, n_flows=2, n_group=4,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=32,
    )
    params = init_waveglow(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    step = make_waveglow_train_step(cfg, optimizer, sigma=0.7071,
                                    donate=False, grad_accum=2)
    mel = jnp.asarray(rng.randn(3, 8, 16), jnp.float32)
    audio = jnp.asarray(rng.randn(3, 256) * 0.1, jnp.float32)
    with pytest.raises(ValueError, match="grad_accum.*divide"):
        step(params, opt_state, (mel, audio))


def test_train_waveglow_lr_schedule_wired(tmp_path, rng):
    """lr_warmup_steps through the real trainer: the iteration-0
    checkpoint records the warmup LR (0.0), not the base LR."""
    import glob
    import os

    from scipy.io import wavfile

    from fac_via_ppg_tpu.scripts.train_waveglow import train

    wavs = []
    for i in range(8):
        t = np.arange(6000) / 16000.0
        p = str(tmp_path / f"w{i}.wav")
        wavfile.write(p, 16000, (np.sin(2 * np.pi * (200 + 20 * i) * t)
                                 * 9000).astype(np.int16))
        wavs.append(p)
    filelist = str(tmp_path / "files.txt")
    with open(filelist, "w") as f:
        f.write("\n".join(wavs) + "\n")

    data_config = dict(
        training_files=filelist, segment_length=2048, sampling_rate=16000,
        filter_length=256, hop_length=64, win_length=256,
        mel_fmin=0.0, mel_fmax=8000.0, n_mel_channels=16,
    )
    waveglow_config = dict(
        n_mel_channels=16, hop_length=64, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2,
        WN_config=dict(n_layers=2, n_channels=16, kernel_size=3),
    )
    out_dir = str(tmp_path / "run")
    train(
        1, 0, "", out_dir, epochs=1, learning_rate=1e-4, sigma=0.7071,
        iters_per_checkpoint=1, batch_size=8, seed=1,
        checkpoint_path="", data_config=data_config,
        waveglow_config=waveglow_config,
        lr_schedule="constant", lr_warmup_steps=4,
    )
    cks = glob.glob(os.path.join(out_dir, "waveglow_0"))
    assert cks
    restored = ckpt.load_checkpoint(cks[0])
    # checkpoints store the BASE lr (resume rebuilds the schedule from it
    # + the restored iteration; storing the mid-warmup 0.0 would freeze a
    # use_saved_learning_rate resume at LR 0)
    assert float(restored["learning_rate"]) == 1e-4
    # ...but the step itself ran at the warmup LR of 0.0: params in the
    # post-step checkpoint are bitwise the trainer's own init
    from fac_via_ppg_tpu.configs.hparams import WaveGlowConfig as WGC
    from fac_via_ppg_tpu.models.waveglow import init_waveglow as init_wg

    k = jax.random.PRNGKey(1)
    _, k_init = jax.random.split(k)
    params_init = init_wg(k_init, WGC.from_dict(waveglow_config))
    saved = ckpt.load_checkpoint(cks[0], like={"params": params_init})
    for a, b in zip(jax.tree.leaves(saved["params"]),
                    jax.tree.leaves(params_init)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_waveglow_cli_zero_sharded_opt(tmp_path, rng):
    """train_waveglow.train() with zero_sharded_opt_state=True: the Adam
    moments run data-sharded through the real trainer, the checkpoint
    round-trips, and a resume re-imposes the ZeRO layout."""
    import glob
    import os

    from scipy.io import wavfile

    from fac_via_ppg_tpu.scripts.train_waveglow import train

    if jax.device_count() < 8:
        pytest.skip("needs an 8-device mesh")

    wavs = []
    for i in range(8):
        t = np.arange(6000) / 16000.0
        p = str(tmp_path / f"w{i}.wav")
        wavfile.write(p, 16000, (np.sin(2 * np.pi * (200 + 20 * i) * t)
                                 * 9000).astype(np.int16))
        wavs.append(p)
    filelist = str(tmp_path / "files.txt")
    with open(filelist, "w") as f:
        f.write("\n".join(wavs) + "\n")

    data_config = dict(
        training_files=filelist, segment_length=2048, sampling_rate=16000,
        filter_length=256, hop_length=64, win_length=256,
        mel_fmin=0.0, mel_fmax=8000.0, n_mel_channels=16,
    )
    waveglow_config = dict(
        n_mel_channels=16, hop_length=64, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2,
        WN_config=dict(n_layers=2, n_channels=16, kernel_size=3),
    )
    out_dir = str(tmp_path / "run_zero")

    def assert_zero_layout(opt_state):
        dist = [
            leaf for leaf in jax.tree.leaves(opt_state)
            if hasattr(leaf, "addressable_shards")
            and getattr(leaf, "ndim", 0) > 0
            and leaf.addressable_shards[0].data.size < leaf.size
        ]
        assert dist, "no optimizer leaf is data-sharded"

    params, opt_state, iteration = train(
        1, 0, "", out_dir, epochs=1, learning_rate=1e-4, sigma=0.7071,
        iters_per_checkpoint=1, batch_size=8, seed=1,
        checkpoint_path="", data_config=data_config,
        waveglow_config=waveglow_config, zero_sharded_opt_state=True,
    )
    assert iteration == 1
    for leaf in jax.tree.leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()
    assert_zero_layout(opt_state)

    cks = glob.glob(os.path.join(out_dir, "waveglow_0"))
    assert cks
    params2, opt_state2, iteration2 = train(
        1, 0, "", out_dir, epochs=2, learning_rate=1e-4, sigma=0.7071,
        iters_per_checkpoint=10, batch_size=8, seed=1,
        checkpoint_path=cks[0], data_config=data_config,
        waveglow_config=waveglow_config, zero_sharded_opt_state=True,
    )
    assert iteration2 == 2
    assert_zero_layout(opt_state2)


def test_train_waveglow_cli_tensor_parallel(tmp_path, rng):
    """train_waveglow.train() with tensor_parallel_devices=2 on the CPU
    mesh: the TP param/opt placements must produce a consistent jitted
    step (regression: optax scalars landing on one device while moments
    inherit the TP layout)."""
    import glob
    import os

    from scipy.io import wavfile

    from fac_via_ppg_tpu.scripts.train_waveglow import train

    if jax.device_count() < 8:
        pytest.skip("needs an 8-device mesh")

    wavs = []
    for i in range(4):
        t = np.arange(6000) / 16000.0
        p = str(tmp_path / f"w{i}.wav")
        wavfile.write(p, 16000, (np.sin(2 * np.pi * (200 + 20 * i) * t)
                                 * 9000).astype(np.int16))
        wavs.append(p)
    filelist = str(tmp_path / "files.txt")
    with open(filelist, "w") as f:
        f.write("\n".join(wavs) + "\n")

    data_config = dict(
        training_files=filelist, segment_length=2048, sampling_rate=16000,
        filter_length=256, hop_length=64, win_length=256,
        mel_fmin=0.0, mel_fmax=8000.0, n_mel_channels=16,
    )
    waveglow_config = dict(
        n_mel_channels=16, hop_length=64, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2,
        WN_config=dict(n_layers=2, n_channels=16, kernel_size=3),
    )
    out_dir = str(tmp_path / "run_tp")
    params, opt_state, iteration = train(
        1, 0, "", out_dir, epochs=2, learning_rate=1e-4, sigma=0.7071,
        iters_per_checkpoint=1, batch_size=4, seed=1,
        checkpoint_path="", data_config=data_config,
        waveglow_config=waveglow_config, tensor_parallel_devices=2,
    )
    assert iteration == 2
    for leaf in jax.tree.leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()
    # TP layout actually applied: some param spans the model axis sharded
    from jax.sharding import PartitionSpec as P

    specs = {getattr(getattr(l, "sharding", None), "spec", None)
             for l in jax.tree.leaves(params)}
    assert any(s is not None and s != P() for s in specs), specs

    # resume through the TP placement path
    params2, _, iteration2 = train(
        1, 0, "", out_dir, epochs=3, learning_rate=1e-4, sigma=0.7071,
        iters_per_checkpoint=100, batch_size=4, seed=1,
        checkpoint_path="auto", data_config=data_config,
        waveglow_config=waveglow_config, tensor_parallel_devices=2,
    )
    assert iteration2 == 3
    for leaf in jax.tree.leaves(params2):
        assert np.isfinite(np.asarray(leaf)).all()


def test_preemption_guard_sigterm_and_uninstall():
    """Real SIGTERM path: the guard's handler sets the flag (the process
    survives), should_stop() reports it, and uninstall() restores the
    previous handler so later tests are unaffected."""
    import os
    import signal

    from fac_via_ppg_tpu.train.preemption import PreemptionGuard

    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as guard:
        assert not guard.should_stop()
        os.kill(os.getpid(), signal.SIGTERM)  # handled, not fatal
        assert guard.requested
        assert guard.should_stop()
    assert signal.getsignal(signal.SIGTERM) is before


def test_train_waveglow_preemption_checkpoints_and_resumes(tmp_path, rng):
    """SIGTERM mid-training: the trainer finishes the iteration in
    flight, writes a final checkpoint, and RETURNS cleanly (no exception,
    no lost work) — then checkpoint_path='auto' resumes from it.  The
    signal is raised from the guard's own per-iteration poll so the
    preemption iteration is deterministic."""
    import glob
    import os
    import signal

    from scipy.io import wavfile

    from fac_via_ppg_tpu.train import preemption as pre_mod
    from fac_via_ppg_tpu.scripts.train_waveglow import train

    wavs = []
    for i in range(8):
        t = np.arange(6000) / 16000.0
        p = str(tmp_path / f"w{i}.wav")
        wavfile.write(p, 16000, (np.sin(2 * np.pi * (200 + 20 * i) * t)
                                 * 9000).astype(np.int16))
        wavs.append(p)
    filelist = str(tmp_path / "files.txt")
    with open(filelist, "w") as f:
        f.write("\n".join(wavs) + "\n")

    data_config = dict(
        training_files=filelist, segment_length=2048, sampling_rate=16000,
        filter_length=256, hop_length=64, win_length=256,
        mel_fmin=0.0, mel_fmax=8000.0, n_mel_channels=16,
    )
    waveglow_config = dict(
        n_mel_channels=16, hop_length=64, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2,
        WN_config=dict(n_layers=2, n_channels=16, kernel_size=3),
    )

    class FireAtThirdPoll(pre_mod.PreemptionGuard):
        polls = 0

        def should_stop(self):
            FireAtThirdPoll.polls += 1
            if FireAtThirdPoll.polls == 3:
                # a REAL eviction notice, delivered to ourselves; the
                # handler runs before super().should_stop() returns
                os.kill(os.getpid(), signal.SIGTERM)
            return super().should_stop()

    out_dir = str(tmp_path / "run")
    orig = pre_mod.PreemptionGuard
    pre_mod.PreemptionGuard = FireAtThirdPoll
    try:
        params, opt_state, iteration = train(
            1, 0, "", out_dir, epochs=2000, learning_rate=1e-4,
            sigma=0.7071, iters_per_checkpoint=1000, batch_size=8, seed=1,
            checkpoint_path="", data_config=data_config,
            waveglow_config=waveglow_config,
        )
    finally:
        pre_mod.PreemptionGuard = orig
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL or callable(
        signal.getsignal(signal.SIGTERM)
    )  # guard uninstalled (pytest may own a handler)
    # preempted on the 3rd poll => iterations 0,1,2 completed
    assert iteration == 3
    cks = sorted(os.path.basename(p) for p in
                 glob.glob(os.path.join(out_dir, "waveglow_*")))
    assert "waveglow_2" in cks, cks  # the preemption checkpoint landed
    for leaf in jax.tree.leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()

    # zero lost work: auto-resume continues from the preemption save
    _, _, iteration2 = train(
        1, 0, "", out_dir, epochs=5, learning_rate=1e-4, sigma=0.7071,
        iters_per_checkpoint=1000, batch_size=8, seed=1,
        checkpoint_path="auto", data_config=data_config,
        waveglow_config=waveglow_config,
    )
    assert iteration2 == 5


def test_train_ppg2mel_preemption_checkpoint(tmp_path, rng, monkeypatch):
    """Same eviction contract for the Tacotron2 trainer: SIGTERM ->
    final checkpoint at the completed iteration + clean return."""
    import glob
    import os
    import signal

    from scipy.io import wavfile

    from fac_via_ppg_tpu.configs.hparams import create_hparams
    from fac_via_ppg_tpu.data import ppg_mel_dataset as ds_mod
    from fac_via_ppg_tpu.frontend.ppg import DependenciesPPG
    from fac_via_ppg_tpu.scripts.make_substitute_am import make_bundle
    from fac_via_ppg_tpu.train import preemption as pre_mod
    from fac_via_ppg_tpu.scripts.train_ppg2mel import train

    make_bundle(str(tmp_path / "bundle"), n_senones=16, n_phones=4,
                hidden_dim=8, num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(tmp_path / "bundle" / "am" / "final.raw.txt"),
        lda_path=str(tmp_path / "bundle" / "feats" / "final.mat"),
        reduce_dim_path=str(tmp_path / "bundle" / "feats" / "reduce_dim.mat"),
        splice_opts_path=str(tmp_path / "bundle" / "feats" / "splice_opts"),
    )
    monkeypatch.setattr(ds_mod, "DependenciesPPG", lambda: deps)

    wavs = []
    for i in range(9):
        t = np.arange(4800 + 160 * i) / 16000.0
        p = str(tmp_path / f"w{i}.wav")
        wavfile.write(p, 16000, (np.sin(2 * np.pi * (180 + 15 * i) * t)
                                 * 9000).astype(np.int16))
        wavs.append(p)
    train_list = str(tmp_path / "train.txt")
    val_list = str(tmp_path / "val.txt")
    with open(train_list, "w") as f:
        f.write("\n".join(wavs[:8]) + "\n")
    with open(val_list, "w") as f:
        f.write(wavs[8] + "\n")

    class FireAtSecondPoll(pre_mod.PreemptionGuard):
        polls = 0

        def should_stop(self):
            FireAtSecondPoll.polls += 1
            if FireAtSecondPoll.polls == 2:
                os.kill(os.getpid(), signal.SIGTERM)
            return super().should_stop()

    out_dir = str(tmp_path / "run")
    hp = create_hparams(
        training_files=train_list, validation_files=val_list,
        output_directory=out_dir, log_directory="log",
        checkpoint_path="", epochs=2000, batch_size=8,
        iters_per_checkpoint=1000, seed=1, length_bucket_size=32,
        n_symbols=16, symbols_embedding_dim=16, encoder_embedding_dim=16,
        decoder_rnn_dim=12, prenet_dim=8, attention_rnn_dim=12,
        attention_dim=8, attention_location_n_filters=4,
        attention_location_kernel_size=7, postnet_embedding_dim=16,
        max_decoder_steps=16,
    )
    os.makedirs(out_dir, exist_ok=True)
    monkeypatch.setattr(pre_mod, "PreemptionGuard", FireAtSecondPoll)
    params, model_state, opt_state, iteration = train(
        out_dir, "log", "", False, 1, 0, "", hp,
    )
    assert iteration == 2  # iterations 0, 1 completed
    cks = sorted(os.path.basename(p) for p in
                 glob.glob(os.path.join(out_dir, "checkpoint_*")))
    assert "checkpoint_1" in cks, cks
    for leaf in jax.tree.leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_waveglow_remat_matches_unremat(rng):
    """jax.checkpoint per flow replays identical ops: loss and the
    updated params must match the standard step (memory, not numerics,
    is the difference)."""
    cfg = WaveGlowConfig(
        n_mel_channels=8, hop_length=16, n_flows=4, n_group=4,
        n_early_every=2, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=32,
    )
    params = init_waveglow(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    plain = make_waveglow_train_step(cfg, optimizer, sigma=0.7071,
                                     donate=False)
    remat = make_waveglow_train_step(cfg, optimizer, sigma=0.7071,
                                     donate=False, remat=True)
    mel = jnp.asarray(rng.randn(4, 8, 16), jnp.float32)
    audio = jnp.asarray(rng.randn(4, 256) * 0.1, jnp.float32)
    out_p = plain(params, opt_state, (mel, audio))
    out_r = remat(params, opt_state, (mel, audio))
    np.testing.assert_allclose(float(out_r.loss), float(out_p.loss),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(out_r.params),
                    jax.tree.leaves(out_p.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # composes with bf16 mixed precision
    remat_bf16 = make_waveglow_train_step(
        cfg, optimizer, sigma=0.7071, donate=False, remat=True,
        compute_dtype=jnp.bfloat16,
    )
    out_rb = remat_bf16(params, opt_state, (mel, audio))
    assert np.isfinite(float(out_rb.loss))


def test_tacotron2_remat_matches_unremat(rng):
    """Decoder-scan remat (jax.checkpoint on the scan body) replays the
    identical ops — same loss and updated params as the plain step (the
    dropout keys are derived from the same splits)."""
    import optax

    params, model_state = init_tacotron2(jax.random.PRNGKey(0), CFG)
    # SGD, not Adam: Adam's first update is ~sign(grad)*lr, so the float
    # reassociation remat's re-scheduled backward introduces flips
    # near-zero gradient elements into +-2lr param diffs (same rationale
    # as tests/mp_worker.py).  SGD keeps the comparison at 1e-6.
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.sgd(1e-3))
    opt_state = optimizer.init(params)
    plain = make_tacotron2_train_step(CFG, optimizer, donate=False)
    remat = make_tacotron2_train_step(CFG, optimizer, donate=False,
                                      remat=True)
    batch = _batch(rng)
    key = jax.random.PRNGKey(5)
    out_p = plain(params, model_state, opt_state, batch, key)
    out_r = remat(params, model_state, opt_state, batch, key)
    np.testing.assert_allclose(float(out_r.loss), float(out_p.loss),
                               rtol=1e-6)
    np.testing.assert_allclose(float(out_r.grad_norm),
                               float(out_p.grad_norm), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(out_r.params),
                    jax.tree.leaves(out_p.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_bf16_ppg_host_cast_matches_device_cast(rng):
    """The trainer transfers the PPG pre-cast to bf16 when
    train_dtype=bfloat16 (halves host->device bytes); the step's in-jit
    cast must make that bit-identical in values to shipping f32."""
    params, model_state = init_tacotron2(jax.random.PRNGKey(0), CFG)
    optimizer = make_optimizer(1e-3, 1e-6, 1.0)
    opt_state = optimizer.init(params)
    step = make_tacotron2_train_step(CFG, optimizer, donate=False,
                                     compute_dtype=jnp.bfloat16)
    batch = _batch(rng)
    pre = (np.asarray(batch[0]).astype(jnp.bfloat16),) + tuple(batch[1:])
    key = jax.random.PRNGKey(9)
    out_f32 = step(params, model_state, opt_state, batch, key)
    out_pre = step(params, model_state, opt_state, pre, key)
    np.testing.assert_allclose(float(out_pre.loss), float(out_f32.loss),
                               rtol=1e-6)
    np.testing.assert_allclose(float(out_pre.grad_norm),
                               float(out_f32.grad_norm), rtol=1e-4)


def test_checkpoint_topology_change_restore(tmp_path):
    """A checkpoint written under a (4 data x 2 model)+ZeRO-1 mesh resumes
    on 8x1 (+ZeRO-1), 2x2 (+TP+ZeRO-1), and a SINGLE device with the same
    loss trajectory as the uninterrupted source-mesh run.  On TPU fleets
    preemption routinely returns a different slice shape; checkpoints are
    host-side numpy on disk (train/checkpoint._to_host), so restore
    placement is the only topology-sensitive step — this proves the whole
    chain end to end.  Reference resume semantics (trivially topology-free
    on one GPU): src/script/train_ppg2mel.py:122-149."""
    from fac_via_ppg_tpu.configs.hparams import WaveGlowConfig
    from fac_via_ppg_tpu.models.waveglow import init_waveglow
    from fac_via_ppg_tpu.parallel.mesh import make_mesh, shard_batch
    from fac_via_ppg_tpu.parallel.sharding import (
        apply_shardings,
        optimizer_state_shardings,
        waveglow_param_shardings,
        waveglow_spec_fn,
    )
    from fac_via_ppg_tpu.train import checkpoint as ckpt
    from fac_via_ppg_tpu.train.optim import make_optimizer
    from fac_via_ppg_tpu.train.step import make_waveglow_train_step

    if jax.device_count() < 8:
        pytest.skip("needs an 8-device mesh")

    cfg = WaveGlowConfig(
        n_mel_channels=16, hop_length=32, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=64,
    )
    optimizer = make_optimizer(1e-3)
    step = make_waveglow_train_step(cfg, optimizer, sigma=0.7071,
                                    donate=False)

    rng_l = np.random.RandomState(0)
    batches = [
        (rng_l.randn(8, 16, 8).astype(np.float32),
         (rng_l.randn(8, 8 * 32) * 0.1).astype(np.float32))
        for _ in range(3)
    ]

    params_host = jax.tree_util.tree_map(
        np.asarray, init_waveglow(jax.random.PRNGKey(0), cfg)
    )
    opt_host = optimizer.init(params_host)

    def place(mesh, p_tree, o_tree, zero):
        from jax.sharding import NamedSharding, PartitionSpec as P

        params = apply_shardings(
            p_tree, waveglow_param_shardings(mesh, p_tree)
        )
        if zero:
            opt = apply_shardings(
                o_tree,
                optimizer_state_shardings(
                    mesh, o_tree, param_spec_fn=waveglow_spec_fn(mesh)
                ),
            )
        else:
            opt = apply_shardings(
                o_tree,
                jax.tree_util.tree_map(
                    lambda _: NamedSharding(mesh, P()), o_tree
                ),
            )
        return params, opt

    # --- source run: (4 data x 2 model) + ZeRO-1, one step, save, two more
    mesh_a = make_mesh(data=4, model=2)
    params, opt = place(mesh_a, params_host, opt_host, zero=True)
    out = step(params, opt, shard_batch(mesh_a, batches[0]))
    ckpt_path = str(tmp_path / "waveglow_0")
    ckpt.save_checkpoint(ckpt_path, out.params, out.opt_state, 1e-3, 0)
    trajectory = []
    p, o = out.params, out.opt_state
    for b in batches[1:]:
        nxt = step(p, o, shard_batch(mesh_a, b))
        trajectory.append(float(nxt.loss))
        p, o = nxt.params, nxt.opt_state
    assert np.isfinite(trajectory).all()

    # --- resume on three different topologies: identical trajectory
    for data, model, zero in [(8, 1, True), (2, 2, True), (1, 1, False)]:
        mesh_b = make_mesh(data=data, model=model)
        restored = ckpt.load_checkpoint(
            ckpt_path, like={"params": params_host, "opt_state": opt_host}
        )
        assert restored["iteration"] == 0
        p, o = place(mesh_b, restored["params"], restored["opt_state"],
                     zero=zero)
        if zero and data > 1:
            # the restored ZeRO layout is genuinely sharded, not an
            # accidental replica
            dist = [
                leaf for leaf in jax.tree_util.tree_leaves(o)
                if hasattr(leaf, "addressable_shards")
                and getattr(leaf, "ndim", 0) > 0
                and leaf.addressable_shards[0].data.size < leaf.size
            ]
            assert dist, f"no data-sharded moment on the {data}x{model} mesh"
        got = []
        for b in batches[1:]:
            nxt = step(p, o, shard_batch(mesh_b, b))
            got.append(float(nxt.loss))
            p, o = nxt.params, nxt.opt_state
        np.testing.assert_allclose(
            got, trajectory, rtol=1e-3, atol=1e-6,
            err_msg=f"loss trajectory diverged after restore on "
                    f"({data} data x {model} model)",
        )
