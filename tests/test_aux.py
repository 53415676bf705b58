"""Auxiliary subsystem tests: loss scaling, precision policy, old-format
WaveGlow conversion, profiling hooks, pitch tracking, eval harness units."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fac_via_ppg_tpu.configs.hparams import WaveGlowConfig
from fac_via_ppg_tpu.eval.parity import mel_mse
from fac_via_ppg_tpu.train.precision import (
    DynamicLossScaler,
    StaticLossScaler,
    get_policy,
)
from fac_via_ppg_tpu.train.profiling import StepTimer
from fac_via_ppg_tpu.utils.pitch import estimate_f0


def test_policy_casting():
    policy = get_policy("bfloat16")
    tree = {"w": jnp.ones((3,), jnp.float32), "i": jnp.ones((2,), jnp.int32)}
    cast = policy.cast_to_compute(tree)
    assert cast["w"].dtype == jnp.bfloat16
    assert cast["i"].dtype == jnp.int32  # non-float leaves untouched
    back = policy.cast_to_param(cast)
    assert back["w"].dtype == jnp.float32


def test_dynamic_loss_scaler_overflow_halves_scale():
    scaler = DynamicLossScaler(init_scale=1024.0, scale_window=4)
    state = scaler.init()
    bad = {"g": jnp.array([jnp.inf, 1.0])}
    grads, state, ok = scaler.unscale(bad, state)
    assert not bool(ok)
    assert float(state.scale) == 512.0
    # overflowed grads are zeroed, not propagated as inf*scale
    assert float(jnp.nan_to_num(grads["g"][1])) == 0.0


def test_dynamic_loss_scaler_growth_after_window():
    scaler = DynamicLossScaler(init_scale=8.0, scale_window=3)
    state = scaler.init()
    good = {"g": jnp.array([1.0, 2.0])}
    for i in range(3):
        grads, state, ok = scaler.unscale(good, state)
        assert bool(ok)
    assert float(state.scale) == 16.0
    np.testing.assert_allclose(np.asarray(grads["g"]), [1 / 8, 2 / 8])


def test_static_loss_scaler():
    scaler = StaticLossScaler(scale=4.0)
    state = scaler.init()
    grads, state, ok = scaler.unscale({"g": jnp.array([8.0])}, state)
    assert bool(ok) and float(grads["g"][0]) == 2.0
    assert float(state.scale) == 4.0


def test_old_waveglow_conversion(rng):
    """Old res+skip layers fuse to res_skip with identical WN outputs."""
    torch = pytest.importorskip("torch")

    cfg = WaveGlowConfig(
        n_mel_channels=8, hop_length=16, n_flows=2, n_group=4,
        n_early_every=4, n_early_size=2, wn_n_layers=3, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=32,
    )
    from fac_via_ppg_tpu.models.waveglow import wn_apply
    from fac_via_ppg_tpu.train.convert_model import (
        import_old_waveglow_state_dict,
    )
    from fac_via_ppg_tpu.train.import_torch import import_waveglow_state_dict

    # Build a NEW-format state dict, then synthesize the OLD format from it
    # by splitting res_skip into res+skip; conversion must round-trip.
    def t(shape):
        return torch.randn(*shape) * 0.1

    sd_new = {"upsample.weight": t((8, 8, 32)), "upsample.bias": t((8,))}
    for k in range(cfg.n_flows):
        sd_new[f"convinv.{k}.conv.weight"] = t((4, 4, 1))
        sd_new[f"WN.{k}.start.weight"] = t((16, 2, 1))
        sd_new[f"WN.{k}.start.bias"] = t((16,))
        sd_new[f"WN.{k}.end.weight"] = t((4, 16, 1))
        sd_new[f"WN.{k}.end.bias"] = t((4,))
        for i in range(cfg.wn_n_layers):
            sd_new[f"WN.{k}.in_layers.{i}.weight"] = t((32, 16, 3))
            sd_new[f"WN.{k}.in_layers.{i}.bias"] = t((32,))
            sd_new[f"WN.{k}.cond_layers.{i}.weight"] = t((32, 32, 1))
            sd_new[f"WN.{k}.cond_layers.{i}.bias"] = t((32,))
            ch = 32 if i < cfg.wn_n_layers - 1 else 16
            sd_new[f"WN.{k}.res_skip_layers.{i}.weight"] = t((ch, 16, 1))
            sd_new[f"WN.{k}.res_skip_layers.{i}.bias"] = t((ch,))

    sd_old = {
        key: v for key, v in sd_new.items() if ".res_skip_layers." not in key
    }
    for k in range(cfg.n_flows):
        for i in range(cfg.wn_n_layers):
            w = sd_new[f"WN.{k}.res_skip_layers.{i}.weight"]
            b = sd_new[f"WN.{k}.res_skip_layers.{i}.bias"]
            if i < cfg.wn_n_layers - 1:
                sd_old[f"WN.{k}.res_layers.{i}.weight"] = w[:16]
                sd_old[f"WN.{k}.res_layers.{i}.bias"] = b[:16]
                sd_old[f"WN.{k}.skip_layers.{i}.weight"] = w[16:]
                sd_old[f"WN.{k}.skip_layers.{i}.bias"] = b[16:]
            else:
                sd_old[f"WN.{k}.skip_layers.{i}.weight"] = w
                sd_old[f"WN.{k}.skip_layers.{i}.bias"] = b

    p_new = import_waveglow_state_dict(sd_new, cfg)
    p_old = import_old_waveglow_state_dict(sd_old, cfg)

    audio = jnp.asarray(rng.randn(2, 2, 64), jnp.float32)
    spect = jnp.asarray(rng.randn(2, 32, 64), jnp.float32)
    out_new = wn_apply(cfg, p_new["wn"][0], audio, spect)
    out_old = wn_apply(cfg, p_old["wn"][0], audio, spect)
    np.testing.assert_allclose(
        np.asarray(out_old), np.asarray(out_new), atol=1e-6
    )


def test_step_timer():
    import time

    timer = StepTimer()
    with timer:
        time.sleep(0.01)
    assert timer.duration >= 0.01
    assert timer.ema is not None


def test_estimate_f0_sine(rng):
    fs = 16000
    t = np.arange(fs) / fs
    for hz in (100.0, 150.0, 333.0):
        wav = np.sin(2 * np.pi * hz * t) * 8000
        f0 = estimate_f0(wav, fs)
        voiced = f0[f0 > 0]
        assert len(voiced) > 0.8 * len(f0)
        np.testing.assert_allclose(np.median(voiced), hz, rtol=0.005)
    # silence -> unvoiced
    f0_sil = estimate_f0(np.zeros(8000), fs)
    assert (f0_sil == 0).all()
    # white noise -> (almost) entirely unvoiced
    f0_noise = estimate_f0(rng.randn(16000) * 0.1, fs)
    assert (f0_noise > 0).mean() < 0.05


def test_estimate_f0_harmonic_no_octave_error(rng):
    """Weak fundamental under strong harmonics — the classic failure where
    an autocorrelation argmax halves the pitch.  YIN's first-dip rule must
    return the true 150 Hz, not 300 or 75."""
    fs = 16000
    t = np.arange(fs) / fs
    wav = (
        0.2 * np.sin(2 * np.pi * 150 * t)
        + 1.0 * np.sin(2 * np.pi * 300 * t)
        + 0.8 * np.sin(2 * np.pi * 450 * t)
    )
    f0 = estimate_f0(wav, fs)
    np.testing.assert_allclose(np.median(f0[f0 > 0]), 150, rtol=0.01)


def test_estimate_f0_frame_contract():
    fs = 16000
    wav = np.sin(2 * np.pi * 200 * np.arange(4321) / fs)
    f0 = estimate_f0(wav, fs, frame_shift_ms=5.0)
    assert len(f0) == 4321 // 80 + 1  # floor(len/shift) + 1, like harvest


def test_mel_mse():
    a = np.ones((80, 10))
    b = np.zeros((80, 12))
    assert mel_mse(a, b) == 1.0
    assert mel_mse(a, a) == 0.0


def test_tensorboard_loggers_write_events(tmp_path, rng):
    """Both loggers write TensorBoard event files with the reference's
    scalar/image/histogram surface (reference logger.py:41-94)."""
    import glob
    import os

    import jax

    from fac_via_ppg_tpu.train.logger import Tacotron2Logger, WaveglowLogger

    d1 = str(tmp_path / "t2")
    lg = Tacotron2Logger(d1)
    lg.log_training(1.25, 0.5, 1e-4, 0.1, iteration=3)
    B, D, T_out, T_in = 2, 8, 10, 6
    params = {"w": rng.randn(4, 3).astype("float32")}
    y = (rng.randn(B, D, T_out).astype("float32"),
         rng.rand(B, T_out).astype("float32"))
    y_pred = (rng.randn(B, D, T_out).astype("float32"),
              rng.randn(B, D, T_out).astype("float32"),
              rng.randn(B, T_out).astype("float32"),
              rng.rand(B, T_out, T_in).astype("float32"))
    lg.log_validation(0.9, params, y, y_pred, iteration=3)
    lg.close()
    events = glob.glob(os.path.join(d1, "events.out.tfevents.*"))
    assert events and os.path.getsize(events[0]) > 1000

    d2 = str(tmp_path / "wg")
    wlg = WaveglowLogger(d2)
    wlg.log_training(0.5, iteration=1)
    wlg.close()
    events = glob.glob(os.path.join(d2, "events.out.tfevents.*"))
    assert events and os.path.getsize(events[0]) > 0


def test_training_is_seed_deterministic(rng):
    """Two runs from the same seed produce bitwise-identical params after
    several steps (reproducibility; reference seeds at hparams.py:49)."""
    import jax
    import jax.numpy as jnp

    from fac_via_ppg_tpu.configs.hparams import WaveGlowConfig
    from fac_via_ppg_tpu.models.waveglow import init_waveglow
    from fac_via_ppg_tpu.train.optim import make_optimizer
    from fac_via_ppg_tpu.train.step import make_waveglow_train_step

    cfg = WaveGlowConfig(
        n_mel_channels=8, hop_length=16, n_flows=2, n_group=4,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=32,
    )
    mel = jnp.asarray(rng.randn(2, 8, 16), jnp.float32)
    audio = jnp.asarray(rng.randn(2, 256) * 0.1, jnp.float32)

    def run():
        params = init_waveglow(jax.random.PRNGKey(7), cfg)
        opt = make_optimizer(1e-3)
        ost = opt.init(params)
        step = make_waveglow_train_step(cfg, opt, sigma=0.7071, donate=False)
        for _ in range(4):
            out = step(params, ost, (mel, audio))
            params, ost = out.params, out.opt_state
        return params

    a, b = run(), run()
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_lr_schedules():
    """make_lr_schedule: constant/exponential/cosine shapes + warmup ramp
    + resume-consistency (pure function of the step)."""
    import pytest

    from fac_via_ppg_tpu.train.optim import make_lr_schedule

    base = 1e-3
    const = make_lr_schedule(base)
    assert float(const(0)) == base and float(const(10**6)) == base

    exp = make_lr_schedule(base, "exponential", decay_steps=100,
                           decay_rate=0.5)
    np.testing.assert_allclose(float(exp(0)), base)
    np.testing.assert_allclose(float(exp(100)), base * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(exp(200)), base * 0.25, rtol=1e-6)

    cos = make_lr_schedule(base, "cosine", decay_steps=1000, min_factor=0.1)
    np.testing.assert_allclose(float(cos(0)), base)
    np.testing.assert_allclose(float(cos(1000)), base * 0.1, rtol=1e-5)
    assert float(cos(500)) < base

    warm = make_lr_schedule(base, "constant", warmup_steps=10)
    assert float(warm(0)) == 0.0
    np.testing.assert_allclose(float(warm(5)), base * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(warm(10)), base, rtol=1e-6)
    # resume at step N sees the same value as a continuous run: a
    # freshly constructed schedule agrees with the original at every step
    warm2 = make_lr_schedule(base, "constant", warmup_steps=10)
    for step in (0, 3, 7, 10, 500):
        np.testing.assert_allclose(float(warm2(step)), float(warm(step)))

    with pytest.raises(ValueError):
        make_lr_schedule(base, "exponential")  # needs decay_steps
    with pytest.raises(ValueError):
        make_lr_schedule(base, "nope")


def test_compilation_cache_helper(tmp_path, monkeypatch):
    """enable_compilation_cache resolves, writes entries, and un-leaks.

    Serving cold-start feature (no reference analogue: the reference pays
    the full cuDNN build on every process, train_ppg2mel.py:230-236).
    """
    import jax
    import jax.numpy as jnp

    from fac_via_ppg_tpu.utils.compilation_cache import (
        disable_compilation_cache,
        enable_compilation_cache,
    )

    # disabled: no dir and no env var -> no-op
    monkeypatch.delenv("FACPPG_COMPILATION_CACHE", raising=False)
    assert enable_compilation_cache(None) is None

    cache_dir = tmp_path / "xla_cache"
    try:
        resolved = enable_compilation_cache(
            str(cache_dir), min_compile_time_secs=0.0
        )
        assert resolved == str(cache_dir)
        assert cache_dir.is_dir()

        @jax.jit
        def f(x):
            return jnp.tanh(x @ x).sum() * 3.25

        x = jnp.full((64, 64), 0.01, jnp.float32)
        expected = float(f(x))
        entries = list(cache_dir.iterdir())
        assert entries, "compile wrote no persistent cache entries"

        # a fresh compilation of the same program hits the persistent
        # cache and still computes the same value
        jax.clear_caches()
        assert float(f(x)) == expected
    finally:
        disable_compilation_cache()

    # env-var fallback resolves when no explicit dir is passed
    env_dir = tmp_path / "from_env"
    monkeypatch.setenv("FACPPG_COMPILATION_CACHE", str(env_dir))
    try:
        assert enable_compilation_cache(None) == str(env_dir)
        assert env_dir.is_dir()
    finally:
        disable_compilation_cache()
