"""Full-size serve-path oracle parity (marked slow).

tests/test_torch_parity.py pins the serve-path numerics at shrunken model
sizes (T2_KW / WG_CONFIG); these tests re-run the three serve-path
comparisons at the REAL operating point — 5816-dim PPG prenet, 600-d
encoder / 300-d decoder with the +-20 attention window
(reference src/common/hparams.py:105-135), and the 12-flow n_group=8
8x256 WaveGlow (reference src/waveglow/config.json:29-41) — so a
size-dependent import or packing bug (e.g. an LSTM gate-order slip that
only shows at 1024-wide concatenations) cannot hide behind the small
configs.

Runtime is bounded by sequence length, not architecture: the decoder cap
and mel frame counts are kept small while every weight matrix is
full-size.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fac_via_ppg_tpu.configs.hparams import Tacotron2Config, WaveGlowConfig
from fac_via_ppg_tpu.models import tacotron2 as t2
from fac_via_ppg_tpu.train.import_torch import (
    import_tacotron2_state_dict,
    import_waveglow_state_dict,
)
from fac_via_ppg_tpu.train.losses import tacotron2_loss

from tests.torch_oracle import (
    load_reference_module,
    no_dropout,
    patch_cuda_to_cpu,
    patch_model_module_for_cpu,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def torch():
    import torch

    torch.manual_seed(16807)
    return torch


# Full reference WaveGlow architecture (config.json:29-41); hop 160 matches
# the 16 kHz / 10 ms regime (hparams.py:97).
FULL_WG_KW = dict(
    n_mel_channels=80, hop_length=160, n_flows=12, n_group=8,
    n_early_every=4, n_early_size=2, wn_n_layers=8, wn_n_channels=256,
    wn_kernel_size=3, upsample_kernel_size=1024,
)


def _full_waveglow_pair(torch):
    """(reference model, imported JAX params, cfg) at full size."""
    glow = load_reference_module("waveglow.glow")
    ref_model = glow.WaveGlow(
        n_mel_channels=80, hop_length=160, n_flows=12, n_group=8,
        n_early_every=4, n_early_size=2,
        WN_config=dict(n_layers=8, n_channels=256, kernel_size=3),
    )
    ref_model.eval()
    cfg = WaveGlowConfig(**FULL_WG_KW)
    params = import_waveglow_state_dict(ref_model.state_dict(), cfg)
    return glow, ref_model, cfg, params


def test_fullsize_tacotron2_forward_and_loss_parity(torch, rng):
    """Teacher-forced forward + loss at the full 5816/600/300 architecture
    (reference model.py:580-595, loss_function.py:36-53)."""
    hparams_mod = load_reference_module("common.hparams")
    model_mod = patch_model_module_for_cpu(
        load_reference_module("common.model")
    )
    hp = hparams_mod.create_hparams()
    ref_model = model_mod.Tacotron2(hp)
    ref_model.eval()

    cfg = Tacotron2Config.from_hparams(hp)
    params, model_state = import_tacotron2_state_dict(
        ref_model.state_dict(), cfg
    )

    B, T_in, T_out = 2, 52, 56
    ppg = np.abs(rng.rand(B, cfg.n_symbols, T_in)).astype(np.float32)
    ppg /= ppg.sum(axis=1, keepdims=True)
    in_len = np.array([52, 41], np.int64)
    mel = (rng.randn(B, 80, T_out) * 0.5).astype(np.float32)
    out_len = np.array([56, 44], np.int64)

    with no_dropout(), torch.no_grad():
        ref_out = ref_model(
            (
                torch.tensor(ppg), torch.tensor(in_len), torch.tensor(mel),
                int(in_len.max()), torch.tensor(out_len),
            )
        )
    ref_mel, ref_mel_post, ref_gate, ref_align = [
        t.detach().numpy() for t in ref_out
    ]

    orig_dropout = t2.dropout
    t2.__dict__["dropout"] = lambda key, x, rate, enabled: x
    try:
        (mel_out, mel_post, gate_out, align), _ = t2.tacotron2_forward(
            cfg, params, model_state,
            jnp.asarray(ppg), jnp.asarray(in_len), jnp.asarray(mel),
            jnp.asarray(out_len), jax.random.PRNGKey(0), training=False,
        )
    finally:
        t2.__dict__["dropout"] = orig_dropout

    np.testing.assert_allclose(np.asarray(align), ref_align, atol=2e-4,
                               err_msg="alignment mismatch")
    np.testing.assert_allclose(np.asarray(mel_out), ref_mel, atol=2e-3,
                               err_msg="pre-postnet mel mismatch")
    np.testing.assert_allclose(np.asarray(mel_post), ref_mel_post, atol=3e-3,
                               err_msg="postnet mel mismatch")
    np.testing.assert_allclose(np.asarray(gate_out), ref_gate, atol=2e-3,
                               err_msg="gate mismatch")

    loss_mod = load_reference_module("common.loss_function")
    gate_t = (np.arange(T_out)[None, :] >= (out_len - 1)[:, None]).astype(
        np.float32
    )
    ref_loss = loss_mod.Tacotron2Loss(1.0, 0.005)(
        [torch.tensor(ref_mel), torch.tensor(ref_mel_post),
         torch.tensor(ref_gate), torch.tensor(ref_align)],
        [torch.tensor(mel), torch.tensor(gate_t)],
    )
    my_loss = tacotron2_loss(
        (mel_out, mel_post, gate_out, align),
        (jnp.asarray(mel), jnp.asarray(gate_t)), 1.0, 0.005,
    )
    np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=1e-4)


def test_fullsize_tacotron2_autoregressive_parity(torch, rng):
    """Gate-stopped autoregressive decode at full size: identical stop step
    + pointwise trajectories (reference model.py:489-535, 597-610).  The
    decoder-step cap bounds runtime; every matrix is the real size."""
    patch_cuda_to_cpu()
    hparams_mod = load_reference_module("common.hparams")
    model_mod = patch_model_module_for_cpu(
        load_reference_module("common.model")
    )
    hp = hparams_mod.create_hparams(max_decoder_steps=48)
    ref_model = model_mod.Tacotron2(hp)
    ref_model.eval()

    cfg = Tacotron2Config.from_hparams(hp)
    assert cfg.n_symbols == 5816 and cfg.max_decoder_steps == 48
    params, model_state = import_tacotron2_state_dict(
        ref_model.state_dict(), cfg
    )

    T_in = 40
    ppg = np.abs(rng.rand(1, cfg.n_symbols, T_in)).astype(np.float32)
    ppg /= ppg.sum(axis=1, keepdims=True)

    with no_dropout(), torch.no_grad():
        ref_mel, ref_mel_post, ref_gate, ref_align = [
            t.detach().numpy()
            for t in ref_model.inference(torch.tensor(ppg))
        ]
    n_ref = ref_mel.shape[-1]

    orig_dropout = t2.dropout
    t2.__dict__["dropout"] = lambda key, x, rate, enabled: x
    try:
        mel, mel_post, gate, align, t_end = t2.tacotron2_inference(
            cfg, params, model_state, jnp.asarray(ppg),
            jax.random.PRNGKey(3),
        )
    finally:
        t2.__dict__["dropout"] = orig_dropout

    assert int(t_end) == n_ref, (
        f"stop step mismatch: {int(t_end)} vs reference {n_ref}"
    )
    k = int(t_end)
    np.testing.assert_allclose(
        np.asarray(align)[:, :k], ref_align.reshape(1, n_ref, T_in),
        atol=2e-4, err_msg="alignment trajectory mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(mel)[:, :, :k], ref_mel, atol=2e-3,
        err_msg="autoregressive mel mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(gate)[:, :k], ref_gate.reshape(1, n_ref), atol=2e-3,
        err_msg="gate trajectory mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(mel_post)[:, :, :k], ref_mel_post, atol=3e-3,
        err_msg="postnet mel mismatch",
    )


def test_fullsize_waveglow_forward_parity(torch, rng):
    """Training-direction (z, log_s, logdet, loss) parity at 12 flows x
    8x256 WN (reference glow.py:208-250)."""
    from fac_via_ppg_tpu.models.waveglow import waveglow_forward
    from fac_via_ppg_tpu.train.losses import waveglow_loss

    glow, ref_model, cfg, params = _full_waveglow_pair(torch)

    B, F = 1, 16
    T = F * cfg.hop_length
    mel = (rng.randn(B, 80, F) * 0.5 - 5.0).astype(np.float32)
    audio = (rng.randn(B, T) * 0.3).astype(np.float32)

    with torch.no_grad():
        z_ref, log_s_ref, log_det_ref = ref_model(
            (torch.tensor(mel), torch.tensor(audio))
        )
    z, log_s_list, log_det_list = waveglow_forward(
        cfg, params, jnp.asarray(mel), jnp.asarray(audio)
    )

    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), atol=2e-3,
                               err_msg="latent z mismatch")
    for i, (a, b) in enumerate(zip(log_s_list, log_s_ref)):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=2e-3,
                                   err_msg=f"log_s[{i}] mismatch")
    scale = B * (T // cfg.n_group)
    for i, (a, b) in enumerate(zip(log_det_list, log_det_ref)):
        assert abs(float(a) - float(b)) < 1e-5 * scale, (
            f"log_det_W[{i}] mismatch: {float(a)} vs {float(b)}"
        )

    loss_ref = glow.WaveGlowLoss(sigma=0.7071)(
        (z_ref, list(log_s_ref), list(log_det_ref))
    )
    loss = waveglow_loss((z, log_s_list, log_det_list), sigma=0.7071)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-3)


def test_fullsize_waveglow_matched_noise_infer_parity(torch, rng):
    """Generative infer with the reference's exact gaussian draws at the
    full 12-flow model (reference glow.py:252-293): pointwise audio."""
    from fac_via_ppg_tpu.models.waveglow import (
        flow_channels, remove_weightnorm, waveglow_infer,
    )

    patch_cuda_to_cpu()
    glow, ref_model, cfg, params = _full_waveglow_pair(torch)
    params = remove_weightnorm(params)

    B, F = 1, 16
    sigma = 0.6  # the serving operating point (generate_synthesis.py:57)
    mel = (rng.randn(B, 80, F) * 0.5 - 5.0).astype(np.float32)
    G = F * cfg.hop_length // cfg.n_group

    torch.manual_seed(2718)
    with torch.no_grad():
        ref_audio = ref_model.infer(torch.tensor(mel), sigma=sigma).numpy()

    torch.manual_seed(2718)
    n_remaining = flow_channels(cfg)[-1]
    shapes = [(B, n_remaining, G)] + [
        (B, cfg.n_early_size, G)
        for k in reversed(range(cfg.n_flows))
        if k % cfg.n_early_every == 0 and k > 0
    ]
    noise = [torch.FloatTensor(*s).normal_().numpy() for s in shapes]

    audio = waveglow_infer(
        cfg, params, jnp.asarray(mel), sigma, key=None, noise=noise
    )
    np.testing.assert_allclose(
        np.asarray(audio), ref_audio, atol=5e-3,
        err_msg="full-size generative infer audio mismatch",
    )


def test_fullsize_denoiser_parity(torch, rng):
    """Denoiser bias spectrum + subtraction on the full 12-flow model
    (reference denoiser.py:35-68; builds its bias from a (1, 80, 88) zero
    mel through waveglow.infer at sigma=0)."""
    from fac_via_ppg_tpu.models.denoiser import Denoiser
    from fac_via_ppg_tpu.models.waveglow import remove_weightnorm

    patch_cuda_to_cpu()
    ref_denoiser_mod = load_reference_module("waveglow.denoiser")
    glow, ref_model, cfg, params = _full_waveglow_pair(torch)
    params = remove_weightnorm(params)

    with torch.no_grad():
        ref_den = ref_denoiser_mod.Denoiser(ref_model, mode="zeros")
    my_den = Denoiser(cfg, params, mode="zeros")

    np.testing.assert_allclose(
        np.asarray(my_den.bias_spec), ref_den.bias_spec.numpy(), atol=1e-3,
        err_msg="full-size bias spectrum mismatch",
    )

    audio = (rng.randn(1, 4000) * 0.2).astype(np.float32)
    for strength in (0.005, 0.1):
        with torch.no_grad():
            ref_out = ref_den(torch.tensor(audio), strength=strength).numpy()
        mine = np.asarray(my_den(jnp.asarray(audio), strength=strength))
        np.testing.assert_allclose(
            mine, ref_out, atol=1e-3,
            err_msg=f"full-size denoised audio mismatch at {strength}",
        )
