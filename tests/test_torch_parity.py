"""Golden parity vs the reference PyTorch implementation (CPU oracle).

The reference modules are imported read-only from /root/reference and run
on CPU torch; their randomly-initialized weights are converted through
train/import_torch and the JAX models must reproduce the outputs.  This is
the 'bit-comparable vs PyTorch checkpoints' requirement exercised end to
end: checkpoint import + model numerics in one comparison.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fac_via_ppg_tpu.configs.hparams import Tacotron2Config, WaveGlowConfig
from fac_via_ppg_tpu.models import tacotron2 as t2
from fac_via_ppg_tpu.models.waveglow import waveglow_forward
from fac_via_ppg_tpu.train.import_torch import (
    import_tacotron2_state_dict,
    import_waveglow_state_dict,
)
from fac_via_ppg_tpu.train.losses import tacotron2_loss, waveglow_loss

from tests.torch_oracle import (
    load_reference_module,
    no_dropout,
    patch_model_module_for_cpu,
)


@pytest.fixture(scope="module")
def torch():
    import torch

    torch.manual_seed(16807)
    return torch


# ==========================================================================
# WaveGlow
# ==========================================================================

WG_CONFIG = dict(
    n_mel_channels=16,
    hop_length=32,
    n_flows=6,
    n_group=8,
    n_early_every=2,
    n_early_size=2,
    WN_config=dict(n_layers=3, n_channels=32, kernel_size=3),
)


def _wg_cfg():
    return WaveGlowConfig(
        n_mel_channels=16, hop_length=32, n_flows=6, n_group=8,
        n_early_every=2, n_early_size=2, wn_n_layers=3, wn_n_channels=32,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )


def test_waveglow_forward_matches_reference(torch, rng):
    glow = load_reference_module("waveglow.glow")
    ref_model = glow.WaveGlow(**WG_CONFIG)
    ref_model.eval()

    cfg = _wg_cfg()
    params = import_waveglow_state_dict(ref_model.state_dict(), cfg)

    B, T = 2, 2048
    F = T // cfg.hop_length
    mel = rng.randn(B, 16, F).astype(np.float32)
    audio = (rng.randn(B, T) * 0.3).astype(np.float32)

    with torch.no_grad():
        z_ref, log_s_ref, log_det_ref = ref_model(
            (torch.tensor(mel), torch.tensor(audio))
        )
    z, log_s_list, log_det_list = waveglow_forward(
        cfg, params, jnp.asarray(mel), jnp.asarray(audio)
    )

    np.testing.assert_allclose(
        np.asarray(z), z_ref.numpy(), atol=2e-4,
        err_msg="latent z mismatch",
    )
    for i, (a, b) in enumerate(zip(log_s_list, log_s_ref)):
        np.testing.assert_allclose(
            np.asarray(a), b.numpy(), atol=2e-4,
            err_msg=f"log_s[{i}] mismatch",
        )
    for i, (a, b) in enumerate(zip(log_det_list, log_det_ref)):
        # log|det W| ~ 0 at orthonormal init; scale tolerance by the B*G
        # multiplier instead of using rtol on a near-zero value.
        scale = audio.shape[0] * (T // cfg.n_group)
        assert abs(float(a) - float(b)) < 1e-5 * scale, (
            f"log_det_W[{i}] mismatch: {float(a)} vs {float(b)}"
        )

    # loss parity
    loss_ref = glow.WaveGlowLoss(sigma=0.7071)(
        (z_ref, list(log_s_ref), list(log_det_ref))
    )
    loss = waveglow_loss((z, log_s_list, log_det_list), sigma=0.7071)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-4)


def test_waveglow_infer_matches_reference_reverse(torch, rng):
    """My infer must invert the REFERENCE's forward: run reference forward,
    feed its z into my reverse flows, recover the original audio."""
    from fac_via_ppg_tpu.models.waveglow import (
        flow_channels,
        group_spect,
        remove_weightnorm,
        ungroup_audio,
        upsample_phase_matmul,
        wn_apply,
    )

    glow = load_reference_module("waveglow.glow")
    ref_model = glow.WaveGlow(**WG_CONFIG)
    ref_model.eval()
    cfg = _wg_cfg()
    params = remove_weightnorm(
        import_waveglow_state_dict(ref_model.state_dict(), cfg)
    )

    B, T = 1, 2048
    F = T // cfg.hop_length
    mel = rng.randn(B, 16, F).astype(np.float32)
    audio = (rng.randn(B, T) * 0.3).astype(np.float32)
    with torch.no_grad():
        z_ref, _, _ = ref_model((torch.tensor(mel), torch.tensor(audio)))
    z = jnp.asarray(z_ref.numpy())

    spect_up = upsample_phase_matmul(params["upsample"], jnp.asarray(mel),
                                     cfg.hop_length)[:, :, :T]
    spect_g = group_spect(spect_up, cfg.n_group)

    chans = flow_channels(cfg)
    sizes = [cfg.n_early_size
             for k in range(cfg.n_flows)
             if k % cfg.n_early_every == 0 and k > 0] + [chans[-1]]
    chunks = jnp.split(z, np.cumsum(sizes)[:-1], axis=1)
    audio_rec = chunks[-1]
    idx = len(chunks) - 2
    for k in reversed(range(cfg.n_flows)):
        n_half = audio_rec.shape[1] // 2
        a0, a1 = audio_rec[:, :n_half], audio_rec[:, n_half:]
        wn_out = wn_apply(cfg, params["wn"][k], a0, spect_g)
        s, b = wn_out[:, n_half:], wn_out[:, :n_half]
        audio_rec = jnp.concatenate([a0, (a1 - b) * jnp.exp(-s)], axis=1)
        audio_rec = jnp.einsum(
            "oc,bct->bot", params["convinv"][k]["weight_inverse"], audio_rec
        )
        if k % cfg.n_early_every == 0 and k > 0:
            audio_rec = jnp.concatenate([chunks[idx], audio_rec], axis=1)
            idx -= 1

    rec = np.asarray(ungroup_audio(audio_rec))
    np.testing.assert_allclose(rec, audio[:, : rec.shape[1]], atol=2e-3)


# ==========================================================================
# Tacotron2
# ==========================================================================

T2_KW = dict(
    n_symbols=48,
    symbols_embedding_dim=32,
    encoder_embedding_dim=32,
    decoder_rnn_dim=24,
    prenet_dim=16,
    attention_rnn_dim=24,
    attention_dim=12,
    attention_location_n_filters=4,
    attention_location_kernel_size=7,
    postnet_embedding_dim=24,
)


def test_tacotron2_forward_matches_reference(torch, rng):
    hparams_mod = load_reference_module("common.hparams")
    model_mod = patch_model_module_for_cpu(
        load_reference_module("common.model")
    )
    hp = hparams_mod.create_hparams(**T2_KW)
    ref_model = model_mod.Tacotron2(hp)
    ref_model.eval()

    cfg = Tacotron2Config(
        max_decoder_steps=hp.max_decoder_steps, **T2_KW
    )
    params, model_state = import_tacotron2_state_dict(
        ref_model.state_dict(), cfg
    )

    B, T_in, T_out = 3, 18, 22
    ppg = np.abs(rng.rand(B, cfg.n_symbols, T_in)).astype(np.float32)
    in_len = np.array([18, 14, 9], np.int64)  # sorted desc (pack_padded)
    mel = (rng.randn(B, 80, T_out) * 0.5).astype(np.float32)
    out_len = np.array([22, 17, 11], np.int64)

    with no_dropout(), torch.no_grad():
        ref_out = ref_model(
            (
                torch.tensor(ppg),
                torch.tensor(in_len),
                torch.tensor(mel),
                int(in_len.max()),
                torch.tensor(out_len),
            )
        )
    ref_mel, ref_mel_post, ref_gate, ref_align = [
        t.detach().numpy() for t in ref_out
    ]

    # Disable every dropout on the JAX side for deterministic comparison.
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

    np.testing.assert_allclose(
        np.asarray(align), ref_align, atol=1e-4,
        err_msg="alignment mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(mel_out), ref_mel, atol=5e-4,
        err_msg="pre-postnet mel mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(mel_post), ref_mel_post, atol=1e-3,
        err_msg="postnet mel mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(gate_out), ref_gate, atol=5e-4,
        err_msg="gate mismatch",
    )

    # Loss parity on the same outputs.
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


# ==========================================================================
# Serve path: autoregressive decode -> vocoder infer -> denoiser
# ==========================================================================

def test_tacotron2_autoregressive_inference_matches_reference(torch, rng):
    """Full serve-path decode parity: gate-stopped autoregressive inference
    (reference model.py:489-535 + 597-610) with dropout disabled both sides
    must produce the identical stop step and pointwise-equal mel / gate /
    alignment trajectories."""
    from tests.torch_oracle import patch_cuda_to_cpu

    patch_cuda_to_cpu()
    hparams_mod = load_reference_module("common.hparams")
    model_mod = patch_model_module_for_cpu(
        load_reference_module("common.model")
    )
    hp = hparams_mod.create_hparams(max_decoder_steps=64, **T2_KW)
    ref_model = model_mod.Tacotron2(hp)
    ref_model.eval()

    cfg = Tacotron2Config(max_decoder_steps=64, **T2_KW)
    params, model_state = import_tacotron2_state_dict(
        ref_model.state_dict(), cfg
    )

    T_in = 18
    ppg = np.abs(rng.rand(1, cfg.n_symbols, T_in)).astype(np.float32)

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
        atol=1e-4, err_msg="alignment trajectory mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(mel)[:, :, :k], ref_mel, atol=5e-4,
        err_msg="autoregressive mel mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(gate)[:, :k], ref_gate.reshape(1, n_ref), atol=5e-4,
        err_msg="gate trajectory mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(mel_post)[:, :, :k], ref_mel_post, atol=1e-3,
        err_msg="postnet mel mismatch",
    )


def test_tacotron2_inference_rejects_batch_gt_1(rng):
    """The single-sequence decode stops on sequence 0's gate only; feeding
    it a batch must be an explicit error, not silently wrong stopping."""
    cfg = Tacotron2Config(max_decoder_steps=8, **T2_KW)
    params, state = t2.init_tacotron2(jax.random.PRNGKey(0), cfg)
    ppg = jnp.asarray(np.abs(rng.rand(2, cfg.n_symbols, 7)), jnp.float32)
    with pytest.raises(ValueError, match="batch"):
        t2.tacotron2_inference(cfg, params, state, ppg, jax.random.PRNGKey(0))


def test_waveglow_infer_matches_reference_with_matched_noise(torch, rng):
    """Generative-direction parity: feed my `waveglow_infer` the exact
    gaussian draws the reference `WaveGlow.infer` (glow.py:252-293) made and
    require pointwise-equal audio."""
    from tests.torch_oracle import patch_cuda_to_cpu
    from fac_via_ppg_tpu.models.waveglow import (
        flow_channels, remove_weightnorm, waveglow_infer,
    )

    patch_cuda_to_cpu()
    glow = load_reference_module("waveglow.glow")
    ref_model = glow.WaveGlow(**WG_CONFIG)
    ref_model.eval()
    cfg = _wg_cfg()
    params = remove_weightnorm(
        import_waveglow_state_dict(ref_model.state_dict(), cfg)
    )

    B, F = 1, 64
    sigma = 0.9
    mel = rng.randn(B, 16, F).astype(np.float32)
    G = F * cfg.hop_length // cfg.n_group

    torch.manual_seed(2718)
    with torch.no_grad():
        ref_audio = ref_model.infer(torch.tensor(mel), sigma=sigma).numpy()

    # Replay the reference's draw order with the same global RNG state:
    # the (B, n_remaining, G) seed, then one (B, n_early_size, G) chunk per
    # early output, k descending (glow.py:261-268, 284-289).
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
        np.asarray(audio), ref_audio, atol=2e-3,
        err_msg="generative infer audio mismatch",
    )


def test_denoiser_matches_reference(torch, rng):
    """Bias spectrum + spectral subtraction parity vs the reference
    Denoiser (denoiser.py:35-68).  sigma=0 makes the bias audio
    noise-independent, so the whole path is pointwise comparable."""
    from tests.torch_oracle import patch_cuda_to_cpu
    from fac_via_ppg_tpu.models.denoiser import Denoiser
    from fac_via_ppg_tpu.models.waveglow import remove_weightnorm

    patch_cuda_to_cpu()
    glow = load_reference_module("waveglow.glow")
    ref_denoiser_mod = load_reference_module("waveglow.denoiser")

    # The reference Denoiser hardcodes an 80-channel bias mel
    # (denoiser.py:45-47), so this config must be 80-mel.
    wg_kw = dict(
        n_mel_channels=80, hop_length=32, n_flows=4, n_group=8,
        n_early_every=2, n_early_size=2,
        WN_config=dict(n_layers=2, n_channels=16, kernel_size=3),
    )
    ref_model = glow.WaveGlow(**wg_kw)
    ref_model.eval()
    cfg = WaveGlowConfig(
        n_mel_channels=80, hop_length=32, n_flows=4, n_group=8,
        n_early_every=2, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )
    params = remove_weightnorm(
        import_waveglow_state_dict(ref_model.state_dict(), cfg)
    )

    with torch.no_grad():
        ref_den = ref_denoiser_mod.Denoiser(ref_model, mode="zeros")
    my_den = Denoiser(cfg, params, mode="zeros")

    np.testing.assert_allclose(
        np.asarray(my_den.bias_spec), ref_den.bias_spec.numpy(), atol=5e-4,
        err_msg="bias spectrum mismatch",
    )

    audio = (rng.randn(1, 4000) * 0.2).astype(np.float32)
    for strength in (0.0, 0.1, 1.0):
        with torch.no_grad():
            ref_out = ref_den(torch.tensor(audio), strength=strength).numpy()
        mine = np.asarray(my_den(jnp.asarray(audio), strength=strength))
        np.testing.assert_allclose(
            mine, ref_out, atol=5e-4,
            err_msg=f"denoised audio mismatch at strength={strength}",
        )
