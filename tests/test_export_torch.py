"""JAX -> torch checkpoint export, validated by loading THROUGH the
reference implementation (the reverse direction of test_torch_parity):
init here -> export -> reference code loads -> forward parity.

Covers both reference formats: the Tacotron2 state_dict .pt
(train_ppg2mel.py:143-149) and the pickled-module WaveGlow checkpoint
(train_waveglow.py:56-64).
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fac_via_ppg_tpu.configs.hparams import Tacotron2Config, WaveGlowConfig
from fac_via_ppg_tpu.models import tacotron2 as t2
from fac_via_ppg_tpu.models.tacotron2 import init_tacotron2
from fac_via_ppg_tpu.models.waveglow import init_waveglow, waveglow_forward
from fac_via_ppg_tpu.train.export_torch import (
    save_reference_tacotron2_checkpoint,
    save_reference_waveglow_checkpoint,
)
from fac_via_ppg_tpu.train.import_torch import (
    import_waveglow_state_dict,
    load_reference_waveglow_checkpoint,
)

from tests.test_torch_parity import T2_KW, WG_CONFIG, _wg_cfg
from tests.torch_oracle import load_reference_module, no_dropout, \
    patch_model_module_for_cpu


@pytest.fixture(scope="module")
def torch():
    import torch

    torch.manual_seed(777)
    return torch


def test_tacotron2_export_loads_in_reference(torch, rng, tmp_path):
    cfg = Tacotron2Config(max_decoder_steps=64, **T2_KW)
    params, model_state = init_tacotron2(jax.random.PRNGKey(11), cfg)
    path = str(tmp_path / "t2.pt")
    save_reference_tacotron2_checkpoint(
        path, params, model_state, cfg, iteration=17, learning_rate=5e-4
    )

    payload = torch.load(path, map_location="cpu", weights_only=False)
    assert payload["iteration"] == 17
    assert payload["learning_rate"] == 5e-4

    hparams_mod = load_reference_module("common.hparams")
    model_mod = patch_model_module_for_cpu(
        load_reference_module("common.model")
    )
    hp = hparams_mod.create_hparams(max_decoder_steps=64, **T2_KW)
    ref_model = model_mod.Tacotron2(hp)
    # strict load: every key the reference expects must be present
    ref_model.load_state_dict(payload["state_dict"], strict=True)
    ref_model.eval()

    B, T_in, T_out = 2, 12, 16
    ppg = np.abs(rng.rand(B, cfg.n_symbols, T_in)).astype(np.float32)
    in_len = np.array([12, 9], np.int64)
    mel = (rng.randn(B, 80, T_out) * 0.5).astype(np.float32)
    out_len = np.array([16, 11], np.int64)

    with no_dropout(), torch.no_grad():
        ref_out = ref_model(
            (torch.tensor(ppg), torch.tensor(in_len), torch.tensor(mel),
             int(in_len.max()), torch.tensor(out_len))
        )
    ref_mel_post = ref_out[1].numpy()

    orig_dropout = t2.dropout
    t2.__dict__["dropout"] = lambda key, x, rate, enabled: x
    try:
        (mm, mel_post, gg, aa), _ = t2.tacotron2_forward(
            cfg, params, model_state,
            jnp.asarray(ppg), jnp.asarray(in_len), jnp.asarray(mel),
            jnp.asarray(out_len), jax.random.PRNGKey(0), training=False,
        )
    finally:
        t2.__dict__["dropout"] = orig_dropout

    np.testing.assert_allclose(
        np.asarray(mel_post), ref_mel_post, atol=1e-3,
        err_msg="reference forward through exported checkpoint diverged",
    )


def test_waveglow_export_loads_in_reference(torch, rng, tmp_path):
    cfg = _wg_cfg()
    params = init_waveglow(jax.random.PRNGKey(5), cfg)
    path = str(tmp_path / "wg.pt")
    save_reference_waveglow_checkpoint(
        path, params, cfg, iteration=3, learning_rate=2e-4
    )

    # Load the way the reference does (inference.py: torch.load()['model'])
    # with the REFERENCE's glow classes resolving the pickle.
    glow = load_reference_module("waveglow.glow")
    prev = sys.modules.get("glow")
    sys.modules["glow"] = glow
    try:
        payload = torch.load(path, map_location="cpu", weights_only=False)
    finally:
        if prev is not None:
            sys.modules["glow"] = prev
        else:
            del sys.modules["glow"]
    model = payload["model"]
    assert type(model) is glow.WaveGlow, "pickle must resolve to the " \
        "reference's own class"
    assert payload["iteration"] == 3
    model.eval()

    B, T = 2, 2048
    F = T // cfg.hop_length
    mel = rng.randn(B, 16, F).astype(np.float32)
    audio = (rng.randn(B, T) * 0.3).astype(np.float32)
    with torch.no_grad():
        z_ref, log_s_ref, _ = model((torch.tensor(mel), torch.tensor(audio)))
    z, log_s_list, _ = waveglow_forward(
        cfg, params, jnp.asarray(mel), jnp.asarray(audio)
    )
    np.testing.assert_allclose(
        np.asarray(z), z_ref.numpy(), atol=2e-4,
        err_msg="reference forward through exported checkpoint diverged",
    )
    for a, b in zip(log_s_list, log_s_ref):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=2e-4)


def test_waveglow_export_import_roundtrip(tmp_path):
    """export -> import must reproduce the exact pytree (both directions of
    the interchange agree on the format)."""
    cfg = _wg_cfg()
    params = init_waveglow(jax.random.PRNGKey(9), cfg)
    path = str(tmp_path / "wg_rt.pt")
    save_reference_waveglow_checkpoint(path, params, cfg)
    back = load_reference_waveglow_checkpoint(path, cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        params, back,
    )
