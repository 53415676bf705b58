"""The trained-checkpoint fidelity LOOP, end to end in-suite (tiny scale):

  train here -> orbax checkpoints -> export to reference torch formats ->
  REFERENCE code serves (inference -> WaveGlow.infer -> Denoiser) ->
  this framework serves the same utterances -> mel-MSE / stop step /
  audio distance via eval/trained_parity.

This is the mechanics proof for the BASELINE acceptance harness; the
full-size trained number is produced on hardware with the same command
(`python -m fac_via_ppg_tpu.eval.trained_parity ...`) and recorded in
docs/STATUS.md.
"""

import numpy as np
import pytest
from scipy.io import wavfile

import jax
import jax.numpy as jnp

from fac_via_ppg_tpu.configs.hparams import (
    Tacotron2Config,
    WaveGlowConfig,
    create_hparams_stage,
)
from fac_via_ppg_tpu.frontend.ppg import DependenciesPPG
from fac_via_ppg_tpu.scripts.make_substitute_am import make_bundle

from tests.test_torch_parity import T2_KW


@pytest.mark.slow
def test_trained_checkpoint_fidelity_loop(tmp_path, rng):
    pytest.importorskip("torch")
    from fac_via_ppg_tpu.data.ppg_mel_dataset import ppg_acoustics_collate
    from fac_via_ppg_tpu.eval.parity import extract_features
    from fac_via_ppg_tpu.eval.trained_parity import run_trained_parity
    from fac_via_ppg_tpu.models.tacotron2 import init_tacotron2
    from fac_via_ppg_tpu.models.waveglow import init_waveglow
    from fac_via_ppg_tpu.train import checkpoint as ckpt
    from fac_via_ppg_tpu.train.optim import make_optimizer
    from fac_via_ppg_tpu.train.step import (
        make_tacotron2_train_step,
        make_waveglow_train_step,
    )

    # --- tiny AM bundle + 2-utterance corpus ------------------------------
    make_bundle(str(tmp_path / "bundle"), n_senones=T2_KW["n_symbols"],
                n_phones=8, hidden_dim=8, num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(tmp_path / "bundle" / "am" / "final.raw.txt"),
        lda_path=str(tmp_path / "bundle" / "feats" / "final.mat"),
        reduce_dim_path=str(tmp_path / "bundle" / "feats" /
                            "reduce_dim.mat"),
        splice_opts_path=str(tmp_path / "bundle" / "feats" / "splice_opts"),
    )
    wavs = []
    for i, hz in enumerate((200.0, 330.0)):
        t = np.arange(10240) / 16000.0
        sig = (np.sin(2 * np.pi * hz * t)
               + 0.3 * np.sin(2 * np.pi * 2.5 * hz * t))
        p = str(tmp_path / f"u{i}.wav")
        wavfile.write(p, 16000, (sig * 9000).astype(np.int16))
        wavs.append(p)

    max_steps = 24
    t2_kw = dict(max_decoder_steps=max_steps, **T2_KW)
    hp = create_hparams_stage(**t2_kw)
    t2_cfg = Tacotron2Config.from_hparams(hp)

    # --- featurize and TRAIN Tacotron2 (overfit a single batch) -----------
    items = []
    for p in wavs:
        ppg, mel = extract_features(p, hp, deps)
        items.append((ppg.astype(np.float32),
                      mel.T.astype(np.float32)))
    batch = ppg_acoustics_collate(items)

    t2_params, t2_state = init_tacotron2(jax.random.PRNGKey(0), t2_cfg)
    opt = make_optimizer(1e-3)
    opt_state = opt.init(t2_params)
    step = make_tacotron2_train_step(t2_cfg, opt, donate=False)
    device_batch = tuple(jnp.asarray(x) for x in batch)
    losses = []
    for i in range(12):
        out = step(t2_params, t2_state, opt_state, device_batch,
                   jax.random.PRNGKey(100 + i))
        t2_params, t2_state, opt_state = (
            out.params, out.model_state, out.opt_state
        )
        losses.append(float(out.loss))
    assert losses[-1] < losses[0], "tiny Tacotron2 did not train"
    t2_ckpt = str(tmp_path / "t2_ckpt")
    ckpt.save_checkpoint(t2_ckpt, t2_params, opt_state, 1e-3, 12,
                         model_state=t2_state)

    # --- TRAIN WaveGlow briefly on the same wavs --------------------------
    wg_cfg = WaveGlowConfig(
        n_mel_channels=80, hop_length=160, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )
    mels, audios = [], []
    for p in wavs:
        _, wav = wavfile.read(p)
        audio = (wav.astype(np.float32) / 32768.0)[:10240]
        _, mel = extract_features(p, hp, deps)
        mels.append(mel[:, :64])
        audios.append(audio[: 64 * 160])
    wg_batch = (jnp.asarray(np.stack(mels)), jnp.asarray(np.stack(audios)))

    wg_params = init_waveglow(jax.random.PRNGKey(1), wg_cfg)
    wg_opt = make_optimizer(1e-4)
    wg_opt_state = wg_opt.init(wg_params)
    wg_step = make_waveglow_train_step(wg_cfg, wg_opt, sigma=0.7071,
                                       donate=False)
    wg_losses = []
    for _ in range(8):
        out = wg_step(wg_params, wg_opt_state, wg_batch)
        wg_params, wg_opt_state = out.params, out.opt_state
        wg_losses.append(float(out.loss))
    assert np.isfinite(wg_losses).all()
    wg_ckpt = str(tmp_path / "wg_ckpt")
    ckpt.save_checkpoint(wg_ckpt, wg_params, wg_opt_state, 1e-4, 8)

    # --- the fidelity loop: export -> reference oracle -> compare ---------
    result = run_trained_parity(
        t2_ckpt, wg_ckpt, wavs, t2_kw=t2_kw, wg_cfg=wg_cfg, deps=deps,
        sigma=0.6, denoiser_strength=0.005,
    )

    assert result["all_stop_steps_match"], result
    # trained-weight serve parity: same weights, both implementations —
    # the BASELINE bound with two orders of margin expected
    assert result["max_mel_mse"] <= 1e-3, result
    assert result["passes_baseline"], result
    for u in result["per_utterance"]:
        assert u["audio_max_abs"] < 5e-2, u
        assert np.isfinite(u["audio_lsd_db"]), u
