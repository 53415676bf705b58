"""The bring-your-own-artifacts runbook (docs/RUNBOOK.md) driven end to
end on the substitute artifacts, so the acceptance chain cannot rot
while the real Kaldi AM / L2-ARCTIC / reference checkpoints are awaited.

Exercises every stage the real-artifact command would run:
  am      AM bundle discovery (reference data/ layout) + PPG invariants
  parity  teacher-forced mel-MSE vs the torch oracle on a reference-
          format .pt checkpoint (the bring-your-own-checkpoint case)
  serve   both implementations' serve paths on the same weights
(bench is hardware-bound and excluded here; the CLI flag drives it.)
"""

import json
import os

import numpy as np
import pytest
from scipy.io import wavfile

import jax

from fac_via_ppg_tpu.configs.hparams import (
    Tacotron2Config,
    WaveGlowConfig,
    create_hparams_stage,
)
from fac_via_ppg_tpu.scripts.make_substitute_am import make_bundle

from tests.test_torch_parity import T2_KW

MAX_STEPS = 16


def _make_artifacts(tmp_path):
    """Substitute AM bundle (reference data/ layout), 2 wavs, and both
    checkpoints exported in the REFERENCE torch formats — exactly what a
    bring-your-own-artifacts user hands the runbook."""
    pytest.importorskip("torch")
    from fac_via_ppg_tpu.models.tacotron2 import init_tacotron2
    from fac_via_ppg_tpu.models.waveglow import init_waveglow
    from fac_via_ppg_tpu.train.export_torch import (
        save_reference_tacotron2_checkpoint,
        save_reference_waveglow_checkpoint,
    )

    bundle = str(tmp_path / "bundle")
    make_bundle(bundle, n_senones=T2_KW["n_symbols"], n_phones=8,
                hidden_dim=8, num_layers=1)

    wavs = []
    for i, hz in enumerate((220.0, 350.0)):
        t = np.arange(8192) / 16000.0
        sig = np.sin(2 * np.pi * hz * t) + 0.3 * np.sin(2 * np.pi * 3 * hz * t)
        p = str(tmp_path / f"u{i}.wav")
        wavfile.write(p, 16000, (sig * 9000).astype(np.int16))
        wavs.append(p)

    t2_kw = dict(max_decoder_steps=MAX_STEPS, **T2_KW)
    t2_cfg = Tacotron2Config.from_hparams(create_hparams_stage(**t2_kw))
    wg_cfg = WaveGlowConfig(
        n_mel_channels=80, hop_length=160, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )
    t2_params, t2_state = init_tacotron2(jax.random.PRNGKey(0), t2_cfg)
    wg_params = init_waveglow(jax.random.PRNGKey(1), wg_cfg)

    t2_pt = str(tmp_path / "t2.pt")
    wg_pt = str(tmp_path / "wg.pt")
    save_reference_tacotron2_checkpoint(
        t2_pt, t2_params, t2_state, t2_cfg, iteration=0, learning_rate=0.0
    )
    save_reference_waveglow_checkpoint(wg_pt, wg_params, wg_cfg)
    return bundle, wavs, t2_pt, wg_pt, t2_kw, wg_cfg


def test_runbook_chain_on_substitute_artifacts(tmp_path, rng):
    from fac_via_ppg_tpu.eval.runbook import run_runbook

    bundle, wavs, t2_pt, wg_pt, t2_kw, wg_cfg = _make_artifacts(tmp_path)

    report = run_runbook(
        bundle, wavs,
        ppg2mel_model=t2_pt, waveglow_model=wg_pt,
        stages=("am", "parity", "serve"),
        t2_kw=t2_kw, wg_cfg=wg_cfg, max_decoder_steps=MAX_STEPS,
    )

    # stage am: bundle found via the reference's am/ + feats/ layout,
    # invariants asserted per utterance
    assert report["am"]["invariants_ok"]
    assert report["am"]["n_senones"] == T2_KW["n_symbols"]
    assert len(report["am"]["per_utterance"]) == len(wavs)
    for u in report["am"]["per_utterance"]:
        assert u["max_row_sum_err"] < 1e-3
        assert u["max_mono_sum_err"] < 1e-3
        assert u["frames"] > 0

    # stage parity: same .pt weights in both implementations ->
    # teacher-forced mels must agree far inside the 1e-3 target
    assert report["parity"]["mean_mse_vs_reference_model"] <= 1e-4, \
        report["parity"]

    # stage serve: both serve paths on the same weights
    assert report["serve"]["all_stop_steps_match"], report["serve"]
    assert report["serve"]["max_mel_mse"] <= 1e-3, report["serve"]
    assert report["passes_baseline"]

    # the report is the runbook's artifact: it must serialize
    json.dumps(report)


def test_runbook_cli_and_flat_layout(tmp_path, rng):
    """The CLI entry + a FLAT artifact directory (files not split into
    am/ + feats/) + orbax-checkpoint inputs (the retrain-here case):
    the am stage runs; parity reports the documented skip (the torch
    oracle needs a .pt); serve accepts the orbax checkpoints."""
    import shutil

    from fac_via_ppg_tpu.eval.runbook import find_am_paths, run_runbook
    from fac_via_ppg_tpu.models.tacotron2 import init_tacotron2
    from fac_via_ppg_tpu.models.waveglow import init_waveglow
    from fac_via_ppg_tpu.train import checkpoint as ckpt
    from fac_via_ppg_tpu.train.optim import make_optimizer

    pytest.importorskip("torch")
    bundle, wavs, _, _, t2_kw, wg_cfg = _make_artifacts(tmp_path)

    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for sub, name in (("am", "final.raw.txt"), ("feats", "final.mat"),
                      ("feats", "reduce_dim.mat"), ("feats", "splice_opts")):
        shutil.copy(os.path.join(bundle, sub, name),
                    os.path.join(flat, name))
    paths = find_am_paths(flat)
    assert all(os.path.dirname(p) == flat for p in paths.values())

    t2_cfg = Tacotron2Config.from_hparams(create_hparams_stage(**t2_kw))
    t2_params, t2_state = init_tacotron2(jax.random.PRNGKey(3), t2_cfg)
    wg_params = init_waveglow(jax.random.PRNGKey(4), wg_cfg)
    opt = make_optimizer(1e-3)
    t2_dir = str(tmp_path / "t2_orbax")
    wg_dir = str(tmp_path / "wg_orbax")
    ckpt.save_checkpoint(t2_dir, t2_params, opt.init(t2_params), 1e-3, 0,
                         model_state=t2_state)
    ckpt.save_checkpoint(wg_dir, wg_params, opt.init(wg_params), 1e-3, 0)

    report = run_runbook(
        flat, wavs, ppg2mel_model=t2_dir, waveglow_model=wg_dir,
        stages=("am", "parity", "serve"),
        t2_kw=t2_kw, wg_cfg=wg_cfg, max_decoder_steps=MAX_STEPS,
    )
    assert report["am"]["invariants_ok"]
    assert "skipped" in report["parity"]
    assert report["serve"]["all_stop_steps_match"]
    assert report["passes_baseline"]

    # missing-artifact errors must name what's absent
    with pytest.raises(FileNotFoundError):
        find_am_paths(str(tmp_path / "nowhere"))
