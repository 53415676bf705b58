"""eval/duration_check smoke test: the study acceptance tool runs the real
PPG front end + autoregressive decode from an orbax checkpoint and reports
GATE/CAP per utterance (docs/STATUS.md gate-convergence studies)."""

import numpy as np
from scipy.io import wavfile

import jax

from fac_via_ppg_tpu.configs.hparams import Tacotron2Config, \
    create_hparams_stage
from fac_via_ppg_tpu.eval.duration_check import check_durations
from fac_via_ppg_tpu.frontend.ppg import DependenciesPPG
from fac_via_ppg_tpu.models.tacotron2 import init_tacotron2
from fac_via_ppg_tpu.scripts.make_substitute_am import make_bundle
from fac_via_ppg_tpu.train import checkpoint as ckpt

TINY_T2 = dict(
    n_symbols=16, symbols_embedding_dim=16, encoder_embedding_dim=16,
    decoder_rnn_dim=12, prenet_dim=8, attention_rnn_dim=12, attention_dim=8,
    attention_location_n_filters=4, attention_location_kernel_size=7,
    postnet_embedding_dim=16, max_decoder_steps=20,
)


def test_duration_check_reports_rows_and_summary(tmp_path):
    make_bundle(str(tmp_path / "bundle"), n_senones=16, n_phones=4,
                hidden_dim=8, num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(tmp_path / "bundle" / "am" / "final.raw.txt"),
        lda_path=str(tmp_path / "bundle" / "feats" / "final.mat"),
        reduce_dim_path=str(tmp_path / "bundle" / "feats" / "reduce_dim.mat"),
        splice_opts_path=str(tmp_path / "bundle" / "feats" / "splice_opts"),
    )
    cfg = Tacotron2Config.from_hparams(create_hparams_stage(**TINY_T2))
    params, state = init_tacotron2(jax.random.PRNGKey(0), cfg)
    ckpt_path = str(tmp_path / "ckpt_t2")
    ckpt.save_checkpoint(ckpt_path, params, {}, 1e-3, 0, model_state=state)

    t = np.arange(6400) / 16000.0
    wav = str(tmp_path / "utt.wav")
    wavfile.write(wav, 16000,
                  (np.sin(2 * np.pi * 220 * t) * 9000).astype(np.int16))

    rows, summary = check_durations(ckpt_path, [wav], cfg=cfg, deps=deps)
    assert len(rows) == 1
    r = rows[0]
    # 0.4 s utterance = 40 source frames at the 10 ms hop
    assert r["src_frames"] == 40
    assert r["stop"] in ("GATE", "CAP")
    assert 0 < r["out_frames"] <= cfg.max_decoder_steps
    assert summary["n_utts"] == 1
    # an untrained model must not be reported as a converged one
    if r["stop"] == "CAP":
        assert summary["median_rel_duration_err"] is None
    else:
        assert summary["median_rel_duration_err"] >= 0
