"""Data-parallel vocoder serving over the CPU mesh (waveglow_inference CLI
surface with --data_parallel): batch padding to the mesh, param
replication, per-file outputs."""

import glob
import os

import numpy as np
import pytest

import jax

from fac_via_ppg_tpu.configs.hparams import WaveGlowConfig
from fac_via_ppg_tpu.models.waveglow import init_waveglow
from fac_via_ppg_tpu.scripts.waveglow_inference import main as wg_infer_main
from fac_via_ppg_tpu.train import checkpoint as ckpt
from fac_via_ppg_tpu.train.optim import make_optimizer


@pytest.mark.skipif(jax.device_count() < 2, reason="needs a multi-device mesh")
def test_data_parallel_vocoder_serving(tmp_path, rng):
    # the CLI builds a full-size WaveGlowConfig, so the checkpoint must be
    # full-size too; mels are kept tiny to bound runtime.
    full = WaveGlowConfig()
    params = init_waveglow(jax.random.PRNGKey(0), full)
    opt = make_optimizer(1e-5)
    ckpt_path = str(tmp_path / "wg")
    ckpt.save_checkpoint(ckpt_path, params, opt.init(params), 1e-5, 0)

    mel_dir = tmp_path / "mels"
    mel_dir.mkdir()
    files = []
    for i in range(5):  # 5 files, mesh of 8: exercises batch padding
        p = str(mel_dir / f"m{i}.npy")
        np.save(p, (rng.randn(80, 24) * 0.5 - 5.0).astype(np.float32))
        files.append(p)
    filelist = str(tmp_path / "mels.txt")
    with open(filelist, "w") as f:
        f.write("\n".join(files) + "\n")

    out_dir = str(tmp_path / "out")
    # batch_size=8 explicitly: the DP mesh (8 data) and the TP mesh below
    # (4 data x 2 model) must batch identically or their noise-key
    # sequences (and thus outputs) are incomparable.
    wg_infer_main(filelist, ckpt_path, out_dir, sigma=0.6,
                  denoiser_strength=0.0, batch_size=8, data_parallel=True)

    outputs = sorted(glob.glob(os.path.join(out_dir, "*.wav")))
    assert len(outputs) == 5
    from scipy.io import wavfile

    for out in outputs:
        fs, wav = wavfile.read(out)
        assert fs == 16000
        assert len(wav) == 24 * 160
        assert np.isfinite(wav.astype(np.float64)).all()

    # DP x TP (model_parallel=2 shards the WN hidden channel): same noise
    # draws (partitionable RNG is layout-independent), so outputs agree up
    # to reduction-order reassociation through the 12 flows.
    tp_dir = str(tmp_path / "out_tp")
    wg_infer_main(filelist, ckpt_path, tp_dir, sigma=0.6,
                  denoiser_strength=0.0, batch_size=8, data_parallel=True,
                  model_parallel=2)
    tp_outputs = sorted(glob.glob(os.path.join(tp_dir, "*.wav")))
    assert len(tp_outputs) == 5
    for dp_f, tp_f in zip(outputs, tp_outputs):
        _, a = wavfile.read(dp_f)
        _, b = wavfile.read(tp_f)
        a = a.astype(np.float64)
        b = b.astype(np.float64)
        err = np.abs(a - b).max()
        assert err <= 64, f"TP audio diverged: max int16 delta {err}"
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.9999, f"TP audio decorrelated: {corr}"


@pytest.mark.skipif(jax.device_count() < 2, reason="needs a multi-device mesh")
def test_int8_composes_with_dp_tp_through_cli(tmp_path, rng):
    """int8 cond matmuls compose with DP x TP through the CLI: the packed
    stack shards column-parallel (parallel/sharding.int8cond_shardings).
    A small --config architecture keeps the CPU int8-matmul emulation
    cheap; init-weight cond projections are small, so int8 quantization
    stays close to the dense TP output."""
    import json

    from scipy.io import wavfile

    small = WaveGlowConfig(
        n_mel_channels=80, hop_length=160, n_flows=2, n_group=8,
        n_early_every=4, n_early_size=2, wn_n_layers=2, wn_n_channels=16,
        wn_kernel_size=3, upsample_kernel_size=1024,
    )
    params = init_waveglow(jax.random.PRNGKey(0), small)
    opt = make_optimizer(1e-5)
    ckpt_path = str(tmp_path / "wg_small")
    ckpt.save_checkpoint(ckpt_path, params, opt.init(params), 1e-5, 0)
    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        json.dump({"waveglow_config": {
            "n_mel_channels": 80, "n_flows": 2, "n_group": 8,
            "n_early_every": 4, "n_early_size": 2,
            "WN_config": {"n_layers": 2, "n_channels": 16,
                          "kernel_size": 3},
        }}, f)

    mel_dir = tmp_path / "mels"
    mel_dir.mkdir()
    files = []
    for i in range(3):
        p = str(mel_dir / f"m{i}.npy")
        np.save(p, (rng.randn(80, 24) * 0.5 - 5.0).astype(np.float32))
        files.append(p)
    filelist = str(tmp_path / "mels.txt")
    with open(filelist, "w") as f:
        f.write("\n".join(files) + "\n")

    tp_dir = str(tmp_path / "out_tp")
    wg_infer_main(filelist, ckpt_path, tp_dir, sigma=0.6,
                  denoiser_strength=0.0, batch_size=8, data_parallel=True,
                  model_parallel=2, config_path=cfg_path)
    i8_dir = str(tmp_path / "out_tp_int8")
    wg_infer_main(filelist, ckpt_path, i8_dir, sigma=0.6,
                  denoiser_strength=0.0, batch_size=8, data_parallel=True,
                  model_parallel=2, cond_impl="int8", config_path=cfg_path)
    tp_outputs = sorted(glob.glob(os.path.join(tp_dir, "*.wav")))
    i8_outputs = sorted(glob.glob(os.path.join(i8_dir, "*.wav")))
    assert len(tp_outputs) == 3 and len(i8_outputs) == 3
    for tp_f, i8_f in zip(tp_outputs, i8_outputs):
        _, b = wavfile.read(tp_f)
        _, c = wavfile.read(i8_f)
        b = b.astype(np.float64)
        c = c.astype(np.float64)
        assert np.isfinite(c).all()
        err = c - b
        snr = 10 * np.log10(
            max(np.sum(b**2), 1e-30) / max(np.sum(err**2), 1e-30)
        )
        assert snr > 25.0, f"int8 TP audio too far from dense TP: {snr:.1f} dB"
