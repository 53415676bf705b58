"""End-to-end test of the batched WaveGlow vocoder inference CLI.

Drives scripts/waveglow_inference.main (the counterpart of the reference
src/waveglow/inference.py:33-73) at a tiny architecture named via the
--config flag (reference waveglow/config.json schema), with the serving
options stacked on: bf16 compute, int8 cond matmuls, denoiser, and a
filelist that mixes mel lengths to exercise the same-length batching.
"""

import json

import pytest

import jax
import numpy as np
from scipy.io import wavfile

from fac_via_ppg_tpu.configs.hparams import WaveGlowConfig
from fac_via_ppg_tpu.models.waveglow import init_waveglow
from fac_via_ppg_tpu.scripts.waveglow_inference import main
from fac_via_ppg_tpu.train.checkpoint import save_checkpoint

TINY = {
    "n_mel_channels": 80, "hop_length": 160, "n_flows": 2, "n_group": 8,
    "n_early_every": 4, "n_early_size": 2,
    "WN_config": {"n_layers": 2, "n_channels": 16, "kernel_size": 3},
}
MEL_LENS = [24, 24, 30]


def test_cli_tiny_config_bf16_int8_denoised(tmp_path):
    cfg = WaveGlowConfig.from_dict(TINY)
    params = init_waveglow(jax.random.PRNGKey(0), cfg)
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), params, {}, 1e-4, 0)
    config_path = tmp_path / "config.json"
    config_path.write_text(json.dumps({"waveglow_config": TINY}))

    rs = np.random.RandomState(0)
    files = []
    for i, frames in enumerate(MEL_LENS):
        mel = (rs.randn(80, frames) * 0.5 - 5).astype(np.float32)
        path = tmp_path / f"mel{i}.npy"
        np.save(path, mel)
        files.append(str(path))
    filelist = tmp_path / "mels.txt"
    filelist.write_text("\n".join(files) + "\n")

    out = tmp_path / "out"
    main(str(filelist), str(ckpt), str(out), 0.8, 0.01, batch_size=2,
         compute_dtype="bfloat16", cond_impl="int8",
         config_path=str(config_path))

    for i, frames in enumerate(MEL_LENS):
        sr, wav = wavfile.read(out / f"mel{i}.npy_synthesis.wav")
        assert sr == 16000
        assert wav.dtype == np.int16
        assert len(wav) == frames * cfg.hop_length
        assert np.isfinite(wav.astype(np.float64)).all()
        assert np.abs(wav).max() > 0


@pytest.mark.slow  # two tiny-model compiles (~40 s); the padding logic
# itself has fast-tier coverage in test_fused.py's shape-spy tests
def test_cli_pads_off_grid_batches_to_tile_grid(tmp_path, monkeypatch):
    """--pad_batches: 9 same-length mels under batch_size=12 dispatch as
    one 16-row program under the default grid policy (the off-grid
    program is slower in ABSOLUTE audio/s — docs/PERF.md B=12 crater),
    exact 9 rows under none, and the wavs are identical-length either
    way (pad rows trimmed)."""
    import fac_via_ppg_tpu.scripts.waveglow_inference as cli

    cfg = WaveGlowConfig.from_dict(TINY)
    params = init_waveglow(jax.random.PRNGKey(0), cfg)
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), params, {}, 1e-4, 0)
    config_path = tmp_path / "config.json"
    config_path.write_text(json.dumps({"waveglow_config": TINY}))

    rs = np.random.RandomState(0)
    files = []
    for i in range(9):
        mel = (rs.randn(80, 24) * 0.5 - 5).astype(np.float32)
        path = tmp_path / f"mel{i}.npy"
        np.save(path, mel)
        files.append(str(path))
    filelist = tmp_path / "mels.txt"
    filelist.write_text("\n".join(files) + "\n")

    real_infer = cli.waveglow_infer
    seen = []

    def spy(cfg_, params_, mel, *a, **kw):
        seen.append(int(mel.shape[0]))
        return real_infer(cfg_, params_, mel, *a, **kw)

    monkeypatch.setattr(cli, "waveglow_infer", spy)

    out = tmp_path / "out_grid"
    cli.main(str(filelist), str(ckpt), str(out), 0.8, 0.0, batch_size=12,
             config_path=str(config_path))
    assert seen == [16]  # 9 real rows -> one on-grid 16-row program
    for i in range(9):
        _, wav = wavfile.read(out / f"mel{i}.npy_synthesis.wav")
        assert len(wav) == 24 * cfg.hop_length

    seen.clear()
    out = tmp_path / "out_none"
    cli.main(str(filelist), str(ckpt), str(out), 0.8, 0.0, batch_size=12,
             config_path=str(config_path), pad_batches="none")
    assert seen == [9]
    assert len(list(out.glob("*.wav"))) == 9

    # full: partial tail chunks pad to the full batch_size, so the 9
    # files split [8, 1] but BOTH chunks run the one 8-row program.
    # The spy fires at jit TRACE time, so `seen` counts compiled batch
    # shapes: exactly one 8-row trace = one compile per mel length
    seen.clear()
    out = tmp_path / "out_full"
    cli.main(str(filelist), str(ckpt), str(out), 0.8, 0.0, batch_size=8,
             config_path=str(config_path), pad_batches="full")
    assert seen == [8]
    assert len(list(out.glob("*.wav"))) == 9
    # grid leaves small tails exact (padding 1 -> 8 is full's job)
    seen.clear()
    out = tmp_path / "out_grid8"
    cli.main(str(filelist), str(ckpt), str(out), 0.8, 0.0, batch_size=8,
             config_path=str(config_path), pad_batches="grid")
    assert seen == [8, 1]
    assert len(list(out.glob("*.wav"))) == 9

    # grid chunks at the grid-rounded batch size, not the off-grid one:
    # 24 files at -b 12 dispatch as [16, 8] = 24 device rows, not
    # [12->16, 12->16] = 32
    for i in range(9, 24):
        path = tmp_path / f"mel{i}.npy"
        np.save(path, (rs.randn(80, 24) * 0.5 - 5).astype(np.float32))
        files.append(str(path))
    filelist.write_text("\n".join(files) + "\n")
    seen.clear()
    out = tmp_path / "out_grid24"
    cli.main(str(filelist), str(ckpt), str(out), 0.8, 0.0, batch_size=12,
             config_path=str(config_path), pad_batches="grid")
    assert seen == [16, 8]
    assert len(list(out.glob("*.wav"))) == 24


def test_bucket_mels_pads_and_tracks_true_length():
    """bucket_mels collapses distinct lengths into shared padded-length
    groups (edge-repeated last frame) and remembers the true frame count
    for post-synthesis trimming; bucket 0 keeps exact lengths."""
    from fac_via_ppg_tpu.scripts.waveglow_inference import bucket_mels

    mels = [("a", np.arange(10, dtype=np.float32).reshape(2, 5)),
            ("b", np.ones((2, 8), np.float32)),
            ("c", np.ones((2, 3), np.float32))]
    out = bucket_mels(mels, 8)
    assert [(m.shape[-1], t) for _, m, t in out] == [(8, 5), (8, 8), (8, 3)]
    # pad region edge-repeats the final frame
    np.testing.assert_array_equal(out[0][1][:, 5:],
                                  np.repeat(out[0][1][:, 4:5], 3, axis=1))
    # bucket 0: untouched
    out0 = bucket_mels(mels, 0)
    assert [(m.shape[-1], t) for _, m, t in out0] == [(5, 5), (8, 8), (3, 3)]


@pytest.mark.slow  # one tiny-model compile
def test_cli_mel_bucket_batches_distinct_lengths(tmp_path, monkeypatch):
    """--mel_bucket 32: mels of length 24 and 30 pad into ONE 32-frame
    group, synthesize as a single 2-row program, and each wav trims back
    to its true length x hop."""
    import fac_via_ppg_tpu.scripts.waveglow_inference as cli

    cfg = WaveGlowConfig.from_dict(TINY)
    params = init_waveglow(jax.random.PRNGKey(0), cfg)
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), params, {}, 1e-4, 0)
    config_path = tmp_path / "config.json"
    config_path.write_text(json.dumps({"waveglow_config": TINY}))

    rs = np.random.RandomState(0)
    lens = [24, 30]
    files = []
    for i, frames in enumerate(lens):
        mel = (rs.randn(80, frames) * 0.5 - 5).astype(np.float32)
        path = tmp_path / f"mel{i}.npy"
        np.save(path, mel)
        files.append(str(path))
    filelist = tmp_path / "mels.txt"
    filelist.write_text("\n".join(files) + "\n")

    real_infer = cli.waveglow_infer
    shapes = []

    def spy(cfg_, params_, mel, *a, **kw):
        shapes.append(tuple(int(d) for d in mel.shape))
        return real_infer(cfg_, params_, mel, *a, **kw)

    monkeypatch.setattr(cli, "waveglow_infer", spy)
    out = tmp_path / "out"
    cli.main(str(filelist), str(ckpt), str(out), 0.8, 0.0, batch_size=2,
             config_path=str(config_path), mel_bucket=32)
    assert shapes == [(2, 80, 32)]  # one traced program for both lengths
    for i, frames in enumerate(lens):
        sr, wav = wavfile.read(out / f"mel{i}.npy_synthesis.wav")
        assert sr == 16000
        assert len(wav) == frames * cfg.hop_length
        assert np.abs(wav).max() > 0


@pytest.mark.slow  # three tiny-model compiles; the logic itself has
# fast-tier coverage (bucket_mels unit test / the always-fast CLI e2e)
def test_cli_hints_mel_bucket_for_distinct_lengths(tmp_path):
    """Batching requested over a corpus of all-distinct lengths warns
    with the --mel_bucket suggestion (exact-length grouping would leave
    every batch at size 1); a bucketed run doesn't."""
    import warnings

    import fac_via_ppg_tpu.scripts.waveglow_inference as cli

    cfg = WaveGlowConfig.from_dict(TINY)
    params = init_waveglow(jax.random.PRNGKey(0), cfg)
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), params, {}, 1e-4, 0)
    config_path = tmp_path / "config.json"
    config_path.write_text(json.dumps({"waveglow_config": TINY}))
    rs = np.random.RandomState(0)
    files = []
    for i, frames in enumerate([17, 21, 26]):
        path = tmp_path / f"mel{i}.npy"
        np.save(path, (rs.randn(80, frames) * 0.5 - 5).astype(np.float32))
        files.append(str(path))
    filelist = tmp_path / "mels.txt"
    filelist.write_text("\n".join(files) + "\n")

    for bucket, expect in ((0, True), (32, False)):
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            cli.main(str(filelist), str(ckpt),
                     str(tmp_path / f"out_b{bucket}"), 0.8, 0.0,
                     batch_size=4, config_path=str(config_path),
                     mel_bucket=bucket)
        hit = any("--mel_bucket" in str(w.message) for w in rec)
        assert hit == expect, (bucket, [str(w.message) for w in rec])

    # a single-file list can't form a batch whatever the bucketing: no
    # hint (and no nonsense about "1 mels have 1 distinct lengths")
    filelist.write_text(files[0] + "\n")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        cli.main(str(filelist), str(ckpt), str(tmp_path / "out_one"),
                 0.8, 0.0, batch_size=8, config_path=str(config_path))
    assert not any("--mel_bucket" in str(w.message) for w in rec)


@pytest.mark.slow  # one tiny-model compile; the logic itself has
# fast-tier coverage (bucket_mels unit test / the always-fast CLI e2e)
def test_cli_clips_overfull_scale_audio(tmp_path, monkeypatch):
    """A vocoder sample past full scale must SATURATE, not wrap: 1.01 x
    32768 cast straight to int16 would flip to ~-32441 (an audible
    polarity click).  Force the model output past 1.0 and check the wav
    pins at the int16 rails."""
    import jax.numpy as jnp

    import fac_via_ppg_tpu.scripts.waveglow_inference as cli

    cfg = WaveGlowConfig.from_dict(TINY)
    params = init_waveglow(jax.random.PRNGKey(0), cfg)
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), params, {}, 1e-4, 0)
    config_path = tmp_path / "config.json"
    config_path.write_text(json.dumps({"waveglow_config": TINY}))
    np.save(tmp_path / "mel.npy",
            (np.random.RandomState(0).randn(80, 16) * 0.5 - 5)
            .astype(np.float32))
    filelist = tmp_path / "mels.txt"
    filelist.write_text(str(tmp_path / "mel.npy") + "\n")

    real_infer = cli.waveglow_infer

    def spy(*a, **kw):
        return jnp.full_like(real_infer(*a, **kw), 1.01)

    monkeypatch.setattr(cli, "waveglow_infer", spy)
    out = tmp_path / "out"
    cli.main(str(filelist), str(ckpt), str(out), 0.8, 0.0, batch_size=1,
             config_path=str(config_path))
    _, wav = wavfile.read(out / "mel.npy_synthesis.wav")
    assert (wav == 32767).all(), (wav.min(), wav.max())


@pytest.mark.slow  # one tiny-model compile; the logic itself has
# fast-tier coverage (bucket_mels unit test / the always-fast CLI e2e)
def test_cli_loads_reference_pt_mel_filelists(tmp_path):
    """The reference's inference filelist points at torch-saved .pt mel
    tensors (src/waveglow/inference.py:46-48); those files serve here
    unchanged, mixed freely with .npy in one filelist."""
    import torch

    cfg = WaveGlowConfig.from_dict(TINY)
    params = init_waveglow(jax.random.PRNGKey(0), cfg)
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), params, {}, 1e-4, 0)
    config_path = tmp_path / "config.json"
    config_path.write_text(json.dumps({"waveglow_config": TINY}))

    rs = np.random.RandomState(0)
    mel = (rs.randn(80, 24) * 0.5 - 5).astype(np.float32)
    torch.save(torch.from_numpy(mel), tmp_path / "ref_mel.pt")
    np.save(tmp_path / "own_mel.npy", mel)
    filelist = tmp_path / "mels.txt"
    filelist.write_text(f"{tmp_path}/ref_mel.pt\n{tmp_path}/own_mel.npy\n")

    out = tmp_path / "out"
    main(str(filelist), str(ckpt), str(out), 0.8, 0.0, batch_size=2,
         config_path=str(config_path))
    _, wav_pt = wavfile.read(out / "ref_mel.pt_synthesis.wav")
    _, wav_np = wavfile.read(out / "own_mel.npy_synthesis.wav")
    # identical mel -> identical batch row content... but different rows
    # get different z noise; assert both are real full-length audio
    assert len(wav_pt) == len(wav_np) == 24 * cfg.hop_length
    assert np.abs(wav_pt).max() > 0 and np.abs(wav_np).max() > 0
