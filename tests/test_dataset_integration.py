"""PPGMelDataset integration: full/monophone PPG, F0 append, cache
protocol (is_cache_feats / load_feats_from_disk semantics)."""

import os

import numpy as np
import pytest
from scipy.io import wavfile

from fac_via_ppg_tpu.configs.hparams import create_hparams
from fac_via_ppg_tpu.data.ppg_mel_dataset import PPGMelDataset
from fac_via_ppg_tpu.frontend.ppg import DependenciesPPG
from fac_via_ppg_tpu.scripts.make_substitute_am import make_bundle


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(3):
        t = np.arange(int(16000 * (0.3 + 0.05 * i))) / 16000.0
        sig = np.sin(2 * np.pi * (150 + 30 * i) * t) * 0.5
        wav = (sig * 12000 + 200 * rng.randn(len(t))).astype(np.int16)
        p = str(root / f"utt{i}.wav")
        wavfile.write(p, 16000, wav)
        paths.append(p)
    filelist = str(root / "files.txt")
    with open(filelist, "w") as f:
        f.write("\n".join(paths) + "\n")

    bundle = root / "bundle"
    make_bundle(str(bundle), n_senones=24, n_phones=6, hidden_dim=8,
                num_layers=1)
    deps = DependenciesPPG(
        nnet_path=str(bundle / "am" / "final.raw.txt"),
        lda_path=str(bundle / "feats" / "final.mat"),
        reduce_dim_path=str(bundle / "feats" / "reduce_dim.mat"),
        splice_opts_path=str(bundle / "feats" / "splice_opts"),
    )
    return filelist, deps, root


def test_full_ppg_dataset(corpus):
    filelist, deps, _ = corpus
    hp = create_hparams(training_files=filelist)
    ds = PPGMelDataset(filelist, hp, deps=deps)
    assert len(ds) == 3
    ppg, mel = ds[0]
    assert ppg.shape[1] == 24  # substitute senone count
    assert mel.shape[1] == 80
    # PPG frames (10 ms) ~ mel frames (hop 160 @ 16 kHz)
    assert abs(ppg.shape[0] - mel.shape[0]) <= 2


def test_monophone_ppg_dataset(corpus):
    filelist, deps, _ = corpus
    hp = create_hparams(training_files=filelist, is_full_ppg=False)
    ds = PPGMelDataset(filelist, hp, deps=deps)
    ppg, _ = ds[0]
    assert ppg.shape[1] == 6  # phone count
    np.testing.assert_allclose(ppg.sum(axis=1), 1.0, atol=1e-3)


def test_append_f0_dataset(corpus):
    filelist, deps, _ = corpus
    hp = create_hparams(training_files=filelist, is_append_f0=True)
    ds = PPGMelDataset(filelist, hp, deps=deps)
    ppg, _ = ds[0]
    assert ppg.shape[1] == 24 + 3  # + logF0, delta, acc


def test_subsampling(corpus):
    filelist, deps, _ = corpus
    hp = create_hparams(training_files=filelist, ppg_subsampling_factor=2)
    ds = PPGMelDataset(filelist, hp, deps=deps)
    full = ds.ppg_sequences[0]
    ppg, _ = ds[0]
    assert ppg.shape[0] == (full.shape[0] + 1) // 2


def test_cache_roundtrip(corpus):
    filelist, deps, root = corpus
    cache = str(root / "feats.pkl")
    hp = create_hparams(
        training_files=filelist, is_cache_feats=True, feats_cache_path=cache
    )
    ds1 = PPGMelDataset(filelist, hp, deps=deps)
    assert os.path.exists(cache)

    hp2 = create_hparams(
        training_files=filelist, load_feats_from_disk=True,
        feats_cache_path=cache,
    )
    ds2 = PPGMelDataset(filelist, hp2)  # no deps needed: loads from cache
    assert len(ds2) == len(ds1)
    np.testing.assert_array_equal(ds2.ppg_sequences[0], ds1.ppg_sequences[0])

    with pytest.raises(ValueError):
        create_and_fail = create_hparams(
            training_files=filelist, is_cache_feats=True,
            load_feats_from_disk=True, feats_cache_path=cache,
        )
        PPGMelDataset(filelist, create_and_fail)


def test_featurize_device_flag(corpus):
    """hparams.featurize_device preloads PPGs through the batched device
    featurizer; shapes and the monophone/F0 plumbing must match the host
    path (values differ only in dither noise, same spec)."""
    filelist, deps, _ = corpus
    hp_host = create_hparams(training_files=filelist)
    hp_dev = create_hparams(training_files=filelist, featurize_device=True)
    ds_host = PPGMelDataset(filelist, hp_host, deps=deps)
    ds_dev = PPGMelDataset(filelist, hp_dev, deps=deps)
    assert len(ds_dev) == len(ds_host)
    for i in range(len(ds_dev)):
        ppg_h, mel_h = ds_host[i]
        ppg_d, mel_d = ds_dev[i]
        assert ppg_d.shape == ppg_h.shape
        np.testing.assert_array_equal(mel_d, mel_h)
        # posteriors on the same utterance: dither-level agreement
        assert np.abs(ppg_d - ppg_h).max() < 0.2
        np.testing.assert_allclose(ppg_d.sum(axis=1), 1.0, atol=1e-3)
