"""Load the reference implementation from /root/reference as a CPU oracle.

Nothing is copied: the reference modules are imported read-only from the
mount purely to generate golden outputs for parity tests.  Two obstacles
are patched around:

  * `common.layers`/`common.stft` import librosa (absent) — stub modules
    backed by this framework's own (independently tested) DSP functions.
  * the reference's mask helpers allocate CUDA tensors (utils.py:41,61) —
    CPU equivalents are injected into the loaded model module.

If the reference mount is unavailable, dependent tests skip.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REFERENCE_SRC = "/root/reference/src"

_loaded = {}


def _stub_librosa():
    if "librosa" in sys.modules and not hasattr(
        sys.modules["librosa"], "__fac_stub__"
    ):
        return
    from fac_via_ppg_tpu.dsp.mel import mel_filterbank
    from fac_via_ppg_tpu.dsp.stft import pad_center as _pad_center

    librosa = types.ModuleType("librosa")
    librosa.__fac_stub__ = True
    util = types.ModuleType("librosa.util")
    filters = types.ModuleType("librosa.filters")

    def pad_center(data, size, **kwargs):
        return _pad_center(np.asarray(data), size)

    def tiny(x):
        return np.finfo(np.asarray(x).dtype).tiny

    def normalize(S, norm=None, **kwargs):
        if norm is None:
            return S
        raise NotImplementedError

    def mel(sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **kwargs):
        return mel_filterbank(sr, n_fft, n_mels, fmin, fmax)

    util.pad_center = pad_center
    util.tiny = tiny
    util.normalize = normalize
    filters.mel = mel
    librosa.util = util
    librosa.filters = filters
    sys.modules["librosa"] = librosa
    sys.modules["librosa.util"] = util
    sys.modules["librosa.filters"] = filters


def _auto_module(name: str):
    """A module whose every attribute resolves to a MagicMock (for pykaldi
    and other absent C++-binding packages pulled in by `common/__init__`)."""
    from unittest.mock import MagicMock

    mod = types.ModuleType(name)
    mod.__fac_stub__ = True
    mod.__getattr__ = lambda attr: MagicMock(name=f"{name}.{attr}")
    return mod


def _stub_absent_packages():
    for name in (
        "kaldi", "kaldi.feat", "kaldi.feat.mfcc", "kaldi.feat.wave",
        "kaldi.feat.functions", "kaldi.matrix", "kaldi.matrix.common",
        "kaldi.matrix.sparse", "kaldi.util", "kaldi.util.io", "kaldi.nnet3",
        "textgrid", "tensorboardX",
    ):
        if name not in sys.modules:
            sys.modules[name] = _auto_module(name)
    # The reference generates common/data_utterance_pb2.py with protoc at
    # install time; our schema is wire-compatible, so our codegen serves.
    if "common.data_utterance_pb2" not in sys.modules:
        from fac_via_ppg_tpu.io.proto import data_utterance_pb2

        sys.modules["common.data_utterance_pb2"] = data_utterance_pb2


def load_reference_module(name: str):
    """Import e.g. 'common.model' or 'waveglow.glow' from the mount."""
    if name in _loaded:
        return _loaded[name]
    if not os.path.isdir(REFERENCE_SRC):
        pytest.skip("reference mount not available")
    _stub_librosa()
    _stub_absent_packages()
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import importlib

    module = importlib.import_module(name)
    _loaded[name] = module
    return module


def patch_model_module_for_cpu(model_module):
    """Replace the CUDA-only mask helpers with CPU equivalents."""
    import torch

    def get_mask_from_lengths(lengths):
        max_len = int(torch.max(lengths).item())
        ids = torch.arange(0, max_len, dtype=torch.long)
        return (ids < lengths.unsqueeze(1)).to(torch.bool)

    def get_mask_window(lengths, attention_window_size, time_step):
        max_len = int(torch.max(lengths).item())
        B = len(lengths)
        mask = torch.ones(B, max_len, dtype=torch.bool)
        for ii in range(B):
            max_idx = int(lengths[ii]) - 1
            start_idx = min(max(0, time_step - attention_window_size), max_idx)
            end_idx = min(time_step + attention_window_size, max_idx)
            if start_idx > end_idx:
                continue
            mask[ii, start_idx : end_idx + 1] = 0
        return mask

    model_module.get_mask_from_lengths = get_mask_from_lengths
    model_module.get_mask_from_lengths_window_and_time_step = get_mask_window
    return model_module


def patch_cuda_to_cpu():
    """Point the legacy `torch.cuda.*Tensor` constructors the reference
    inference paths allocate on (glow.py:261-268/284-289, model.py:598) at
    their CPU twins, and make `.cuda()` a no-op (denoiser.py:42-64).

    Idempotent; patches stay for the process (tests only)."""
    import torch

    torch.cuda.FloatTensor = torch.FloatTensor
    torch.cuda.HalfTensor = torch.HalfTensor
    torch.cuda.LongTensor = torch.LongTensor
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    return torch


class no_dropout:
    """Context manager disabling torch.nn.functional.dropout (the reference
    Prenet hardcodes training=True, model.py:134)."""

    def __enter__(self):
        import torch.nn.functional as F

        self._orig = F.dropout
        F.dropout = lambda x, p=0.5, training=False, inplace=False: x
        return self

    def __exit__(self, *exc):
        import torch.nn.functional as F

        F.dropout = self._orig
        return False
