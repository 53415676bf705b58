"""ctypes bindings for the native host-side library.

The reference's host hot loops run in Kaldi C++; this package is the
framework's own native muscle (native/src/frontend.cc): Kaldi-convention
MFCC, CMN, splicing, and affine transforms with a C ABI.  The library is
built on demand with `make` (g++, no external deps) and every entry point
has a numpy fallback, so the framework works even without a toolchain.

Usage:
    from fac_via_ppg_tpu import native
    if native.available():
        feats = native.mfcc_compute(wav, fs, opts)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")
)
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libfacppg_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_WINDOW_TYPES = {"povey": 0, "hanning": 1, "hamming": 2, "rectangular": 3}


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        src_path = os.path.join(_NATIVE_DIR, "src", "frontend.cc")
        stale = (
            not os.path.exists(_LIB_PATH)
            or (os.path.exists(src_path)
                and os.path.getmtime(src_path) > os.path.getmtime(_LIB_PATH))
        )
        if stale:
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=300,
                )
            except (subprocess.SubprocessError, OSError):
                if not os.path.exists(_LIB_PATH):
                    _build_failed = True
                    return None  # no toolchain and no binary
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None

        lib.fac_num_frames.restype = ctypes.c_int
        lib.fac_num_frames.argtypes = [
            ctypes.c_longlong, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_int,
        ]
        lib.fac_mfcc_compute.restype = ctypes.c_int
        lib.fac_mfcc_compute.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.fac_cmn.restype = None
        lib.fac_cmn.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int
        ]
        lib.fac_splice.restype = None
        lib.fac_splice.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.fac_apply_transform.restype = ctypes.c_int
        lib.fac_apply_transform.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def supports(opts) -> bool:
    """Whether the native path implements this exact option combination.

    The C++ library covers the production envelope; exotic options fall
    back to numpy rather than silently computing something different.
    """
    fo = opts.frame_opts
    return (
        fo.window_type in _WINDOW_TYPES
        and fo.round_to_power_of_two
        and (not opts.use_energy or (opts.raw_energy
                                     and opts.energy_floor == 0.0))
    )


def mfcc_compute(wav: np.ndarray, fs: float, opts, seed: int = 0
                 ) -> Optional[np.ndarray]:
    """Native MFCC matching frontend.mfcc.compute_mfcc; None if unavailable
    or the options fall outside the supported envelope (see `supports`).

    `opts` is a frontend.mfcc.MfccOptions; resampling (allow_downsample) is
    handled by the caller.
    """
    if not supports(opts):
        return None
    lib = _load()
    if lib is None:
        return None
    fo = opts.frame_opts
    wav = np.ascontiguousarray(wav, dtype=np.float64)
    n_frames = lib.fac_num_frames(
        len(wav), fo.samp_freq, fo.frame_shift_ms, fo.frame_length_ms,
        int(fo.snip_edges),
    )
    if n_frames <= 0:
        return np.zeros((0, opts.num_ceps), np.float32)
    out = np.empty((n_frames, opts.num_ceps), np.float32)
    written = lib.fac_mfcc_compute(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(wav),
        fo.samp_freq, fo.frame_shift_ms, fo.frame_length_ms, fo.dither,
        fo.preemph_coeff, int(fo.remove_dc_offset),
        _WINDOW_TYPES[fo.window_type], int(fo.snip_edges),
        opts.mel_opts.num_bins, opts.mel_opts.low_freq,
        opts.mel_opts.high_freq, opts.num_ceps, int(opts.use_energy),
        opts.cepstral_lifter, seed, _fptr(out),
    )
    if written != n_frames:
        return None
    return out


def cmn(feats: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    feats = np.ascontiguousarray(feats, dtype=np.float32).copy()
    lib.fac_cmn(_fptr(feats), feats.shape[0], feats.shape[1])
    return feats


def splice(feats: np.ndarray, left: int, right: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    feats = np.ascontiguousarray(feats, dtype=np.float32)
    t, d = feats.shape
    out = np.empty((t, (left + 1 + right) * d), np.float32)
    lib.fac_splice(_fptr(feats), t, d, left, right, _fptr(out))
    return out


def apply_transform(feats: np.ndarray,
                    transform: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    feats = np.ascontiguousarray(feats, dtype=np.float32)
    transform = np.ascontiguousarray(transform, dtype=np.float32)
    t, d = feats.shape
    rows, cols = transform.shape
    out = np.empty((t, rows), np.float32)
    rc = lib.fac_apply_transform(
        _fptr(feats), t, d, _fptr(transform), rows, cols, _fptr(out)
    )
    if rc != 0:
        raise ValueError(
            "Transform matrix has bad dimension %dx%d versus feat dim %d"
            % (rows, cols, d)
        )
    return out
