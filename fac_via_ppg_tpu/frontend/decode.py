"""Kaldi model readers (reference src/common/decode.py:23-66).

The reference exposes three readers through pykaldi; their status here:

  * read_nnet3_model  — fully supported (text-format nnet3 import, see
    frontend/nnet3.py; convert binary models with
    `nnet3-copy --binary=false`).
  * read_trans_model / read_den_fst — the reference itself never uses these
    on its main path (SURVEY.md section 2 component #3: "last two unused by
    main path"); they exist for Kaldi decoding experiments.  Loading a
    TransitionModel / denominator FST requires a Kaldi FST runtime that has
    no TPU-side consumer in this pipeline, so these raise with guidance
    instead of silently returning wrong objects.
"""

from __future__ import annotations

from fac_via_ppg_tpu.frontend.nnet3 import Nnet3, load_nnet3


def read_nnet3_model(nnet_path: str) -> Nnet3:
    """Read an nnet3 acoustic model (reference decode.py:23-38)."""
    return load_nnet3(nnet_path)


def read_trans_model(trans_model_path: str):
    """Unsupported: unused by the accent-conversion path (decode.py:41-53).

    The PPG pipeline consumes the raw nnet3 AM only; transition models are
    a Kaldi-decoder concern with no consumer here."""
    raise NotImplementedError(
        "TransitionModel reading is not supported: the accent-conversion "
        "pipeline never consumes it (see module docstring). Use Kaldi "
        "tooling for decoding experiments."
    )


def read_den_fst(den_fst_path: str):
    """Unsupported: unused by the accent-conversion path (decode.py:56-66)."""
    raise NotImplementedError(
        "Denominator-FST reading is not supported: the accent-conversion "
        "pipeline never consumes it (see module docstring)."
    )
