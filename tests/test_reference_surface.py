"""Public-surface parity vs the reference, checked mechanically.

1. hparams: every reference key exists here with an identical default, for
   both create_hparams and the frozen stage variant (extensions are
   additive only).
2. proto: the reference's data_utterance.proto is compiled with protoc at
   test time and messages serialized by THIS implementation are parsed by
   the reference schema (and vice versa) — wire compatibility, not just
   schema similarity.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from fac_via_ppg_tpu.configs.hparams import create_hparams, create_hparams_stage

from tests.torch_oracle import load_reference_module

REFERENCE_PROTO = "/root/reference/src/common/data_utterance.proto"


def _diff_hparams(ref: dict, mine: dict):
    missing = sorted(set(ref) - set(mine))
    assert not missing, f"reference hparams missing here: {missing}"
    wrong = {
        k: (ref[k], mine[k]) for k in ref
        if mine[k] != ref[k]
    }
    assert not wrong, f"default mismatches (ref, mine): {wrong}"


def test_create_hparams_surface_matches_reference():
    ref_mod = load_reference_module("common.hparams")
    _diff_hparams(ref_mod.create_hparams().__dict__,
                  create_hparams().__dict__)
    # unknown keys rejected the same way
    with pytest.raises(ValueError):
        create_hparams(not_a_key=1)


def test_create_hparams_stage_surface_matches_reference():
    ref_mod = load_reference_module("common.hparams")
    _diff_hparams(ref_mod.create_hparams_stage().__dict__,
                  create_hparams_stage().__dict__)


@pytest.fixture(scope="module")
def reference_pb2(tmp_path_factory):
    if not os.path.isfile(REFERENCE_PROTO):
        pytest.skip("reference proto not available")
    out = tmp_path_factory.mktemp("refproto")
    subprocess.run(
        ["protoc", f"--proto_path={os.path.dirname(REFERENCE_PROTO)}",
         f"--python_out={out}", os.path.basename(REFERENCE_PROTO)],
        check=True,
    )
    sys.path.insert(0, str(out))
    import importlib

    # force a fresh import distinct from our own codegen
    if "data_utterance_pb2" in sys.modules:
        del sys.modules["data_utterance_pb2"]
    mod = importlib.import_module("data_utterance_pb2")
    sys.path.pop(0)
    return mod


def test_proto_wire_compat_with_reference(reference_pb2, rng):
    from fac_via_ppg_tpu.io import Utterance

    utt = Utterance(wav=rng.randn(100) * 100, fs=16000, text="hello")
    utt.ppg = rng.rand(7, 5).astype(np.float32)
    utt.utterance_id = "u1"
    utt.dialect = "EN_CN"
    utt.kaldi_shift = 10.0
    payload = utt.write_internal()

    # parse with the REFERENCE schema
    ref_msg = reference_pb2.DataUtterance()
    ref_msg.ParseFromString(payload)
    assert ref_msg.fs == 16000
    assert ref_msg.text == "hello"
    assert ref_msg.utterance_id == "u1"
    assert ref_msg.ppg.num_row == 7 and ref_msg.ppg.num_col == 5
    assert ref_msg.meta_data.dialect == reference_pb2.MetaData.EN_CN
    np.testing.assert_allclose(ref_msg.kaldi_param.shift, 10.0)

    # and the reverse: reference-serialized bytes parse here
    ref_msg.text = "roundtrip"
    back = Utterance()
    back.read_internal(ref_msg.SerializeToString())
    assert back.text == "roundtrip"
    assert back.ppg.shape == (7, 5)
    np.testing.assert_allclose(back.ppg, np.asarray(utt.ppg), rtol=1e-6)
