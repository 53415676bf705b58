"""TransitionModel / OpenFst / decision-tree parser tests.

Covers the reference's pykaldi reader surface (src/common/decode.py:41-66)
with synthetic-artifact roundtrips, plus validation of the binary
primitives against the REAL Kaldi tree artifact shipped with the
reference (/root/reference/data/am/tree).
"""

import os

import numpy as np
import pytest

from fac_via_ppg_tpu.frontend.decode import (
    read_den_fst,
    read_trans_model,
)
from fac_via_ppg_tpu.frontend.kaldi_models import (
    ConstantEventMap,
    FstState,
    HmmState,
    HmmTopology,
    SplitEventMap,
    StdArc,
    TransitionModel,
    TransitionTuple,
    VectorFst,
    read_context_dependency,
    write_fst,
    write_transition_model,
)

REFERENCE_TREE = "/root/reference/data/am/tree"


def _toy_topology():
    # Two phones sharing a 3-state left-to-right entry (Kaldi topo style).
    states = [
        HmmState(0, 0, [(0, 0.5), (1, 0.5)]),
        HmmState(1, 1, [(1, 0.5), (2, 0.5)]),
        HmmState(-1, -1, []),  # non-emitting final state
    ]
    return HmmTopology(
        phones=np.array([1, 2]),
        phone2idx=np.array([-1, 0, 0]),
        entries=[states],
    )


def test_transition_model_roundtrip_triples(tmp_path):
    model = TransitionModel(
        topology=_toy_topology(),
        tuples=[
            TransitionTuple(1, 0, 0, 0), TransitionTuple(1, 1, 1, 1),
            TransitionTuple(2, 0, 2, 2), TransitionTuple(2, 1, 3, 3),
        ],
        log_probs=np.log(np.linspace(0.1, 1.0, 9)).astype(np.float32),
    )
    path = str(tmp_path / "final.mdl")
    write_transition_model(path, model)
    back = read_trans_model(path)

    assert back.num_pdfs == model.num_pdfs == 4
    np.testing.assert_array_equal(back.topology.phones, [1, 2])
    np.testing.assert_array_equal(back.topology.phone2idx, [-1, 0, 0])
    assert len(back.topology.entries) == 1
    entry = back.topology.entries[0]
    assert [s.forward_pdf_class for s in entry] == [0, 1, -1]
    assert entry[0].transitions == [(0, 0.5), (1, 0.5)]
    assert [
        (t.phone, t.hmm_state, t.forward_pdf, t.self_loop_pdf)
        for t in back.tuples
    ] == [(1, 0, 0, 0), (1, 1, 1, 1), (2, 0, 2, 2), (2, 1, 3, 3)]
    np.testing.assert_allclose(back.log_probs, model.log_probs, rtol=1e-6)
    # all pdfs identical forward/self-loop -> compact Triples table on disk
    with open(path, "rb") as f:
        data = f.read()
    assert b"<Triples>" in data and b"<Tuples>" not in data


def test_transition_model_roundtrip_tuples(tmp_path):
    """Chain-style models (forward_pdf != self_loop_pdf) use <Tuples>."""
    model = TransitionModel(
        topology=_toy_topology(),
        tuples=[TransitionTuple(1, 0, 0, 1), TransitionTuple(2, 0, 2, 3)],
        log_probs=np.zeros(5, np.float32),
    )
    path = str(tmp_path / "chain.mdl")
    write_transition_model(path, model)
    back = read_trans_model(path)
    assert back.num_pdfs == 4
    assert (back.tuples[0].forward_pdf, back.tuples[0].self_loop_pdf) == (0, 1)
    with open(path, "rb") as f:
        assert b"<Tuples>" in f.read()


def test_transition_model_rejects_text(tmp_path):
    p = tmp_path / "text.mdl"
    p.write_text("<TransitionModel> ...")
    with pytest.raises(ValueError, match="binary"):
        read_trans_model(str(p))


def test_den_fst_roundtrip(tmp_path):
    inf = float("inf")
    fst = VectorFst(
        start=0,
        states=[
            FstState(inf, [StdArc(1, 1, 0.5, 1), StdArc(2, 2, 1.25, 2)]),
            FstState(inf, [StdArc(3, 3, 0.0, 2)]),
            FstState(0.75, []),
        ],
    )
    path = str(tmp_path / "den.fst")
    write_fst(path, fst)
    back = read_den_fst(path)

    assert back.start == 0
    assert back.num_arcs == 3
    assert len(back.states) == 3
    assert back.states[0].arcs[1] == StdArc(2, 2, 1.25, 2)
    assert back.states[1].arcs == [StdArc(3, 3, 0.0, 2)]
    assert back.states[2].final == 0.75 and back.states[2].arcs == []
    assert back.states[0].final == inf  # non-final in tropical semiring


def test_den_fst_rejects_bad_magic(tmp_path):
    p = tmp_path / "bad.fst"
    p.write_bytes(b"\x01\x02\x03\x04 garbage")
    with pytest.raises(ValueError, match="magic"):
        read_den_fst(str(p))


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_TREE), reason="reference mount unavailable"
)
def test_real_kaldi_tree_parses():
    """The REAL Kaldi artifact: a 1.4 MB triphone decision tree.  Its pdf
    count must equal the 5816-senone PPG dimension the whole pipeline is
    built around — cross-validating the binary token/int-vector readers
    against production Kaldi output."""
    cd = read_context_dependency(REFERENCE_TREE)
    assert cd.context_width == 3       # triphone
    assert cd.central_position == 1
    assert cd.num_pdfs == 5816
    # root splits on the central phone with a sorted yes-set
    assert isinstance(cd.to_pdf, SplitEventMap)
    ys = np.asarray(cd.to_pdf.yes_set)
    assert (np.diff(ys) > 0).all()
    # and every leaf is a constant pdf-id in range
    stack, leaves = [cd.to_pdf], 0
    while stack:
        node = stack.pop()
        if isinstance(node, ConstantEventMap):
            leaves += 1
            assert 0 <= node.answer < 5816
        elif isinstance(node, SplitEventMap):
            stack += [node.yes, node.no]
        elif node is not None:
            stack += [c for c in node.table if c is not None]
    assert leaves >= 5816
