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
from fac_via_ppg_tpu.frontend.kaldi_io import KaldiIOError
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


# ==========================================================================
# Property-based fuzzing (VERDICT r2 item 8): seeded random
# generate -> write -> read -> compare, plus malformed-input rejection.
# No real Kaldi-produced .mdl/den.fst exists in this environment, so the
# roundtrip fuzz over the full structural space (Triples vs Tuples, empty
# FSTs, deep SE nesting, NULL table slots) is the strongest available
# cross-check of the binary layouts.
# ==========================================================================

from fac_via_ppg_tpu.frontend.kaldi_models import (  # noqa: E402
    ContextDependency,
    TableEventMap,
    read_fst,
    read_transition_model,
    write_context_dependency,
)


def _random_topology(rng):
    n_entries = rng.randint(1, 4)
    entries = []
    for _ in range(n_entries):
        n_states = rng.randint(2, 6)
        states = []
        for s in range(n_states - 1):
            n_trans = rng.randint(0, 4)
            trans = [
                (int(rng.randint(0, n_states)),
                 float(np.round(rng.rand(), 6)))
                for _ in range(n_trans)
            ]
            states.append(
                HmmState(int(rng.randint(0, 40)), int(rng.randint(0, 40)),
                         trans)
            )
        states.append(HmmState(-1, -1, []))  # non-emitting final
        entries.append(states)
    n_phones = rng.randint(1, 8)
    phones = np.sort(rng.choice(np.arange(1, 50), n_phones, replace=False))
    phone2idx = np.full(int(phones.max()) + 1, -1, np.int64)
    for ph in phones:
        phone2idx[ph] = rng.randint(0, n_entries)
    return HmmTopology(phones, phone2idx, entries)


def _random_transition_model(rng):
    topo = _random_topology(rng)
    wide = bool(rng.rand() < 0.5)  # Tuples vs legacy Triples
    tuples = []
    for _ in range(rng.randint(1, 20)):
        fwd = int(rng.randint(0, 100))
        self_loop = int(rng.randint(0, 100)) if wide else fwd
        tuples.append(
            TransitionTuple(
                int(rng.choice(topo.phones)), int(rng.randint(0, 5)),
                fwd, self_loop,
            )
        )
    if wide and all(t.forward_pdf == t.self_loop_pdf for t in tuples):
        tuples[0].self_loop_pdf = tuples[0].forward_pdf + 1
    n_trans = rng.randint(1, 40)
    log_probs = rng.randn(n_trans).astype(np.float32)
    return TransitionModel(topo, tuples, log_probs)


def _topo_equal(a, b):
    np.testing.assert_array_equal(a.phones, b.phones)
    np.testing.assert_array_equal(a.phone2idx, b.phone2idx)
    assert len(a.entries) == len(b.entries)
    for ea, eb in zip(a.entries, b.entries):
        assert len(ea) == len(eb)
        for sa, sb in zip(ea, eb):
            assert sa.forward_pdf_class == sb.forward_pdf_class
            assert sa.self_loop_pdf_class == sb.self_loop_pdf_class
            assert len(sa.transitions) == len(sb.transitions)
            for (da, pa), (db, pb) in zip(sa.transitions, sb.transitions):
                assert da == db
                np.testing.assert_allclose(pa, pb, rtol=1e-6)


def test_fuzz_transition_model_roundtrip(tmp_path):
    for case in range(40):
        rng = np.random.RandomState(1000 + case)
        model = _random_transition_model(rng)
        path = str(tmp_path / f"m{case}.mdl")
        write_transition_model(path, model)
        back = read_transition_model(path)
        _topo_equal(back.topology, model.topology)
        assert [
            (t.phone, t.hmm_state, t.forward_pdf, t.self_loop_pdf)
            for t in back.tuples
        ] == [
            (t.phone, t.hmm_state, t.forward_pdf, t.self_loop_pdf)
            for t in model.tuples
        ]
        np.testing.assert_allclose(back.log_probs, model.log_probs,
                                   rtol=1e-6)
        assert back.num_pdfs == model.num_pdfs


def _random_fst(rng):
    n_states = int(rng.randint(0, 12))
    states = []
    inf = float("inf")
    for _ in range(n_states):
        final = float(np.float32(rng.randn())) if rng.rand() < 0.4 else inf
        arcs = [
            StdArc(int(rng.randint(0, 50)), int(rng.randint(0, 50)),
                   float(np.float32(rng.randn())),
                   int(rng.randint(0, n_states)))
            for _ in range(rng.randint(0, 5))
        ]
        states.append(FstState(final, arcs))
    start = int(rng.randint(0, n_states)) if n_states else -1
    return VectorFst(start, states)


def test_fuzz_fst_roundtrip(tmp_path):
    for case in range(40):
        rng = np.random.RandomState(2000 + case)
        fst = _random_fst(rng)
        path = str(tmp_path / f"f{case}.fst")
        write_fst(path, fst)
        back = read_fst(path)
        assert back.start == fst.start
        assert len(back.states) == len(fst.states)
        for sa, sb in zip(back.states, fst.states):
            assert sa.final == sb.final or (
                np.isinf(sa.final) and np.isinf(sb.final)
            )
            assert sa.arcs == sb.arcs


def _random_event_map(rng, depth):
    kinds = ["CE", "SE", "TE", "NULL"] if depth > 0 else ["CE", "NULL"]
    kind = kinds[rng.randint(0, len(kinds))]
    if kind == "NULL":
        return None
    if kind == "CE":
        return ConstantEventMap(int(rng.randint(0, 6000)))
    if kind == "SE":
        n_yes = rng.randint(1, 8)
        yes_set = np.sort(
            rng.choice(np.arange(0, 400), n_yes, replace=False)
        )
        return SplitEventMap(
            int(rng.randint(-1, 3)), yes_set,
            _random_event_map(rng, depth - 1),
            _random_event_map(rng, depth - 1),
        )
    table = [
        _random_event_map(rng, depth - 1) for _ in range(rng.randint(0, 6))
    ]
    return TableEventMap(int(rng.randint(-1, 3)), table)


def _em_equal(a, b):
    stack = [(a, b)]
    while stack:
        x, y = stack.pop()
        assert type(x) is type(y), (type(x), type(y))
        if x is None:
            continue
        if isinstance(x, ConstantEventMap):
            assert x.answer == y.answer
        elif isinstance(x, SplitEventMap):
            assert x.key == y.key
            np.testing.assert_array_equal(x.yes_set, y.yes_set)
            stack += [(x.yes, y.yes), (x.no, y.no)]
        else:
            assert x.key == y.key and len(x.table) == len(y.table)
            stack += list(zip(x.table, y.table))


def test_fuzz_context_dependency_roundtrip(tmp_path):
    for case in range(40):
        rng = np.random.RandomState(3000 + case)
        tree = ContextDependency(
            int(rng.randint(1, 5)), int(rng.randint(0, 3)),
            _random_event_map(rng, depth=5),
        )
        path = str(tmp_path / f"t{case}.tree")
        write_context_dependency(path, tree)
        back = read_context_dependency(path)
        assert back.context_width == tree.context_width
        assert back.central_position == tree.central_position
        _em_equal(back.to_pdf, tree.to_pdf)
        assert back.num_pdfs == tree.num_pdfs


def test_deep_se_chain_roundtrip(tmp_path):
    """Real trees nest thousands of SE nodes deep; both the reader and the
    writer must be iterative (a recursive one dies at Python's default
    recursion limit well before Kaldi scale)."""
    depth = 4000
    node = ConstantEventMap(7)
    for i in range(depth):
        node = SplitEventMap(1, np.array([i % 300]), node,
                             ConstantEventMap(i % 100))
    tree = ContextDependency(3, 1, node)
    path = str(tmp_path / "deep.tree")
    write_context_dependency(path, tree)
    back = read_context_dependency(path)
    n = 0
    cur = back.to_pdf
    while isinstance(cur, SplitEventMap):
        n += 1
        cur = cur.yes
    assert n == depth and cur.answer == 7
    assert back.num_pdfs == tree.num_pdfs


def test_fuzz_truncation_rejected(tmp_path):
    """Every strict prefix of a valid artifact must raise a clean typed
    error (never hang, never return a silently-wrong object)."""
    import struct as _struct

    rng = np.random.RandomState(42)
    model = _random_transition_model(rng)
    mdl_path = str(tmp_path / "full.mdl")
    write_transition_model(mdl_path, model)
    tree = ContextDependency(3, 1, _random_event_map(rng, depth=4))
    tree_path = str(tmp_path / "full.tree")
    write_context_dependency(tree_path, tree)
    fst = _random_fst(np.random.RandomState(43))
    fst_path = str(tmp_path / "full.fst")
    write_fst(fst_path, fst)

    errors = KaldiIOError  # the guarded readers' declared contract
    for src, reader in (
        (mdl_path, read_transition_model),
        (tree_path, read_context_dependency),
        (fst_path, read_fst),
    ):
        data = open(src, "rb").read()
        cuts = sorted({int(c) for c in
                       np.random.RandomState(7).randint(0, len(data), 12)})
        for cut in cuts:
            p = str(tmp_path / "cut.bin")
            with open(p, "wb") as f:
                f.write(data[:cut])
            with pytest.raises(errors):
                reader(p)


def test_fuzz_token_corruption_rejected(tmp_path):
    """Corrupting a structural token must raise, not mis-parse."""
    rng = np.random.RandomState(4242)
    model = _random_transition_model(rng)
    path = str(tmp_path / "tok.mdl")
    write_transition_model(path, model)
    data = bytearray(open(path, "rb").read())
    # flip one character inside the '<TransitionModel>' token
    idx = bytes(data).index(b"<TransitionModel>") + 3
    data[idx] ^= 0x15
    bad = str(tmp_path / "tok_bad.mdl")
    with open(bad, "wb") as f:
        f.write(bytes(data))
    with pytest.raises(ValueError):
        read_transition_model(bad)


# ==========================================================================
# Golden byte-level vectors, hand-derived from the Kaldi/OpenFst format
# specs (NOT produced by this repo's writers): kaldi/src/base/io-funcs-inl.h
# (WriteToken = ascii + ' '; WriteBasicType<int32/float> = size byte +
# little-endian payload; WriteIntegerVector = size byte + raw int32 count +
# raw data), kaldi/src/hmm/transition-model.cc + hmm-topology.cc,
# openfst/src/include/fst/fst.h (FstHeader) + vector-fst.h, and
# kaldi/src/tree/event-map.cc + context-dep.cc.  These pin the exact wire
# encoding independently of the write->read roundtrip tests above (a
# matched encode/decode bug passes a roundtrip; it cannot pass these),
# and include edge encodings the random generators never emit: the legacy
# <Triples> table, an empty integer vector, a non-final FST state
# (+inf tropical weight), and a negative arc weight.
# ==========================================================================

import struct as _st


def _tok(s):           # WriteToken: ascii chars, one trailing space
    return s.encode("ascii") + b" "


def _i32(v):           # WriteBasicType<int32>: size byte 4 + LE payload
    return b"\x04" + _st.pack("<i", v)


def _f32(v):           # WriteBasicType<float>: size byte 4 + LE payload
    return b"\x04" + _st.pack("<f", v)


def _ivec(vals):       # WriteIntegerVector<int32>: \x04 + raw count + raw
    return b"\x04" + _st.pack("<i", len(vals)) + _st.pack(
        f"<{len(vals)}i", *vals) if vals else b"\x04" + _st.pack("<i", 0)


def _golden_topology_bytes():
    """HmmTopology::Write for two phones: phone 1 = 2-state Bakis entry
    (emitting state 0 with self-loop + forward, final nonemitting state
    with pdf-class -1 = kNoPdf), phone 2 = a forward-pdf != self-loop-pdf
    entry (the chain-model two-pdf topology)."""
    return (
        _tok("<Topology>")
        + _ivec([1, 2])          # phones_ (sorted)
        + _ivec([-1, 0, 1])      # phone2idx_: phone id -> entry index
        + _i32(2)                # entries_.size()
        # entry 0: 2 states
        + _i32(2)
        + _i32(0) + _i32(0)      # state 0: fwd pdf-class 0, self-loop 0
        + _i32(2)                # 2 transitions
        + _i32(0) + _f32(0.5)    # self-loop
        + _i32(1) + _f32(0.5)    # forward
        + _i32(-1) + _i32(-1)    # state 1: nonemitting (kNoPdf)
        + _i32(0)                # no transitions
        # entry 1: 2 states, forward/self-loop pdf classes differ
        + _i32(2)
        + _i32(0) + _i32(1)      # fwd class 0, self-loop class 1
        + _i32(1)
        + _i32(1) + _f32(1.0)
        + _i32(-1) + _i32(-1)
        + _i32(0)
        + _tok("</Topology>")
    )


def test_golden_transition_model_tuples():
    """Hand-built <Tuples>-format .mdl bytes parse to the exact structure
    (transition-model.cc TransitionModel::Write, current format)."""
    from fac_via_ppg_tpu.frontend.kaldi_models import (
        read_transition_model,
    )

    log_probs = [0.0, -0.1, -0.2, -0.3, -0.4]
    data = (
        b"\x00B"
        + _tok("<TransitionModel>")
        + _golden_topology_bytes()
        + _tok("<Tuples>")
        + _i32(3)
        # (phone, hmm_state, forward_pdf, self_loop_pdf)
        + _i32(1) + _i32(0) + _i32(0) + _i32(0)
        + _i32(2) + _i32(0) + _i32(1) + _i32(2)
        + _i32(2) + _i32(0) + _i32(3) + _i32(3)
        + _tok("</Tuples>")
        + _tok("<LogProbs>")
        + _tok("FV") + _i32(5) + _st.pack("<5f", *log_probs)
        + _tok("</LogProbs>")
        + _tok("</TransitionModel>")
    )
    path = os.path.join(os.environ.get("TMPDIR", "/tmp"), "golden_tuples.mdl")
    with open(path, "wb") as f:
        f.write(data)
    m = read_transition_model(path)
    np.testing.assert_array_equal(m.topology.phones, [1, 2])
    np.testing.assert_array_equal(m.topology.phone2idx, [-1, 0, 1])
    assert len(m.topology.entries) == 2
    e0, e1 = m.topology.entries
    assert (e0[0].forward_pdf_class, e0[0].self_loop_pdf_class) == (0, 0)
    assert e0[0].transitions == [(0, 0.5), (1, 0.5)]
    assert (e0[1].forward_pdf_class, e0[1].self_loop_pdf_class) == (-1, -1)
    assert e0[1].transitions == []
    assert (e1[0].forward_pdf_class, e1[0].self_loop_pdf_class) == (0, 1)
    assert [(t.phone, t.hmm_state, t.forward_pdf, t.self_loop_pdf)
            for t in m.tuples] == [(1, 0, 0, 0), (2, 0, 1, 2), (2, 0, 3, 3)]
    np.testing.assert_allclose(m.log_probs, np.float32(log_probs))
    assert m.num_pdfs == 4


def test_golden_transition_model_triples_legacy():
    """The pre-2015 <Triples> table (3 ints per tuple, self_loop_pdf
    implied == forward_pdf) — an encoding this repo's writer only emits
    when ALL tuples are degenerate, so the roundtrip fuzzers barely touch
    it; here the bytes are pinned directly.  Also exercises an EMPTY
    integer vector (phone2idx edge) nothing random generates."""
    from fac_via_ppg_tpu.frontend.kaldi_models import (
        read_transition_model,
    )

    topo = (
        _tok("<Topology>")
        + _ivec([3])
        + _ivec([-1, -1, -1, 0])
        + _i32(1)
        + _i32(2)
        + _i32(0) + _i32(0)
        + _i32(1) + _i32(1) + _f32(1.0)
        + _i32(-1) + _i32(-1) + _i32(0)
        + _tok("</Topology>")
    )
    data = (
        b"\x00B"
        + _tok("<TransitionModel>")
        + topo
        + _tok("<Triples>")
        + _i32(2)
        + _i32(3) + _i32(0) + _i32(0)
        + _i32(3) + _i32(0) + _i32(1)
        + _tok("</Triples>")
        + _tok("<LogProbs>")
        + _tok("FV") + _i32(0)            # empty log-prob vector
        + _tok("</LogProbs>")
        + _tok("</TransitionModel>")
    )
    path = os.path.join(os.environ.get("TMPDIR", "/tmp"), "golden_triples.mdl")
    with open(path, "wb") as f:
        f.write(data)
    m = read_transition_model(path)
    assert [(t.phone, t.forward_pdf, t.self_loop_pdf) for t in m.tuples] \
        == [(3, 0, 0), (3, 1, 1)]
    assert m.log_probs.shape == (0,)
    assert m.num_pdfs == 2


def test_golden_fst_bytes():
    """Hand-built StdVectorFst bytes (FstHeader magic 2125659606,
    length-prefixed type strings, i64 state/arc counts, 16-byte arcs)
    parse exactly — including a NON-final state (+inf tropical weight)
    and a negative arc weight."""
    from fac_via_ppg_tpu.frontend.kaldi_models import read_fst

    inf = float("inf")
    data = (
        _st.pack("<i", 2125659606)                      # FstHeader magic
        + _st.pack("<i", 6) + b"vector"                 # fsttype
        + _st.pack("<i", 8) + b"standard"               # arctype
        + _st.pack("<ii", 2, 0)                         # version, flags
        + _st.pack("<Qqqq", 3, 0, 2, 3)  # props, start, nstates, narcs
        # state 0: non-final (tropical Zero = +inf), 2 arcs
        + _st.pack("<f", inf) + _st.pack("<q", 2)
        + _st.pack("<iifi", 3, 4, 0.5, 1)
        + _st.pack("<iifi", 0, 0, -1.25, 0)
        # state 1: final with weight 2.5, 1 arc
        + _st.pack("<f", 2.5) + _st.pack("<q", 1)
        + _st.pack("<iifi", 7, 8, 0.0, 0)
    )
    path = os.path.join(os.environ.get("TMPDIR", "/tmp"), "golden.fst")
    with open(path, "wb") as f:
        f.write(data)
    fst = read_fst(path)
    assert fst.start == 0 and len(fst.states) == 2
    s0, s1 = fst.states
    assert s0.final == inf and len(s0.arcs) == 2
    assert (s0.arcs[0].ilabel, s0.arcs[0].olabel, s0.arcs[0].weight,
            s0.arcs[0].nextstate) == (3, 4, 0.5, 1)
    assert s0.arcs[1].weight == -1.25
    assert s1.final == 2.5 and s1.arcs[0].ilabel == 7


def test_golden_fst_embedded_symbol_tables_rejected():
    """FstHeader flags bits 0/1 mark serialized SymbolTables between the
    header and the states; parsing must refuse rather than misread the
    state section."""
    from fac_via_ppg_tpu.frontend.kaldi_models import read_fst

    data = (
        _st.pack("<i", 2125659606)
        + _st.pack("<i", 6) + b"vector"
        + _st.pack("<i", 8) + b"standard"
        + _st.pack("<ii", 2, 1)                         # flags bit 0 set
        + _st.pack("<Qqqq", 0, 0, 0, 0)
    )
    path = os.path.join(os.environ.get("TMPDIR", "/tmp"), "golden_sym.fst")
    with open(path, "wb") as f:
        f.write(data)
    with pytest.raises(ValueError):
        read_fst(path)


def test_golden_context_dependency_bytes():
    """Hand-built ContextDependency bytes (context-dep.cc Write:
    'ContextDependency' N P 'ToPdf' EventMap 'EndContextDependency';
    event-map.cc: SE = key + yes-set + '{' yes no '}', TE = key + size +
    '(' children ')', CE = answer, NULL) parse to the exact tree —
    including a NULL table slot, which the answer-set walker must skip."""
    from fac_via_ppg_tpu.frontend.kaldi_models import (
        read_context_dependency,
    )

    data = (
        b"\x00B"
        + _tok("ContextDependency")
        + _i32(3) + _i32(1)                             # N=3, P=1
        + _tok("ToPdf")
        + _tok("SE") + _i32(1) + _ivec([1, 2, 3]) + _tok("{")
        +   _tok("TE") + _i32(0) + _i32(3) + _tok("(")
        +     _tok("NULL")
        +     _tok("CE") + _i32(0)
        +     _tok("CE") + _i32(1)
        +   _tok(")")
        +   _tok("CE") + _i32(2)
        + _tok("}")
        + _tok("EndContextDependency")
    )
    path = os.path.join(os.environ.get("TMPDIR", "/tmp"), "golden.tree")
    with open(path, "wb") as f:
        f.write(data)
    tree = read_context_dependency(path)
    assert (tree.context_width, tree.central_position) == (3, 1)
    root = tree.to_pdf
    assert isinstance(root, SplitEventMap) and root.key == 1
    np.testing.assert_array_equal(root.yes_set, [1, 2, 3])
    te = root.yes
    assert te.key == 0 and len(te.table) == 3
    assert te.table[0] is None
    assert isinstance(te.table[1], ConstantEventMap)
    assert (te.table[1].answer, te.table[2].answer) == (0, 1)
    assert isinstance(root.no, ConstantEventMap) and root.no.answer == 2
    assert tree.num_pdfs == 3


def test_golden_truncations_rejected(tmp_path):
    """Strategic truncations of the GOLDEN byte sequences (mid size-byte,
    mid int-vector payload, mid arc record, mid token) raise clean typed
    errors — fixed offsets, unlike the random-cut fuzzer above."""
    import struct as _struct

    from fac_via_ppg_tpu.frontend.kaldi_models import (
        read_fst, read_transition_model,
    )

    errors = KaldiIOError
    mdl = (
        b"\x00B" + _tok("<TransitionModel>") + _golden_topology_bytes()
        + _tok("<Tuples>") + _i32(1)
        + _i32(1) + _i32(0) + _i32(0) + _i32(0)
        + _tok("</Tuples>") + _tok("<LogProbs>")
        + _tok("FV") + _i32(1) + _st.pack("<f", -0.5)
        + _tok("</LogProbs>") + _tok("</TransitionModel>")
    )
    # inside marker / token / int-vector count / tuple int / FV payload
    for cut in (1, 10, len(_tok("<TransitionModel>")) + 14,
                len(mdl) - 40, len(mdl) - 2):
        p = str(tmp_path / "g.mdl")
        with open(p, "wb") as f:
            f.write(mdl[:cut])
        with pytest.raises(errors):
            read_transition_model(p)

    fst = (
        _st.pack("<i", 2125659606)
        + _st.pack("<i", 6) + b"vector" + _st.pack("<i", 8) + b"standard"
        + _st.pack("<ii", 2, 0) + _st.pack("<Qqqq", 0, 0, 1, 1)
        + _st.pack("<f", 0.0) + _st.pack("<q", 1)
        + _st.pack("<iifi", 1, 1, 0.0, 0)
    )
    for cut in (2, 9, 25, len(fst) - 20, len(fst) - 3):
        p = str(tmp_path / "g.fst")
        with open(p, "wb") as f:
            f.write(fst[:cut])
        with pytest.raises(errors):
            read_fst(p)
