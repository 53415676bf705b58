"""Seeded corruption + roundtrip fuzz of the hand-written file parsers.

The reference trusts external libraries to reject malformed files (pykaldi
for models, the `textgrid` package for Praat documents — reference
src/common/decode.py:41-66, align.py:18); here the parsers are our own, so
the robustness contract is pinned by fuzz:

  * every reader either parses or raises its DECLARED error type
    (KaldiIOError for the kaldi binary readers, ValueError for
    TextGrid/nnet3) — never a bare struct.error / IndexError / reshape
    ValueError from numpy internals,
  * no hang: corrupt count fields must not become unbounded loops or
    multi-GB allocations,
  * roundtrips preserve content exactly, including adversarial marks
    (embedded quotes, newlines, text that looks like Praat decoration).

Complements the truncation fuzzers in test_kaldi_models.py /
test_nnet3_binary.py (strict prefixes) with byte-level flips, inserts,
deletes, and overwrites anywhere in the stream.
"""

import numpy as np
import pytest

from fac_via_ppg_tpu.frontend import kaldi_io, nnet3
from fac_via_ppg_tpu.frontend.kaldi_io import KaldiIOError
from fac_via_ppg_tpu.frontend.kaldi_models import (
    read_context_dependency,
    read_fst,
    read_transition_model,
)
from fac_via_ppg_tpu.frontend.nnet3_binary import write_nnet3_binary
from fac_via_ppg_tpu.io.textgrid import (
    Interval,
    IntervalTier,
    PointTier,
    TextGrid,
    _num,
    _quoted,
)


# ==========================================================================
# byte-level mutation helper
# ==========================================================================

def _mutate(data: bytes, rng: np.random.RandomState) -> bytes:
    buf = bytearray(data)
    op = rng.randint(5)
    if op == 0 or not buf:  # truncate
        return bytes(buf[: rng.randint(max(len(buf), 1))])
    if op == 1:  # bit-flip
        i = rng.randint(len(buf))
        buf[i] ^= 1 << rng.randint(8)
    elif op == 2:  # zero a byte
        buf[rng.randint(len(buf))] = 0
    elif op == 3:  # insert a random byte
        buf.insert(rng.randint(len(buf) + 1), rng.randint(256))
    else:  # delete a byte
        del buf[rng.randint(len(buf))]
    return bytes(buf)


# ==========================================================================
# TextGrid: adversarial-mark roundtrip
# ==========================================================================

# marks that collide with every piece of Praat syntax the parser keys on
_MARK_TOKENS = [
    "a", "word", '"', '""', 'say "hi"', "item [1]:", "x = 1",
    "tiers? <exists>", "3.14", "-7", "é漢", "[", "]", "(x)",
    "two\nlines", "ends with space ", " leading", 'a\n"b',
    'IntervalTier', '"TextTier"', "intervals: size = 4",
]


def _random_mark(rng, allow_empty=False) -> str:
    if allow_empty and rng.rand() < 0.1:
        return ""
    n = rng.randint(1, 4)
    return "".join(
        _MARK_TOKENS[rng.randint(len(_MARK_TOKENS))] for _ in range(n)
    )


def _random_grid(rng) -> TextGrid:
    tg = TextGrid(maxTime=10.0)
    for t in range(rng.randint(1, 4)):
        if rng.rand() < 0.7:
            tier = IntervalTier(f"tier{t}_{_random_mark(rng)}", 0.0, 10.0)
            cuts = np.unique(rng.randint(0, 10000, rng.randint(2, 8)))
            cuts = [float(c) / 1000.0 for c in cuts]
            for lo, hi in zip(cuts[:-1], cuts[1:]):
                if rng.rand() < 0.8:
                    # non-empty marks only: the Praat writer densifies
                    # gaps with ""-marked intervals, so "" is reserved
                    tier.add(lo, hi, _random_mark(rng))
        else:
            tier = PointTier(f"pts{t}", 0.0, 10.0)
            for when in np.unique(rng.randint(0, 10000, rng.randint(1, 6))):
                tier.add(float(when) / 1000.0, _random_mark(
                    rng, allow_empty=True))
        tg.append(tier)
    return tg


def _marked_intervals(tier):
    return [(iv.minTime, iv.maxTime, iv.mark)
            for iv in tier if iv.mark != ""]


def test_textgrid_roundtrip_fuzz():
    rng = np.random.RandomState(0xF00D)
    for _ in range(120):
        tg = _random_grid(rng)
        parsed = TextGrid.from_praat(tg.to_praat())
        assert len(parsed) == len(tg)
        for orig, back in zip(tg, parsed):
            assert back.name == orig.name
            if isinstance(orig, IntervalTier):
                assert _marked_intervals(back) == _marked_intervals(orig)
            else:
                assert [(p.time, p.mark) for p in back] == [
                    (p.time, p.mark) for p in orig
                ]


def _short_format(tg: TextGrid) -> str:
    """The same value stream as to_praat, without the long-format
    decoration — Praat's 'short text file' flavor."""
    end = tg._end_time()
    rows = ['"ooTextFile"', '"TextGrid"', _num(tg.minTime), _num(end),
            "<exists>", str(len(tg.tiers))]
    for tier in tg:
        if isinstance(tier, IntervalTier):
            dense = tier._fillInTheGaps("")
            rows += ['"IntervalTier"', _quoted(tier.name),
                     _num(tier.minTime), _num(end), str(len(dense))]
            for iv in dense:
                rows += [_num(iv.minTime), _num(iv.maxTime),
                         _quoted(iv.mark)]
        else:
            rows += ['"TextTier"', _quoted(tier.name),
                     _num(tier.minTime), _num(end), str(len(tier))]
            for pt in tier:
                rows += [_num(pt.time), _quoted(pt.mark)]
    return "\n".join(rows) + "\n"


def test_textgrid_long_short_equivalence_fuzz():
    """Long and short formats carry the identical value stream; the
    format-agnostic scanner must parse both to the same grid."""
    rng = np.random.RandomState(0xBEEF)
    for _ in range(60):
        tg = _random_grid(rng)
        a = TextGrid.from_praat(tg.to_praat())
        b = TextGrid.from_praat(_short_format(tg))
        assert len(a) == len(b)
        for ta, tb in zip(a, b):
            assert ta.name == tb.name
            assert type(ta) is type(tb)
            if isinstance(ta, IntervalTier):
                assert [(i.minTime, i.maxTime, i.mark) for i in ta] == [
                    (i.minTime, i.maxTime, i.mark) for i in tb
                ]
            else:
                assert [(p.time, p.mark) for p in ta] == [
                    (p.time, p.mark) for p in tb
                ]


def test_textgrid_corruption_fuzz():
    """Random character-level corruption: parse must return a TextGrid or
    raise ValueError — no other exception type, no hang."""
    rng = np.random.RandomState(0xC0FFEE)
    docs = [_random_grid(rng).to_praat() for _ in range(4)]
    alphabet = '"=[]:()<>? \n0123456789e.-xyzitemsize'
    for _ in range(400):
        doc = docs[rng.randint(len(docs))]
        mode = rng.randint(4)
        if mode == 0:  # truncate
            doc = doc[: rng.randint(len(doc))]
        elif mode == 1:  # replace a char
            i = rng.randint(len(doc))
            doc = doc[:i] + alphabet[rng.randint(len(alphabet))] \
                + doc[i + 1:]
        elif mode == 2:  # delete a line
            lines = doc.splitlines()
            del lines[rng.randint(len(lines))]
            doc = "\n".join(lines)
        else:  # duplicate a line
            lines = doc.splitlines()
            i = rng.randint(len(lines))
            doc = "\n".join(lines[: i + 1] + [lines[i]] + lines[i + 1:])
        try:
            out = TextGrid.from_praat(doc)
        except ValueError:
            continue
        assert isinstance(out, TextGrid)


def test_textgrid_count_fields_validated():
    base = _random_grid(np.random.RandomState(3)).to_praat()
    # negative tier count must raise, not silently parse zero tiers
    neg = base.replace("size = ", "size = -", 1)
    with pytest.raises(ValueError, match="implausible"):
        TextGrid.from_praat(neg)
    # inf count must raise ValueError, not OverflowError at int()
    inf = base.replace("size = ", "size = 1e999", 1).replace("1e9991", "1",
                                                             1)
    with pytest.raises(ValueError):
        TextGrid.from_praat(inf)


# ==========================================================================
# Kaldi binary models: byte-corruption fuzz (guarded public readers)
# ==========================================================================

def _kaldi_artifacts(tmp_path):
    """Small valid artifacts via the roundtrip-twin writers, reusing the
    random generators from test_kaldi_models."""
    from tests.test_kaldi_models import (
        _random_event_map,
        _random_fst,
        _random_transition_model,
    )
    from fac_via_ppg_tpu.frontend.kaldi_models import (
        ContextDependency,
        write_context_dependency,
        write_fst,
        write_transition_model,
    )

    rng = np.random.RandomState(1234)
    mdl = str(tmp_path / "m.mdl")
    write_transition_model(mdl, _random_transition_model(rng))
    fst = str(tmp_path / "m.fst")
    write_fst(fst, _random_fst(rng))
    tree = str(tmp_path / "m.tree")
    write_context_dependency(
        tree, ContextDependency(3, 1, _random_event_map(rng, depth=3))
    )
    return [(mdl, read_transition_model), (fst, read_fst),
            (tree, read_context_dependency)]


def test_kaldi_models_corruption_fuzz(tmp_path):
    """Arbitrary byte-level corruption of .mdl / den-FST / tree files:
    the public readers must parse or raise KaldiIOError naming the file —
    the declared contract, tighter than 'some exception'."""
    rng = np.random.RandomState(0xD00D)
    for path, reader in _kaldi_artifacts(tmp_path):
        blob = open(path, "rb").read()
        bad = str(tmp_path / "bad.bin")
        for _ in range(120):
            with open(bad, "wb") as f:
                f.write(_mutate(blob, rng))
            try:
                reader(bad)
            except KaldiIOError:
                pass  # the declared failure type; anything else fails


def test_kaldi_io_corruption_fuzz(tmp_path):
    """Matrix / vector / sparse-matrix readers under byte corruption:
    parse or ValueError (KaldiIOError included), never IndexError or a
    silently index-wrapped row."""
    rng = np.random.RandomState(0xABCD)
    mat = str(tmp_path / "m.mat")
    kaldi_io.write_matrix(mat, rng.randn(5, 7).astype(np.float32))
    vec = str(tmp_path / "v.vec")
    kaldi_io.write_vector(vec, rng.randn(11).astype(np.float32))
    sp = str(tmp_path / "s.mat")
    dense = np.zeros((4, 9), np.float32)
    dense[rng.randint(0, 4, 6), rng.randint(0, 9, 6)] = 1.5
    kaldi_io.write_sparse_matrix(sp, dense)

    for path, reader in ((mat, kaldi_io.read_matrix),
                         (vec, kaldi_io.read_vector),
                         (sp, kaldi_io.read_sparse_matrix)):
        blob = open(path, "rb").read()
        bad = str(tmp_path / "bad.bin")
        for _ in range(120):
            with open(bad, "wb") as f:
                f.write(_mutate(blob, rng))
            try:
                reader(bad)
            except ValueError:
                pass


def test_nnet3_corruption_fuzz(tmp_path):
    """load_nnet3 (binary and text formats) under byte corruption: parse
    or ValueError — never struct.error / KeyError / IndexError."""
    rng = np.random.RandomState(0x5EED)
    net = nnet3.make_random_tdnn(
        input_dim=6, output_dim=10, hidden_dim=8, num_layers=2, seed=7
    )
    bin_path = str(tmp_path / "net.raw")
    write_nnet3_binary(net, bin_path)
    bin_blob = open(bin_path, "rb").read()

    bad = str(tmp_path / "bad.raw")
    for _ in range(100):
        with open(bad, "wb") as f:
            f.write(_mutate(bin_blob, rng))
        try:
            nnet3.load_nnet3(bad)
        except ValueError:
            pass


def test_nnet3_text_corruption_fuzz(tmp_path):
    """The text-format descriptor parser under line/char corruption."""
    rng = np.random.RandomState(0x7EA)
    net = nnet3.make_random_tdnn(
        input_dim=6, output_dim=10, hidden_dim=8, num_layers=2, seed=8
    )
    txt_path = str(tmp_path / "net.txt")
    nnet3.write_nnet3_text(net, txt_path)
    text = open(txt_path).read()

    bad = str(tmp_path / "bad.txt")
    alphabet = "<>=()-. 0123456789abcdefABE"
    for _ in range(80):
        doc = text
        mode = rng.randint(3)
        if mode == 0:
            doc = doc[: rng.randint(len(doc))]
        elif mode == 1:
            i = rng.randint(len(doc))
            doc = doc[:i] + alphabet[rng.randint(len(alphabet))] \
                + doc[i + 1:]
        else:
            lines = doc.splitlines()
            del lines[rng.randint(len(lines))]
            doc = "\n".join(lines)
        with open(bad, "w") as f:
            f.write(doc)
        try:
            nnet3.load_nnet3(bad)
        except ValueError:
            pass
