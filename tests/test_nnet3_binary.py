"""Binary nnet3 format: write/read round-trip and text/binary agreement."""

import numpy as np
import pytest

import jax.numpy as jnp

from fac_via_ppg_tpu.frontend import nnet3
from fac_via_ppg_tpu.frontend.nnet3_binary import write_nnet3_binary


@pytest.fixture
def net():
    return nnet3.make_random_tdnn(
        input_dim=12, output_dim=30, hidden_dim=16, num_layers=2, seed=5
    )


def test_binary_roundtrip_matches_text(net, tmp_path, rng):
    text_path = str(tmp_path / "net.txt")
    bin_path = str(tmp_path / "net.raw")
    nnet3.write_nnet3_text(net, text_path)
    write_nnet3_binary(net, bin_path)

    # binary header present
    with open(bin_path, "rb") as f:
        assert f.read(2) == b"\x00B"

    net_text = nnet3.load_nnet3(text_path)
    net_bin = nnet3.load_nnet3(bin_path)

    x = jnp.asarray(rng.randn(9, 12), jnp.float32)
    out_t = np.asarray(net_text.forward(x))
    out_b = np.asarray(net_bin.forward(x))
    assert out_b.shape == (9, 30)
    np.testing.assert_allclose(out_b, out_t, atol=1e-6)
    np.testing.assert_allclose(out_b.sum(axis=1), 1.0, atol=1e-5)


def test_binary_with_tdnn_component(tmp_path, rng):
    """TdnnComponent (integer-vector TimeOffsets) survives the binary form."""
    w = (rng.randn(6, 8) * 0.2).astype(np.float32)
    b = rng.randn(6).astype(np.float32) * 0.1
    nodes = {
        "input": nnet3.Node("input", "input", dim=4),
        "tdnn": nnet3.Node(
            "component", "tdnn", component="tdnn",
            descriptor=nnet3.parse_descriptor("input"),
        ),
        "output": nnet3.Node(
            "output", "output", descriptor=nnet3.parse_descriptor("tdnn")
        ),
    }
    comps = {
        "tdnn": nnet3.Component(
            "TdnnComponent",
            {"TimeOffsets": np.array([-1, 0], np.int64),
             "LinearParams": w, "BiasParams": b,
             "OrthonormalConstraint": -1.0,
             "UseNaturalGradient": "T"},
        )
    }
    net = nnet3.Nnet3(nodes, ["input", "tdnn", "output"], comps)
    bin_path = str(tmp_path / "tdnn.raw")
    write_nnet3_binary(net, bin_path)
    net2 = nnet3.load_nnet3(bin_path)

    x = jnp.asarray(rng.randn(5, 4), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(net2.forward(x)), np.asarray(net.forward(x)), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.ravel(net2.components["tdnn"].attrs["TimeOffsets"]), [-1, 0]
    )
    assert net2.components["tdnn"].attrs["UseNaturalGradient"] == "T"


def test_binary_malformed_inputs_raise_cleanly(net, tmp_path):
    """Corrupt binary artifacts must raise (any Exception subclass, never
    hang, crash the process, or silently return a wrong network)."""
    bin_path = str(tmp_path / "net.raw")
    write_nnet3_binary(net, bin_path)
    blob = open(bin_path, "rb").read()

    # truncation at several depths: empty, header-only, mid-token,
    # mid-params
    for cut in (0, 1, 2, 10, len(blob) // 2, len(blob) - 4):
        p = str(tmp_path / f"trunc_{cut}.raw")
        with open(p, "wb") as f:
            f.write(blob[:cut])
        with pytest.raises(Exception):
            nnet3.load_nnet3(p)

    # corrupted magic / leading token
    bad = b"\x00Z" + blob[2:]
    p = str(tmp_path / "badmagic.raw")
    with open(p, "wb") as f:
        f.write(bad)
    with pytest.raises(Exception):
        nnet3.load_nnet3(p)

    # a dimension field blown up to a huge value must not allocate wildly
    # or loop: find the first int32 after <Nnet3> and overwrite it
    idx = blob.find(b"<NumComponents>")
    if idx != -1:
        import struct
        bad2 = bytearray(blob)
        # token is followed by \x04 + int32 count
        off = idx + len(b"<NumComponents>") + 2
        bad2[off : off + 4] = struct.pack("<i", 2**30)
        p = str(tmp_path / "hugecount.raw")
        with open(p, "wb") as f:
            f.write(bytes(bad2))
        with pytest.raises(Exception):
            nnet3.load_nnet3(p)


def test_kaldi_io_malformed_matrix_raises(tmp_path, rng):
    """Truncated / garbage Kaldi matrices raise instead of returning
    partial data."""
    from fac_via_ppg_tpu.frontend import kaldi_io

    mat = rng.randn(6, 5).astype(np.float32)
    path = str(tmp_path / "m.mat")
    kaldi_io.write_matrix(path, mat)
    blob = open(path, "rb").read()

    for cut in (1, 3, 8, len(blob) - 3):
        p = str(tmp_path / f"m_{cut}.mat")
        with open(p, "wb") as f:
            f.write(blob[:cut])
        with pytest.raises(Exception):
            kaldi_io.read_matrix(p)

    p = str(tmp_path / "garbage.mat")
    with open(p, "wb") as f:
        f.write(b"\x00B\x00XYZW" + bytes(40))
    with pytest.raises(Exception):
        kaldi_io.read_matrix(p)


def test_fuzz_nnet3_binary_roundtrip(tmp_path):
    """Seeded size sweep: write_nnet3_binary -> load_nnet3 must reproduce
    every node and component parameter exactly (structure compare — no
    forward, so no per-shape compile cost)."""
    from fac_via_ppg_tpu.frontend.nnet3 import _descriptor_str

    for case in range(12):
        rng = np.random.RandomState(5000 + case)
        net = nnet3.make_random_tdnn(
            input_dim=int(rng.randint(4, 48)),
            output_dim=int(rng.randint(8, 200)),
            hidden_dim=int(rng.randint(8, 64)),
            num_layers=int(rng.randint(1, 5)),
            seed=int(rng.randint(0, 10000)),
        )
        path = str(tmp_path / f"n{case}.raw")
        write_nnet3_binary(net, path)
        back = nnet3.load_nnet3(path)

        assert back.node_order == net.node_order
        for name in net.nodes:
            a, b = net.nodes[name], back.nodes[name]
            assert (a.kind, a.dim, a.component) == (
                b.kind, b.dim, b.component
            )
            if a.descriptor is not None:
                assert _descriptor_str(a.descriptor) == _descriptor_str(
                    b.descriptor
                )
        assert set(back.components) == set(net.components)
        for name, comp in net.components.items():
            bc = back.components[name]
            assert bc.kind == comp.kind
            for key, val in comp.attrs.items():
                if isinstance(val, np.ndarray):
                    np.testing.assert_allclose(
                        np.asarray(bc.attrs[key], np.float64),
                        np.asarray(val, np.float64),
                        rtol=1e-6, atol=1e-7,
                        err_msg=f"{name}.{key} case {case}",
                    )


def test_fuzz_nnet3_binary_truncation_rejected(tmp_path, rng):
    net = nnet3.make_random_tdnn(
        input_dim=8, output_dim=20, hidden_dim=12, num_layers=2, seed=9
    )
    path = str(tmp_path / "full.raw")
    write_nnet3_binary(net, path)
    data = open(path, "rb").read()
    import struct as _struct

    for cut in sorted({int(c) for c in
                       np.random.RandomState(11).randint(1, len(data), 10)}):
        p = str(tmp_path / "cut.raw")
        with open(p, "wb") as f:
            f.write(data[:cut])
        with pytest.raises(ValueError):  # load_nnet3's declared contract
            nnet3.load_nnet3(p)
