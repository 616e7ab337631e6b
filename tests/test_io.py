"""I/O round-trip tests: PLY (ascii + binary), .patch checkpoint format
(reference io_file.c / patch.cpp parity)."""

import numpy as np
import pytest

from mvskit_tpu.io import patch_io, ply


def test_ply_ascii_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    xyz = rng.uniform(-5, 5, size=(37, 3))
    normal = rng.normal(size=(37, 3))
    rgb = rng.randint(0, 256, size=(37, 3)).astype(np.uint8)
    p = str(tmp_path / "a.ply")
    ply.write_ply(p, xyz, normal=normal, rgb=rgb, binary=False)
    d = ply.read_ply(p)
    np.testing.assert_allclose(d["xyz"], xyz, rtol=1e-6)
    np.testing.assert_allclose(d["normal"], normal, rtol=1e-6)
    np.testing.assert_array_equal(d["rgb"], rgb)


def test_ply_binary_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    xyz = rng.uniform(-5, 5, size=(1000, 3)).astype(np.float32)
    p = str(tmp_path / "b.ply")
    ply.write_ply(p, xyz, binary=True)
    d = ply.read_ply(p)
    np.testing.assert_allclose(d["xyz"], xyz, rtol=1e-6)


def test_ply_reads_red_green_blue_names(tmp_path):
    p = str(tmp_path / "c.ply")
    with open(p, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex 2\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
            "0 0 0 10 20 30\n1 2 3 40 50 60\n"
        )
    d = ply.read_ply(p)
    np.testing.assert_array_equal(d["rgb"], [[10, 20, 30], [40, 50, 60]])


def test_patch_file_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    n = 11
    coord = rng.uniform(-1, 1, size=(n, 4))
    coord[:, 3] = 1.0
    normal = rng.normal(size=(n, 4))
    ncc = rng.uniform(0, 1, size=n)
    dscale = rng.uniform(0.001, 0.1, size=n)
    ascale = rng.uniform(0.01, 0.2, size=n)
    images = [[0, 2, 5], [1, 3], [4, 0, 1, 2]] * 4
    images = images[:n]
    vimages = [[7], [], [6, 7]] * 4
    vimages = vimages[:n]

    p = str(tmp_path / "x.patch")
    patch_io.write_patch_file(
        p, coord, normal, ncc, dscale, ascale, images, vimages
    )
    d = patch_io.read_patch_file(p)
    np.testing.assert_allclose(d["coord"], coord, rtol=1e-6)
    np.testing.assert_allclose(d["normal"], normal, rtol=1e-6)
    np.testing.assert_allclose(d["ncc"], ncc, rtol=1e-6)
    assert d["images"] == images
    assert d["vimages"] == vimages


def test_padded_list_helpers():
    lists = [[3, 1], [], [0, 2, 4, 6]]
    arr = patch_io.lists_to_padded(lists, 3)
    assert arr.shape == (3, 3)
    assert patch_io.padded_to_lists(arr) == [[3, 1], [], [0, 2, 4]]


def test_rq_decompose():
    from mvskit_tpu.pipeline.seed import rq_decompose

    rng = np.random.RandomState(3)
    K = np.array([[500.0, 2.0, 320.0], [0.0, 510.0, 240.0], [0.0, 0.0, 1.0]])
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q = -q
    M = K @ q
    K2, R2 = rq_decompose(M)
    np.testing.assert_allclose(K2 / K2[2, 2], K, atol=1e-8)
    np.testing.assert_allclose(R2, q, atol=1e-8)
    np.testing.assert_allclose(np.linalg.det(R2), 1.0, atol=1e-10)


def test_native_ply_matches_python(tmp_path):
    """The C++ PLY library round-trips identically to the Python path."""
    from mvskit_tpu.io import native

    if not native.available():
        pytest.skip("no native toolchain")
    rng = np.random.RandomState(5)
    xyz = rng.uniform(-3, 3, size=(500, 3)).astype(np.float32)
    normal = rng.normal(size=(500, 3)).astype(np.float32)
    rgb = rng.randint(0, 256, size=(500, 3)).astype(np.uint8)
    for binary in (False, True):
        p = str(tmp_path / f"n_{binary}.ply")
        assert native.write_ply(p, xyz, normal=normal, rgb=rgb, binary=binary)
        d_native = native.read_ply(p)
        d_py = ply._read_ply_py(p)
        for k in ("xyz", "normal"):
            np.testing.assert_allclose(d_native[k], d_py[k], rtol=1e-6)
        np.testing.assert_array_equal(d_native["rgb"], d_py["rgb"])
        np.testing.assert_allclose(d_native["xyz"], xyz, rtol=1e-6)
