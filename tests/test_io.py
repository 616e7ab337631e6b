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


@pytest.mark.parametrize("binary", [False, True])
def test_ply_faces_range_grid_roundtrip(tmp_path, binary):
    """Mesh extensions of the reference PLY adapter (io_file.c
    ply_write_1/:218-341): face lists, range_grid with obj_info
    num_cols/num_rows, -1 = empty cell."""
    rng = np.random.RandomState(2)
    xyz = rng.uniform(-1, 1, size=(12, 3)).astype(np.float32)
    faces = [[0, 1, 2], [3, 4, 5, 6], [7, 8, 9]]
    grid = np.full((4, 5), -1, np.int32)
    grid[1, 2] = 7
    grid[3, 4] = 11
    p = str(tmp_path / ("m_b.ply" if binary else "m_a.ply"))
    ply.write_ply(p, xyz, faces=faces, range_grid=grid, binary=binary)
    d = ply.read_ply(p)
    np.testing.assert_allclose(d["xyz"], xyz, rtol=1e-6)
    assert len(d["faces"]) == 3
    for got, want in zip(d["faces"], faces):
        np.testing.assert_array_equal(got, want)
    assert d["range_grid"].shape == (4, 5)
    np.testing.assert_array_equal(d["range_grid"], grid)
    assert d["obj_info"]["num_cols"] == "5"
    assert d["obj_info"]["num_rows"] == "4"


def test_ply_range_grid_only(tmp_path):
    """ply_write_list analog (reference io_file.c:189-216): a
    range_grid-only PLY with no vertex element."""
    grid = np.array([3, -1, 0, -1, 5, 2], np.int64)
    p = str(tmp_path / "g.ply")
    ply.write_range_grid_ply(p, grid)
    d = ply.read_ply(p)
    assert "xyz" not in d
    np.testing.assert_array_equal(d["range_grid"], grid)


def test_ply_obj_info_roundtrip(tmp_path):
    xyz = np.zeros((2, 3), np.float32)
    p = str(tmp_path / "o.ply")
    ply.write_ply(p, xyz, obj_info={"scanner": "synthetic rig"})
    d = ply.read_ply(p)
    assert d["obj_info"]["scanner"] == "synthetic rig"
