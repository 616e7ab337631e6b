"""Geometry core tests: projection round-trips, depths, patch axes,
camera file formats (reference parity: image/camera.cpp)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from mvskit_tpu.geometry import camera as cam
from mvskit_tpu.utils import synthetic


@pytest.fixture(scope="module")
def cams():
    Ps = synthetic.ring_cameras(5, 160, 120)
    return synthetic.ring_cameras(5, 160, 120), cam.make_camera_set(Ps)


def test_center_projects_nowhere(cams):
    Ps, cs = cams
    # optical center has projective depth 0 -> invalid
    _, z, valid = cam.project(cs, 0, cs.center[0])
    assert abs(float(z)) < 1e-3
    assert not bool(valid)


def test_project_unproject_roundtrip(cams):
    Ps, cs = cams
    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, size=(64, 3))
    coord = jnp.asarray(
        np.concatenate([pts, np.ones((64, 1))], axis=1), jnp.float32
    )
    for level in (0, 1, 2):
        idx = jnp.full((64,), 2, jnp.int32)
        xy, z, valid = cam.project(cs, idx, coord, level)
        assert bool(jnp.all(valid))
        back = cam.unproject(cs, idx, xy, z, level)
        np.testing.assert_allclose(
            np.asarray(back), np.asarray(coord), rtol=2e-4, atol=2e-3
        )


def test_level_halving(cams):
    """project at level l == project at level 0 divided by 2^l
    (reference camera.cpp:91-100)."""
    Ps, cs = cams
    coord = jnp.asarray([0.3, -0.2, 0.1, 1.0], jnp.float32)
    xy0, _, _ = cam.project(cs, 1, coord, 0)
    xy2, _, _ = cam.project(cs, 1, coord, 2)
    np.testing.assert_allclose(np.asarray(xy0) / 4.0, np.asarray(xy2), rtol=1e-5)


def test_compute_depth_matches_distance_along_axis(cams):
    Ps, cs = cams
    coord = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)
    d = float(cam.compute_depth(cs, 0, coord))
    # depth along optical axis == projective z of the normalized P row 2
    expect = float(
        np.dot(np.asarray(cs.oaxis[0]), np.asarray(coord))
    )
    assert d == pytest.approx(expect)
    assert d > 0


def test_get_unit_is_footprint(cams):
    """getUnit ~ scene displacement per 2 pixels of image motion
    (reference optim.cpp:34-41)."""
    Ps, cs = cams
    coord = jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32)
    unit = float(cam.get_unit(cs, jnp.asarray([0]), coord, 0)[0])
    # moving the point by `unit` along the camera x axis moves the image
    # point by ~1 px (definition: 2*dist/(fx+fy) with fx ~ fy ~ f, so
    # unit ~ dist/f); the reference's "2 pixel" displacement is
    # unit2 = 2*unit (patch_manager.cpp:379-380)
    offs = jnp.concatenate(
        [jnp.asarray(cs.xaxis[0]) * unit, jnp.zeros((1,))]
    )
    xy0, _, _ = cam.project(cs, 0, coord[0], 0)
    xy1, _, _ = cam.project(cs, 0, coord[0] + offs, 0)
    moved = float(jnp.linalg.norm(xy1 - xy0))
    assert moved == pytest.approx(1.0, rel=0.1)


def test_paxes_project_to_unit_pixel(cams):
    """getPAxes axes projected into the view displace by ~1 pixel
    (reference optim.cpp:67-84)."""
    Ps, cs = cams
    coord = jnp.asarray([[0.2, 0.1, 0.0, 1.0]], jnp.float32)
    normal = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float32)
    idx = jnp.asarray([1])
    px, py = cam.get_paxes(cs, idx, coord, normal, 1)
    xy0, _, _ = cam.project(cs, idx, coord, 1)
    xyx, _, _ = cam.project(cs, idx, coord + px, 1)
    xyy, _, _ = cam.project(cs, idx, coord + py, 1)
    assert float(jnp.linalg.norm(xyx - xy0)) == pytest.approx(1.0, rel=1e-2)
    assert float(jnp.linalg.norm(xyy - xy0)) == pytest.approx(1.0, rel=1e-2)
    # axes lie in the patch plane
    assert abs(float(jnp.sum(px[0, :3] * normal[0, :3]))) < 1e-5
    assert abs(float(jnp.sum(py[0, :3] * normal[0, :3]))) < 1e-5


def test_quat_proj_roundtrip():
    q = [12.0, -35.0, 130.0, 0.4, -1.2, 3.3]
    proj = cam.quat2proj(q)
    q2 = cam.proj2quat(proj)
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_contour_file_roundtrip(tmp_path):
    intr = [600.0, 0.0, 80.0, 60.0, 0.0, 600.0]
    extr = [80.0, 60.0, 1.0, 0.0, 0.0, 1.0]
    path = str(tmp_path / "00000000.txt")
    cam.write_camera_file(path, intr, extr, 0)
    i2, e2, t = cam.parse_camera_file(path)
    assert t == 0
    np.testing.assert_allclose(i2, intr)
    np.testing.assert_allclose(e2, extr)
    P = cam.projection_from_params(i2, e2, 0)
    assert P.shape == (3, 4)


def test_contour2_matches_manual():
    intr = [500.0, 510.0, 0.0, 320.0, 240.0, 0.0]
    extr = [10.0, 20.0, 30.0, 1.0, 2.0, 3.0]
    P = cam.projection_from_params(intr, extr, 2)
    K = np.array([[500.0, 0.0, 320.0], [0.0, 510.0, 240.0], [0.0, 0.0, 1.0]])
    Rt = cam.quat2proj(extr)[:3]
    np.testing.assert_allclose(P, K @ Rt, rtol=1e-12)


def test_project_xy_lists_matches_project():
    """project_xy_lists (the padding-safe dense-matmul projection used
    by the grid build, round-5 scale-OOM fix) must agree with the
    gather-based cam.project on [N, M] view lists, including
    behind-camera sentinels and padded (-1) entries."""
    from mvskit_tpu.utils import synthetic

    Ps, _, scene = synthetic.plane_scene(n_views=6, width=160, height=120)
    rng = np.random.RandomState(3)
    N, M = 64, 6
    pts = rng.uniform(-1.5, 1.5, size=(N, 3))
    pts[:, 2] = rng.uniform(-0.5, 6.0, size=N)  # some behind cameras
    coord = jnp.asarray(
        np.concatenate([pts, np.ones((N, 1))], 1), jnp.float32
    )
    lists = rng.randint(-1, 6, size=(N, M)).astype(np.int32)
    idx = jnp.asarray(np.maximum(lists, 0))

    xy, _, want_valid = cam.project(scene.cams, idx, coord[:, None, :], 1)
    x, y, got_valid = cam.project_xy_lists(scene.cams, idx, coord, 1)
    np.testing.assert_array_equal(np.asarray(got_valid), np.asarray(want_valid))
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(xy[..., 0]), rtol=1e-6, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(xy[..., 1]), rtol=1e-6, atol=1e-4
    )
