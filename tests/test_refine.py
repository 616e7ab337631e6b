"""Refinement tests: encoding round-trip and convergence of the batched
random search to the true surface (replacing reference BOBYQA,
optim.cpp:470-599)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvskit_tpu.pipeline import refine as rf
from mvskit_tpu.pipeline import views as vw
from mvskit_tpu.utils import synthetic

LEVEL = 1
WSIZE = 7
TAU = 6
A0 = np.deg2rad(60.0)
A1 = np.deg2rad(60.0)
ASCALE = math.pi / 48.0


@pytest.fixture(scope="module")
def sp():
    Ps, imgs, scene = synthetic.plane_scene(n_views=8, width=160, height=120)
    coord, normal = synthetic.plane_points(Ps, 24, extent=0.6)
    coord = jnp.asarray(coord, jnp.float32)
    normal = jnp.asarray(normal, jnp.float32)
    images = np.full((24, scene.n_images), -1, np.int32)
    images[:, 0] = 0
    images = vw.add_images(scene, coord, normal, jnp.asarray(images), LEVEL, A0)
    images = vw.sort_images(scene, coord, normal, images, LEVEL)
    dscale, _ = vw.set_scales(scene, coord, images, LEVEL, TAU, WSIZE)
    return scene, coord, normal, images, dscale


def test_normal_encode_decode_roundtrip(sp):
    scene, coord, normal, images, dscale = sp
    rng = np.random.RandomState(0)
    # random normals in the hemisphere facing camera 2
    raw = rng.normal(size=(32, 3))
    raw /= np.linalg.norm(raw, axis=1, keepdims=True)
    z = np.asarray(scene.cams.zaxis[2])
    raw = np.where((raw @ z)[:, None] > 0, -raw, raw)  # face the camera
    n4 = jnp.asarray(np.concatenate([raw, np.zeros((32, 1))], 1), jnp.float32)
    ref = jnp.full((32,), 2, jnp.int32)
    a1, a2 = rf.encode_normal(scene, ref, n4)
    back = rf.decode_normal(scene, ref, a1, a2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(n4), atol=2e-5)


def test_decode_coord_moves_along_ray(sp):
    scene, coord, normal, images, dscale = sp
    ref = jnp.maximum(images[:, 0], 0)
    ray = coord - scene.cams.center[ref]
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    out = rf.decode_coord(coord, ray, dscale, jnp.full(coord.shape[:1], 2.0))
    d = np.linalg.norm(np.asarray(out - coord)[:, :3], axis=1)
    np.testing.assert_allclose(d, 2 * np.asarray(dscale), rtol=1e-4)


def test_refine_recovers_depth(sp):
    """Perturb depth by several dscale units and the normal by ~15 deg;
    refinement must pull the patch back onto the z=0 plane."""
    scene, coord, normal, images, dscale = sp
    ok = np.asarray(images[:, 0]) >= 0
    ref = jnp.maximum(images[:, 0], 0)
    ray = coord - scene.cams.center[ref]
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    start = coord + (3.0 * dscale)[:, None] * ray
    tilt = jnp.asarray([[0.26, 0.0, 0.97, 0.0]], jnp.float32)
    tilt = tilt / jnp.linalg.norm(tilt)
    start_n = jnp.broadcast_to(tilt, normal.shape)

    res = rf.refine_batch(
        scene, start, start_n, images, dscale, jax.random.PRNGKey(0),
        level=LEVEL, wsize=WSIZE, tau=TAU, min_image_num=3,
        angle_threshold1=A1, ascale=ASCALE,
        rounds=24, n_cands=8, shrink=0.85,
        init_depth_radius=4.0, init_angle_radius=8.0,
    )
    z_before = np.abs(np.asarray(start)[:, 2])
    z_after = np.abs(np.asarray(res.coord)[:, 2])
    # most refined patches land very close to the plane
    good = z_after[ok] < 0.05
    assert good.mean() > 0.7, (z_before[ok], z_after[ok])
    assert np.median(np.asarray(res.ncc)[ok][good]) > 0.9
    # normals recovered toward +z
    nz = np.asarray(res.normal)[ok][good][:, 2]
    assert np.median(np.abs(nz)) > 0.9


def test_refine_noop_at_truth(sp):
    """Starting at the truth, refinement should not move patches away."""
    scene, coord, normal, images, dscale = sp
    ok = np.asarray(images[:, 0]) >= 0
    res = rf.refine_batch(
        scene, coord, normal, images, dscale, jax.random.PRNGKey(1),
        level=LEVEL, wsize=WSIZE, tau=TAU, min_image_num=3,
        angle_threshold1=A1, ascale=ASCALE,
        rounds=12, n_cands=4, shrink=0.8,
        init_depth_radius=4.0, init_angle_radius=8.0,
    )
    z_after = np.abs(np.asarray(res.coord)[ok, 2])
    assert np.median(z_after) < 0.03


def test_luma_refine_matches_rgb(sp):
    """luma_refine=True (the shipped default, config.py) searches
    candidates by luminance NCC but re-scores the final pose in RGB;
    its refined geometry must match the RGB-searched path on the
    analytic plane. This is the accuracy side of the 2.2x-faster luma
    kernel (PERF.md kernel microbenchmarks)."""
    scene, coord, normal, images, dscale = sp
    ok = np.asarray(images[:, 0]) >= 0
    ref = jnp.maximum(images[:, 0], 0)
    ray = coord - scene.cams.center[ref]
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    start = coord + (3.0 * dscale)[:, None] * ray
    tilt = jnp.asarray([[0.26, 0.0, 0.97, 0.0]], jnp.float32)
    tilt = tilt / jnp.linalg.norm(tilt)
    start_n = jnp.broadcast_to(tilt, normal.shape)

    kw = dict(
        level=LEVEL, wsize=WSIZE, tau=TAU, min_image_num=3,
        angle_threshold1=A1, ascale=ASCALE,
        rounds=24, n_cands=8, shrink=0.85,
        init_depth_radius=4.0, init_angle_radius=8.0,
    )
    rgb = rf.refine_batch(
        scene, start, start_n, images, dscale, jax.random.PRNGKey(0),
        luma=False, **kw
    )
    lum = rf.refine_batch(
        scene, start, start_n, images, dscale, jax.random.PRNGKey(0),
        luma=True, **kw
    )
    z_rgb = np.abs(np.asarray(rgb.coord)[ok, 2])
    z_lum = np.abs(np.asarray(lum.coord)[ok, 2])
    # both paths land on the plane; luma's median plane error is within
    # 2x of RGB's (both far under the acceptance scale of 0.05)
    assert np.median(z_lum) < 0.03, z_lum
    assert np.median(z_lum) < 2.0 * max(np.median(z_rgb), 5e-3)
    # the FINAL score is RGB in both modes and must agree at the truth
    n_rgb = np.asarray(rgb.ncc)[ok]
    n_lum = np.asarray(lum.ncc)[ok]
    assert np.median(n_lum) > 0.9
    assert abs(np.median(n_lum) - np.median(n_rgb)) < 0.05


def test_gradient_polish_improves(sp):
    """With gradient polish on, the final cost is never worse and
    typically better than random search alone at a tiny search budget."""
    scene, coord, normal, images, dscale = sp
    ok = np.asarray(images[:, 0]) >= 0
    ref = jnp.maximum(images[:, 0], 0)
    ray = coord - scene.cams.center[ref]
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    start = coord + (2.0 * dscale)[:, None] * ray

    kw = dict(
        level=LEVEL, wsize=WSIZE, tau=TAU, min_image_num=3,
        angle_threshold1=A1, ascale=ASCALE,
        rounds=4, n_cands=4, shrink=0.8,
        init_depth_radius=4.0, init_angle_radius=8.0,
    )
    base = rf.refine_batch(
        scene, start, normal, images, dscale, jax.random.PRNGKey(3), **kw
    )
    polished = rf.refine_batch(
        scene, start, normal, images, dscale, jax.random.PRNGKey(3),
        grad_steps=4, grad_lr=0.5, **kw
    )
    b = np.asarray(base.cost)[ok]
    p = np.asarray(polished.cost)[ok]
    assert np.all(p <= b + 1e-5)
    assert np.mean(p) < np.mean(b)


def test_rgb_tail_full_equals_rgb_search(sp):
    """rgb_tail covering ALL rounds of a luma search must reproduce the
    pure RGB search bit-for-bit: both run the same scan bodies over the
    same key split with the round-0 pinned start (pipeline/refine.py
    two-segment search)."""
    scene, coord, normal, images, dscale = sp
    ref = jnp.maximum(images[:, 0], 0)
    ray = coord - scene.cams.center[ref]
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    start = coord + (2.0 * dscale)[:, None] * ray

    kw = dict(
        level=LEVEL, wsize=WSIZE, tau=TAU, min_image_num=3,
        angle_threshold1=A1, ascale=ASCALE,
        rounds=4, n_cands=4, shrink=0.8,
        init_depth_radius=4.0, init_angle_radius=8.0,
    )
    want = rf.refine_batch(
        scene, start, normal, images, dscale, jax.random.PRNGKey(2),
        luma=False, **kw
    )
    got = rf.refine_batch(
        scene, start, normal, images, dscale, jax.random.PRNGKey(2),
        luma=True, rgb_tail=4, **kw
    )
    np.testing.assert_array_equal(np.asarray(got.coord), np.asarray(want.coord))
    np.testing.assert_array_equal(np.asarray(got.ncc), np.asarray(want.ncc))


def test_rgb_tail_hybrid_runs(sp):
    """Hybrid luma+RGB-tail search converges onto the plane like the
    single-mode searches (the re-anchored tail argmin is pure RGB)."""
    scene, coord, normal, images, dscale = sp
    ok = np.asarray(images[:, 0]) >= 0
    res = rf.refine_batch(
        scene, coord, normal, images, dscale, jax.random.PRNGKey(5),
        level=LEVEL, wsize=WSIZE, tau=TAU, min_image_num=3,
        angle_threshold1=A1, ascale=ASCALE,
        rounds=6, n_cands=8, shrink=0.64,
        init_depth_radius=4.0, init_angle_radius=8.0,
        luma=True, rgb_tail=2,
    )
    z = np.abs(np.asarray(res.coord)[ok, 2])
    assert np.median(z) < 0.03
