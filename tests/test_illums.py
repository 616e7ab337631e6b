"""Multi-illumination scoring wired through the live gauntlet.

The reference's dataset contract is photometric (image/%04d%04d per
view x illumination, image/photo.hpp:25-30) but its live cost path
samples illum 0 only; the multi-illum getTex overload
(optim.cpp:846-893) is dormant. Here the capability is LIVE behind
config.use_illums: scores average the weighted robust INCC over the
illumination axis (ops/ncc.compute_patch_ncc_illums), the refinement
objective averages its per-candidate cost the same way, and view
selection stays illum-0 (as in every reference variant).
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvskit_tpu.config import MVSConfig
from mvskit_tpu.image.scene import scene_from_arrays
from mvskit_tpu.ops import ncc as nccops
from mvskit_tpu.pipeline import refine as rf
from mvskit_tpu.pipeline import views as vw
from mvskit_tpu.pipeline.driver import PMMVS
from mvskit_tpu.utils import synthetic as sy

LEVEL = 1
WSIZE = 7
TAU = 6
A1 = np.deg2rad(60.0)


@pytest.fixture(scope="module")
def dup3():
    """Plane scene whose 3 illuminations are IDENTICAL images — the
    degenerate case where multi-illum scoring must equal single-illum
    exactly."""
    Ps = sy.ring_cameras(6, 160, 120)
    imgs = sy.render_plane_views(Ps, 160, 120, seed=0)
    tri = [np.stack([im, im, im]) for im in imgs]
    scene = scene_from_arrays(Ps, tri, max_level=4)
    coord, normal = sy.plane_points(Ps, 32, extent=0.6)
    coord = jnp.asarray(coord, jnp.float32)
    normal = jnp.asarray(normal, jnp.float32)
    images = np.full((32, scene.n_images), -1, np.int32)
    images[:, 0] = 0
    images = vw.add_images(scene, coord, normal, jnp.asarray(images), LEVEL, A1)
    images = vw.sort_images(scene, coord, normal, images, LEVEL)
    dscale, _ = vw.set_scales(scene, coord, images, LEVEL, TAU, WSIZE)
    return scene, coord, normal, images, dscale


def test_identical_illums_degenerate_parity(dup3):
    """With identical illuminations, the multi-illum average equals the
    single-illum score bit-for-bit."""
    scene, coord, normal, images, dscale = dup3
    assert scene.n_illums == 3
    s1 = nccops.compute_patch_ncc(
        scene, images, coord, normal, LEVEL, WSIZE, TAU, A1
    )
    s3 = nccops.compute_patch_ncc_n(
        scene, images, coord, normal, LEVEL, WSIZE, TAU, A1, n_illums=3
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s3), atol=1e-6)


def test_identical_illums_refine_parity(dup3):
    """Same PRNG + identical illum costs -> the illum-aware refinement
    selects identical candidates and lands on identical poses."""
    scene, coord, normal, images, dscale = dup3
    ref = jnp.maximum(images[:, 0], 0)
    ray = coord - scene.cams.center[ref]
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    start = coord + (2.0 * dscale)[:, None] * ray
    kw = dict(
        level=LEVEL, wsize=WSIZE, tau=TAU, min_image_num=3,
        angle_threshold1=A1, ascale=math.pi / 48.0,
        rounds=6, n_cands=4, shrink=0.8,
        init_depth_radius=4.0, init_angle_radius=8.0,
    )
    r1 = rf.refine_batch(
        scene, start, normal, images, dscale, jax.random.PRNGKey(2),
        n_illums=1, **kw
    )
    r3 = rf.refine_batch(
        scene, start, normal, images, dscale, jax.random.PRNGKey(2),
        n_illums=3, **kw
    )
    np.testing.assert_allclose(
        np.asarray(r1.coord), np.asarray(r3.coord), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(r1.ncc), np.asarray(r3.ncc), atol=1e-6
    )


def test_multi_illum_scores_surface():
    """On a genuinely multi-illuminated scene (3 lambertian lights +
    per-illum gain fields) the averaged score still discriminates the
    true surface."""
    Ps, imgs, scene = sy.sphere_scene(
        n_views=8, width=160, height=120, nillums=3
    )
    assert scene.n_illums == 3
    coord, normal = sy.visible_surface_points(
        Ps, 128, geometry="sphere", seed=5, width=160, height=120
    )
    cj = jnp.asarray(coord, jnp.float32)
    nj = jnp.asarray(normal, jnp.float32)
    B = coord.shape[0]
    images = np.full((B, scene.n_images), -1, np.int32)
    images[:, 0] = 0
    images = vw.add_images(scene, cj, nj, jnp.asarray(images), LEVEL, A1)
    images = vw.sort_images(scene, cj, nj, images, LEVEL)
    ok = np.asarray(images[:, 0]) >= 0
    s = np.asarray(
        nccops.compute_patch_ncc_n(
            scene, images, cj, nj, LEVEL, WSIZE, TAU, A1, n_illums=3
        )
    )[ok]
    off = cj.at[:, 2].add(0.15)
    s2 = np.asarray(
        nccops.compute_patch_ncc_n(
            scene, images, off, nj, LEVEL, WSIZE, TAU, A1, n_illums=3
        )
    )[ok]
    val = s < 1.39
    assert np.median(s[val]) > 0.9
    assert np.median(s[val]) - np.median(s2[val]) > 0.08


def test_multi_illum_pipeline_smoke(tmp_path):
    """nillums=3 dataset end-to-end through the driver: the dataset
    contract round-trips (option `illum` key, %04d%04d naming) and the
    multi-illum-scored pipeline reconstructs the plane."""
    prefix = str(tmp_path / "ds")
    sy.write_dataset(
        prefix, n_views=6, width=160, height=120, n_seeds=64, nillums=3
    )
    assert os.path.exists(os.path.join(prefix, "image", "00050002.ppm"))
    cfg = MVSConfig.from_option_file(prefix)
    assert cfg.nillums == 3
    cfg.max_patches = 4096
    cfg.n_iterations = 1
    cfg.prop_rounds = 2
    cfg.donor_budget = 512
    cfg.refine_rounds = 8
    engine = PMMVS(cfg, log=lambda *a: None)
    assert engine.prop_params.n_illums == 3
    engine.seed()
    engine.propagate(0)
    engine.filter()
    cloud = engine.collect()["coord"][:, :3]
    assert cloud.shape[0] > 100
    assert np.median(np.abs(cloud[:, 2])) < 0.03
