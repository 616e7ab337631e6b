"""Non-planar (sphere-on-plane) synthetic scene tests.

The flat-plane scene barely exercises the occlusion machinery (round-3
VERDICT weak spot 4: filters removed 0-3 patches per E2E iteration).
The sphere tangent to the plane occludes a view-dependent region of
plane in every camera, so the z-buffer visibility logic, filterOutside
and filterExact have real work — these tests assert they do it
correctly in a full pipeline run (reference filter.cpp:51-263).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvskit_tpu.config import MVSConfig
from mvskit_tpu.ops import ncc as nccops
from mvskit_tpu.pipeline import views as vw
from mvskit_tpu.pipeline.driver import PMMVS
from mvskit_tpu.utils import metrics, synthetic as sy

LEVEL = 1
WSIZE = 7
A1 = np.deg2rad(60.0)


@pytest.fixture(scope="module")
def sphere():
    Ps, imgs, scene = sy.sphere_scene(n_views=8, width=160, height=120)
    return Ps, imgs, scene


def test_render_views_plane_back_compat():
    """geometry='plane', nillums=1 must stay byte-identical to the
    historical renderer (golden-parity tests depend on those images)."""
    Ps = sy.ring_cameras(3, 96, 64)
    old = sy.render_plane_views(Ps, 96, 64, seed=0)
    new = sy.render_views(Ps, 96, 64, geometry="plane", seed=0)
    assert new.shape == (3, 1, 64, 96, 3)
    np.testing.assert_array_equal(old, new[:, 0])


def test_raytrace_occlusion_consistency(sphere):
    """Pixels marked on_sphere are closer to the camera than the plane
    along the same ray, and their points lie on the sphere."""
    Ps, _, _ = sphere
    pts, normal, hit, on_sphere = sy.raytrace_view(Ps[0], 160, 120)
    assert on_sphere.any() and (~on_sphere & hit).any()
    d = sy.surface_distance(pts[hit].reshape(-1, 3), "sphere")
    assert d.max() < 1e-9
    # sphere normals are unit and outward
    n = normal[on_sphere]
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-9)


def test_gt_points_visible_and_scored(sphere):
    """visible_surface_points returns surface points the engine can
    actually score: median NCC at truth is high, and an off-surface
    offset scores clearly worse."""
    Ps, _, scene = sphere
    coord, normal = sy.visible_surface_points(
        Ps, 256, geometry="sphere", seed=3, width=160, height=120
    )
    assert coord.shape[0] > 100
    assert sy.surface_distance(coord[:, :3], "sphere").max() < 1e-9
    cj = jnp.asarray(coord, jnp.float32)
    nj = jnp.asarray(normal, jnp.float32)
    B = coord.shape[0]
    images = np.full((B, scene.n_images), -1, np.int32)
    images[:, 0] = 0
    images = vw.add_images(scene, cj, nj, jnp.asarray(images), LEVEL, A1)
    images = vw.sort_images(scene, cj, nj, images, LEVEL)
    ok = np.asarray(images[:, 0]) >= 0
    s = np.asarray(
        nccops.compute_patch_ncc(scene, images, cj, nj, LEVEL, WSIZE, 6, A1)
    )[ok]
    off = cj.at[:, 2].add(0.15)
    s2 = np.asarray(
        nccops.compute_patch_ncc(scene, images, off, nj, LEVEL, WSIZE, 6, A1)
    )[ok]
    # 1.4 is the invalid-window sentinel (= 1 - unrobustincc(2.0));
    # windows straddling the occlusion rim legitimately score lower
    # (different background per view), so test the distribution
    val = s < 1.39
    assert np.median(s[val]) > 0.75, np.median(s[val])
    assert (s[val] > 0.9).mean() > 0.4
    assert (s[val] > 0.8).mean() - (s2[val] > 0.8).mean() > 0.1


def test_sphere_pipeline_filters_kill_floaters(tmp_path):
    """Full pipeline on the occluding scene with planted floaters: the
    filter suite (reference filter.cpp:25-49) must remove a nonzero
    number of patches, every planted floater must die, and the final
    cloud must lie on the analytic surface."""
    prefix = str(tmp_path / "ds")
    sy.write_dataset(
        prefix, n_views=8, width=160, height=120, n_seeds=96,
        geometry="sphere",
    )
    # plant floaters 0.35 above the plane, off the sphere: visible in
    # many views but photometrically unsupported and occluding real
    # surface — filterOutside/filterExact material
    from mvskit_tpu.io import ply as plyio

    d = plyio.read_ply(os.path.join(prefix, "ply", "00000000.ply"))
    rng = np.random.RandomState(11)
    fl = np.stack(
        [
            rng.uniform(0.65, 0.8, 12) * rng.choice([-1, 1], 12),
            rng.uniform(-0.3, 0.3, 12),
            np.full(12, 0.35),
        ],
        axis=1,
    )
    plyio.write_ply(
        os.path.join(prefix, "ply", "00000000.ply"),
        np.concatenate([d["xyz"], fl]),
    )

    cfg = MVSConfig.from_option_file(prefix)
    cfg.max_patches = 8192
    cfg.n_iterations = 1
    cfg.prop_rounds = 3
    cfg.donor_budget = 1024
    cfg.refine_rounds = 12
    engine = PMMVS(cfg, log=lambda *a: None)
    engine.seed()

    # some floaters survive seeding (photometric gate is not applied
    # at seed time, matching the reference's seed path)
    t = engine.table
    alive0 = np.asarray(t.alive)
    coord0 = np.asarray(t.coord)[alive0]
    planted0 = (sy.surface_distance(coord0[:, :3], "sphere") > 0.2).sum()
    assert planted0 > 0, "floaters must survive seeding for the test"

    engine.propagate(0)
    stats = engine.filter()
    removed = sum(int(np.asarray(v)) for v in stats)
    assert removed > 0, "filters fired zero times on the occluding scene"

    data = engine.collect()
    cloud = data["coord"][:, :3]
    dist = sy.surface_distance(cloud, "sphere")
    # every planted floater is gone from the final cloud
    assert (dist > 0.2).sum() == 0, dist[dist > 0.2]
    # the cloud lies on the analytic surface
    assert np.median(dist) < 0.02
    assert (dist < 0.05).mean() > 0.9

    # completeness against the visible ground truth
    Ps = sy.sphere_cameras(8, 160, 120)
    gt, _ = sy.visible_surface_points(
        Ps, 2000, geometry="sphere", seed=9, width=160, height=120
    )
    # coverage grows with budget/iterations; this smoke config runs 1
    # iteration at a tiny donor budget (full-scale completeness is the
    # on-chip E2E artifact's job)
    m = metrics.accuracy_completeness(cloud, gt[:, :3], threshold=0.05)
    assert m["comp_frac"] > 0.2, m
