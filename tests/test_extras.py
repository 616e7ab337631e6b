"""Tests for auxiliary capabilities: multi-illumination scoring,
bicubic sampling, pyramid filter variants, profiling utilities, and the
in-gauntlet depth>=2 check."""

import jax.numpy as jnp
import numpy as np
import pytest

from mvskit_tpu.image import scene as sc
from mvskit_tpu.ops import ncc, sampling
from mvskit_tpu.utils import synthetic
from mvskit_tpu.utils.profiling import Counters, PhaseTimer

LEVEL = 1
WSIZE = 7
A1 = np.deg2rad(60.0)


def test_multi_illum_ncc():
    Ps = synthetic.ring_cameras(6, 160, 120)
    il0 = synthetic.render_plane_views(Ps, 160, 120, seed=0)
    il1 = synthetic.render_plane_views(Ps, 160, 120, seed=5)
    imgs = [np.stack([a, b]) for a, b in zip(il0, il1)]
    scene = sc.scene_from_arrays(Ps, imgs, max_level=4)
    assert scene.n_illums == 2

    coord, normal = synthetic.plane_points(Ps, 16, extent=0.6)
    views = jnp.asarray(np.tile(np.arange(6, dtype=np.int32), (16, 1)))
    coord = jnp.asarray(coord, jnp.float32)
    normal = jnp.asarray(normal, jnp.float32)
    s = np.asarray(ncc.compute_patch_ncc_illums(
        scene, views, coord, normal, LEVEL, WSIZE, 6, A1
    ))
    ok = s <= 1.0
    assert ok.sum() >= 8
    assert np.median(s[ok]) > 0.9
    # off-surface drops under both illuminations
    off = coord + jnp.asarray([0.0, 0.0, 0.15, 0.0])
    s2 = np.asarray(ncc.compute_patch_ncc_illums(
        scene, views, off, normal, LEVEL, WSIZE, 6, A1
    ))
    both = ok & (s2 <= 1.0)
    assert np.median(s[both]) > np.median(s2[both])


def test_bicubic_interpolates_lattice():
    Ps, imgs, scene = synthetic.plane_scene(n_views=2, width=64, height=48)
    col = sampling.sample_color_bicubic(
        scene, jnp.asarray(1), jnp.asarray(10.0), jnp.asarray(7.0),
        jnp.asarray(0),
    )
    # exact at lattice points (weights collapse to identity)
    np.testing.assert_allclose(np.asarray(col), imgs[1][7, 10], atol=1e-3)


def test_pyramid_filter_variants():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    avg = sc.build_pyramid(img, 2, filter=0)[1]
    mx = sc.build_pyramid(img, 2, filter=1)[1]
    mn = sc.build_pyramid(img, 2, filter=2)[1]
    # interior: max >= avg >= min
    assert np.all(mx[2:-2, 2:-2] >= avg[2:-2, 2:-2] - 1)
    assert np.all(mn[2:-2, 2:-2] <= avg[2:-2, 2:-2] + 1)


def test_profiling_utils():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.summary()
    c = Counters()
    c.add(total=10, passed=7)
    c.add(total=5, passed=2)
    assert c.values == {"total": 15, "passed": 9}
    assert c.rates()["passed"] == pytest.approx(60.0)


def test_check_batch_rejects_floater():
    from mvskit_tpu.pipeline import filters as fl
    from test_grid import make_seeded_table

    Ps, imgs, scene = synthetic.plane_scene(n_views=8, width=160, height=120)
    g = np.linspace(-0.4, 0.4, 16)
    xs, ys = np.meshgrid(g, g)
    pts = np.stack([xs.ravel(), ys.ravel()], 1)
    coord = np.concatenate([pts, np.zeros((256, 1)), np.ones((256, 1))], 1)
    normal = np.tile([[0.0, 0.0, 1.0, 0.0]], (256, 1))
    table = make_seeded_table(
        scene, jnp.asarray(coord, jnp.float32),
        jnp.asarray(normal, jnp.float32), capacity=512,
    )
    table, grid = fl.rebuild(scene, table, LEVEL, 2, 8, 0.5, additive=False)

    # hypothesis batch: one on-surface point and one floater 0.3 above
    hc = jnp.asarray(
        [[0.0, 0.0, 0.0, 1.0], [0.05, 0.05, 0.3, 1.0]], jnp.float32
    )
    hn = jnp.asarray(
        [[0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 1.0, 0.0]], jnp.float32
    )
    himg = jnp.asarray(
        np.tile(np.arange(8, dtype=np.int32), (2, 1))
    )
    hd = jnp.asarray([0.01, 0.01], jnp.float32)
    hncc = jnp.asarray([0.95, 0.72], jnp.float32)
    hvim = jnp.full((2, 8), -1, jnp.int32)
    reject = np.asarray(fl.check_batch(
        scene, grid, table, hc, hn, hd, hncc, himg, hvim,
        level=LEVEL, csize=2, tau=6, ncc_threshold=0.7,
        quad_threshold=2.5, neighbor_threshold=0.5,
        neighbor_threshold1=1.0,
    ))
    assert not reject[0]  # surface hypothesis is consistent
    assert reject[1]      # weak floater pressed by the surface -> killed


def test_pmvs_expansion_strategy():
    """The scene-space expansion alternative grows the cloud from
    sparse seeds and stays on the surface."""
    import jax

    from mvskit_tpu.pipeline import expand as ex
    from mvskit_tpu.pipeline import propagate as pr
    from test_grid import make_seeded_table
    from test_propagate import make_params

    Ps, imgs, scene = synthetic.plane_scene(n_views=8, width=160, height=120)
    coord, normal = synthetic.plane_points(Ps, 12, seed=3, extent=0.5)
    table = make_seeded_table(
        scene, jnp.asarray(coord, jnp.float32),
        jnp.asarray(normal, jnp.float32), capacity=2048,
    )
    p = make_params(donor_budget=96, chunk=48)
    state = ex.init_state(scene, LEVEL, 2)
    n0 = int(np.asarray(table.n_alive()))
    key = jax.random.PRNGKey(2)
    for r in range(2):
        key, sub = jax.random.split(key)
        table, state, stats = ex.expand_round(
            scene, table, state, sub, p,
            ncc_threshold=0.7, ncc_threshold_before=0.4,
            count_threshold=4, depth=1,
        )
    n1 = int(np.asarray(table.n_alive()))
    assert n1 > n0, (n0, n1)
    alive = np.asarray(table.alive)
    new = alive.copy()
    new[:n0] = False
    z = np.abs(np.asarray(table.coord)[new, 2])
    assert np.median(z) < 0.05
    # effort counters incremented where patches landed
    assert int(np.asarray(state.counts).sum()) > 0


def test_visdata_restricts_add_images(tmp_path):
    import dataclasses

    from mvskit_tpu.image.scene import load_visdata
    from mvskit_tpu.pipeline import views as vw

    Ps, imgs, scene = synthetic.plane_scene(n_views=4, width=96, height=72)
    # vis.dat: view 0 only covisible with 1
    p = tmp_path / "vis.dat"
    p.write_text("VISDATA\n4\n0 1 1\n1 1 0\n2 1 3\n3 1 2\n")
    covis = load_visdata(str(p), [0, 1, 2, 3])
    assert covis is not None and covis[0, 1] and not covis[0, 2]
    scene2 = dataclasses.replace(scene, covis=jnp.asarray(covis))

    coord, normal = synthetic.plane_points(Ps, 8, extent=0.4)
    coord = jnp.asarray(coord, jnp.float32)
    normal = jnp.asarray(normal, jnp.float32)
    images = jnp.full((8, 4), -1, jnp.int32).at[:, 0].set(0)
    out_all = np.asarray(vw.add_images(scene, coord, normal, images, 1, A1))
    out_vis = np.asarray(vw.add_images(scene2, coord, normal, images, 1, A1))
    assert (out_all >= 0).sum() > (out_vis >= 0).sum()
    for row in out_vis:
        assert set(row[row >= 0]) <= {0, 1}


def test_luma_mode_scores_surface():
    """The luma fast path discriminates the surface like RGB NCC."""
    import jax

    from mvskit_tpu.pipeline import refine as rf
    from mvskit_tpu.pipeline import views as vw

    Ps, imgs, scene = synthetic.plane_scene(n_views=6, width=160, height=120)
    coord, normal = synthetic.plane_points(Ps, 16, extent=0.6)
    coord = jnp.asarray(coord, jnp.float32)
    normal = jnp.asarray(normal, jnp.float32)
    views = jnp.asarray(np.tile(np.arange(6, dtype=np.int32), (16, 1)))

    tex, valid = ncc.texs_for_views(
        scene, views, coord, normal, LEVEL, WSIZE, A1, luma=True
    )
    assert tex.shape[-1] == WSIZE * WSIZE  # luma: one channel block
    cost_true = np.asarray(ncc.incc_cost(tex, valid, 3))
    off = coord + jnp.asarray([0.0, 0.0, 0.15, 0.0])
    tex2, valid2 = ncc.texs_for_views(
        scene, views, off, normal, LEVEL, WSIZE, A1, luma=True
    )
    cost_off = np.asarray(ncc.incc_cost(tex2, valid2, 3))
    ok = (cost_true < 2.0) & (cost_off < 2.0)
    assert ok.sum() >= 8
    assert np.median(cost_true[ok]) < np.median(cost_off[ok])

    # refinement with luma mode recovers depth
    images = vw.sort_images(scene, coord, normal, views, LEVEL, is_fixed=False)
    dscale, _ = vw.set_scales(scene, coord, images, LEVEL, 6, WSIZE)
    ref = jnp.maximum(images[:, 0], 0)
    ray = coord - scene.cams.center[ref]
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    start = coord + (3.0 * dscale)[:, None] * ray
    res = rf.refine_batch(
        scene, start, normal, images, dscale, jax.random.PRNGKey(0),
        level=LEVEL, wsize=WSIZE, tau=6, min_image_num=3,
        angle_threshold1=A1, ascale=np.pi / 48,
        rounds=16, n_cands=8, shrink=0.85,
        init_depth_radius=4.0, init_angle_radius=8.0, luma=True,
    )
    okm = np.asarray(images[:, 0]) >= 0
    z = np.abs(np.asarray(res.coord)[okm, 2])
    assert np.median(z) < 0.05
