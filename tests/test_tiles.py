"""Tile-sharded propagation (parallel/tiles.py) equals the unsharded
step bit-for-bit on the 8-device virtual CPU mesh: grid build, donor
selection, halo full-cell gate, and the full round."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvskit_tpu.core import grid as gridmod
from mvskit_tpu.parallel import shard as sh
from mvskit_tpu.parallel import tiles
from mvskit_tpu.pipeline import propagate as pr
from mvskit_tpu.utils import synthetic

from test_grid import make_seeded_table
from test_propagate import make_params

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple devices"
)

LEVEL, CSIZE, CAP = 1, 2, 8


@pytest.fixture(scope="module")
def sp():
    Ps, imgs, scene = synthetic.plane_scene(n_views=6, width=160, height=120)
    coord, normal = synthetic.plane_points(Ps, 48, extent=0.6)
    table = make_seeded_table(scene, coord, normal, capacity=1024)
    return scene, table


@pytest.mark.parametrize("k", [2, 8])
def test_tiled_build_grid_matches(sp, k):
    scene, table = sp
    mesh = sh.make_mesh(k, axis="tile")
    want = gridmod.build_grid(scene, table, LEVEL, CSIZE, CAP)
    got_t = jax.jit(
        lambda t: tiles.tiled_build_grid(
            mesh, scene, t, LEVEL, CSIZE, CAP
        )
    )(table)
    got = tiles.tiled_grid_to_global(scene, got_t, LEVEL, CSIZE)
    np.testing.assert_array_equal(np.asarray(got.slots), np.asarray(want.slots))
    np.testing.assert_array_equal(np.asarray(got.vslots), np.asarray(want.vslots))
    np.testing.assert_array_equal(np.asarray(got.depth_idx), np.asarray(want.depth_idx))
    np.testing.assert_allclose(np.asarray(got.depth), np.asarray(want.depth))
    np.testing.assert_array_equal(np.asarray(got.evicted), np.asarray(want.evicted))
    # padded rows beyond gh hold no cells
    _, gh = gridmod.grid_dims(scene, LEVEL, CSIZE)
    assert np.all(np.asarray(got_t.slots)[:, gh:] == -1)


def test_tiled_select_donors_matches(sp):
    scene, table = sp
    mesh = sh.make_mesh(8, axis="tile")
    budget = 64

    grid = gridmod.build_grid(scene, table, LEVEL, CSIZE, CAP)
    w_pidx, w_img, w_cy, w_cx, w_ok = pr.select_donors(
        scene, grid, table, budget
    )

    def run(t):
        gt = tiles.tiled_build_grid(mesh, scene, t, LEVEL, CSIZE, CAP)
        return tiles.tiled_select_donors(
            mesh, scene, gt, t, budget, LEVEL, CSIZE
        )
    g_pidx, g_img, g_cy, g_cx, g_ok = jax.jit(run)(table)

    w_ok = np.asarray(w_ok)
    g_ok = np.asarray(g_ok)
    np.testing.assert_array_equal(g_ok, w_ok)
    for got, want in ((g_pidx, w_pidx), (g_img, w_img), (g_cy, w_cy), (g_cx, w_cx)):
        np.testing.assert_array_equal(
            np.asarray(got)[w_ok], np.asarray(want)[w_ok]
        )


@pytest.mark.parametrize("direction", [1, -1])
def test_tiled_full_cell_gate_matches(sp, direction):
    scene, table = sp
    mesh = sh.make_mesh(8, axis="tile")
    budget = 64
    grid = gridmod.build_grid(scene, table, LEVEL, CSIZE, CAP)
    pidx, img, cy, cx, ok = pr.select_donors(scene, grid, table, budget)

    gw, gh = gridmod.grid_dims(scene, LEVEL, CSIZE)
    for axis_sp in (0, 1):
        ty = np.asarray(cy) + (direction if axis_sp == 1 else 0)
        tx = np.asarray(cx) + (direction if axis_sp == 0 else 0)
        inb = (tx >= 0) & (tx < gw) & (ty >= 0) & (ty < gh)
        tyc = np.clip(ty, 0, gh - 1)
        txc = np.clip(tx, 0, gw - 1)
        worst = np.asarray(grid.slots)[np.asarray(img), tyc, txc, CAP - 1]
        want_full = worst >= 0
        want_ncc = np.asarray(table.ncc)[np.maximum(worst, 0)]

        def run(t):
            gt = tiles.tiled_build_grid(mesh, scene, t, LEVEL, CSIZE, CAP)
            return tiles.tiled_full_cell_gate(
                mesh, scene, gt, t, img, cy, cx, axis_sp, direction,
                LEVEL, CSIZE,
            )
        g_full, g_ncc = jax.jit(run)(table)
        g_full = np.asarray(g_full)
        # gate values only matter for in-bounds targets of ok donors
        m = inb & np.asarray(ok)
        np.testing.assert_array_equal(g_full[m], want_full[m])
        mm = m & want_full
        np.testing.assert_allclose(
            np.asarray(g_ncc)[mm], want_ncc[mm], rtol=1e-6
        )


@pytest.mark.parametrize("k", [2, 8])
def test_tiled_propagate_round_matches(sp, k):
    scene, table = sp
    mesh = sh.make_mesh(k, axis="tile")
    p = make_params(donor_budget=64, chunk=32, refine_rounds=2,
                    refine_cands=2)
    key = jax.random.PRNGKey(7)
    args = dict(
        ncc_threshold=jnp.float32(0.7),
        ncc_threshold_before=jnp.float32(0.4),
    )

    want, wstats = jax.jit(
        pr.propagate_round, static_argnames=("p", "direction"),
    )(scene, table, key, p=p, direction=1, **args)

    got, gstats = jax.jit(
        lambda s, t, kk: tiles.tiled_propagate_round(
            mesh, s, t, kk, p, 1, **args
        )
    )(scene, table, key)

    np.testing.assert_array_equal(np.asarray(got.alive), np.asarray(want.alive))
    alive = np.asarray(want.alive)
    np.testing.assert_allclose(
        np.asarray(got.coord)[alive], np.asarray(want.coord)[alive],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(got.ncc)[alive], np.asarray(want.ncc)[alive], atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(got.images)[alive], np.asarray(want.images)[alive]
    )
    for gs, ws in zip(gstats, wstats):
        assert int(np.asarray(gs)) == int(np.asarray(ws))
    # the round must actually do work for this to be evidence
    assert int(np.asarray(wstats.passed)) > 0
