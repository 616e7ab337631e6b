"""Propagation tests: sparse seeds on the analytic plane expand into
neighboring cells with surface-accurate, high-NCC patches (behavioral
parity with reference propagate.cpp:72-237)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvskit_tpu.core import grid as gr
from mvskit_tpu.pipeline import propagate as pr
from mvskit_tpu.utils import synthetic

from test_grid import make_seeded_table

LEVEL = 1
CSIZE = 2


def make_params(**kw):
    d = dict(
        level=LEVEL, csize=CSIZE, wsize=7, tau=6, min_image_num=3,
        cell_capacity=8,
        angle_threshold0=np.deg2rad(60.0), angle_threshold1=np.deg2rad(60.0),
        max_angle_threshold=np.deg2rad(10.0),
        ascale=np.pi / 48.0,
        refine_rounds=6, refine_cands=4, refine_shrink=0.8,
        refine_depth_radius=4.0, refine_angle_radius=8.0,
        neighbor_threshold=0.5,
        donor_budget=128, chunk=64,
    )
    d.update(kw)
    return pr.PropagateParams(**d)


@pytest.fixture(scope="module")
def sp():
    Ps, imgs, scene = synthetic.plane_scene(n_views=8, width=160, height=120)
    coord, normal = synthetic.plane_points(Ps, 12, seed=3, extent=0.5)
    table = make_seeded_table(
        scene, jnp.asarray(coord, jnp.float32),
        jnp.asarray(normal, jnp.float32), capacity=2048,
    )
    return scene, table


def test_select_donors(sp):
    scene, table = sp
    p = make_params()
    grid = gr.build_grid(scene, table, LEVEL, CSIZE, p.cell_capacity)
    pidx, img, cy, cx, ok = pr.select_donors(scene, grid, table, 64)
    ok = np.asarray(ok)
    assert ok.sum() >= 10
    # donor slots really hold that patch with that ref view
    pidx, img = np.asarray(pidx), np.asarray(img)
    refs = np.asarray(table.images)[:, 0]
    for i in np.nonzero(ok)[0]:
        assert refs[pidx[i]] == img[i]


def test_select_donors_cell_first_covers_cells(sp):
    """The cell_first policy must exhaust every cell's slot-0 donor
    before admitting any cell's slot-1 donor (per-cell coverage, the
    array analog of reference propagate.cpp:88-121 donating from every
    cell per sweep)."""
    scene, table = sp
    p = make_params()
    grid = gr.build_grid(scene, table, LEVEL, CSIZE, p.cell_capacity)
    slots = np.asarray(grid.slots)
    refs = np.asarray(table.images)[:, 0]
    alive = np.asarray(table.alive)
    n, gh, gw, S = slots.shape
    imgax = np.arange(n)[:, None, None, None]
    okg = (slots >= 0) & (refs[np.maximum(slots, 0)] == imgax)
    okg &= alive[np.maximum(slots, 0)]
    n_rank0 = int(okg[..., 0].sum())
    budget = max(8, n_rank0 // 2)  # force rationing
    pidx, img, cy, cx, ok = pr.select_donors(
        scene, grid, table, budget, policy="cell_first"
    )
    ok = np.asarray(ok)
    assert ok.sum() == budget  # enough rank-0 donors exist
    # every selected donor is its cell's slot-0 occupant
    s0 = slots[np.asarray(img), np.asarray(cy), np.asarray(cx), 0]
    np.testing.assert_array_equal(s0[ok], np.asarray(pidx)[ok])
    # and no cell is selected twice while rank-0 donors are rationed
    cells = np.stack([np.asarray(img), np.asarray(cy), np.asarray(cx)], 1)[ok]
    assert len(np.unique(cells, axis=0)) == ok.sum()


def test_generate_hypotheses_depth_transfer(sp):
    """A hypothesis inherits the donor's optical-axis depth in the ref
    view (reference propagate.cpp:224-226) — on a fronto-parallel-ish
    plane the new point must stay near z=0."""
    scene, table = sp
    p = make_params()
    grid = gr.build_grid(scene, table, LEVEL, CSIZE, p.cell_capacity)
    donors = pr.select_donors(scene, grid, table, 64)
    coord, normal, images, ncc0, ok = pr.generate_hypotheses(
        scene, table, grid, *donors, 0, 1, jax.random.PRNGKey(0), p
    )
    ok = np.asarray(ok)
    assert ok.sum() >= 10
    # depth along the donor ref view's optical axis is preserved
    dimg = np.asarray(donors[1])
    dpt = np.asarray(table.coord)[np.asarray(donors[0])]
    oax = np.asarray(scene.cams.oaxis)[dimg]
    d_donor = np.sum(oax * dpt, axis=1)
    d_new = np.sum(oax * np.asarray(coord), axis=1)
    np.testing.assert_allclose(d_new[ok], d_donor[ok], rtol=1e-4)


def test_propagation_expands_and_stays_on_surface(sp):
    scene, table = sp
    p = make_params()
    n0 = int(np.asarray(table.n_alive()))
    key = jax.random.PRNGKey(1)
    stats_all = []
    for r in range(3):
        key, sub = jax.random.split(key)
        table, stats = pr.propagate_round(
            scene, table, sub, p, direction=+1,
            ncc_threshold=0.7, ncc_threshold_before=0.4,
        )
        stats_all.append(stats)
    n1 = int(np.asarray(table.n_alive()))
    assert n1 > n0 + 10, (n0, n1)

    alive = np.asarray(table.alive)
    new_mask = alive.copy()
    new_mask[:n0] = False
    z = np.abs(np.asarray(table.coord)[new_mask, 2])
    assert np.median(z) < 0.05, z
    nccs = np.asarray(table.ncc)[new_mask]
    assert np.median(nccs) > 0.8

    total = int(np.asarray(stats_all[-1].total))
    passed = int(np.asarray(stats_all[-1].passed))
    assert total > 0 and passed > 0


def test_insert_patches_respects_capacity():
    from mvskit_tpu.core.patches import empty_table

    table = empty_table(8, 4)
    table = table._replace(alive=table.alive.at[:6].set(True))
    B = 5
    out = pr.GauntletOut(
        coord=jnp.ones((B, 4)),
        normal=jnp.ones((B, 4)),
        images=jnp.zeros((B, 4), jnp.int32),
        vimages=jnp.full((B, 4), -1, jnp.int32),
        ncc=jnp.asarray([0.5, 0.9, 0.1, 0.7, 0.3]),
        dscale=jnp.ones((B,)),
        ascale=jnp.ones((B,)),
        ok=jnp.asarray([True, True, False, True, True]),
        fail0=jnp.zeros((B,), bool),
        fail1=jnp.zeros((B,), bool),
    )
    new = pr.insert_patches(table, out)
    assert int(np.asarray(new.n_alive())) == 8  # 6 old + 2 free rows
    # the two best accepted (ncc .9, .7) got the free rows
    filled = sorted(float(v) for v in np.asarray(new.ncc)[6:8])
    np.testing.assert_allclose(filled, [0.7, 0.9], atol=1e-6)


def test_propagate_round_row_limit_parity(sp):
    """A compacted table propagated with row_limit set must produce the
    identical table to the unbounded round (same key)."""
    scene, table = sp
    p = make_params()
    key = jax.random.PRNGKey(7)
    thr = jnp.float32(0.6)
    thrb = jnp.float32(0.3)
    t1, s1 = pr.propagate_round(
        scene, table, key, p, 1, thr, thrb, use_depth=False
    )
    t2, s2 = pr.propagate_round(
        scene, table, key, p, 1, thr, thrb, use_depth=False,
        row_limit=64,
    )
    for a, b in zip(t1, t2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(np.asarray(s1.passed)) == int(np.asarray(s2.passed))
