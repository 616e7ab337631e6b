"""Filter-suite tests: each of the four filters must keep true-surface
patches and remove the planted outliers (reference filter.cpp parity
properties)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mvskit_tpu.core import grid as gr
from mvskit_tpu.core import patches as pt
from mvskit_tpu.pipeline import filters as fl
from mvskit_tpu.utils import synthetic

from test_grid import make_seeded_table

LEVEL = 1
CSIZE = 2
WSIZE = 7
TAU = 6
A1 = np.deg2rad(60.0)

FILTER_KW = dict(
    level=LEVEL, csize=CSIZE, wsize=WSIZE, tau=TAU, min_image_num=3,
    cell_capacity=8, ncc_threshold=0.7, quad_threshold=2.5,
    neighbor_threshold=0.5, neighbor_threshold1=1.0,
    neighbor_threshold2=1.0, angle_threshold1=A1, neighbor_chunk=256,
)


@pytest.fixture(scope="module")
def dense_plane():
    """A dense grid of true patches (~1 per image cell, so the
    neighbor graph connects) + a few planted outliers."""
    Ps, imgs, scene = synthetic.plane_scene(n_views=8, width=160, height=120)
    g = np.linspace(-0.5, 0.5, 24)
    xs, ys = np.meshgrid(g, g)
    pts = np.stack([xs.ravel(), ys.ravel()], axis=1)
    n_true = pts.shape[0]
    coord = np.concatenate(
        [pts, np.zeros((n_true, 1)), np.ones((n_true, 1))], axis=1
    )
    normal = np.tile([[0.0, 0.0, 1.0, 0.0]], (n_true, 1))

    # planted floaters: above the plane, between it and the cameras
    n_out = 6
    rng = np.random.RandomState(7)
    opts = rng.uniform(-0.4, 0.4, size=(n_out, 2))
    ocoord = np.concatenate(
        [opts, np.full((n_out, 1), 1.2), np.ones((n_out, 1))], axis=1
    )
    onormal = np.tile([[0.0, 0.0, 1.0, 0.0]], (n_out, 1))

    coord = jnp.asarray(np.concatenate([coord, ocoord]), jnp.float32)
    normal = jnp.asarray(np.concatenate([normal, onormal]), jnp.float32)
    table = make_seeded_table(scene, coord, normal, capacity=1024)
    return scene, table, n_true, n_out


def test_score2(dense_plane):
    scene, table, n_true, n_out = dense_plane
    s = np.asarray(fl.score2(table, 0.7))
    nccv = np.asarray(table.ncc)
    nimg = np.asarray(table.n_images_per_patch())
    expect = np.maximum(0.0, nccv - 0.7) * nimg
    np.testing.assert_allclose(s[: n_true + n_out], expect[: n_true + n_out], rtol=1e-5)


def test_is_neighbor_symmetric_and_local(dense_plane):
    scene, table, n_true, n_out = dense_plane
    # adjacent grid points on the plane are neighbors
    a = jnp.asarray([0, 0], jnp.int32)
    b = jnp.asarray([1, n_true + 1], jnp.int32)  # next grid point / outlier
    ra = fl._ref_unit(scene, table, a, LEVEL)
    rb = fl._ref_unit(scene, table, b, LEVEL)
    hunit = (ra + rb) / 2.0 * CSIZE
    nb = np.asarray(fl.is_neighbor_pairs(scene, table, a, b, hunit, 1.0))
    assert nb[0]       # adjacent plane points
    assert not nb[1]   # plane point vs floater 1.2 above


def test_filter_outside_kills_floaters(dense_plane):
    scene, table, n_true, n_out = dense_plane
    table2, grid = fl.rebuild(
        scene, table, LEVEL, CSIZE, 8, 0.5, additive=False
    )
    gains = np.asarray(
        fl.compute_gains(scene, grid, table2, LEVEL, CSIZE, 0.7, 1.0)
    )
    alive = np.asarray(table2.alive)
    # floaters occlude many true patches -> strongly negative gain
    out_gain = gains[n_true : n_true + n_out][alive[n_true : n_true + n_out]]
    true_gain = gains[:n_true][alive[:n_true]]
    assert np.median(true_gain) > 0
    table3, removed = fl.filter_outside(
        scene, grid, table2, LEVEL, CSIZE, 0.7, 1.0
    )
    a3 = np.asarray(table3.alive)
    # most true patches survive
    assert a3[:n_true].sum() >= 0.8 * alive[:n_true].sum()


def test_filter_exact_keeps_visible_views(dense_plane):
    scene, table, n_true, n_out = dense_plane
    table2, grid = fl.rebuild(
        scene, table, LEVEL, CSIZE, 8, 0.5, additive=False
    )
    before = np.asarray(table2.alive)[:n_true].sum()
    table3, removed = fl.filter_exact(
        scene, grid, table2, LEVEL, CSIZE, WSIZE, 3, 1.0, A1
    )
    after = np.asarray(table3.alive)[:n_true].sum()
    assert after >= 0.9 * before


def test_gather_neighbors_counts(dense_plane):
    scene, table, n_true, n_out = dense_plane
    table2, grid = fl.rebuild(
        scene, table, LEVEL, CSIZE, 8, 0.5, additive=False
    )
    rows = jnp.arange(n_true, dtype=jnp.int32)
    nbrs, count = fl.gather_neighbors(
        scene, grid, table2, rows, LEVEL, CSIZE,
        margin=2, scale=4.0, neighbor_threshold=0.5, max_neighbors=48,
    )
    count = np.asarray(count)
    alive = np.asarray(table2.alive)[:n_true]
    # interior plane patches have many coplanar neighbors
    assert np.median(count[alive]) >= 6
    # neighbor lists contain no duplicates and not self
    nb = np.asarray(nbrs)
    for i in range(0, n_true, 17):
        row = nb[i][nb[i] >= 0]
        assert len(set(row.tolist())) == len(row)
        assert i not in row


def test_quad_residual_low_on_plane(dense_plane):
    scene, table, n_true, n_out = dense_plane
    table2, grid = fl.rebuild(
        scene, table, LEVEL, CSIZE, 8, 0.5, additive=False
    )
    rows = jnp.arange(n_true, dtype=jnp.int32)
    nbrs, count = fl.gather_neighbors(
        scene, grid, table2, rows, LEVEL, CSIZE,
        margin=2, scale=4.0, neighbor_threshold=0.5, max_neighbors=48,
    )
    resid, denom = fl.quad_residuals(scene, table2, rows, nbrs, LEVEL, TAU)
    resid = np.asarray(resid)
    use = (np.asarray(count) >= 6) & np.asarray(table2.alive)[:n_true]
    # coplanar neighborhoods fit a quadric almost exactly
    assert np.median(resid[use]) < 0.5


def test_filter_small_groups_removes_isolated(dense_plane):
    scene, table, n_true, n_out = dense_plane
    table2, grid = fl.rebuild(
        scene, table, LEVEL, CSIZE, 8, 0.5, additive=False
    )
    table3, removed = fl.filter_small_groups(
        scene, grid, table2, LEVEL, CSIZE, 1.0
    )
    a = np.asarray(table3.alive)
    # the 6 isolated floaters form components < 20 -> gone
    assert a[n_true : n_true + n_out].sum() == 0
    # the 144-strong plane component survives
    assert a[:n_true].sum() == np.asarray(table2.alive)[:n_true].sum()


def test_run_filters_end_to_end(dense_plane):
    scene, table, n_true, n_out = dense_plane
    table2, stats = fl.run_filters(scene, table, **FILTER_KW)
    a = np.asarray(table2.alive)
    assert a[n_true : n_true + n_out].sum() == 0       # outliers gone
    assert a[:n_true].sum() >= 0.6 * n_true            # plane survives
