"""Spatial-index tests: slot building/eviction, z-buffer depth maps,
visibility (reference patch_manager.cpp parity properties)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mvskit_tpu.core import grid as gr
from mvskit_tpu.core import patches as pt
from mvskit_tpu.geometry import camera as cam
from mvskit_tpu.ops import ncc as nccops
from mvskit_tpu.pipeline import views as vw
from mvskit_tpu.utils import synthetic

LEVEL = 1
CSIZE = 2
WSIZE = 7
TAU = 6
A0 = A1 = np.deg2rad(60.0)


def make_seeded_table(scene, coord, normal, capacity=256):
    B = coord.shape[0]
    images = jnp.full((B, scene.n_images), -1, jnp.int32).at[:, 0].set(0)
    images = vw.add_images(scene, coord, normal, images, LEVEL, A0)
    images = vw.sort_images(scene, coord, normal, images, LEVEL)
    dscale, ascale = vw.set_scales(scene, coord, images, LEVEL, TAU, WSIZE)
    ncc = nccops.compute_patch_ncc(
        scene, images, coord, normal, LEVEL, WSIZE, TAU, A1
    )
    return pt.from_numpy(
        np.asarray(coord), np.asarray(normal), np.asarray(images),
        capacity, scene.n_images,
        ncc=np.asarray(ncc), dscale=np.asarray(dscale),
        ascale=np.asarray(ascale),
    )


@pytest.fixture(scope="module")
def sp():
    Ps, imgs, scene = synthetic.plane_scene(n_views=8, width=160, height=120)
    coord, normal = synthetic.plane_points(Ps, 24, extent=0.6)
    coord = jnp.asarray(coord, jnp.float32)
    normal = jnp.asarray(normal, jnp.float32)
    table = make_seeded_table(scene, coord, normal)
    return scene, table


def test_grid_contains_all_patches(sp):
    scene, table = sp
    grid = gr.build_grid(scene, table, LEVEL, CSIZE, capacity=8)
    slots = np.asarray(grid.slots)
    present = set(slots[slots >= 0].tolist())
    alive = set(np.nonzero(np.asarray(table.alive))[0].tolist())
    # every alive patch with views lands in at least one cell
    nimg = np.asarray(table.n_images_per_patch())
    for pidx in alive:
        if nimg[pidx] > 0:
            assert pidx in present
    assert not np.any(np.asarray(grid.evicted))


def test_slots_sorted_by_ncc(sp):
    scene, table = sp
    grid = gr.build_grid(scene, table, LEVEL, CSIZE, capacity=8)
    slots = np.asarray(grid.slots)
    nccv = np.asarray(table.ncc)
    for cell in slots.reshape(-1, slots.shape[-1]):
        vals = nccv[cell[cell >= 0]]
        assert np.all(np.diff(vals) <= 1e-6)


def test_eviction_over_capacity(sp):
    """Many co-located patches: only the best `capacity` survive a cell;
    the rest are flagged evicted (reference propagate.cpp:94-98)."""
    scene, _ = sp
    B = 12
    coord = np.tile(np.array([[0.05, 0.05, 0.0, 1.0]]), (B, 1)).astype(np.float32)
    normal = np.tile(np.array([[0.0, 0.0, 1.0, 0.0]]), (B, 1)).astype(np.float32)
    images = np.full((B, scene.n_images), -1, np.int32)
    images[:, 0] = 0
    table = pt.from_numpy(coord, normal, images, 64, scene.n_images,
                          ncc=np.linspace(0.1, 0.9, B))
    grid = gr.build_grid(scene, table, LEVEL, CSIZE, capacity=4)
    ev = np.asarray(grid.evicted)
    assert ev.sum() == 8
    # survivors are the 4 best ncc
    surv = np.nonzero(~ev[:B])[0]
    assert set(surv) == set(range(8, 12))


def test_depth_maps_front_wins(sp):
    scene, _ = sp
    # two patches on the same ray of view 0: one at z=0, one behind
    c0 = np.array([[0.0, 0.0, 0.0, 1.0]], np.float32)
    ray = c0[0, :3] - np.asarray(scene.cams.center)[0, :3]
    behind = c0[0, :3] + 0.5 * ray / np.linalg.norm(ray)  # farther from cam
    coord = np.concatenate([c0, [[*behind, 1.0]]]).astype(np.float32)
    normal = np.tile([[0.0, 0.0, 1.0, 0.0]], (2, 1)).astype(np.float32)
    images = np.full((2, scene.n_images), -1, np.int32)
    images[:, 0] = 0
    table = pt.from_numpy(coord, normal, images, 16, scene.n_images,
                          ncc=np.asarray([0.5, 0.5]))
    depth, didx = gr.build_depth_maps(scene, table, LEVEL, CSIZE)
    depth = np.asarray(depth)
    didx = np.asarray(didx)
    # near patch is in front along view 0's optical axis
    d0 = float(jnp.sum(scene.cams.oaxis[0] * jnp.asarray(coord[0])))
    xy, _, _ = cam.project(scene.cams, 0, jnp.asarray(coord[1]), LEVEL)
    cx = int(np.floor(float(xy[0]) + 0.5)) // CSIZE
    cy = int(np.floor(float(xy[1]) + 0.5)) // CSIZE
    # the behind patch projects near the front one; front depth recorded
    assert didx[0, cy, cx] in (0, 1)
    assert depth[0, cy, cx] <= d0 + 1e-3


def test_is_visible_occlusion(sp):
    scene, _ = sp
    c0 = np.array([[0.0, 0.0, 0.0, 1.0]], np.float32)
    ray = np.asarray(scene.cams.center)[0, :3] - c0[0, :3]
    ray /= np.linalg.norm(ray)
    occluded = c0[0, :3] - 1.0 * ray  # far behind the surface
    coord = np.concatenate([c0, [[*occluded, 1.0]]]).astype(np.float32)
    normal = np.tile([[0.0, 0.0, 1.0, 0.0]], (2, 1)).astype(np.float32)
    images = np.full((2, scene.n_images), -1, np.int32)
    images[:, 0] = 0
    table = pt.from_numpy(coord, normal, images, 16, scene.n_images,
                          ncc=np.asarray([0.9, 0.9]))
    grid = gr.build_grid(scene, table, LEVEL, CSIZE, capacity=4)

    xy, _, _ = cam.project(scene.cams, 0, jnp.asarray(coord), LEVEL)
    cx = (jnp.floor(xy[:, 0] + 0.5).astype(jnp.int32)) // CSIZE
    cy = (jnp.floor(xy[:, 1] + 0.5).astype(jnp.int32)) // CSIZE
    vis = gr.is_visible(
        scene, grid, table,
        jnp.asarray(coord), jnp.asarray(normal),
        jnp.zeros((2,), jnp.int32), cx, cy,
        0.5, LEVEL, CSIZE,
    )
    vis = np.asarray(vis)
    assert vis[0]          # the surface patch sees itself
    assert not vis[1]      # the deep patch is occluded by the z-buffer


def test_visible_extra_views_discovers(sp):
    scene, table = sp
    grid = gr.build_grid(scene, table, LEVEL, CSIZE, capacity=8)
    vimages = gr.set_vimages(scene, grid, table, LEVEL, CSIZE, 0.5)
    vim = np.asarray(vimages)
    imgs = np.asarray(table.images)
    alive = np.asarray(table.alive)
    # vimages disjoint from images
    for p in np.nonzero(alive)[0]:
        a = set(imgs[p][imgs[p] >= 0].tolist())
        b = set(vim[p][vim[p] >= 0].tolist())
        assert not (a & b)
    # planar scene, everything visible: patches with missing views get them
    nimg = (imgs >= 0).sum(1) + (vim >= 0).sum(1)
    assert np.median(nimg[alive[: len(nimg)]]) >= scene.n_images - 2


def test_build_grid_row_limit_parity(sp):
    """row_limit (the compacted-table bound) must not change any grid
    content — dead rows beyond the bound contribute nothing."""
    scene, table = sp
    full = gr.build_grid(scene, table, LEVEL, CSIZE, 8)
    lim = gr.build_grid(scene, table, LEVEL, CSIZE, 8, row_limit=64)
    np.testing.assert_array_equal(np.asarray(full.slots), np.asarray(lim.slots))
    np.testing.assert_array_equal(
        np.asarray(full.vslots), np.asarray(lim.vslots)
    )
    np.testing.assert_array_equal(
        np.asarray(full.depth_idx), np.asarray(lim.depth_idx)
    )
    np.testing.assert_array_equal(
        np.asarray(full.evicted), np.asarray(lim.evicted)
    )


def test_compact_table_moves_alive_to_prefix(sp):
    scene, table = sp
    # kill some rows in the middle
    alive = np.asarray(table.alive).copy()
    idx = np.nonzero(alive)[0]
    alive[idx[::3]] = False
    t = table._replace(alive=jnp.asarray(alive))
    c = pt.compact_table(t)
    a = np.asarray(c.alive)
    n = a.sum()
    assert a[:n].all() and not a[n:].any()
    # alive rows keep their full attribute tuples (order-stable)
    surv = np.nonzero(alive)[0]
    np.testing.assert_array_equal(
        np.asarray(c.coord)[:n], np.asarray(t.coord)[surv]
    )
    np.testing.assert_array_equal(
        np.asarray(c.images)[:n], np.asarray(t.images)[surv]
    )
