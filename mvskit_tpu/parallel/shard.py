"""Multi-chip sharding for the PM-MVS engine.

The reference is strictly single-threaded (SURVEY.md §2: no threads, no
MPI/NCCL); every parallel axis here is greenfield design:

  * patch/batch sharding (DP analog) — the patch table's row axis is
    sharded across the mesh; grid builds, the gauntlet, and filters
    are array programs, so GSPMD partitions them and inserts the
    all-to-alls/reduces for the scatter/sort phases automatically;
  * view sharding (TP analog) — pyramid planes are sharded over the
    view axis; each chip warps windows only for its local views and the
    cross-view NCC reduction is a psum over the `view` axis (the ICI
    collective replacing the reference's all-views loop in
    optim.cpp:420-425);
  * tile sharding (SP/CP analog) — cell-grid rows are sharded; the
    propagation halo (one cell row) moves by ppermute (halo_exchange).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.patches import PatchTable
from ..geometry import camera as cam
from ..image.scene import Scene
from ..ops import ncc as nccops


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


# ----------------------------------------------------------------------
# patch-row (DP) sharding
# ----------------------------------------------------------------------

def table_sharding(mesh: Mesh, axis: str = "dp"):
    """Per-leaf NamedShardings for a PatchTable row-sharded over `axis`."""
    def spec(leaf):
        return NamedSharding(
            mesh, P(axis, *([None] * (leaf.ndim - 1)))
        )
    return PatchTable(
        coord=spec(jnp.zeros((1, 4))),
        normal=spec(jnp.zeros((1, 4))),
        ncc=spec(jnp.zeros((1,))),
        dscale=spec(jnp.zeros((1,))),
        ascale=spec(jnp.zeros((1,))),
        images=spec(jnp.zeros((1, 1))),
        vimages=spec(jnp.zeros((1, 1))),
        alive=spec(jnp.zeros((1,))),
    )


def shard_table(table: PatchTable, mesh: Mesh, axis: str = "dp") -> PatchTable:
    """Place the patch table row-sharded across the mesh."""
    shardings = table_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), table, shardings
    )


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


# ----------------------------------------------------------------------
# view-sharded NCC (psum over the view axis)
# ----------------------------------------------------------------------

def sharded_patch_ncc(
    mesh: Mesh,
    scene: Scene,
    coord,
    normal,
    views,
    *,
    level: int,
    wsize: int,
    tau: int,
    angle_threshold1: float,
    axis: str = "view",
):
    """computeNcc with the VIEW axis sharded across the mesh.

    Each device holds a contiguous block of pyramid planes, warps
    windows only for its local views, and the reference-view window plus
    the weighted INCC numerator/denominator are combined by psum over
    the `view` mesh axis. Numerically equivalent to
    ops.ncc.compute_patch_ncc over the first `tau` listed views.
    Requires scene.n_images % mesh.shape[axis] == 0.
    """
    n = scene.n_images
    k = mesh.shape[axis]
    assert n % k == 0, (n, k)
    n_local = n // k

    views_t = views[:, :tau]
    weights = nccops.compute_weights(scene, views_t, coord, normal, level)
    ref = jnp.maximum(views_t[:, 0], 0)
    pxaxis, pyaxis = cam.get_paxes(scene.cams, ref, coord, normal, level)

    # per-view membership over the GLOBAL view axis
    B = coord.shape[0]
    ids = jnp.arange(n, dtype=jnp.int32)
    pos_is_member = (views_t[:, :, None] == ids[None, None, :]) & (
        views_t[:, :, None] >= 0
    )
    w_full = jnp.einsum("btn,bt->bn", pos_is_member.astype(jnp.float32), weights)
    member = jnp.any(pos_is_member, axis=1)

    from functools import partial
    from jax import shard_map

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(axis),          # planes block [n_local, ...]
            P(),              # cams etc. replicated
            P(), P(), P(), P(), P(),
            P(None, axis),    # member block [B, n_local]
            P(None, axis),    # weights block [B, n_local]
        ),
        out_specs=P(),
    )
    def _score(planes_local, cams, coordb, normalb, px, py, refb, memberb, wfull):
        local_scene = Scene(
            planes=planes_local,
            masks=None,
            cams=cams,
            lvl_offsets=scene.lvl_offsets,
            lvl_widths=scene.lvl_widths,
            lvl_heights=scene.lvl_heights,
            widths=scene.widths,
            heights=scene.heights,
            offsets=scene.offsets,
            max_level=scene.max_level,
        )
        shard = lax.axis_index(axis)
        base = shard * n_local
        lids = base + jnp.arange(n_local, dtype=jnp.int32)

        # windows for the local views, batch-minor (plane axes from the
        # ref view): tex [3, V, S, B], valid [V, B]
        Bb = coordb.shape[0]
        vcoord = jnp.broadcast_to(coordb[None, :, :], (n_local, Bb, 4))
        vnorm = jnp.broadcast_to(normalb[None, :, :], (n_local, Bb, 4))
        vpx = jnp.broadcast_to(px[None, :, :], (n_local, Bb, 4))
        vpy = jnp.broadcast_to(py[None, :, :], (n_local, Bb, 4))
        gids = jnp.broadcast_to(lids[:, None], (n_local, Bb))
        tex, valid = _get_tex_local(
            local_scene, cams, gids, base, vcoord, vpx, vpy, vnorm,
            level, wsize, angle_threshold1,
        )
        tex = nccops.normalize_tex(tex)
        valid = valid & memberb.T          # [V, B]
        lw = wfull.T                        # [V, B]

        # reference window via psum of the one-hot selection
        is_ref = gids == refb[None, :]
        t0_part = jnp.sum(
            jnp.where((is_ref & valid)[None, :, None, :], tex, 0.0), axis=1
        )  # [3, S, B]
        ref_ok_part = jnp.sum((is_ref & valid).astype(jnp.float32), axis=0)
        t0 = lax.psum(t0_part, axis)
        ref_ok = lax.psum(ref_ok_part, axis) > 0.0

        dots = jnp.einsum("cvsb,csb->vb", tex, t0) / (3.0 * tex.shape[-2])
        incc = nccops.robustincc(1.0 - dots)
        use = valid & ~is_ref
        num = lax.psum(
            jnp.sum(jnp.where(use, incc * lw, 0.0), axis=0), axis
        )
        den = lax.psum(jnp.sum(jnp.where(use, lw, 0.0), axis=0), axis)
        score = jnp.where(den > 0.0, num / jnp.where(den == 0, 1.0, den), 2.0)
        score = jnp.where(ref_ok, score, 2.0)
        return 1.0 - nccops.unrobustincc(score)

    out = _score(
        scene.planes, scene.cams, coord, normal, pxaxis, pyaxis,
        ref, member, w_full,
    )
    nimg = jnp.sum(views >= 0, axis=1)
    return jnp.where(nimg < 2, 1.0 - nccops.unrobustincc(2.0), out)


def _get_tex_local(
    local_scene, cams, gids, base, coord, pxaxis, pyaxis, normal,
    level, wsize, angle_threshold1,
):
    """get_tex against a view-sharded plane block: geometry uses GLOBAL
    view ids (cameras replicated), sampling indexes LOCAL planes.
    Batch is (V, B); returns batch-minor tex [3, V, S, B], valid [V, B]."""
    from ..ops import sampling

    tl, dx2, dy2, new_level, valid = nccops.window_geometry(
        _GlobalGeomScene(local_scene, cams), gids, coord, pxaxis, pyaxis,
        normal, level, wsize, angle_threshold1,
    )
    s = wsize * wsize
    V, B = gids.shape
    xs = jnp.arange(wsize, dtype=jnp.float32)
    lat_x = jnp.tile(xs, wsize)[None, :, None]
    lat_y = jnp.repeat(xs, wsize)[None, :, None]
    gx = tl[:, None, :, 0] + dx2[:, None, :, 0] * lat_x + dy2[:, None, :, 0] * lat_y
    gy = tl[:, None, :, 1] + dx2[:, None, :, 1] * lat_x + dy2[:, None, :, 1] * lat_y
    lvl = jnp.broadcast_to(new_level[:, None, :], (V, s, B))
    lidx = jnp.broadcast_to((gids - base)[:, None, :], (V, s, B))
    tex = sampling.sample_color_ch(local_scene, lidx, gx, gy, lvl)
    return tex, valid


class _GlobalGeomScene:
    """Scene facade whose cameras are global but whose level metadata
    comes from the local block (identical on every shard)."""

    def __init__(self, local_scene, cams):
        self.cams = cams
        self.lvl_widths = local_scene.lvl_widths
        self.lvl_heights = local_scene.lvl_heights
        self.lvl_offsets = local_scene.lvl_offsets


def cam_set_global(local_scene, cams):
    """The camera set stays replicated (global) under view sharding."""
    return cams


# ----------------------------------------------------------------------
# tile sharding (SP/CP analog): the real row-sharded propagation —
# tile-local grid build, merged donor top-k, 1-cell ppermute halo for
# the full-cell gate — lives in parallel/tiles.py
# (tiles.tiled_propagate_round).
# ----------------------------------------------------------------------
