"""Struct-of-arrays patch state.

Replaces the reference's pointer-graph patch model (reference
pmmvps/patch.hpp:23-67: shared_ptr patches living in per-image cell
vectors) with one dense table. View membership is an *ordered* index
list per patch (`images[N, M]`, -1 padded) exactly mirroring the
semantics of `Patch::m_images` (entry 0 is the reference view, order is
the priority order produced by sortImages); `vimages` mirrors
`m_vimages` (extra views that pass the visibility test but don't
contribute to NCC). Cell-grid coordinates (`m_grids`) are NOT stored:
they are a deterministic projection of `coord`, recomputed on demand
(see core/grid.py), which removes the incremental-mutation problem on
static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class PatchTable(NamedTuple):
    coord: jnp.ndarray    # [N, 4] homogeneous, w = 1
    normal: jnp.ndarray   # [N, 4] plane normal, w component unused in math
    ncc: jnp.ndarray      # [N]
    dscale: jnp.ndarray   # [N] depth encoding scale (patch_manager.cpp:378-399)
    ascale: jnp.ndarray   # [N] angle encoding scale
    images: jnp.ndarray   # [N, M] ordered view list, -1 pad
    vimages: jnp.ndarray  # [N, M] extra visible views, -1 pad
    alive: jnp.ndarray    # [N] bool

    @property
    def capacity(self) -> int:
        return self.coord.shape[0]

    @property
    def max_views(self) -> int:
        return self.images.shape[1]

    def n_images_per_patch(self):
        return jnp.sum(self.images >= 0, axis=1)

    def n_alive(self):
        return jnp.sum(self.alive)


def empty_table(capacity: int, max_views: int) -> PatchTable:
    return PatchTable(
        coord=jnp.zeros((capacity, 4), jnp.float32).at[:, 3].set(1.0),
        normal=jnp.zeros((capacity, 4), jnp.float32),
        ncc=jnp.full((capacity,), -1.0, jnp.float32),
        dscale=jnp.zeros((capacity,), jnp.float32),
        ascale=jnp.zeros((capacity,), jnp.float32),
        images=jnp.full((capacity, max_views), -1, jnp.int32),
        vimages=jnp.full((capacity, max_views), -1, jnp.int32),
        alive=jnp.zeros((capacity,), bool),
    )


def from_numpy(
    coord: np.ndarray,
    normal: np.ndarray,
    images: np.ndarray,
    capacity: int,
    max_views: int,
    ncc=None,
    dscale=None,
    ascale=None,
    vimages=None,
) -> PatchTable:
    """Host-side constructor padding a seed set up to `capacity`."""
    n = coord.shape[0]
    assert n <= capacity, (n, capacity)
    t = empty_table(capacity, max_views)

    def put(dst, src):
        return dst.at[:n].set(jnp.asarray(src, dst.dtype))

    t = t._replace(
        coord=put(t.coord, coord),
        normal=put(t.normal, normal),
        images=put(t.images, images[:, :max_views]),
        alive=t.alive.at[:n].set(True),
    )
    if ncc is not None:
        t = t._replace(ncc=put(t.ncc, ncc))
    if dscale is not None:
        t = t._replace(dscale=put(t.dscale, dscale))
    if ascale is not None:
        t = t._replace(ascale=put(t.ascale, ascale))
    if vimages is not None:
        t = t._replace(vimages=put(t.vimages, vimages[:, :max_views]))
    return t


def compact_table(table: PatchTable) -> PatchTable:
    """Move alive rows to the front (stable in row order).

    Patch identity is positional only within one grid build (grids are
    rebuilt from scratch each pass, core/grid.py), so compaction between
    passes is semantics-free — it exists so every row loop and the grid
    build's pair sort can bound themselves to the live prefix
    (`row_limit` args) instead of the full table capacity."""
    order = jnp.argsort(~table.alive, stable=True)

    def take(x):
        return x[order]

    return PatchTable(
        coord=take(table.coord),
        normal=take(table.normal),
        ncc=take(table.ncc),
        dscale=take(table.dscale),
        ascale=take(table.ascale),
        images=take(table.images),
        vimages=take(table.vimages),
        alive=take(table.alive),
    )


def count_valid(lst: jnp.ndarray) -> jnp.ndarray:
    """Number of non-(-1) entries per row of an index list."""
    return jnp.sum(lst >= 0, axis=-1)


def member_mask(lst: jnp.ndarray, n_images: int) -> jnp.ndarray:
    """[..., M] ordered list -> [..., n_images] bool membership."""
    ids = jnp.arange(n_images, dtype=jnp.int32)
    return jnp.any(
        lst[..., :, None] == ids[(None,) * (lst.ndim - 1) + (None, slice(None))],
        axis=-2,
    )


def position_in_list(lst: jnp.ndarray, n_images: int) -> jnp.ndarray:
    """[..., M] list -> [..., n_images] position of each view id in the
    list (first occurrence), or M where absent."""
    M = lst.shape[-1]
    ids = jnp.arange(n_images, dtype=jnp.int32)
    eq = lst[..., :, None] == ids  # [..., M, n]
    pos = jnp.argmax(eq, axis=-2)
    present = jnp.any(eq, axis=-2)
    return jnp.where(present, pos, M).astype(jnp.int32)


def compact_by_keys(keys: jnp.ndarray, big: float = 1e30) -> jnp.ndarray:
    """Turn per-view sort keys [..., n_images] (big == excluded) into an
    ordered view list [..., n_images] (-1 pad), ascending by key."""
    n = keys.shape[-1]
    order = jnp.argsort(keys, axis=-1)
    sorted_keys = jnp.take_along_axis(keys, order, axis=-1)
    return jnp.where(sorted_keys < big, order.astype(jnp.int32), -1)
