"""Pallas TPU kernel for fused window sampling + normalization.

The XLA path samples NCC windows with random gathers, whose throughput
on TPU is bound by a fixed per-index rate (~100-130M fetches/s measured
on v5e) — not by HBM bandwidth. This kernel takes the tile-DMA route
instead (the plan of SURVEY.md §7.3): per window it DMAs the bounding
tile of the projected lattice from the pyramid level into VMEM, then
evaluates all wsize^2 bilinear samples at once as a weighted one-hot
matmul on the MXU (gathers inside VMEM re-expressed as dot products),
and applies the zero-mean/unit-RMS normalization of reference
optim.cpp:917-940 in-register. DMA issue rate replaces gather rate as
the limiting resource.

v1 operates on luminance pyramids (the luma fast path; the RGB variant
triples the tile planes). Numerics are validated against the jnp
sampler in interpret mode; on-chip tuning is tracked for round 2.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile pulled from HBM per window; covers a wsize<=7 lattice whose steps
# are <= sqrt(2) px after level normalization (|span| <= 2*3*2.83+2 ~ 19)
TILE_H = 24
TILE_W = 32
SPAD = 64    # wsize^2 = 49 padded to a sublane multiple
W_BLK = 128  # windows per program (output lane dimension)


def luma_levels_from_scene(scene) -> Tuple[jnp.ndarray, ...]:
    """Per-level luminance planes [n*I, h_l, w_l] f32 for the kernel."""
    n, ni, total, _ = scene.planes.shape
    # same u8 quantization as the packed luma-quad planes so both
    # samplers are bit-consistent
    luma = jnp.clip(jnp.round(
        0.299 * scene.planes[..., 0]
        + 0.587 * scene.planes[..., 1]
        + 0.114 * scene.planes[..., 2]
    ), 0, 255).reshape(n * ni, total)
    out = []
    for l in range(scene.max_level):
        o, wl, hl = scene.offsets[l], scene.widths[l], scene.heights[l]
        plane = luma[:, o : o + wl * hl].reshape(n * ni, hl, wl)
        # coarse levels smaller than the DMA tile are zero-padded; the
        # border-safety margins of window_geometry keep real samples
        # inside the true extent
        if hl < TILE_H or wl < TILE_W:
            plane = jnp.pad(
                plane,
                ((0, 0), (0, max(0, TILE_H - hl)), (0, max(0, TILE_W - wl))),
            )
        out.append(plane)
    return tuple(out)


def _kernel(
    # scalar prefetch (SMEM): ids + per-window float geometry
    img_ref, lvl_ref, y0_ref, x0_ref,
    tlx_ref, tly_ref, dxx_ref, dxy_ref, dyx_ref, dyy_ref,
    *rest,
):
    n_levels = len(rest) - 3  # rest = levels + out_ref + 2 scratch
    level_refs = rest[:n_levels]
    out_ref = rest[n_levels]
    tile = rest[n_levels + 1]
    sem = rest[n_levels + 2]
    blk = pl.program_id(0)

    def one_window(j, _):
        i = blk * W_BLK + j
        img = img_ref[i]
        lvl = lvl_ref[i]
        y0 = y0_ref[i]
        x0 = x0_ref[i]

        # DMA the bounding tile of this window's level plane into VMEM
        for l in range(n_levels):
            @pl.when(lvl == l)
            def _(l=l):
                cp = pltpu.make_async_copy(
                    level_refs[l].at[
                        img, pl.ds(y0, TILE_H), pl.ds(x0, TILE_W)
                    ],
                    tile,
                    sem,
                )
                cp.start()
                cp.wait()

        tlx = tlx_ref[i] - x0.astype(jnp.float32)
        tly = tly_ref[i] - y0.astype(jnp.float32)
        dxx = dxx_ref[i]
        dxy = dxy_ref[i]
        dyx = dyx_ref[i]
        dyy = dyy_ref[i]

        # lattice sample coordinates inside the tile, [SPAD, 1]
        sidx = jax.lax.broadcasted_iota(jnp.int32, (SPAD, 1), 0)
        wsize = 7
        li = (sidx % wsize).astype(jnp.float32)   # x lattice count
        lj = (sidx // wsize).astype(jnp.float32)  # y lattice count
        valid_s = sidx < wsize * wsize
        sx = tlx + li * dxx + lj * dyx
        sy = tly + li * dxy + lj * dyy

        ix = jnp.clip(sx.astype(jnp.int32), 0, TILE_W - 2)
        iy = jnp.clip(sy.astype(jnp.int32), 0, TILE_H - 2)
        fx = jnp.clip(sx - ix.astype(jnp.float32), 0.0, 1.0)
        fy = jnp.clip(sy - iy.astype(jnp.float32), 0.0, 1.0)
        f00 = (1.0 - fx) * (1.0 - fy)
        f10 = fx * (1.0 - fy)
        f01 = (1.0 - fx) * fy
        f11 = fx * fy

        base = iy * TILE_W + ix  # [SPAD, 1]
        pidx = jax.lax.broadcasted_iota(
            jnp.int32, (SPAD, TILE_H * TILE_W), 1
        )
        w = (
            f00 * (pidx == base)
            + f10 * (pidx == base + 1)
            + f01 * (pidx == base + TILE_W)
            + f11 * (pidx == base + TILE_W + 1)
        )
        tex = jax.lax.dot_general(
            w,
            tile[:].reshape(TILE_H * TILE_W, 1),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [SPAD, 1]
        tex = jnp.where(valid_s, tex, 0.0)

        # zero-mean, unit-RMS over the 49 valid samples
        sden = float(wsize * wsize)
        ave = jnp.sum(tex) / sden
        diff = jnp.where(valid_s, tex - ave, 0.0)
        msd = jnp.sqrt(jnp.sum(diff * diff) / sden)
        msd = jnp.where(msd == 0.0, 1.0, msd)
        out_ref[:, pl.ds(j, 1)] = diff / msd
        return 0

    lax.fori_loop(0, W_BLK, one_window, 0)


def sample_windows(
    levels: Sequence[jnp.ndarray],
    img,
    lvl,
    tl,
    dx,
    dy,
    interpret: bool = False,
):
    """Fused sample+normalize for a window batch.

    levels : per-level [n*I, h_l, w_l] f32 luminance planes
    img    : [B] view*illum plane index
    lvl    : [B] resolved pyramid level of each window
    tl     : [B, 2] lattice origin (pixel coords at `lvl`)
    dx, dy : [B, 2] lattice steps

    Returns normalized windows [SPAD, B] (rows 49.. are zero padding).
    Callers guarantee the lattice fits the (TILE_H, TILE_W) bounding
    tile (true for wsize 7 after the level shift of window_geometry,
    which bounds |dx|+|dy| <= 2*sqrt(2)).
    """
    B = img.shape[0]
    n_levels = len(levels)
    # tile origin: floor(tl) minus a 2px guard, clamped per level dims
    hs = jnp.asarray([l.shape[1] for l in levels], jnp.int32)[lvl]
    ws = jnp.asarray([l.shape[2] for l in levels], jnp.int32)[lvl]
    m = 6.0  # wsize - 1 lattice steps
    cx = jnp.stack(
        [
            tl[:, 0],
            tl[:, 0] + m * dx[:, 0],
            tl[:, 0] + m * dy[:, 0],
            tl[:, 0] + m * (dx[:, 0] + dy[:, 0]),
        ],
        axis=0,
    )
    cy = jnp.stack(
        [
            tl[:, 1],
            tl[:, 1] + m * dx[:, 1],
            tl[:, 1] + m * dy[:, 1],
            tl[:, 1] + m * (dx[:, 1] + dy[:, 1]),
        ],
        axis=0,
    )
    x0 = jnp.clip(
        jnp.floor(jnp.min(cx, axis=0)).astype(jnp.int32) - 2,
        0,
        jnp.maximum(ws - TILE_W, 0),
    )
    y0 = jnp.clip(
        jnp.floor(jnp.min(cy, axis=0)).astype(jnp.int32) - 2,
        0,
        jnp.maximum(hs - TILE_H, 0),
    )

    # pad the window batch to a multiple of the per-program block
    Bp = ((B + W_BLK - 1) // W_BLK) * W_BLK
    geos = [
        tl[:, 0], tl[:, 1], dx[:, 0], dx[:, 1], dy[:, 0], dy[:, 1]
    ]
    if Bp != B:
        padn = Bp - B
        img = jnp.concatenate([img, jnp.zeros((padn,), img.dtype)])
        lvl_p = jnp.concatenate([lvl, jnp.zeros((padn,), jnp.int32)])
        x0 = jnp.concatenate([x0, jnp.zeros((padn,), x0.dtype)])
        y0 = jnp.concatenate([y0, jnp.zeros((padn,), y0.dtype)])
        geos = [
            jnp.concatenate([g, jnp.zeros((padn,), jnp.float32)])
            for g in geos
        ]
    else:
        lvl_p = lvl
    geos = [g.astype(jnp.float32) for g in geos]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=10,
        grid=(Bp // W_BLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_levels,
        out_specs=pl.BlockSpec(
            (SPAD, W_BLK), lambda i, *_: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((SPAD, Bp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        img.astype(jnp.int32),
        lvl_p.astype(jnp.int32),
        y0,
        x0,
        *geos,
        *levels,
    )
    return out[:, :B]
