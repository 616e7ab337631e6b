"""Pallas TPU kernel for fused window sampling + normalization.

The XLA path samples NCC windows with random gathers, whose throughput
on TPU is bound by a fixed per-index rate (~100-130M fetches/s measured
on v5e) — not by HBM bandwidth. This kernel takes the tile-DMA route
instead (the plan of SURVEY.md §7.3): per window it DMAs the bounding
tile of the projected lattice from the pyramid level into VMEM through
an NBUF-deep pipeline, then evaluates all wsize^2 bilinear samples at
once as a pair of factorized one-hot matmuls on the MXU (the bilinear
weight of tile pixel (r, c) for sample s factorizes as
wy[r, s] * wx[c, s], so column gathering is one
[TILE_H, TILE_W] x [TILE_W, S] matmul and row gathering a weighted
sublane reduction), and applies the zero-mean/unit-RMS normalization of
reference optim.cpp:917-940 in-register. DMA issue rate replaces gather
rate as the limiting resource.

Two modes share the machinery: LUMA (f32 luminance planes, one matmul
per window) and RGB (packed r|g<<8|b<<16 int32 planes — same DMA bytes,
three unpack+matmul passes, joint 3-channel normalization as in the
reference). Numerics are validated against the jnp sampler in
interpret mode (tests/test_pallas_ncc.py).
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

W_BLK = 128  # windows per program
NBUF = 16    # DMA pipeline depth (tiles in flight)

# extra tile margin (px, each axis) for GROUPED mode: K refinement
# candidates of one (patch, view) share a single DMA'd tile, so the
# tile must also absorb the candidate spread (depth jitter translates
# the window along the epipolar line by ~refine_init_depth_radius
# half-pixels; angle jitter perturbs the lattice steps). Members whose
# window still escapes the shared tile are masked by the fit bit.
GROUP_MARGIN = 14


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _compact_w(group: int = 1) -> int:
    """Lanes kept after the dynamic rotation (window + group spread)."""
    return 48 if group > 1 else 32


def _tile_dims(wsize: int, group: int = 1) -> Tuple[int, int, int]:
    """(TILE_H, TILE_W, SPAD) for a given window size.

    The projected lattice after window_geometry's level shift has steps
    of ~<= 2*sqrt(2) px, so the bounding tile needs
    (wsize-1)*2.83 + interp/guard margins, plus 7 rows of slack for the
    8-row DMA alignment of y0 (HBM memrefs are (8,128)-tiled; row
    offsets must be provably divisible by 8). Windows that still
    overflow (level_diff clipped at +-2 with extreme footprints) are
    masked out by sample_windows' fit mask. group > 1 adds the grouped
    candidate-spread margin (GROUP_MARGIN).
    """
    span = int(np.ceil((wsize - 1) * 2 * 1.42)) + 6
    if group > 1:
        span += GROUP_MARGIN
    tile_h = _round_up(max(span + 7, 32), 8)
    # slice widths AND lane offsets must be 128-aligned: x0 floors to a
    # multiple of 128, so the tile needs 127 lanes of slack
    tile_w = _round_up(span + 127, 128)
    spad = _round_up(wsize * wsize, 8)
    return tile_h, tile_w, spad


def _split_pad_levels(scene, flat) -> Tuple[jnp.ndarray, ...]:
    """Split a flat [N, total_px] buffer into per-level [N, h_l, w_l]
    planes padded so aligned DMA slices stay in bounds: height to
    >= tile_h (8-multiple), width to >= tile_w (128-multiple). The
    border-safety margins of window_geometry keep real samples inside
    the true extent; padding is never sampled.

    Works on either jnp or np input (np input pads host-side — the
    zero-dispatch scene-construction path)."""
    tile_h, tile_w, _ = _tile_dims(7)
    # pad for the LARGEST tile any kernel mode DMAs (grouped tiles are
    # taller than single-window ones) so every aligned slice stays in
    # bounds regardless of the group size used at call time
    gh, gw, _ = _tile_dims(7, group=2)
    tile_h, tile_w = max(tile_h, gh), max(tile_w, gw)
    xp = np if isinstance(flat, np.ndarray) else jnp
    out = []
    n = flat.shape[0]
    for l in range(scene.max_level):
        o, wl, hl = scene.offsets[l], scene.widths[l], scene.heights[l]
        plane = flat[:, o : o + wl * hl].reshape(n, hl, wl)
        hp = _round_up(max(hl, tile_h), 8)
        wp = _round_up(max(wl, tile_w), 128)
        if hp != hl or wp != wl:
            plane = xp.pad(plane, ((0, 0), (0, hp - hl), (0, wp - wl)))
        out.append(plane)
    return tuple(out)


def levels_np(offsets, widths, heights, max_level, planes_np, packed_np):
    """Host-side (numpy) construction of BOTH kernel operand sets from
    the flat float planes [n, I, total, 3] and packed-RGB [n, I, total]
    buffers. Returns (luma_levels, rgb_levels) as numpy tuples — the
    caller transfers each exactly once. On axon, doing this on device
    costs one remote compile + ~0.5 s dispatch per eager op; host-side
    it is free (reference image.cpp:309-353 builds pyramids host-side
    too)."""
    meta = _SceneMeta(offsets, widths, heights, max_level)
    n, ni, total, _ = planes_np.shape
    luma = np.clip(np.round(
        0.299 * planes_np[..., 0]
        + 0.587 * planes_np[..., 1]
        + 0.114 * planes_np[..., 2]
    ), 0, 255).astype(np.float32).reshape(n * ni, total)
    luma_levels = _split_pad_levels(meta, luma)
    rgb_levels = _split_pad_levels(
        meta, np.ascontiguousarray(packed_np.reshape(n * ni, total))
    )
    return luma_levels, rgb_levels


class _SceneMeta:
    """Duck-typed stand-in carrying just the static level metadata
    _split_pad_levels needs."""

    def __init__(self, offsets, widths, heights, max_level):
        self.offsets = tuple(offsets)
        self.widths = tuple(widths)
        self.heights = tuple(heights)
        self.max_level = int(max_level)


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
    return _split_pad_levels(scene, luma)


def rgb_levels_from_scene(scene) -> Tuple[jnp.ndarray, ...]:
    """Per-level packed-RGB planes [n*I, h_l, w_l] int32 (r|g<<8|b<<16,
    lossless for the u8-quantized pyramids) for the RGB kernel."""
    n, ni, total = scene.planes_packed.shape
    return _split_pad_levels(
        scene, scene.planes_packed.reshape(n * ni, total)
    )


def enable_pallas_luma(scene):
    """Return a Scene carrying the kernel's per-level luma planes (turns
    on the Pallas path of ncc.texs_for_views for luma scoring)."""
    import dataclasses

    return dataclasses.replace(
        scene, planes_luma_levels=luma_levels_from_scene(scene)
    )


def enable_pallas(scene):
    """Return a Scene with BOTH kernel operand sets (RGB default path
    and the opt-in luma fast mode) populated."""
    import dataclasses

    return dataclasses.replace(
        scene,
        planes_luma_levels=luma_levels_from_scene(scene),
        planes_rgb_levels=(
            rgb_levels_from_scene(scene)
            if scene.planes_packed is not None
            else None
        ),
    )


def _make_kernel(
    n_levels: int, wsize: int, rgb: bool = False, ablate: str = "",
    group: int = 1, fused: bool = False,
):
    """ablate: '' normal; 'nodma' skips the tile fetches (garbage out);
    'nocompute' fetches but stores a trivial function of the tile —
    perf-tuning scaffolding for separating DMA from compute cost.

    group > 1: GROUPED mode — every `group` consecutive windows share
    one DMA'd tile (and one rotate + RGB unpack): the tile-reuse scheme
    for refinement candidates of the same (patch, view), cutting DMA
    descriptors (the kernel's limiting resource) by the group factor.

    fused (grouped only): evaluate the whole group with ONE MXU matmul
    ([cw, K*spad] concatenated tent weights) and ONE K-row store
    instead of K of each — fewer, larger ops on the compute path.
    """
    tile_h, tile_w, spad = _tile_dims(wsize, group)
    n_grp = W_BLK // group  # groups (= DMAs) per program

    # compacted window width: after the dynamic lane rotation the
    # window lattice starts at lane 0 and fits in CW lanes
    cw = _compact_w(group)

    def kernel(
        # scalar prefetch (SMEM): packed ids img*L+lvl,
        # y0<<16 | x0_aligned | lane_off (x0_aligned is a multiple of
        # 128 so the low 7 bits of the x field carry the offset)
        il_ref, yx_ref,
        # VMEM-blocked per-window sample coords (relative to the tile
        # origin, precomputed in XLA), then HBM level planes
        *rest,
    ):
        sx_ref = rest[0]             # [W_BLK, spad]
        sy_ref = rest[1]
        level_refs = rest[2 : 2 + n_levels]
        out_ref = rest[2 + n_levels]
        tiles = rest[2 + n_levels + 1]   # [NBUF, tile_h, tile_w]
        sems = rest[2 + n_levels + 2]    # DMA sems [NBUF]
        blk = pl.program_id(0)

        def start_dma(g, slot):
            """Issue the HBM->VMEM tile fetch for group g into slot."""
            if ablate == "nodma":
                return
            i = blk * n_grp + g
            il = il_ref[i]
            img = il // n_levels
            lvl = il - img * n_levels
            yx = yx_ref[i]
            y0 = pl.multiple_of((yx >> 18) * 8, 8)
            x0 = pl.multiple_of(((yx >> 8) & 0x3FF) * 128, 128)
            for l in range(n_levels):
                @pl.when(lvl == l)
                def _(l=l):
                    pltpu.make_async_copy(
                        level_refs[l].at[
                            img, pl.ds(y0, tile_h), pl.ds(x0, tile_w)
                        ],
                        tiles.at[slot],
                        sems.at[slot],
                    ).start()

        def wait_dma(slot):
            if ablate == "nodma":
                return
            # equal-sized descriptor purely to wait on the slot's
            # semaphore (the expected count is shape-determined)
            pltpu.make_async_copy(
                level_refs[0].at[0, pl.ds(0, tile_h), pl.ds(0, tile_w)],
                tiles.at[slot],
                sems.at[slot],
            ).wait()

        # warm up the pipeline
        for g in range(min(NBUF, n_grp)):
            start_dma(g, g)

        def one_group(g, _):
            slot = lax.rem(g, NBUF)
            wait_dma(slot)
            if ablate == "nocompute":
                nch = 3 if rgb else 1
                for k in range(group):
                    out_ref[pl.ds(g * group + k, 1), :] = tiles[slot][
                        0:1, : nch * spad
                    ].astype(jnp.float32)

                @pl.when(g + NBUF < n_grp)
                def _():
                    start_dma(g + NBUF, slot)

                return 0
            i = blk * n_grp + g
            off = yx_ref[i] & 0xFF
            # rotate the DMA'd tile so the window lattice starts at
            # lane 0 and keep CW lanes: weight construction and the
            # sampling matmul shrink from K=tile_w to K=CW. One rotate
            # (and one RGB unpack) serves the whole group.
            if ablate == "norot":
                tile = tiles[slot][:, :cw]
            else:
                tile = pltpu.roll(
                    tiles[slot], lax.rem(tile_w - off, tile_w), 1
                )[:, :cw]

            if rgb:
                # unpack r|g<<8|b<<16 (the DMA moved the same bytes as
                # one luma plane) and stack the channel tiles along
                # sublanes: ONE [3*tile_h, cw] x [cw, spad] matmul
                # fills the MXU's M dimension (M=3*tile_h) instead of
                # three M=tile_h passes
                planes = jnp.concatenate(
                    [
                        ((tile >> sh) & 0xFF).astype(jnp.float32)
                        for sh in (0, 8, 16)
                    ],
                    axis=0,
                )  # [3*tile_h, cw]
            else:
                planes = tile
            # NOTE: Mosaic's tpu.iota only supports integer result
            # types — build the iota in int32 and cast (a f32 iota
            # fails kernel verification on real TPUs; interpret-mode
            # tests cannot catch this).
            cidx = jax.lax.broadcasted_iota(
                jnp.int32, (cw, spad), 0
            ).astype(jnp.float32)
            ridx = jax.lax.broadcasted_iota(
                jnp.int32, (tile_h, spad), 0
            ).astype(jnp.float32)

            nchan = 3 if rgb else 1
            if fused and group > 1:
                # FUSED group evaluation: one MXU matmul and one store
                # serve all K member windows. wx blocks concatenate
                # along lanes ([cw, K*spad]); the per-window wy
                # reduction and output rows assemble as K-row blocks.
                sx = sx_ref[pl.ds(g * group, group), :]  # [K, spad]
                sy = sy_ref[pl.ds(g * group, group), :]
                sx = jnp.clip(sx, 0.0, float(cw - 1))
                sy = jnp.clip(sy, 0.0, float(tile_h - 1))
                wxs = [
                    jnp.maximum(
                        0.0, 1.0 - jnp.abs(cidx - sx[k : k + 1])
                    )
                    for k in range(group)
                ]
                tmp = jax.lax.dot_general(
                    planes,
                    jnp.concatenate(wxs, axis=1),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [C*tile_h, K*spad]
                rows = []
                for k in range(group):
                    wy = jnp.maximum(
                        0.0, 1.0 - jnp.abs(ridx - sy[k : k + 1])
                    )
                    chans = [
                        jnp.sum(
                            wy
                            * tmp[
                                c * tile_h : (c + 1) * tile_h,
                                k * spad : (k + 1) * spad,
                            ],
                            axis=0,
                            keepdims=True,
                        )
                        for c in range(nchan)
                    ]
                    rows.append(jnp.concatenate(chans, axis=1))
                out_ref[pl.ds(g * group, group), :] = jnp.concatenate(
                    rows, axis=0
                )

                @pl.when(g + NBUF < n_grp)
                def _():
                    start_dma(g + NBUF, slot)

                return 0

            for k in range(group):
                j = g * group + k if group > 1 else g
                # sample coords inside the compact tile; samples live
                # in the LANE axis (Mosaic supports dynamic-sublane but
                # not dynamic-lane stores, so one window = one output
                # row)
                sx = sx_ref[pl.ds(j, 1), :]  # [1, spad]
                sy = sy_ref[pl.ds(j, 1), :]
                # clip reproduces the reference sampler's edge clamp
                # (ix = min(ix, w-2), fx = clip(frac)) in tent form
                sx = jnp.clip(sx, 0.0, float(cw - 1))
                sy = jnp.clip(sy, 0.0, float(tile_h - 1))
                if ablate == "nowx":
                    sx = jnp.zeros_like(sx)
                    sy = jnp.zeros_like(sy)

                # bilinear weights factorize: w[s,(r,c)] =
                # wy[r,s]*wx[c,s], and each factor is a TENT:
                # relu(1 - |c - sx|) equals the two-tap interpolation
                # weights in 3 ops with no int index/frac split. One
                # [tile_h,cw]x[cw,spad] matmul gathers columns; a
                # wy-weighted sublane reduction finishes the sample.
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(cidx - sx))
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(ridx - sy))

                if ablate == "nomm":
                    tmp = jnp.broadcast_to(
                        planes[:, :1], (planes.shape[0], spad)
                    ) + wx[:1]
                else:
                    tmp = jax.lax.dot_general(
                        planes,
                        wx,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [C*tile_h, spad]
                chans = [
                    jnp.sum(
                        wy * tmp[c * tile_h : (c + 1) * tile_h],
                        axis=0,
                        keepdims=True,
                    )
                    for c in range(nchan)
                ]

                # RAW samples out — normalization (reference
                # optim.cpp:917-940) happens outside in one batched XLA
                # pass at memory bandwidth; in-kernel it would add ~10
                # serial latency-bound ops to every window's chain.
                # Lanes wsize^2..spad of each channel block are lattice
                # duplicates the caller slices away.
                out_ref[pl.ds(j, 1), :] = jnp.concatenate(chans, axis=1)

            # prefetch the tile NBUF groups ahead
            @pl.when(g + NBUF < n_grp)
            def _():
                start_dma(g + NBUF, slot)

            return 0

        lax.fori_loop(0, n_grp, one_group, 0)

    return kernel


def padded_level_shapes(scene) -> Tuple[Tuple[int, int], ...]:
    """(h, w) of each padded kernel plane as _split_pad_levels builds
    them, WITHOUT materializing the planes — for measurement tools that
    need the shipped fit geometry only (tools/measure_divergences.py)."""
    tile_h, tile_w, _ = _tile_dims(7)
    gh, gw, _ = _tile_dims(7, group=2)
    tile_h, tile_w = max(tile_h, gh), max(tile_w, gw)
    return tuple(
        (
            _round_up(max(hl, tile_h), 8),
            _round_up(max(wl, tile_w), 128),
        )
        for wl, hl in zip(scene.widths, scene.heights)
    )


def plan_tiles(hs, ws, img, lvl, tl, dx, dy, wsize: int, group: int):
    """The pure-XLA tile-planning half of sample_windows: per-window
    (or per-group) DMA tile origin + the exact fit mask saying whether
    every sample's 2x2 interpolation support lands inside the compact
    tile. This is the shipped semantics of DIVERGENCES A11 (ungrouped
    tile overflow) and A12 (grouped candidates losing a view), so the
    measurement tool calls exactly this function.

    hs/ws: [B] padded plane height/width of each window's level.
    Returns (fit[B], x0e_w[B], y0_w[B], y0[G], x0a[G], off[G],
    img_g[G], lvl_g[G]) with G = B // group."""
    B = img.shape[0]
    tile_h, tile_w, _ = _tile_dims(wsize, group)
    cw = _compact_w(group)
    # tile origin: floor(lattice bbox min) minus a 2px guard, clamped
    # to keep the tile inside the (padded) level plane
    m = float(wsize - 1)
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
    wminx = jnp.min(cx, axis=0)
    wmaxx = jnp.max(cx, axis=0)
    wminy = jnp.min(cy, axis=0)
    wmaxy = jnp.max(cy, axis=0)
    if group > 1:
        # GROUPED: one tile per group of `group` consecutive windows.
        # Group level/plane = member 0's; the bbox spans the members
        # that share it (others are masked by okl and fit=False).
        G = B // group
        lv = lvl.reshape(G, group)
        okl = lv == lv[:, :1]
        big = jnp.float32(2**30)
        gminx = jnp.min(jnp.where(okl, wminx.reshape(G, group), big), 1)
        gmaxx = jnp.max(jnp.where(okl, wmaxx.reshape(G, group), -big), 1)
        gminy = jnp.min(jnp.where(okl, wminy.reshape(G, group), big), 1)
        gmaxy = jnp.max(jnp.where(okl, wmaxy.reshape(G, group), -big), 1)
        wsg = ws.reshape(G, group)[:, 0]
        hsg = hs.reshape(G, group)[:, 0]
        x0e = jnp.clip(
            jnp.floor(gminx).astype(jnp.int32) - 2,
            0, jnp.maximum(wsg - cw, 0),
        )
        y0 = jnp.clip(
            jnp.floor(gminy).astype(jnp.int32) - 2,
            0, jnp.maximum(hsg - tile_h, 0),
        )
        y0 = (y0 // 8) * 8
        x0a = jnp.minimum((x0e // 128) * 128, jnp.maximum(wsg - tile_w, 0))
        off = x0e - x0a
        x0f = x0e.astype(jnp.float32)[:, None]
        y0f = y0.astype(jnp.float32)[:, None]
        fit = (
            okl
            & (wminx.reshape(G, group) >= x0f)
            & (wmaxx.reshape(G, group) <= x0f + (cw - 2))
            & (wminy.reshape(G, group) >= y0f)
            & (wmaxy.reshape(G, group) <= y0f + (tile_h - 2))
        ).reshape(B)
        img_g = img.reshape(G, group)[:, 0]
        lvl_g = lv[:, 0]
        # per-window tile origin for the sample coords
        x0e_w = jnp.repeat(x0e, group)
        y0_w = jnp.repeat(y0, group)
    else:
        # exact window origin; the kernel's dynamic lane rotation
        # brings lane x0e of the aligned DMA tile to lane 0
        x0e = jnp.clip(
            jnp.floor(wminx).astype(jnp.int32) - 2,
            0,
            jnp.maximum(ws - cw, 0),
        )
        y0 = jnp.clip(
            jnp.floor(wminy).astype(jnp.int32) - 2,
            0,
            jnp.maximum(hs - tile_h, 0),
        )
        # DMA offsets must be tile-aligned (HBM (8,128) tiling): y0
        # floors to 8 (tile_h carries the slack), x0 floors to 128 but
        # clamps so the tile stays in bounds — the lane offset is
        # carried separately (off <= tile_w - cw by the x0e clip above)
        y0 = (y0 // 8) * 8
        x0a = jnp.minimum(
            (x0e // 128) * 128, jnp.maximum(ws - tile_w, 0)
        )
        off = x0e - x0a
        # exact fit: every sample's 2x2 interp support inside the
        # compact window and the tile rows
        x0f = x0e.astype(jnp.float32)
        y0f = y0.astype(jnp.float32)
        fit = (
            (wminx >= x0f)
            & (wmaxx <= x0f + (cw - 2))
            & (wminy >= y0f)
            & (wmaxy <= y0f + (tile_h - 2))
        )
        img_g, lvl_g = img, lvl
        x0e_w, y0_w = x0e, y0
    return fit, x0e_w, y0_w, y0, x0a, off, img_g, lvl_g


def sample_windows(
    levels: Sequence[jnp.ndarray],
    img,
    lvl,
    tl,
    dx,
    dy,
    wsize: int = 7,
    rgb: bool = False,
    interpret: bool = False,
    ablate: str = "",
    group: int = 1,
    fused: bool = False,
):
    """Fused sample+normalize for a window batch.

    levels : per-level [n*I, h_l, w_l] planes — f32 luminance, or
             packed-RGB int32 with rgb=True
    img    : [B] view*illum plane index
    lvl    : [B] resolved pyramid level of each window
    tl     : [B, 2] lattice origin (pixel coords at `lvl`)
    dx, dy : [B, 2] lattice steps
    group  : every `group` CONSECUTIVE windows share one DMA'd tile
             (refinement candidates of the same patch x view: same img,
             near-identical geometry). The shared tile is the bbox of
             the members that resolve to member 0's pyramid level;
             members at another level or escaping the tile get
             fit=False. Cuts DMA descriptors (the kernel's limiting
             resource) by the group factor.

    Returns (tex [B, C*SPAD] RAW sampled windows in the kernel's OWN
    storage order (windows-major rows; within a row channel c occupies
    lanes [c*SPAD, c*SPAD + wsize^2), the rest of each block being
    lattice duplicates to discard) and fit [B] bool, False where the
    lattice overflowed the DMA bounding tile and the window values are
    garbage. C = 3 with rgb else 1. A transposed return here forces XLA
    to materialize an ~80 MB relayout per 393k-window batch (measured
    8 ms — as expensive as the kernel); consumers reduce over lanes
    instead (ncc.normalize_tex / tex_dot).
    """
    B = img.shape[0]
    if group > 1 and (W_BLK % group != 0 or B % group != 0):
        group = 1
    n_levels = len(levels)
    tile_h, tile_w, spad = _tile_dims(wsize, group)
    cw = _compact_w(group)
    # off-TPU (CPU test runs) Mosaic cannot compile: use interpret mode
    interpret = interpret or jax.default_backend() != "tpu"
    hs = jnp.asarray([l.shape[1] for l in levels], jnp.int32)[lvl]
    ws = jnp.asarray([l.shape[2] for l in levels], jnp.int32)[lvl]
    fit, x0e_w, y0_w, y0, x0a, off, img_g, lvl_g = plan_tiles(
        hs, ws, img, lvl, tl, dx, dy, wsize, group
    )

    # per-window sample coordinates RELATIVE to the tile origin,
    # precomputed in XLA (the kernel reads one [1, spad] row each):
    # sample s = tl + (s % wsize) * dx + (s // wsize) * dy
    sarange = jnp.arange(spad, dtype=jnp.float32)
    li = jnp.minimum(sarange % wsize, wsize - 1)[None, :]
    lj = jnp.minimum(sarange // wsize, wsize - 1)[None, :]
    sxr = (
        tl[:, :1] + dx[:, :1] * li + dy[:, :1] * lj
        - x0e_w.astype(jnp.float32)[:, None]
    )  # [B, spad]
    syr = (
        tl[:, 1:] + dx[:, 1:] * li + dy[:, 1:] * lj
        - y0_w.astype(jnp.float32)[:, None]
    )
    # packed SMEM scalars (scalar memory is tiny — two arrays only),
    # one entry per GROUP (= per DMA descriptor):
    # yx = y0/8 (13b) | x0a/128 (10b) | lane offset (8b)
    il = img_g.astype(jnp.int32) * n_levels + lvl_g.astype(jnp.int32)
    yx = (
        ((y0.astype(jnp.int32) // 8) << 18)
        | ((x0a.astype(jnp.int32) // 128) << 8)
        | off.astype(jnp.int32)
    )

    # chunk the batch: scalar-prefetch operands resident in SMEM bound
    # the windows a single pallas_call may cover
    CH = min(32768, _round_up(B, W_BLK))
    Bp = _round_up(B, CH)
    if Bp != B:
        padn = Bp - B
        padg = padn // group
        il = jnp.concatenate([il, jnp.zeros((padg,), jnp.int32)])
        yx = jnp.concatenate([yx, jnp.zeros((padg,), jnp.int32)])
        sxr = jnp.concatenate([sxr, jnp.zeros((padn, spad), jnp.float32)])
        syr = jnp.concatenate([syr, jnp.zeros((padn, spad), jnp.float32)])

    nchan = 3 if rgb else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(CH // W_BLK,),
        in_specs=[
            pl.BlockSpec(
                (W_BLK, spad), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (W_BLK, spad), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [pl.BlockSpec(memory_space=pltpu.HBM)] * n_levels,
        out_specs=pl.BlockSpec(
            (W_BLK, nchan * spad), lambda i, *_: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (NBUF, tile_h, tile_w),
                jnp.int32 if rgb else jnp.float32,
            ),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    call = pl.pallas_call(
        _make_kernel(n_levels, wsize, rgb, ablate, group, fused),
        out_shape=jax.ShapeDtypeStruct((CH, nchan * spad), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )
    nch = Bp // CH
    if nch == 1:
        out = call(il, yx, sxr, syr, *levels)
    else:
        out = lax.map(
            lambda a: call(a[0], a[1], a[2], a[3], *levels),
            (
                il.reshape(nch, CH // group),
                yx.reshape(nch, CH // group),
                sxr.reshape(nch, CH, spad),
                syr.reshape(nch, CH, spad),
            ),
        ).reshape(Bp, nchan * spad)
    return out[:B], fit
