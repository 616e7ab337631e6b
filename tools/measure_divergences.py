"""Quantify kernel divergences A11/A12 at production scale.

DIVERGENCES.md A11: the Pallas tile-DMA sampler invalidates windows
whose projected lattice overflows its bounding tile, where the
reference admits any border-safe window (reference optim.cpp:895-915).
DIVERGENCES.md A12: with grouped DMA (refine_group_dma), a refinement
candidate whose window escapes the group's shared tile — or resolves to
a different pyramid level than candidate 0 — loses that view for that
evaluation only.

Both conditions are decided by ops/pallas_ncc.plan_tiles (pure XLA, no
kernel execution needed), so this tool measures the SHIPPED logic
directly: it rebuilds the refinement search's candidate distribution
(same encoding, radius schedule, candidate count and pinned round-0
candidate as pipeline/refine.refine_batch) over a production-scale
scene, runs the exact window geometry (ops/ncc.window_geometry_views)
and tile planning, and reports

  a11_frac  = P(tile overflow | border-safe window),  ungrouped
  a12_frac  = P(view lost to group sharing | would fit ungrouped)

per refinement round and aggregated. Patch poses come from the analytic
plane (default) or a real e2e cloud (--patch ply/final_patches.patch
from tools/e2e_run.py), whose refined-hypothesis distribution is the
production one.

Writes A11A12.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--patch", default=None,
                    help=".patch checkpoint to draw patch poses from "
                         "(e.g. the e2e run's final_patches.patch)")
    ap.add_argument("--platform", default="cpu",
                    help="pure geometry — cpu by default")
    ap.add_argument("--out", default=os.path.join(REPO, "A11A12.json"))
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from mvskit_tpu.config import MVSConfig
    from mvskit_tpu.geometry import camera as cam
    from mvskit_tpu.ops import ncc as nccops
    from mvskit_tpu.ops import pallas_ncc as pk
    from mvskit_tpu.pipeline import refine as rf
    from mvskit_tpu.pipeline import views as vw
    from mvskit_tpu.utils.synthetic import plane_points, plane_scene

    cfg = MVSConfig()  # shipped defaults: rounds/cands/shrink/radii
    level, wsize, tau = cfg.level, cfg.wsize, 6
    a1 = cfg.angle_threshold1
    rounds, n_cands = cfg.refine_rounds, cfg.refine_cands
    shrink = cfg.refine_shrink
    ascale = cfg.ascale

    print(
        f"scene {args.views}x{args.width}x{args.height}, B={args.batch},"
        f" {rounds}x{n_cands} schedule", file=sys.stderr,
    )
    Ps, _, scene = plane_scene(
        n_views=args.views, width=args.width, height=args.height,
        max_level=level + 3,
    )

    B = args.batch
    if args.patch:
        from mvskit_tpu.io import patch_io

        data = patch_io.read_patch_file(args.patch)
        n = data["coord"].shape[0]
        sel = np.random.RandomState(0).choice(n, min(B, n), replace=False)
        B = sel.size
        coord = jnp.asarray(data["coord"][sel], jnp.float32)
        normal = jnp.asarray(data["normal"][sel], jnp.float32)
        source = f"{args.patch} ({n} patches, {B} sampled)"
    else:
        coord, normal = plane_points(Ps, B, extent=1.2)
        coord = jnp.asarray(coord, jnp.float32)
        normal = jnp.asarray(normal, jnp.float32)
        source = "analytic plane"

    images = jnp.full((B, scene.n_images), -1, jnp.int32).at[:, 0].set(0)
    images = vw.add_images(scene, coord, normal, images, level, a1)
    images = vw.sort_images(scene, coord, normal, images, level)
    dscale, _ = vw.set_scales(scene, coord, images, level, tau, wsize)
    views = images[:, :tau]

    # refine_batch's encoding prelude
    ref = jnp.maximum(images[:, 0], 0)
    ray = coord - scene.cams.center[ref]
    ray = ray / jnp.sqrt(
        jnp.maximum(jnp.sum(ray * ray, axis=-1, keepdims=True), 1e-20)
    )
    safe_dscale = jnp.where(dscale == 0.0, 1.0, dscale)
    a1e, a2e = rf.encode_normal(scene, ref, normal)
    p0 = jnp.stack(
        [jnp.zeros((B,)), a1e / ascale, a2e / ascale], axis=-1
    )
    p0 = p0.at[:, 1:].set(
        jnp.clip(p0[:, 1:], -rf.ANGLE_BOUND, rf.ANGLE_BOUND)
    )

    pad_hw = pk.padded_level_shapes(scene)
    hs_l = jnp.asarray([h for h, _ in pad_hw], jnp.int32)
    ws_l = jnp.asarray([w for _, w in pad_hw], jnp.int32)

    @jax.jit
    def round_counts(rkey, radius, is_first):
        delta = jax.random.uniform(
            rkey, (B, n_cands, 3), minval=-1.0, maxval=1.0
        ) * radius
        delta = jnp.where(is_first, delta.at[:, 0, :].set(0.0), delta)
        cand = p0[:, None, :] + delta
        cand = cand.at[:, :, 1:].set(
            jnp.clip(cand[:, :, 1:], -rf.ANGLE_BOUND, rf.ANGLE_BOUND)
        )
        flat = cand.reshape(B * n_cands, 3)
        c = rf.decode_coord(
            jnp.repeat(coord, n_cands, axis=0),
            jnp.repeat(ray, n_cands, axis=0),
            jnp.repeat(safe_dscale, n_cands, axis=0),
            flat[:, 0],
        )
        nrm = rf.decode_normal(
            scene, jnp.repeat(ref, n_cands, axis=0),
            flat[:, 1] * ascale, flat[:, 2] * ascale,
        )
        v = jnp.repeat(views, n_cands, axis=0)

        # texs_for_views prelude: plane axes from the reference view,
        # then the dense window geometry (final `valid` = angle gate &
        # border safety & in-front — the windows the REFERENCE admits)
        refv = jnp.maximum(v[:, 0], 0)
        px, py = cam.get_paxes(scene.cams, refv, c, nrm, level)
        views_t = v.T
        idx = jnp.maximum(views_t, 0)
        tl, dx2, dy2, new_level, valid = nccops.window_geometry_views(
            scene, views_t, c, px, py, nrm, level, wsize, a1,
        )
        valid = valid & (views_t >= 0)

        # flatten exactly as ncc.sample_windows_raw does (T-major,
        # group members consecutive along B)
        imgf = idx.reshape(-1)
        lvlf = new_level.reshape(-1)
        tlf = tl.reshape(-1, 2)
        dxf = dx2.reshape(-1, 2)
        dyf = dy2.reshape(-1, 2)
        validf = valid.reshape(-1)
        hs = hs_l[lvlf]
        ws = ws_l[lvlf]

        fit1, *_ = pk.plan_tiles(
            hs, ws, imgf, lvlf, tlf, dxf, dyf, wsize, 1
        )
        fitg, *_ = pk.plan_tiles(
            hs, ws, imgf, lvlf, tlf, dxf, dyf, wsize, n_cands
        )
        denom = jnp.sum(validf)
        a11 = jnp.sum(validf & ~fit1)
        ok1 = validf & fit1
        a12 = jnp.sum(ok1 & ~fitg)
        return denom, a11, jnp.sum(ok1), a12

    radius0 = np.asarray(
        [cfg.refine_init_depth_radius, cfg.refine_init_angle_radius,
         cfg.refine_init_angle_radius], np.float32,
    )
    key = jax.random.PRNGKey(0)
    per_round = []
    tot = np.zeros(4, np.int64)
    for r in range(rounds):
        key, sub = jax.random.split(key)
        radius = jnp.asarray(radius0 * (shrink ** r))
        d, a11, d12, a12 = (
            int(np.asarray(x))
            for x in round_counts(sub, radius, r == 0)
        )
        tot += [d, a11, d12, a12]
        per_round.append(
            {
                "round": r,
                "valid_pairs": d,
                "a11_overflow": a11,
                "a11_frac": round(a11 / max(d, 1), 6),
                "a12_group_loss": a12,
                "a12_frac": round(a12 / max(d12, 1), 6),
            }
        )
        print(
            f"round {r:2d}: valid {d}, a11 {a11} "
            f"({a11 / max(d, 1):.2e}), a12 {a12} "
            f"({a12 / max(d12, 1):.2e})", file=sys.stderr,
        )

    result = {
        "scene": {
            "views": args.views, "width": args.width,
            "height": args.height, "level": level, "wsize": wsize,
            "tau": tau,
        },
        "patch_source": source,
        "batch": B,
        "schedule": {
            "rounds": rounds, "cands": n_cands, "shrink": shrink,
            "depth_radius": cfg.refine_init_depth_radius,
            "angle_radius": cfg.refine_init_angle_radius,
        },
        "totals": {
            "valid_pairs": int(tot[0]),
            "a11_overflow": int(tot[1]),
            "a11_frac": round(float(tot[1] / max(tot[0], 1)), 8),
            "a12_group_loss": int(tot[3]),
            "a12_frac": round(float(tot[3] / max(tot[2], 1)), 8),
        },
        "per_round": per_round,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)
    print(json.dumps(result["totals"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
