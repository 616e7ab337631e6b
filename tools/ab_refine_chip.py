"""On-chip refinement quality A/B (round 5): isolate the effect of the
refinement schedule, the grouped-DMA view loss (DIVERGENCES A12), and
the luma search on REAL kernel-path refinement quality.

The CPU quality A/Bs run the gather path, which never loses a view to
group sharing — only an on-chip run exercises the shipped combination
(Pallas tile DMA + grouping + luma). Perturbed starts (3 dscale depth,
~15 deg tilt) on the production-scale plane scene; each arm is one
small jitted program.

Writes REFINE_AB_CHIP.json.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--out", default=os.path.join(REPO, "REFINE_AB_CHIP.json"))
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from mvskit_tpu.ops import pallas_ncc as pk
    from mvskit_tpu.pipeline import refine as rf
    from mvskit_tpu.pipeline import views as vw
    from mvskit_tpu.utils import synthetic

    LEVEL, WSIZE, TAU = 1, 7, 6
    A1 = math.radians(60.0)
    ASC = math.pi / 48.0
    B = args.batch

    Ps, _, scene = synthetic.plane_scene(
        n_views=args.views, width=args.width, height=args.height,
        max_level=LEVEL + 3,
    )
    if jax.default_backend() == "tpu":
        scene = pk.enable_pallas(scene)
    scene = jax.device_put(scene)
    coord, normal = synthetic.plane_points(Ps, B, extent=1.2)
    coord = jnp.asarray(coord, jnp.float32)
    normal = jnp.asarray(normal, jnp.float32)

    @jax.jit
    def prep(scene, coord, normal):
        images = jnp.full((B, scene.n_images), -1, jnp.int32)
        images = images.at[:, 0].set(0)
        images = vw.add_images(scene, coord, normal, images, LEVEL, A1)
        images = vw.sort_images(scene, coord, normal, images, LEVEL)
        dscale, _ = vw.set_scales(scene, coord, images, LEVEL, TAU, WSIZE)
        ref = jnp.maximum(images[:, 0], 0)
        ray = coord - scene.cams.center[ref]
        ray = ray / jnp.sqrt(
            jnp.maximum(jnp.sum(ray * ray, -1, keepdims=True), 1e-20)
        )
        start = coord + (3.0 * dscale)[:, None] * ray
        return images, dscale, start

    images, dscale, start = jax.block_until_ready(
        prep(scene, coord, normal)
    )
    ok = np.asarray(images[:, 0]) >= 0
    rng = np.random.RandomState(1)
    tilt = np.asarray(normal[:, :3]) + 0.27 * rng.normal(size=(B, 3))
    tilt /= np.linalg.norm(tilt, axis=1, keepdims=True)
    start_n = jnp.asarray(
        np.concatenate([tilt, np.zeros((B, 1))], 1), jnp.float32
    )

    arms = {
        "6x32_grouped_luma": dict(rounds=6, n_cands=32, shrink=0.4096,
                                  group_dma=True, luma=True),
        "6x32_ungrouped_luma": dict(rounds=6, n_cands=32, shrink=0.4096,
                                    group_dma=False, luma=True),
        "12x16_grouped_luma": dict(rounds=12, n_cands=16, shrink=0.64,
                                   group_dma=True, luma=True),
        "6x32_grouped_rgb": dict(rounds=6, n_cands=32, shrink=0.4096,
                                 group_dma=True, luma=False),
        "6x32_grouped_hybrid_tail1": dict(
            rounds=6, n_cands=32, shrink=0.4096, group_dma=True,
            luma=True, rgb_tail=1,
        ),
        "6x32_grouped_hybrid_tail2": dict(
            rounds=6, n_cands=32, shrink=0.4096, group_dma=True,
            luma=True, rgb_tail=2,
        ),
    }

    out = {"batch": B, "arms": {}}
    for name, arm in arms.items():
        def step(scene, start, start_n, images, dscale, key, arm=arm):
            return rf.refine_batch(
                scene, start, start_n, images, dscale, key,
                level=LEVEL, wsize=WSIZE, tau=TAU, min_image_num=3,
                angle_threshold1=A1, ascale=ASC,
                rounds=arm["rounds"], n_cands=arm["n_cands"],
                shrink=arm["shrink"],
                init_depth_radius=4.0, init_angle_radius=8.0,
                luma=arm["luma"], group_dma=arm["group_dma"],
                rgb_tail=arm.get("rgb_tail", 0),
            )

        jstep = jax.jit(step)
        t0 = time.time()
        res = jstep(scene, start, start_n, images, dscale,
                    jax.random.PRNGKey(0))
        c = np.asarray(res.coord)
        t1 = time.time() - t0
        # timed warm rep
        t0 = time.time()
        res = jstep(scene, start, start_n, images, dscale,
                    jax.random.PRNGKey(1))
        c = np.asarray(res.coord)
        dt = time.time() - t0
        z = np.abs(c[ok, 2])
        rec = {
            "err_median": float(np.median(z)),
            "err_mean": float(np.mean(z)),
            "frac_err_lt_0.05": float((z < 0.05).mean()),
            "ncc_median": float(np.median(np.asarray(res.ncc)[ok])),
            "cost_median": float(np.median(np.asarray(res.cost)[ok])),
            "warm_seconds": round(dt, 2),
            "compile_plus_first_seconds": round(t1, 1),
        }
        out["arms"][name] = rec
        print(name, rec, file=sys.stderr)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
