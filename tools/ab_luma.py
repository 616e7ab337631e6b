"""Luma-vs-RGB refinement-search A/B on the occluding sphere scene
(VERDICT r4 weak #6): `luma_refine=True` ships as the default on the
strength of a plane-scene parity test; luminance NCC is blind to
chroma-only texture, so this tool re-runs the comparison on the sphere
geometry (and optionally multi-illumination), where the texture and
occlusion structure differ.

Both arms run the SAME search schedule from the same perturbed starts;
the final pose is re-scored in RGB in both (pipeline/refine.py), so the
comparison isolates the argmin-selection signal. Reports surface
distance to the analytic sphere-on-plane surface and final NCC.
Writes LUMA_AB.json.
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
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--nillums", type=int, default=2)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--out", default=os.path.join(REPO, "LUMA_AB.json"))
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from mvskit_tpu.config import MVSConfig
    from mvskit_tpu.pipeline import refine as rf
    from mvskit_tpu.pipeline import views as vw
    from mvskit_tpu.utils import synthetic

    cfg = MVSConfig()
    LEVEL, WSIZE, TAU = 1, 7, 6
    A1 = math.radians(60.0)
    B = args.batch

    out = {"batch": B, "scenes": {}}
    for tag, nillums in (("sphere", 1), (f"sphere_illum{args.nillums}",
                                         args.nillums)):
        Ps, _, scene = synthetic.sphere_scene(
            n_views=8, width=160, height=120, nillums=nillums
        )
        coord, normal = synthetic.visible_surface_points(
            Ps, 3 * B, geometry="sphere", seed=11, width=160, height=120
        )
        coord, normal = coord[:B], normal[:B]
        n = coord.shape[0]
        coord = jnp.asarray(coord, jnp.float32)
        normal = jnp.asarray(normal, jnp.float32)
        images = jnp.full((n, scene.n_images), -1, jnp.int32)
        images = images.at[:, 0].set(0)
        images = vw.add_images(scene, coord, normal, images, LEVEL, A1)
        images = vw.sort_images(scene, coord, normal, images, LEVEL)
        dscale, _ = vw.set_scales(scene, coord, images, LEVEL, TAU, WSIZE)
        ok = np.asarray(images[:, 0]) >= 0

        ref = jnp.maximum(images[:, 0], 0)
        ray = coord - scene.cams.center[ref]
        ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
        start = coord + (3.0 * dscale)[:, None] * ray
        rng = np.random.RandomState(3)
        tilt = np.asarray(normal[:, :3]) + 0.27 * rng.normal(size=(n, 3))
        tilt /= np.linalg.norm(tilt, axis=1, keepdims=True)
        start_n = jnp.asarray(
            np.concatenate([tilt, np.zeros((n, 1))], 1), jnp.float32
        )

        res_scene = {}
        for name, luma in (("rgb_search", False), ("luma_search", True)):
            res = rf.refine_batch(
                scene, start, start_n, images, dscale,
                jax.random.PRNGKey(0),
                level=LEVEL, wsize=WSIZE, tau=TAU, min_image_num=3,
                angle_threshold1=A1, ascale=cfg.ascale,
                rounds=cfg.refine_rounds, n_cands=cfg.refine_cands,
                shrink=cfg.refine_shrink,
                init_depth_radius=cfg.refine_init_depth_radius,
                init_angle_radius=cfg.refine_init_angle_radius,
                luma=luma, n_illums=nillums,
            )
            c = np.asarray(res.coord)[ok, :3]
            err = synthetic.surface_distance(c, "sphere")
            res_scene[name] = {
                "err_median": float(np.median(err)),
                "err_mean": float(np.mean(err)),
                "frac_err_lt_0.05": float((err < 0.05).mean()),
                "ncc_median": float(np.median(np.asarray(res.ncc)[ok])),
            }
            print(tag, name, res_scene[name], file=sys.stderr)
        out["scenes"][tag] = res_scene

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
