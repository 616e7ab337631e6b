"""Gradient-polish study (VERDICT r4 #8): same-eval-budget comparison
of pure random search vs random search + differentiable polish.

The reference's refinement budget is BOBYQA's maxeval (reference
optim.cpp:487); our analog is rounds * n_cands cost evaluations. A
gradient step costs one forward+backward through the differentiable
gather sampler (~2 forward evaluations) plus one accept-test forward
evaluation, so the arms below hold the total forward-equivalent budget
roughly constant (VERDICT's suggested pairing):

  arm A: 12 rounds x 16 cands, grad_steps 0   (192 evals)
  arm B: 12 rounds x  8 cands, grad_steps 4   (96 + 4*(2+1) = 108) and
  arm C: 12 rounds x 16 cands, grad_steps 4   (A + polish on top)

Starts from perturbed poses (3 dscale of depth error, ~15 deg normal
tilt) on the plane and sphere scenes and reports final cost, |z| error
(plane) / surface distance (sphere), and NCC. Writes GRADPOLISH.json.
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
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--out", default=os.path.join(REPO, "GRADPOLISH.json"))
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from mvskit_tpu.pipeline import refine as rf
    from mvskit_tpu.pipeline import views as vw
    from mvskit_tpu.utils import synthetic

    LEVEL, WSIZE, TAU = 1, 7, 6
    A1 = math.radians(60.0)
    ASCALE = math.pi / 48.0
    B = args.batch

    arms = {
        "A_random_12x16": dict(rounds=12, n_cands=16, shrink=0.64,
                               grad_steps=0),
        "B_random_12x8_grad4": dict(rounds=12, n_cands=8, shrink=0.64,
                                    grad_steps=4),
        "C_random_12x16_grad4": dict(rounds=12, n_cands=16, shrink=0.64,
                                     grad_steps=4),
    }

    out = {"batch": B, "scenes": {}}
    for geometry in ("plane", "sphere"):
        if geometry == "plane":
            Ps, _, scene = synthetic.plane_scene(
                n_views=8, width=160, height=120
            )
            coord, normal = synthetic.plane_points(Ps, B, extent=0.6)
        else:
            Ps, _, scene = synthetic.sphere_scene(
                n_views=8, width=160, height=120
            )
            coord, normal = synthetic.visible_surface_points(
                Ps, 3 * B, geometry="sphere", seed=5,
                width=160, height=120,
            )
            coord, normal = coord[:B], normal[:B]
        B = coord.shape[0]
        coord = jnp.asarray(coord, jnp.float32)
        normal = jnp.asarray(normal, jnp.float32)
        images = jnp.full((B, scene.n_images), -1, jnp.int32)
        images = images.at[:, 0].set(0)
        images = vw.add_images(scene, coord, normal, images, LEVEL, A1)
        images = vw.sort_images(scene, coord, normal, images, LEVEL)
        dscale, _ = vw.set_scales(scene, coord, images, LEVEL, TAU, WSIZE)
        ok = np.asarray(images[:, 0]) >= 0

        # perturb: 3 dscale along the ray + ~15 deg normal tilt
        ref = jnp.maximum(images[:, 0], 0)
        ray = coord - scene.cams.center[ref]
        ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
        start = coord + (3.0 * dscale)[:, None] * ray
        rng = np.random.RandomState(1)
        tilt = np.asarray(normal[:, :3]) + 0.27 * rng.normal(size=(B, 3))
        tilt /= np.linalg.norm(tilt, axis=1, keepdims=True)
        start_n = jnp.asarray(
            np.concatenate([tilt, np.zeros((B, 1))], 1), jnp.float32
        )

        res_scene = {}
        for name, arm in arms.items():
            res = rf.refine_batch(
                scene, start, start_n, images, dscale,
                jax.random.PRNGKey(7),
                level=LEVEL, wsize=WSIZE, tau=TAU, min_image_num=3,
                angle_threshold1=A1, ascale=ASCALE,
                rounds=arm["rounds"], n_cands=arm["n_cands"],
                shrink=arm["shrink"],
                init_depth_radius=4.0, init_angle_radius=8.0,
                grad_steps=arm["grad_steps"], grad_lr=0.5,
            )
            c = np.asarray(res.coord)[ok, :3]
            if geometry == "plane":
                err = np.abs(c[:, 2])
            else:
                err = synthetic.surface_distance(c, "sphere")
            res_scene[name] = {
                "evals_fwd_equiv": arm["rounds"] * arm["n_cands"]
                + 3 * arm["grad_steps"],
                "cost_mean": float(np.mean(np.asarray(res.cost)[ok])),
                "cost_median": float(np.median(np.asarray(res.cost)[ok])),
                "err_median": float(np.median(err)),
                "err_mean": float(np.mean(err)),
                "frac_err_lt_0.05": float((err < 0.05).mean()),
                "ncc_median": float(np.median(np.asarray(res.ncc)[ok])),
            }
            print(geometry, name, res_scene[name], file=sys.stderr)
        out["scenes"][geometry] = res_scene

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
