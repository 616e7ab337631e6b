"""On-chip Mosaic smoke test for the Pallas window-sampling kernel.

Compiles + runs ONE 128-window `pallas_call` (both LUMA and RGB modes)
on the real TPU and cross-checks the values against interpret mode.
This exists because interpret-mode CPU tests CANNOT catch Mosaic
verification constraints (e.g. `tpu.iota` being integer-only) — the
exact failure class that broke round 1's bench (VERDICT.md §weak-1).

Run this BEFORE committing any change that touches ops/pallas_ncc.py:

    python tools/smoke_tpu.py        # exits 0 on pass, 1 on fail

Fast: one tiny scene, one W_BLK batch, compile cached in .jax_cache/.
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mvskit_tpu.geometry import camera as cam
    from mvskit_tpu.ops import ncc as nccops
    from mvskit_tpu.ops import pallas_ncc as pk
    from mvskit_tpu.utils import synthetic

    backend = jax.default_backend()
    print(f"backend: {backend}, devices: {jax.devices()}", file=sys.stderr)
    if backend != "tpu":
        print("SMOKE SKIP: no TPU backend — this test is meaningless "
              "off-chip (interpret mode hides Mosaic errors)", file=sys.stderr)
        return 2

    B = pk.W_BLK  # one program's worth of windows
    LEVEL, WSIZE = 1, 7
    A1 = float(np.deg2rad(60.0))

    K = 8  # grouped-mode group size
    rng = np.random.default_rng(0)
    Ps, _, scene = synthetic.plane_scene(n_views=4, width=320, height=240)
    # group-structured batch (the refine layout): B//K base points, K
    # jittered members each, per-group-constant view
    coord, normal = synthetic.plane_points(Ps, B // K, extent=1.0)
    jit = rng.uniform(-1, 1, (B // K, K, 4)).astype(np.float32) * 0.004
    jit[..., 3] = 0.0
    jit[:, 0] = 0.0
    coord = jnp.asarray(
        (coord[:, None, :] + jit).reshape(B, 4), jnp.float32
    )
    normal = jnp.asarray(np.repeat(normal, K, axis=0), jnp.float32)
    idx = jnp.asarray(
        np.repeat(rng.integers(0, 4, B // K), K), jnp.int32
    )

    px, py = cam.get_paxes(scene.cams, idx, coord, normal, LEVEL)
    tl, dx2, dy2, new_level, valid = jax.jit(
        nccops.window_geometry, static_argnums=(6, 7, 8)
    )(scene, idx, coord, px, py, normal, LEVEL, WSIZE, A1)

    levels_luma = jax.device_put(pk.luma_levels_from_scene(scene))
    levels_rgb = jax.device_put(pk.rgb_levels_from_scene(scene))
    args = jax.device_put((idx, new_level, tl, dx2, dy2))

    ok = True
    for name, levels, rgb, group in (
        ("luma", levels_luma, False, 1),
        ("rgb", levels_rgb, True, 1),
        ("rgb-grouped", levels_rgb, True, 8),
    ):
        t0 = time.time()
        fn = jax.jit(
            lambda lv, i, l, t, dx, dy, rgb=rgb, group=group:
            pk.sample_windows(
                lv, i, l, t, dx, dy, wsize=WSIZE, rgb=rgb, group=group
            )
        )
        try:
            out, fit = fn(levels, *args)
            out = np.asarray(out)
            fit = np.asarray(fit)
        except Exception as e:  # Mosaic verification / runtime error
            print(f"SMOKE FAIL [{name}]: {type(e).__name__}: {e}",
                  file=sys.stderr)
            ok = False
            continue
        # interpret-mode oracle on the same inputs
        ref, _ = jax.jit(
            lambda lv, i, l, t, dx, dy, rgb=rgb, group=group:
            pk.sample_windows(
                lv, i, l, t, dx, dy, wsize=WSIZE, rgb=rgb, group=group,
                interpret=True,
            )
        )(levels, *args)
        ref = np.asarray(ref)
        m = fit & np.asarray(valid)
        err = float(np.max(np.abs(out[m] - ref[m]))) if m.any() else 0.0
        print(
            f"[{name}] {time.time()-t0:.1f}s  fit={fit.mean():.2f}  "
            f"max|tpu-interp|={err:.2e}",
            file=sys.stderr,
        )
        if err > 1e-2 or not np.isfinite(out[m]).all():
            print(f"SMOKE FAIL [{name}]: numeric mismatch vs interpret",
                  file=sys.stderr)
            ok = False

    print("SMOKE PASS" if ok else "SMOKE FAIL", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
