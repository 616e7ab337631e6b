"""Decompose the refine-round cost on-chip: geometry vs kernel vs
aggregation at the exact shapes bench.py's candidate rounds use
(B*cands patches x tau views).

Usage: python tools/bench_refine_parts.py [n_patches] [reps]
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mvskit_tpu.ops import ncc as nccops
    from mvskit_tpu.ops import pallas_ncc as pk
    from mvskit_tpu.geometry import camera as cam
    from mvskit_tpu.utils import synthetic

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    LEVEL, WSIZE, TAU = 1, 7, 6
    A1 = float(np.deg2rad(60.0))

    print(f"devices: {jax.devices()}", file=sys.stderr)
    Ps, _, scene = synthetic.plane_scene(
        n_views=16, width=640, height=480, max_level=LEVEL + 3
    )
    scene = pk.enable_pallas(scene)
    scene = jax.device_put(scene)
    coord, normal = synthetic.plane_points(Ps, B, extent=1.2)
    coord = jnp.asarray(coord, jnp.float32)
    normal = jnp.asarray(normal, jnp.float32)
    views = jnp.broadcast_to(
        jnp.arange(TAU, dtype=jnp.int32)[None], (B, TAU)
    )

    def geometry(scene, views, coord, normal):
        ref = jnp.maximum(views[..., 0], 0)
        px, py = cam.get_paxes(scene.cams, ref, coord, normal, LEVEL)
        T = views.shape[1]
        vt = views.T
        vc = jnp.broadcast_to(coord[None], (T, B, 4))
        vn = jnp.broadcast_to(normal[None], (T, B, 4))
        vpx = jnp.broadcast_to(px[None], (T, B, 4))
        vpy = jnp.broadcast_to(py[None], (T, B, 4))
        idx = jnp.maximum(vt, 0)
        tl, dx2, dy2, nl, valid = nccops.window_geometry(
            scene, idx, vc, vpx, vpy, vn, LEVEL, WSIZE, A1
        )
        return tl, dx2, dy2, nl, valid, idx

    @jax.jit
    def run_geometry(scene, views, coord, normal):
        tl, dx2, dy2, nl, valid, idx = geometry(scene, views, coord, normal)
        return (
            jnp.sum(tl) + jnp.sum(dx2) + jnp.sum(dy2)
            + jnp.sum(nl) + jnp.sum(valid)
        )

    @jax.jit
    def run_kernel_only(scene, views, coord, normal):
        tl, dx2, dy2, nl, valid, idx = geometry(scene, views, coord, normal)
        T = views.shape[1]
        out, fit = pk.sample_windows(
            scene.planes_rgb_levels,
            idx.reshape(-1),
            nl.reshape(-1),
            tl.reshape(-1, 2),
            dx2.reshape(-1, 2),
            dy2.reshape(-1, 2),
            rgb=True,
        )
        return jnp.sum(out * out) + jnp.sum(fit)

    @jax.jit
    def run_texs(scene, views, coord, normal):
        tex, valid = nccops.texs_for_views(
            scene, views, coord, normal, LEVEL, WSIZE, A1
        )
        return jnp.sum(tex * tex) + jnp.sum(valid)

    @jax.jit
    def run_eval_cost(scene, views, coord, normal):
        tex, valid = nccops.texs_for_views(
            scene, views, coord, normal, LEVEL, WSIZE, A1
        )
        return jnp.sum(nccops.incc_cost(tex, valid, 3))

    null = jax.jit(lambda c: c + 1.0)

    def timed(fn, *a):
        t0 = time.time()
        np.asarray(fn(*a))
        return time.time() - t0

    np.asarray(null(coord))
    for name, fn in [
        ("geometry", run_geometry),
        ("geometry+kernel", run_kernel_only),
        ("texs_for_views", run_texs),
        ("eval_cost", run_eval_cost),
    ]:
        t0 = time.time()
        np.asarray(fn(scene, views, coord, normal))
        print(f"{name}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)
        lat = min(timed(null, coord) for _ in range(3))
        ts = [timed(fn, scene, views, coord, normal) for _ in range(reps)]
        dt = max(1e-9, min(ts) - lat)
        msps = B * TAU * WSIZE * WSIZE / dt / 1e6
        print(
            f"{name}: {dt*1e3:.1f} ms ({msps:.0f} Msamples/s)"
            f" times={[f'{t*1e3:.0f}' for t in ts]} lat={lat*1e3:.0f}",
            file=sys.stderr,
        )
        print(f"{name.upper().replace('+','_')}_MS={dt*1e3:.2f}")


if __name__ == "__main__":
    main()
