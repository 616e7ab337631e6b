"""On-chip microbenchmark for the Pallas window-sampling kernel.

Times ops/pallas_ncc.sample_windows against the jnp gather sampler on
identical window batches (axon timing rules per CLAUDE.md: pull results
to host, subtract measured null round-trip latency).

Usage: python tools/bench_pallas_kernel.py [n_windows] [reps]
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

    from mvskit_tpu.geometry import camera as cam
    from mvskit_tpu.ops import ncc as nccops
    from mvskit_tpu.ops import pallas_ncc as pk
    from mvskit_tpu.utils import synthetic

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 57344
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    LEVEL, WSIZE = 1, 7
    A1 = float(np.deg2rad(60.0))

    print(f"devices: {jax.devices()}", file=sys.stderr)
    print(f"scene 16x640x480, {B} windows", file=sys.stderr)
    Ps, _, scene = synthetic.plane_scene(n_views=16, width=640, height=480)
    coord, normal = synthetic.plane_points(Ps, B, extent=1.2)
    coord = jnp.asarray(coord, jnp.float32)
    normal = jnp.asarray(normal, jnp.float32)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 16, B), jnp.int32)

    px, py = cam.get_paxes(scene.cams, idx, coord, normal, LEVEL)
    tl, dx2, dy2, new_level, valid = jax.jit(
        nccops.window_geometry, static_argnums=(6, 7, 8)
    )(scene, idx, coord, px, py, normal, LEVEL, WSIZE, A1)
    print(f"valid: {np.asarray(valid).mean():.2f}", file=sys.stderr)

    levels = pk.luma_levels_from_scene(scene)
    levels = jax.device_put(levels)
    levels_rgb = jax.device_put(pk.rgb_levels_from_scene(scene))
    args = jax.device_put((idx, new_level, tl, dx2, dy2))

    ablate = os.environ.get("ABLATE", "")
    # GROUP=K: time the grouped tile-reuse mode on a K-member candidate
    # layout (each base window repeated K times with a ~±2 px jitter on
    # the lattice origin — the refine-round shape)
    group = int(os.environ.get("GROUP", "1"))
    fused = os.environ.get("FUSED", "") == "1"
    if group > 1:
        Bg = B // group
        rj = np.random.default_rng(1)
        jx = rj.uniform(-2, 2, (Bg, group, 2)).astype(np.float32)
        jx[:, 0] = 0.0
        idx = jnp.repeat(idx[:Bg], group)
        new_level = jnp.repeat(new_level[:Bg], group)
        tl = (np.asarray(tl[:Bg])[:, None, :] + jx).reshape(B, 2)
        tl = jnp.asarray(tl)
        dx2 = jnp.repeat(dx2[:Bg], group, axis=0)
        dy2 = jnp.repeat(dy2[:Bg], group, axis=0)
        args = jax.device_put((idx, new_level, tl, dx2, dy2))
        print(f"grouped layout: {Bg} groups x {group}", file=sys.stderr)

    @jax.jit
    def run_pallas(levels, idx, lvl, tl, dx, dy):
        out, _fit = pk.sample_windows(
            levels, idx, lvl, tl, dx, dy, ablate=ablate, group=group,
            fused=fused,
        )
        return jnp.sum(out * out)  # tiny pull

    @jax.jit
    def run_pallas_rgb(levels, idx, lvl, tl, dx, dy):
        out, _fit = pk.sample_windows(
            levels, idx, lvl, tl, dx, dy, rgb=True, ablate=ablate,
            group=group, fused=fused,
        )
        return jnp.sum(out * out)

    # jnp gather path on the same windows (luma quad = 1 fetch/sample)
    @jax.jit
    def run_jnp(scene, idx, lvl, tl, dx, dy):
        from mvskit_tpu.ops import sampling
        s = WSIZE * WSIZE
        xs = jnp.arange(WSIZE, dtype=jnp.float32)
        lat_x = jnp.tile(xs, WSIZE)[None, :]
        lat_y = jnp.repeat(xs, WSIZE)[None, :]
        gx = tl[:, :1] + dx[:, :1] * lat_x + dy[:, :1] * lat_y
        gy = tl[:, 1:] + dx[:, 1:] * lat_x + dy[:, 1:] * lat_y
        gx = gx.T  # [S, B]
        gy = gy.T
        lvlb = jnp.broadcast_to(lvl[None, :], (s, B))
        iidxb = jnp.broadcast_to(idx[None, :], (s, B))
        if scene.planes_luma_quad is not None:
            tex = sampling.sample_luma_quad(
                scene, iidxb[None], gx[None], gy[None], lvlb[None], 0
            )[0, 0]  # [1(T) missing...]
        else:
            tex = sampling.sample_color_ch(
                scene, iidxb[None], gx[None], gy[None], lvlb[None], 0
            )
        return jnp.sum(tex * tex)

    # null round-trip must pull the SAME payload size as the timed fns
    # (a scalar) — pulling a coord-shaped array inflates the measured
    # latency by the transfer time and over-subtracts
    null = jax.jit(lambda c: jnp.sum(c))

    def timed(fn, *a):
        t0 = time.time()
        np.asarray(fn(*a))
        return time.time() - t0

    print("compiling pallas...", file=sys.stderr)
    t0 = time.time()
    v = np.asarray(run_pallas(levels, *args))
    print(f"  first call {time.time()-t0:.1f}s, out {v:.3f}", file=sys.stderr)

    np.asarray(null(coord))
    lat = min(timed(null, coord) for _ in range(3))
    print(f"null latency {lat*1e3:.0f} ms", file=sys.stderr)

    times = [timed(run_pallas, levels, *args) for _ in range(reps)]
    dt = max(1e-9, min(times) - lat)
    msps = B * WSIZE * WSIZE / dt / 1e6
    mwps = B / dt / 1e6
    print(
        f"pallas luma: {dt*1e3:.1f} ms -> {mwps:.2f} Mwindows/s, "
        f"{msps:.1f} Msamples/s (times {[f'{t*1e3:.0f}' for t in times]})",
        file=sys.stderr,
    )
    print(f"PALLAS_MSPS={msps:.2f}")

    print("compiling pallas rgb...", file=sys.stderr)
    t0 = time.time()
    v = np.asarray(run_pallas_rgb(levels_rgb, *args))
    print(f"  first call {time.time()-t0:.1f}s, out {v:.3f}", file=sys.stderr)
    times = [timed(run_pallas_rgb, levels_rgb, *args) for _ in range(reps)]
    dt = max(1e-9, min(times) - lat)
    msps = B * WSIZE * WSIZE / dt / 1e6
    mwps = B / dt / 1e6
    print(
        f"pallas rgb: {dt*1e3:.1f} ms -> {mwps:.2f} Mwindows/s, "
        f"{msps:.1f} Msamples/s (times {[f'{t*1e3:.0f}' for t in times]})",
        file=sys.stderr,
    )
    print(f"PALLAS_RGB_MSPS={msps:.2f}")


if __name__ == "__main__":
    main()
