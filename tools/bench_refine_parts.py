"""Decompose the refine-round cost on-chip: geometry vs kernel vs
aggregation at the exact shapes bench.py's candidate rounds use
(B*cands patches x tau views).

Usage: python tools/bench_refine_parts.py [n_patches] [reps]

Env knobs:
  LUMA=1   sample luminance planes instead of RGB (the shipped
           candidate-search default, config.luma_refine)
  GROUP=N  grouped tile-DMA mode: every N consecutive windows share one
           DMA tile (the candidate-group fast path, pallas_ncc group
           mode); rows must be repeat-contiguous, which this bench's
           broadcasted plane points satisfy
  SCAN=LO,HI  differential scan timing: run lax.scan chains of LO and
           HI rounds for geometry / texs / eval_cost and report the
           per-round SLOPE (HI-LO cancels dispatch latency, which on
           axon is too noisy for one-shot subtraction — measured
           50-118 ms jitter). This is the trustworthy decomposition of
           the refine_batch inner loop.
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
    LUMA = os.environ.get("LUMA", "0") == "1"
    GROUP = int(os.environ.get("GROUP", "1"))
    SCAN = os.environ.get("SCAN", "")
    if SCAN:
        SCAN_LO, SCAN_HI = (int(x) for x in SCAN.split(","))

    print(f"devices: {jax.devices()}", file=sys.stderr)
    Ps, _, scene = synthetic.plane_scene(
        n_views=16, width=640, height=480, max_level=LEVEL + 3
    )
    scene = pk.enable_pallas(scene)
    scene = jax.device_put(scene)
    if GROUP > 1:
        # grouped mode contract: every GROUP consecutive rows are
        # jittered candidates of the SAME patch (same view, shared DMA
        # tile) — mirror refine_batch's repeat-contiguous layout
        coord, normal = synthetic.plane_points(Ps, B // GROUP, extent=1.2)
        coord = np.repeat(coord, GROUP, axis=0)
        normal = np.repeat(normal, GROUP, axis=0)
        rng = np.random.default_rng(0)
        coord[:, 2] += rng.uniform(-2e-3, 2e-3, coord.shape[0])
    else:
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
        planes = (
            scene.planes_luma_levels if LUMA else scene.planes_rgb_levels
        )
        out, fit = pk.sample_windows(
            planes,
            idx.reshape(-1),
            nl.reshape(-1),
            tl.reshape(-1, 2),
            dx2.reshape(-1, 2),
            dy2.reshape(-1, 2),
            rgb=not LUMA,
            group=GROUP,
        )
        return jnp.sum(out * out) + jnp.sum(fit)

    @jax.jit
    def run_texs(scene, views, coord, normal):
        tex, valid = nccops.texs_for_views(
            scene, views, coord, normal, LEVEL, WSIZE, A1,
            luma=LUMA, group=GROUP,
        )
        return jnp.sum(tex * tex) + jnp.sum(valid)

    @jax.jit
    def run_eval_cost(scene, views, coord, normal):
        tex, valid = nccops.texs_for_views(
            scene, views, coord, normal, LEVEL, WSIZE, A1,
            luma=LUMA, group=GROUP,
        )
        return jnp.sum(nccops.incc_cost(tex, valid, 3))

    # -- differential scan variants: each body perturbs coord from the
    # carry (so XLA cannot hoist anything) and reduces to a scalar --
    def scan_of(inner, n):
        @jax.jit
        def run(scene, views, coord, normal):
            def body(carry, r):
                c = coord.at[:, 2].add(carry * 1e-6 + r * 0.0)
                return inner(scene, views, c, normal) * 1e-9, None
            out, _ = jax.lax.scan(
                body, 0.0, jnp.arange(n, dtype=jnp.float32)
            )
            return out
        return run

    def inner_geometry(scene, views, coord, normal):
        tl, dx2, dy2, nl, valid, idx = geometry(scene, views, coord, normal)
        return (
            jnp.sum(tl) + jnp.sum(dx2) + jnp.sum(dy2)
            + jnp.sum(nl) + jnp.sum(valid)
        )

    def inner_geometry_dense(scene, views, coord, normal):
        # the dense-over-views path texs_for_views actually uses
        ref = jnp.maximum(views[:, 0], 0)
        px, py = cam.get_paxes(scene.cams, ref, coord, normal, LEVEL)
        tl, dx2, dy2, nl, valid = nccops.window_geometry_views(
            scene, views.T, coord, px, py, normal, LEVEL, WSIZE, A1
        )
        return (
            jnp.sum(tl) + jnp.sum(dx2) + jnp.sum(dy2)
            + jnp.sum(nl) + jnp.sum(valid)
        )

    def inner_kernel(scene, views, coord, normal):
        tl, dx2, dy2, nl, valid, idx = geometry(scene, views, coord, normal)
        planes = (
            scene.planes_luma_levels if LUMA else scene.planes_rgb_levels
        )
        out, fit = pk.sample_windows(
            planes, idx.reshape(-1), nl.reshape(-1), tl.reshape(-1, 2),
            dx2.reshape(-1, 2), dy2.reshape(-1, 2),
            rgb=not LUMA, group=GROUP,
        )
        return jnp.sum(out * out) + jnp.sum(fit)

    def inner_raw(scene, views, coord, normal):
        # texs_for_views minus normalize_tex: splits the post-kernel
        # assembly/transpose cost from the normalization pass
        ref = jnp.maximum(views[:, 0], 0)
        px, py = cam.get_paxes(scene.cams, ref, coord, normal, LEVEL)
        vt = views.T
        idx = jnp.maximum(vt, 0)
        tl, dx2, dy2, nl, valid = nccops.window_geometry_views(
            scene, vt, coord, px, py, normal, LEVEL, WSIZE, A1
        )
        tex, fit, _c = nccops.sample_windows_raw(
            scene, idx, tl, dx2, dy2, nl, WSIZE, 0, LUMA, GROUP
        )
        return jnp.sum(tex) + jnp.sum(fit) + jnp.sum(valid)

    def inner_texs(scene, views, coord, normal):
        tex, valid = nccops.texs_for_views(
            scene, views, coord, normal, LEVEL, WSIZE, A1,
            luma=LUMA, group=GROUP,
        )
        return jnp.sum(tex * tex) + jnp.sum(valid)

    def inner_eval(scene, views, coord, normal):
        tex, valid = nccops.texs_for_views(
            scene, views, coord, normal, LEVEL, WSIZE, A1,
            luma=LUMA, group=GROUP,
        )
        return jnp.sum(nccops.incc_cost(tex, valid, 3))

    null = jax.jit(lambda c: c + 1.0)

    def timed(fn, *a):
        t0 = time.time()
        np.asarray(fn(*a))
        return time.time() - t0

    np.asarray(null(coord))
    if SCAN:
        # differential: per-round slope between SCAN_LO and SCAN_HI
        # chained rounds — dispatch latency and fixed costs cancel
        for name, inner in [
            ("geometry", inner_geometry),
            ("geometry_dense", inner_geometry_dense),
            ("geometry+kernel", inner_kernel),
            ("raw_windows", inner_raw),
            ("texs_for_views", inner_texs),
            ("eval_cost", inner_eval),
        ]:
            flo = scan_of(inner, SCAN_LO)
            fhi = scan_of(inner, SCAN_HI)
            t0 = time.time()
            np.asarray(flo(scene, views, coord, normal))
            np.asarray(fhi(scene, views, coord, normal))
            print(f"{name}: compile+first {time.time()-t0:.1f}s",
                  file=sys.stderr)
            tlo = [timed(flo, scene, views, coord, normal)
                   for _ in range(reps)]
            thi = [timed(fhi, scene, views, coord, normal)
                   for _ in range(reps)]
            per = max(1e-9, min(thi) - min(tlo)) / (SCAN_HI - SCAN_LO)
            msps = B * TAU * WSIZE * WSIZE / per / 1e6
            print(
                f"{name}: {per*1e3:.2f} ms/round ({msps:.0f} Msamples/s)"
                f" lo={[f'{t*1e3:.0f}' for t in tlo]}"
                f" hi={[f'{t*1e3:.0f}' for t in thi]}",
                file=sys.stderr,
            )
            print(f"SCAN_{name.upper().replace('+','_')}_MS={per*1e3:.2f}")
        return

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
