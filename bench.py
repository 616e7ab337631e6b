"""Benchmark: NCC + PatchMatch refinement throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Msamples/s", "vs_baseline": N}

A "sample" is one bilinear RGB texture fetch inside the NCC objective —
the unit of work that dominates the reference's runtime (SURVEY.md
§3.3: one refinement is up to 500 evals x tau views x wsize^2 fetches).
With the shipped luma_refine default the candidate search fetches
luminance instead of RGB (same evals, same refined geometry —
tests/test_refine.py::test_luma_refine_matches_rgb), so the metric
counts REFERENCE-EQUIVALENT samples: the RGB fetches the C++ reference
needs for the same number of cost evaluations.
The benchmark times the jitted refine_batch (the batched replacement
for Optim::refinePatch, reference pmmvps/optim.cpp:470-547) on a
dinoSparseRing-scale synthetic scene (16 views, 640x480).

vs_baseline compares against the single-threaded C++ hot-loop
microbenchmark (native/ref_hotloop.cpp) measured on this host, per
BASELINE.md ("measure on C++ reference (CPU)"). The baseline number is
cached in native/baseline_cpu.json.
"""

import json
import math
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def cpu_baseline_msps() -> float:
    cache = os.path.join(REPO, "native", "baseline_cpu.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)["msamples_per_s"]
    src = os.path.join(REPO, "native", "ref_hotloop.cpp")
    exe = os.path.join(REPO, "native", "ref_hotloop")
    subprocess.run(
        ["g++", "-O3", "-march=native", "-o", exe, src],
        check=True, capture_output=True,
    )
    out = subprocess.run(
        [exe, "100000"], check=True, capture_output=True, text=True,
        timeout=600,
    )
    val = float(out.stdout.strip())
    with open(cache, "w") as f:
        json.dump({"msamples_per_s": val}, f)
    return val


def main() -> None:
    import jax
    import jax.numpy as jnp

    # persistent compile cache: remote compiles through the axon tunnel
    # are slow and flaky; cache hits skip them entirely
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mvskit_tpu.config import MVSConfig
    from mvskit_tpu.pipeline import refine as rf
    from mvskit_tpu.pipeline import views as vw
    from mvskit_tpu.utils.synthetic import plane_points, plane_scene

    # measure the SHIPPED refinement path: luma_refine / group_dma come
    # from the config defaults (candidate search in luminance, final
    # pose re-scored in RGB — config.py, pipeline/refine.py). Override
    # with BENCH_LUMA=0 to measure the RGB-search path.
    defaults = MVSConfig()
    luma = (
        os.environ.get("BENCH_LUMA", "1" if defaults.luma_refine else "0")
        == "1"
    )

    # dinoSparseRing-scale scene (16 views, 640x480, level 1)
    n_views, w, h = 16, 640, 480
    level, wsize, tau = 1, 7, 6
    rounds_lo = int(os.environ.get("BENCH_ROUNDS_LO", 6))
    rounds_hi = int(
        os.environ.get("BENCH_ROUNDS_HI", defaults.refine_rounds)
    )
    cands = int(os.environ.get("BENCH_CANDS", defaults.refine_cands))
    B = int(os.environ.get("BENCH_BATCH", 8192))
    a1 = math.radians(60.0)

    print(f"building scene {n_views}x{w}x{h}...", file=sys.stderr)
    Ps, _, scene = plane_scene(n_views=n_views, width=w, height=h,
                               max_level=level + 3)
    if os.environ.get("BENCH_PALLAS", "1") == "1":
        from mvskit_tpu.ops import pallas_ncc as pk

        scene = pk.enable_pallas(scene)
    coord, normal = plane_points(Ps, B, extent=1.2)
    coord = jnp.asarray(coord, jnp.float32)
    normal = jnp.asarray(normal, jnp.float32)

    # pass the scene as a traced argument — closing over it would bake
    # the pyramid planes into the graph as a giant constant
    scene = jax.device_put(scene)

    @jax.jit
    def prep(scene, coord, normal):
        images = jnp.full((B, n_views), -1, jnp.int32).at[:, 0].set(0)
        images = vw.add_images(scene, coord, normal, images, level, a1)
        images = vw.sort_images(scene, coord, normal, images, level)
        dscale, _ = vw.set_scales(scene, coord, images, level, tau, wsize)
        return images, dscale

    print("prep...", file=sys.stderr)
    images, dscale = jax.block_until_ready(prep(scene, coord, normal))

    # Timing on the axon remote backend: block_until_ready does not
    # reliably block, long single programs can crash the remote worker,
    # and every synchronized dispatch pays ~0.5s tunnel latency.
    # Execution of the standard workload is tens of seconds, so by
    # default ONE program is timed and the measured null round-trip is
    # subtracted (single remote compile); BENCH_DIFFERENTIAL=1 switches
    # to the two-program differential that also cancels fixed per-call
    # costs.
    differential = os.environ.get("BENCH_DIFFERENTIAL", "0") == "1"

    def make_step(rounds):
        def step(scene, coord, normal, images, dscale, key):
            res = rf.refine_batch(
                scene, coord, normal, images, dscale, key,
                level=level, wsize=wsize, tau=tau, min_image_num=3,
                angle_threshold1=a1, ascale=math.pi / 48.0,
                rounds=rounds, n_cands=cands,
                shrink=defaults.refine_shrink,
                init_depth_radius=4.0, init_angle_radius=8.0,
                luma=luma, group_dma=defaults.refine_group_dma,
                rgb_tail=int(
                    os.environ.get(
                        "BENCH_RGB_TAIL", defaults.refine_rgb_tail
                    )
                ),
            )
            return res.ncc

        return jax.jit(step)

    key = jax.random.PRNGKey(0)

    def timed(fn, sub):
        t0 = time.time()
        r = np.asarray(fn(scene, coord, normal, images, dscale, sub))
        return time.time() - t0, r

    if differential:
        jlo = make_step(rounds_lo)
        jhi = make_step(rounds_hi)
        print(f"compiling ({rounds_lo} and {rounds_hi} rounds)...",
              file=sys.stderr)
        t0 = time.time()
        out = np.asarray(jlo(scene, coord, normal, images, dscale, key))
        np.asarray(jhi(scene, coord, normal, images, dscale, key))
        print(f"compile+first runs {time.time() - t0:.1f}s", file=sys.stderr)
        t_lo, t_hi = [], []
        for i in range(3):
            key, s1 = jax.random.split(key)
            key, s2 = jax.random.split(key)
            d1, out = timed(jlo, s1)
            d2, _ = timed(jhi, s2)
            t_lo.append(d1)
            t_hi.append(d2)
            print(f"  rep {i}: lo {d1*1e3:.0f} ms, hi {d2*1e3:.0f} ms",
                  file=sys.stderr)
        dt = max(1e-9, min(t_hi) - min(t_lo))
        evals_delta = (rounds_hi - rounds_lo) * cands
    else:
        jhi = make_step(rounds_hi)
        null = jax.jit(lambda c: c + 1.0)
        print(f"compiling ({rounds_hi} rounds)...", file=sys.stderr)
        t0 = time.time()
        out = np.asarray(jhi(scene, coord, normal, images, dscale, key))
        print(f"compile+first run {time.time() - t0:.1f}s", file=sys.stderr)
        np.asarray(null(coord))
        lat = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(null(coord))
            lat.append(time.time() - t0)
        latency = min(lat)
        times = []
        for i in range(2):
            key, s1 = jax.random.split(key)
            d1, out = timed(jhi, s1)
            times.append(d1)
            print(f"  rep {i}: {d1*1e3:.0f} ms (latency {latency*1e3:.0f})",
                  file=sys.stderr)
        dt = max(1e-9, min(times) - latency)
        # rounds * cands evaluations: the start pose scores as round
        # 0's pinned candidate 0 (pipeline/refine.py), no extra pass
        evals_delta = rounds_hi * cands

    samples = B * evals_delta * tau * wsize * wsize
    msps = samples / dt / 1e6
    print(
        f"batch {B}, delta {evals_delta} evals/patch in {dt*1e3:.1f} ms "
        f"-> {msps:.1f} Msamples/s "
        f"(median ncc {float(np.median(out)):.3f})",
        file=sys.stderr,
    )

    try:
        base = cpu_baseline_msps()
    except Exception as e:  # baseline failure must not kill the bench
        print(f"baseline failed: {e}", file=sys.stderr)
        base = None

    result = {
        "metric": "ncc_refine_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / base, 2) if base else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
