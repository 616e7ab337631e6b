"""Worker process for tests/test_multihost.py.

Each OS process joins the jax.distributed runtime (gloo CPU
collectives — the DCN stand-in), builds the SAME synthetic scene,
shards its pyramid planes over the global view mesh
(parallel/multihost.enable_view_sharding_global), and computes
view-sharded NCC. The result must equal the process-local unsharded
value: the cross-host psum reduction is exact, not approximate.

Run: python tests/multihost_worker.py <pid> <nproc> <port> <out.json>
"""

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    out_path = sys.argv[4]

    from mvskit_tpu.parallel import multihost as mh

    mh.init_distributed(
        f"localhost:{port}", num_processes=nproc, process_id=pid,
        local_device_count=2,
    )

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvskit_tpu.ops import ncc as nccops
    from mvskit_tpu.utils.synthetic import plane_points, plane_scene

    n_views = len(jax.devices())
    assert jax.process_count() == nproc, jax.process_count()

    # deterministic inputs -> identical (replicated) in every process
    Ps, _, scene = plane_scene(
        n_views=n_views, width=96, height=64, max_level=4
    )
    coord, normal = plane_points(Ps, 16, extent=0.6)
    coord = jnp.asarray(coord, jnp.float32)
    normal = jnp.asarray(normal, jnp.float32)
    views = jnp.asarray(
        np.tile(np.arange(n_views, dtype=np.int32), (16, 1))
    )
    a1 = math.radians(60.0)
    tau = min(6, n_views)

    def score(scn):
        return nccops.compute_patch_ncc(
            scn, views, coord, normal, 1, 7, tau, a1
        )

    # process-local unsharded value (local devices only)
    ref = np.asarray(jax.jit(score)(scene))

    # global view mesh spanning both processes; planes sharded over DCN
    mesh = mh.global_view_mesh()
    gscene = mh.enable_view_sharding_global(scene, mesh)
    got = mh.to_host_replicated(jax.jit(score)(gscene))

    ok = bool(np.allclose(got, ref, atol=1e-5))
    with open(out_path, "w") as f:
        json.dump(
            {
                "pid": pid,
                "processes": jax.process_count(),
                "global_devices": len(jax.devices()),
                "local_devices": len(jax.local_devices()),
                "max_abs_diff": float(np.max(np.abs(got - ref))),
                "ok": ok,
            },
            f,
        )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
