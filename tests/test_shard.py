"""Multi-device sharding tests on the 8-device virtual CPU mesh:
view-sharded NCC equals the single-device op; DP-sharded propagation
compiles and runs; halo exchange moves rows correctly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mvskit_tpu.ops import ncc as nccops
from mvskit_tpu.parallel import shard as sh
from mvskit_tpu.utils import synthetic

LEVEL = 1
WSIZE = 7
TAU = 6
A1 = np.deg2rad(60.0)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple devices"
)


@pytest.fixture(scope="module")
def sp():
    n = 8  # divisible by 2, 4, 8 device meshes
    Ps, imgs, scene = synthetic.plane_scene(n_views=n, width=160, height=120)
    coord, normal = synthetic.plane_points(Ps, 32, extent=0.6)
    views = np.tile(np.arange(n, dtype=np.int32), (32, 1))
    return scene, jnp.asarray(coord, jnp.float32), jnp.asarray(
        normal, jnp.float32
    ), jnp.asarray(views)


def test_view_sharded_ncc_matches_reference_op(sp):
    scene, coord, normal, views = sp
    expect = np.asarray(
        nccops.compute_patch_ncc(
            scene, views[:, :TAU], coord, normal, LEVEL, WSIZE, TAU, A1
        )
    )
    for k in (2, 4):
        mesh = sh.make_mesh(k, axis="view")
        vscene = sh.enable_view_sharding(scene, mesh)
        got = np.asarray(
            nccops.compute_patch_ncc(
                vscene, views[:, :TAU], coord, normal, LEVEL, WSIZE,
                TAU, A1,
            )
        )
        np.testing.assert_allclose(got, expect, atol=1e-5), k


def test_dp_sharded_propagation(sp):
    from mvskit_tpu.pipeline import propagate as pr
    from test_grid import make_seeded_table
    from test_propagate import make_params

    scene, coord, normal, views = sp
    table = make_seeded_table(scene, coord, normal, capacity=1024)
    mesh = sh.make_mesh(8, axis="dp")
    table_sharded = sh.shard_table(table, mesh)
    p = make_params(donor_budget=64, chunk=32, refine_rounds=2,
                    refine_cands=2)
    step = jax.jit(
        pr.propagate_round,
        static_argnames=("p", "direction", "use_depth"),
    )
    out, stats = step(
        scene, table_sharded, jax.random.PRNGKey(0), p=p, direction=1,
        ncc_threshold=jnp.float32(0.7),
        ncc_threshold_before=jnp.float32(0.4),
    )
    assert int(np.asarray(out.n_alive())) >= int(np.asarray(table.n_alive()))


# tile sharding (SP/CP) is covered by tests/test_tiles.py: the real
# row-sharded propagation round must equal the unsharded step exactly.
