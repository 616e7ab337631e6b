"""Driver-level mesh integration (VERDICT r4 #4): PMMVS built with a
(dp, view, tile) mesh from config runs the SAME driver code path as
production — seed -> propagate -> filter -> final cloud — and the
tile-sharded driver equals the single-device driver bit-for-bit.

The reference baseline being replaced at scale is the single-threaded
serpentine sweep (reference pmmvps/propagate.cpp:78-121)."""

import jax
import numpy as np
import pytest

from mvskit_tpu.config import MVSConfig
from mvskit_tpu.pipeline.driver import PMMVS
from mvskit_tpu.utils import synthetic

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    td = str(tmp_path_factory.mktemp("ds"))
    synthetic.write_dataset(td, n_views=4, width=96, height=64, n_seeds=48)
    return td


def _cfg(prefix, **over):
    cfg = MVSConfig.from_option_file(prefix)
    cfg.n_iterations = 1
    cfg.prop_rounds = 2
    cfg.max_patches = 2048
    cfg.donor_budget = 128
    cfg.gauntlet_chunk = 128
    cfg.refine_rounds = 2
    cfg.refine_cands = 4
    for k, v in over.items():
        setattr(cfg, k, v)
    return cfg


def _run(cfg):
    eng = PMMVS(cfg, log=lambda *a: None)
    eng.run(write_snapshots=False)
    return eng.collect()


@pytest.fixture(scope="module")
def base_cloud(dataset):
    return _run(_cfg(dataset))


def test_tile_mesh_driver_bit_equal(dataset, base_cloud):
    """mesh_tile=8: the driver routes propagation through
    tiles.tiled_propagate_round with the same key stream; the final
    cloud must be identical to the single-device driver."""
    got = _run(_cfg(dataset, mesh_tile=8))
    want = base_cloud
    assert got["coord"].shape == want["coord"].shape
    np.testing.assert_array_equal(got["coord"], want["coord"])
    np.testing.assert_array_equal(got["normal"], want["normal"])
    np.testing.assert_array_equal(got["ncc"], want["ncc"])
    np.testing.assert_array_equal(got["images"], want["images"])


def test_combined_mesh_driver_runs(dataset, base_cloud):
    """(dp=2, view=2, tile=2): all three axes live in one driver run.
    View-psum contributions are disjoint (adding exact zeros), so the
    result should still match the single-device cloud."""
    got = _run(_cfg(dataset, mesh_dp=2, mesh_view=2, mesh_tile=2))
    want = base_cloud
    assert got["coord"].shape[0] > 0
    if got["coord"].shape == want["coord"].shape:
        np.testing.assert_allclose(
            got["coord"], want["coord"], atol=1e-5
        )
    else:  # sharded reductions reordered an accept boundary case
        assert abs(got["coord"].shape[0] - want["coord"].shape[0]) <= max(
            4, want["coord"].shape[0] // 10
        )
