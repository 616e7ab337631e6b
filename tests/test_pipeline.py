"""End-to-end pipeline tests on a synthetic written dataset: seeding
from PLYs, the full iteration loop, checkpoint resume, and the CLI."""

import os
import subprocess
import sys

import numpy as np
import pytest

from mvskit_tpu.config import MVSConfig
from mvskit_tpu.io import ply
from mvskit_tpu.pipeline.driver import PMMVS
from mvskit_tpu.utils import synthetic


def small_cfg(prefix):
    cfg = MVSConfig.from_option_file(prefix)
    # small budgets for CPU tests
    cfg.max_patches = 4096
    cfg.donor_budget = 512
    cfg.gauntlet_chunk = 256
    cfg.refine_rounds = 6
    cfg.refine_cands = 4
    cfg.prop_rounds = 2
    cfg.n_iterations = 1
    return cfg


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    prefix = str(tmp_path_factory.mktemp("scene"))
    synthetic.write_dataset(prefix, n_views=6, width=160, height=120,
                            n_seeds=48)
    return prefix


def test_seed_from_plys(dataset):
    cfg = small_cfg(dataset)
    engine = PMMVS(cfg, log=lambda *a: None)
    engine.seed()
    n = int(np.asarray(engine.table.n_alive()))
    assert n >= 30
    # seeds sit on the plane with upward normals
    alive = np.asarray(engine.table.alive)
    z = np.asarray(engine.table.coord)[alive, 2]
    np.testing.assert_allclose(z, 0.0, atol=1e-4)
    nz = np.asarray(engine.table.normal)[alive, 2]
    assert np.all(nz > 0.9)
    ncc = np.asarray(engine.table.ncc)[alive]
    assert np.median(ncc) > 0.9


def test_full_pipeline_and_outputs(dataset):
    cfg = small_cfg(dataset)
    engine = PMMVS(cfg, log=lambda *a: None)
    engine.seed()
    n0 = int(np.asarray(engine.table.n_alive()))
    engine.run(write_snapshots=True)
    n1 = int(np.asarray(engine.table.n_alive()))
    assert n1 > n0  # propagation grew the cloud

    alive = np.asarray(engine.table.alive)
    z = np.abs(np.asarray(engine.table.coord)[alive, 2])
    assert np.median(z) < 0.05  # reconstruction stays on the surface

    snap = os.path.join(dataset, "ply", "refined_patches_0.ply")
    assert os.path.exists(snap)
    d = ply.read_ply(snap)
    assert d["xyz"].shape[0] == n1
    assert "normal" in d and "rgb" in d

    # checkpoint + resume
    out = os.path.join(dataset, "ply", "00000001")
    engine.write_patches(out, export_ply=False, export_patch=True)
    engine2 = PMMVS(cfg, scene=engine.scene, log=lambda *a: None)
    engine2.seed(resume_iter=1)
    n2 = int(np.asarray(engine2.table.n_alive()))
    assert n2 == n1
    engine2.filter()  # the reference's filter-only resume path


def test_cli_filter_only(dataset):
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    out = os.path.join(dataset, "ply", "cli_out")
    res = subprocess.run(
        [
            sys.executable, "-m", "mvskit_tpu", dataset,
            "--filter-only", "--resume-iter", "1",
            "--platform", "cpu", "--out", out,
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert os.path.exists(out + ".ply")


def test_pipeline_accuracy_completeness(dataset):
    """Quality gate: the reconstructed cloud must be accurate (on the
    analytic plane) and complete (covering the seeded region)."""
    from mvskit_tpu.utils import metrics

    cfg = small_cfg(dataset)
    engine = PMMVS(cfg, log=lambda *a: None)
    engine.seed()
    engine.run(write_snapshots=False)
    data = engine.collect()
    cloud = data["coord"][:, :3]

    # ground truth: plane samples over the observed extent
    g = np.linspace(-0.8, 0.8, 160)
    xs, ys = np.meshgrid(g, g)
    gt = np.stack([xs.ravel(), ys.ravel(), np.zeros(xs.size)], axis=1)

    m = metrics.accuracy_completeness(cloud, gt, threshold=0.05)
    assert m["acc_median"] < 0.02, m      # points lie on the plane
    assert metrics.plane_rms(cloud) < 0.1, m
    assert m["n_cloud"] > 50
