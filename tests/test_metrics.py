"""Metrics tests."""

import numpy as np

from mvskit_tpu.utils import metrics


def test_accuracy_completeness_identity():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, size=(200, 3))
    m = metrics.accuracy_completeness(pts, pts, threshold=0.01)
    assert m["acc_mean"] < 1e-6 and m["comp_mean"] < 1e-6
    assert m["acc_frac"] == 1.0 and m["comp_frac"] == 1.0
    assert metrics.f_score(m) == 1.0


def test_accuracy_completeness_offsets():
    gt = np.zeros((100, 3))
    gt[:, 0] = np.linspace(0, 10, 100)
    cloud = gt.copy()
    cloud[:, 2] += 0.05  # uniform 5cm error
    m = metrics.accuracy_completeness(cloud, gt, threshold=0.1)
    assert abs(m["acc_mean"] - 0.05) < 1e-6
    assert m["acc_frac"] == 1.0
    m2 = metrics.accuracy_completeness(cloud, gt, threshold=0.01)
    assert m2["acc_frac"] == 0.0
    # half-coverage completeness
    m3 = metrics.accuracy_completeness(cloud[:50], gt, threshold=0.1)
    assert m3["comp_frac"] < 1.0


def test_plane_rms():
    cloud = np.zeros((10, 3))
    cloud[:, 2] = 0.1
    assert abs(metrics.plane_rms(cloud) - 0.1) < 1e-9


def test_pairwise_view_distances():
    from mvskit_tpu.image.scene import pairwise_view_distances
    from mvskit_tpu.utils import synthetic

    Ps, imgs, scene = synthetic.plane_scene(n_views=4, width=64, height=48)
    d = pairwise_view_distances(scene)
    assert d.shape == (4, 4)
    assert np.allclose(np.diag(d), np.maximum(0, 1 - 1 - np.cos(np.deg2rad(10))) )
    # symmetric in center-distance part, farther views bigger
    assert d[0, 3] > d[0, 1] * 0.5


def test_accuracy_crop_to_gt_bbox():
    """crop_to_gt_bbox evaluates accuracy only inside the GT volume
    (the DTU observation-crop convention): on-surface points beyond
    the sampled GT extent must not count as inaccurate."""
    rng = np.random.default_rng(0)
    gt = rng.uniform(-1, 1, (500, 3))
    inside = gt[:250] + 1e-4
    outside = inside.copy()
    outside[:, 0] += 10.0  # far outside the GT bbox
    cloud = np.concatenate([inside, outside])
    m = metrics.accuracy_completeness(cloud, gt, threshold=0.05)
    assert m["acc_frac"] <= 0.5  # uncropped: half the cloud "inaccurate"
    mc = metrics.accuracy_completeness(
        cloud, gt, threshold=0.05, crop_to_gt_bbox=True
    )
    assert mc["acc_frac"] == 1.0
    assert mc["n_cloud_in_gt_bbox"] == 250
    assert mc["n_cloud"] == 500
    # completeness unaffected by the crop
    assert mc["comp_frac"] == m["comp_frac"]
