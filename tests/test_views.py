"""View-selection gauntlet tests (reference optim.cpp:137-398 parity
properties) on the analytic plane scene."""

import jax.numpy as jnp
import numpy as np
import pytest

from mvskit_tpu.core import patches as pt
from mvskit_tpu.pipeline import views as vw
from mvskit_tpu.utils import synthetic

LEVEL = 1
WSIZE = 7
TAU = 6
A0 = np.deg2rad(60.0)
A1 = np.deg2rad(60.0)
MAXA = np.deg2rad(10.0)


@pytest.fixture(scope="module")
def sp():
    Ps, imgs, scene = synthetic.plane_scene(n_views=8, width=160, height=120)
    coord, normal = synthetic.plane_points(Ps, 16, extent=0.6)
    return scene, jnp.asarray(coord, jnp.float32), jnp.asarray(normal, jnp.float32)


def _ref_only(B, M, ref=0):
    images = np.full((B, M), -1, np.int32)
    images[:, 0] = ref
    return jnp.asarray(images)


def test_add_images_expands(sp):
    scene, coord, normal = sp
    images = _ref_only(coord.shape[0], scene.n_images)
    out = vw.add_images(scene, coord, normal, images, LEVEL, A0)
    out = np.asarray(out)
    assert np.all(out[:, 0] == 0)  # ref stays first
    counts = (out >= 0).sum(axis=1)
    assert np.all(counts >= 4)  # interior points visible in most views
    # appended views are in ascending id order
    for row in out:
        tail = row[1:][row[1:] >= 0]
        assert np.all(np.diff(tail) > 0)


def test_member_mask_and_positions():
    lst = jnp.asarray([[2, 0, -1, -1], [3, 1, 2, -1]], jnp.int32)
    mm = np.asarray(pt.member_mask(lst, 4))
    assert mm.tolist() == [
        [True, False, True, False],
        [False, True, True, True],
    ]
    pos = np.asarray(pt.position_in_list(lst, 4))
    assert pos[0, 2] == 0 and pos[0, 0] == 1 and pos[0, 1] == 4
    assert pos[1, 3] == 0 and pos[1, 1] == 1 and pos[1, 2] == 2


def test_compact_list_preserves_order():
    lst = jnp.asarray([[5, 3, 7, 1, -1]], jnp.int32)
    keep = jnp.asarray([[True, False, True, True, True]])
    out = np.asarray(vw.compact_list(lst, keep))
    assert out.tolist() == [[5, 7, 1, -1, -1]]


def test_constraint_images_keeps_consistent_views(sp):
    scene, coord, normal = sp
    images = _ref_only(coord.shape[0], scene.n_images)
    images = vw.add_images(scene, coord, normal, images, LEVEL, A0)
    out = vw.constraint_images(
        scene, coord, normal, images, LEVEL, WSIZE, A1, 0.4
    )
    counts = np.asarray(pt.count_valid(out))
    assert np.median(counts) >= 4  # true-surface patches stay consistent
    assert np.all(np.asarray(out)[:, 0] == 0)


def test_sort_images_pins_ref_when_fixed(sp):
    scene, coord, normal = sp
    images = _ref_only(coord.shape[0], scene.n_images, ref=2)
    images = vw.add_images(scene, coord, normal, images, LEVEL, A0)
    out = vw.sort_images(scene, coord, normal, images, LEVEL, is_fixed=True)
    out_np = np.asarray(out)
    ok = out_np[:, 0] >= 0
    assert ok.sum() > 8
    assert np.all(out_np[ok, 0] == 2)
    # members preserved as a set
    for before, after in zip(np.asarray(images)[ok], out_np[ok]):
        assert set(after[after >= 0]) <= set(before[before >= 0])


def test_filter_images_by_angle_kills_on_ref_fail(sp):
    scene, coord, normal = sp
    B = coord.shape[0]
    images = _ref_only(B, scene.n_images)
    images = vw.add_images(scene, coord, normal, images, LEVEL, A0)
    # flip the normal: every view now sees the back side -> ref fails
    out = vw.filter_images_by_angle(scene, coord, -normal, images, A1)
    assert np.all(np.asarray(out) == -1)
    # true normal: everything survives
    out2 = vw.filter_images_by_angle(scene, coord, normal, images, A1)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(images))


def test_set_ref_image_is_permutation(sp):
    scene, coord, normal = sp
    images = _ref_only(coord.shape[0], scene.n_images)
    images = vw.add_images(scene, coord, normal, images, LEVEL, A0)
    out = vw.set_ref_image(scene, coord, normal, images, LEVEL, WSIZE, A1)
    for before, after in zip(np.asarray(images), np.asarray(out)):
        assert sorted(before.tolist()) == sorted(after.tolist())


def test_check_angles(sp):
    scene, coord, normal = sp
    B = coord.shape[0]
    # single view: no pair -> fail
    one = _ref_only(B, scene.n_images)
    assert not np.any(np.asarray(vw.check_angles(scene, coord, one, MAXA, A1)))
    # ring cameras subtend >10 deg pairs
    images = vw.add_images(scene, coord, normal, one, LEVEL, A0)
    assert np.all(np.asarray(vw.check_angles(scene, coord, images, MAXA, A1)))


def test_set_scales_halfpixel_property(sp):
    """Moving the patch dscale along the ref ray moves the other views'
    projections by ~1 px on average (patch_manager.cpp:388-396; the
    reference comment says half-pixel, but the code computes
    dscale = unit2 / mean_motion(unit2), i.e. one pixel)."""
    scene, coord, normal = sp
    images = _ref_only(coord.shape[0], scene.n_images)
    images = vw.add_images(scene, coord, normal, images, LEVEL, A0)
    images = vw.sort_images(scene, coord, normal, images, LEVEL)
    dscale, ascale = vw.set_scales(scene, coord, images, LEVEL, TAU, WSIZE)
    ds = np.asarray(dscale)
    ok = np.asarray(images[:, 0]) >= 0
    assert np.all(ds[ok] > 0)
    assert np.all(np.asarray(ascale)[ok] > 0)

    from mvskit_tpu.geometry import camera as cam

    ref = jnp.maximum(images[:, 0], 0)
    ray = coord - scene.cams.center[ref]
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    moved = coord - dscale[:, None] * ray
    motions = []
    for i in range(1, TAU):
        v = jnp.maximum(images[:, i], 0)
        xy0, _, _ = cam.project(scene.cams, v, coord, LEVEL)
        xy1, _, _ = cam.project(scene.cams, v, moved, LEVEL)
        m = np.linalg.norm(np.asarray(xy0 - xy1), axis=-1)
        motions.append(np.where(np.asarray(images[:, i]) >= 0, m, np.nan))
    mean_motion = np.nanmean(np.stack(motions), axis=0)
    np.testing.assert_allclose(mean_motion[ok], 1.0, rtol=0.2)


def test_pre_process_ok_at_truth(sp):
    scene, coord, normal = sp
    images = _ref_only(coord.shape[0], scene.n_images)
    res = vw.pre_process(
        scene, coord, normal, images,
        level=LEVEL, wsize=WSIZE, tau=TAU, min_image_num=3,
        ncc_threshold_before=0.4, angle_threshold0=A0, angle_threshold1=A1,
        max_angle_threshold=MAXA,
    )
    assert np.asarray(res.ok).sum() >= 10
    ok = np.asarray(res.ok)
    assert np.all(np.asarray(pt.count_valid(res.images))[ok] >= 3)


def test_post_process_ok_at_truth(sp):
    scene, coord, normal = sp
    images = _ref_only(coord.shape[0], scene.n_images)
    res = vw.pre_process(
        scene, coord, normal, images,
        level=LEVEL, wsize=WSIZE, tau=TAU, min_image_num=3,
        ncc_threshold_before=0.4, angle_threshold0=A0, angle_threshold1=A1,
        max_angle_threshold=MAXA,
    )
    imgs2, ok, score = vw.post_process_core(
        scene, coord, normal, res.images,
        level=LEVEL, wsize=WSIZE, tau=TAU, min_image_num=3,
        ncc_threshold=0.7, angle_threshold0=A0, angle_threshold1=A1,
    )
    ok = np.asarray(ok)
    assert ok.sum() >= 10
    assert np.median(np.asarray(score)[ok]) > 0.9
