"""NCC scoring tests on an analytically-known planar scene.

The reference has no tests; these assert the semantic properties the
algorithm depends on (reference optim.cpp:401-948): NCC near 1 at the
true surface, degrading with depth/normal error; robust transform;
weight semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvskit_tpu.geometry import camera as cam
from mvskit_tpu.ops import ncc
from mvskit_tpu.utils import synthetic

LEVEL = 1
WSIZE = 7
ANGLE1 = np.deg2rad(60.0)


@pytest.fixture(scope="module")
def scene_pts():
    Ps, imgs, scene = synthetic.plane_scene(n_views=6, width=160, height=120)
    coord, normal = synthetic.plane_points(Ps, 32, extent=1.0)
    views = np.tile(np.arange(6, dtype=np.int32), (32, 1))
    return scene, jnp.asarray(coord, jnp.float32), jnp.asarray(
        normal, jnp.float32
    ), jnp.asarray(views)


def test_robust_roundtrip():
    x = jnp.asarray([0.0, 0.1, 0.5, 1.5])
    r = ncc.robustincc(x)
    np.testing.assert_allclose(np.asarray(ncc.unrobustincc(r)), np.asarray(x), rtol=1e-5)


def test_ncc_high_at_truth(scene_pts):
    scene, coord, normal, views = scene_pts
    score = ncc.compute_patch_ncc(
        scene, views, coord, normal, LEVEL, WSIZE, 6, ANGLE1
    )
    score = np.asarray(score)
    assert np.median(score) > 0.95, score


def test_ncc_drops_off_surface(scene_pts):
    """A failed/invalid hypothesis scores ncc = 1 - unrobustincc(2) = 1.4
    exactly like the reference, so comparisons are over hypotheses valid
    in both configurations (ncc <= 1)."""
    scene, coord, normal, views = scene_pts
    off = coord + jnp.asarray([0.0, 0.0, 0.12, 0.0])
    s_true = np.asarray(
        ncc.compute_patch_ncc(scene, views, coord, normal, LEVEL, WSIZE, 6, ANGLE1)
    )
    s_off = np.asarray(
        ncc.compute_patch_ncc(scene, views, off, normal, LEVEL, WSIZE, 6, ANGLE1)
    )
    both = (s_true <= 1.0) & (s_off <= 1.0)
    assert both.sum() >= 8
    assert np.mean(s_true[both]) > np.mean(s_off[both]) + 0.03


def test_ncc_drops_with_wrong_normal(scene_pts):
    scene, coord, normal, views = scene_pts
    tilted = jnp.asarray(
        np.tile([[0.8, 0.0, 0.6, 0.0]], (coord.shape[0], 1)), jnp.float32
    )
    s_true = np.asarray(
        ncc.compute_patch_ncc(scene, views, coord, normal, LEVEL, WSIZE, 6, ANGLE1)
    )
    s_bad = np.asarray(
        ncc.compute_patch_ncc(scene, views, coord, tilted, LEVEL, WSIZE, 6, ANGLE1)
    )
    both = (s_true <= 1.0) & (s_bad <= 1.0)
    assert both.sum() >= 8
    assert np.mean(s_true[both]) > np.mean(s_bad[both])


def test_cost_low_at_truth(scene_pts):
    scene, coord, normal, views = scene_pts
    tex, valid = ncc.texs_for_views(
        scene, views, coord, normal, LEVEL, WSIZE, ANGLE1
    )
    ref_ok = np.asarray(valid[0])  # valid is [T, B]
    assert ref_ok.sum() >= 8
    cost = np.asarray(ncc.incc_cost(tex, valid, 3))
    assert np.median(cost[ref_ok]) < 0.02


def test_invalid_ref_gives_two(scene_pts):
    scene, coord, normal, views = scene_pts
    # point far outside every image -> windows invalid -> cost 2
    far = jnp.asarray([[50.0, 50.0, 0.0, 1.0]], jnp.float32)
    nrm = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float32)
    v = views[:1]
    tex, valid = ncc.texs_for_views(scene, v, far, nrm, LEVEL, WSIZE, ANGLE1)
    cost = float(ncc.incc_cost(tex, valid, 3)[0])
    assert cost == 2.0


def test_normalize_zero_mean_unit_rms():
    rng = np.random.RandomState(0)
    # windows-major rows [B, L]: 3 channel blocks of spad=56 lanes,
    # s=49 live samples each (the kernel's literal storage order)
    spad, s, C, B = 56, 49, 3, 4
    tex = jnp.asarray(rng.uniform(0, 255, size=(B, C * spad)), jnp.float32)
    out = ncc.normalize_tex(tex, C, s)
    o = np.asarray(out)
    for c in range(C):
        blk = o[:, c * spad : c * spad + s]
        # per-channel zero mean (scaled values)
        np.testing.assert_allclose(blk.mean(axis=-1), 0.0, atol=1e-3)
        # duplicate lanes zeroed
        np.testing.assert_allclose(
            o[:, c * spad + s : (c + 1) * spad], 0.0
        )
    # self-dot of a normalized window is 1 (the 1/sqrt(C*S) fold)
    np.testing.assert_allclose(
        np.asarray(ncc.tex_dot(out, out)), 1.0, atol=1e-3
    )


def test_weights_leq_one(scene_pts):
    scene, coord, normal, views = scene_pts
    w = np.asarray(ncc.compute_weights(scene, views, coord, normal, LEVEL))
    assert np.all(w <= 1.0 + 1e-6)
    np.testing.assert_allclose(w[:, 0], 1.0)


def test_jit_compiles(scene_pts):
    scene, coord, normal, views = scene_pts

    @jax.jit
    def f(c, n, v):
        return ncc.compute_patch_ncc(scene, v, c, n, LEVEL, WSIZE, 6, ANGLE1)

    out = f(coord, normal, views)
    assert out.shape == (coord.shape[0],)
