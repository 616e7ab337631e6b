"""Pallas window-sampling kernel: numerics vs the jnp path (interpret
mode on CPU; on-chip tuning is a round-2 item)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvskit_tpu.ops import ncc as nccops
from mvskit_tpu.ops import pallas_ncc as pk
from mvskit_tpu.geometry import camera as cam
from mvskit_tpu.utils import synthetic

LEVEL = 1
WSIZE = 7
A1 = np.deg2rad(60.0)


def test_pallas_matches_jnp_sampler():
    Ps, imgs, scene = synthetic.plane_scene(n_views=4, width=160, height=120)
    coord, normal = synthetic.plane_points(Ps, 12, extent=0.5)
    coord = jnp.asarray(coord, jnp.float32)
    normal = jnp.asarray(normal, jnp.float32)
    B = coord.shape[0]
    views = jnp.zeros((B, 1), jnp.int32)  # all windows in view 0

    # geometry from the shared helper (identical on both paths)
    idx = jnp.zeros((B,), jnp.int32)
    px, py = cam.get_paxes(scene.cams, idx, coord, normal, LEVEL)
    tl, dx2, dy2, new_level, valid = nccops.window_geometry(
        scene, idx, coord, px, py, normal, LEVEL, WSIZE, A1
    )
    valid = np.asarray(valid)
    assert valid.sum() >= 8

    # jnp luma reference windows, normalized windows-major:
    # [T=1, B, S] -> [B, S]
    tex_jnp, v2 = nccops.texs_for_views(
        scene, views, coord, normal, LEVEL, WSIZE, A1, luma=True
    )
    S = WSIZE * WSIZE
    ref = np.asarray(tex_jnp)[0][:, :S]  # [B, S]

    levels = pk.luma_levels_from_scene(scene)
    out, fit = pk.sample_windows(
        levels, idx, new_level, tl, dx2, dy2, interpret=True
    )
    assert np.asarray(fit)[np.asarray(valid)].all()
    # kernel output is RAW [B, SPAD] rows; normalize like the consumer
    got = np.asarray(nccops.normalize_tex(out[None], 1, S))[0][:, :S]

    # compare normalized windows where valid (both zero-mean, scaled by
    # the 1/sqrt(S) fold)
    for b in range(B):
        if not valid[b]:
            continue
        np.testing.assert_allclose(got[b], ref[b], atol=1e-2), b


def test_texs_for_views_pallas_branch_matches_jnp():
    """enable_pallas_luma routes texs_for_views(luma=True) through the
    kernel (interpret mode on CPU) and must agree with the gather path
    wherever both mark the window valid."""
    Ps, _, scene = synthetic.plane_scene(n_views=4, width=160, height=120)
    coord, normal = synthetic.plane_points(Ps, 16, extent=0.5)
    coord = jnp.asarray(coord, jnp.float32)
    normal = jnp.asarray(normal, jnp.float32)
    B = coord.shape[0]
    views = jnp.broadcast_to(
        jnp.arange(3, dtype=jnp.int32)[None], (B, 3)
    )

    tex_ref, val_ref = nccops.texs_for_views(
        scene, views, coord, normal, LEVEL, WSIZE, A1, luma=True
    )
    pscene = pk.enable_pallas_luma(scene)
    tex_pal, val_pal = nccops.texs_for_views(
        pscene, views, coord, normal, LEVEL, WSIZE, A1, luma=True
    )
    S = WSIZE * WSIZE
    assert tex_ref.shape == (3, B, S)        # gather path: L = S
    assert tex_pal.shape[:2] == (3, B)       # kernel path: L = SPAD
    vr = np.asarray(val_ref)
    vp = np.asarray(val_pal)
    # pallas validity additionally masks tile-overflow windows
    assert (~vr | vp | ~vp).all()  # vp implies vr may differ only by fit
    both = vr & vp
    assert both.sum() >= 8
    np.testing.assert_allclose(
        np.asarray(tex_pal)[..., :S][both],
        np.asarray(tex_ref)[..., :S][both],
        atol=1e-2,
    )

    # the full NCC aggregation agrees too
    w = jnp.ones((B, 3), jnp.float32)
    _check_aggregation(tex_ref, tex_pal, both, w)


def _check_aggregation(tex_ref, tex_pal, both, w):
    s_ref = nccops.incc_weighted(
        jnp.where(jnp.asarray(both)[:, :, None], tex_ref, 0.0),
        jnp.asarray(both), w,
    )
    s_pal = nccops.incc_weighted(
        jnp.where(jnp.asarray(both)[:, :, None], tex_pal, 0.0),
        jnp.asarray(both), w,
    )
    np.testing.assert_allclose(
        np.asarray(s_pal), np.asarray(s_ref), atol=2e-2
    )


def test_texs_for_views_pallas_rgb_matches_jnp():
    """The RGB kernel (packed int32 tiles, 3-channel joint
    normalization) is the DEFAULT path once enable_pallas populates
    planes_rgb_levels; it must agree with the packed-gather path."""
    Ps, _, scene = synthetic.plane_scene(n_views=4, width=160, height=120)
    coord, normal = synthetic.plane_points(Ps, 16, extent=0.5)
    coord = jnp.asarray(coord, jnp.float32)
    normal = jnp.asarray(normal, jnp.float32)
    B = coord.shape[0]
    views = jnp.broadcast_to(
        jnp.arange(3, dtype=jnp.int32)[None], (B, 3)
    )

    tex_ref, val_ref = nccops.texs_for_views(
        scene, views, coord, normal, LEVEL, WSIZE, A1
    )
    pscene = pk.enable_pallas(scene)
    assert pscene.planes_rgb_levels is not None
    tex_pal, val_pal = nccops.texs_for_views(
        pscene, views, coord, normal, LEVEL, WSIZE, A1
    )
    S = WSIZE * WSIZE
    assert tex_ref.shape == (3, B, 3 * S)    # gather: 3 blocks of S
    assert tex_pal.shape[:2] == (3, B)       # kernel: 3 blocks of SPAD
    spad = tex_pal.shape[-1] // 3
    vr = np.asarray(val_ref)
    vp = np.asarray(val_pal)
    both = vr & vp
    assert both.sum() >= 8
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(tex_pal)[..., c * spad : c * spad + S][both],
            np.asarray(tex_ref)[..., c * S : (c + 1) * S][both],
            atol=1e-2,
        )
    w = jnp.ones((B, 3), jnp.float32)
    _check_aggregation(tex_ref, tex_pal, both, w)


def test_host_built_levels_match_device_path():
    """scene_from_arrays(pallas_levels=True) builds the kernel operand
    planes host-side (numpy) — must be bit-identical to enable_pallas's
    on-device derivation (the path it replaces for init speed)."""
    from mvskit_tpu.image import scene as sc

    rng = np.random.default_rng(3)
    n, H, W = 3, 64, 96
    imgs = [rng.integers(0, 256, (H, W, 3), dtype=np.uint8) for _ in range(n)]
    Ps = np.tile(np.eye(3, 4), (n, 1, 1)) + 0.01 * rng.standard_normal((n, 3, 4))
    s_host = sc.scene_from_arrays(Ps, imgs, max_level=3, pallas_levels=True)
    s_dev = pk.enable_pallas(sc.scene_from_arrays(Ps, imgs, max_level=3))
    for a, b in zip(s_host.planes_luma_levels, s_dev.planes_luma_levels):
        assert a.shape == b.shape and a.dtype == b.dtype
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(s_host.planes_rgb_levels, s_dev.planes_rgb_levels):
        assert a.shape == b.shape and a.dtype == b.dtype
        assert np.array_equal(np.asarray(a), np.asarray(b))
