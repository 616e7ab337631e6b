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

    # jnp luma reference windows, normalized: [1, T=1, S, B] -> [S, B]
    tex_jnp, v2 = nccops.texs_for_views(
        scene, views, coord, normal, LEVEL, WSIZE, A1, luma=True
    )
    ref = np.asarray(tex_jnp)[0, 0]  # [S, B]

    levels = pk.luma_levels_from_scene(scene)
    out = pk.sample_windows(
        levels, idx, new_level, tl, dx2, dy2, interpret=True
    )
    got = np.asarray(out)[: WSIZE * WSIZE]  # [S, B]

    # compare normalized windows where valid (both zero-mean/unit-RMS)
    for b in range(B):
        if not valid[b]:
            continue
        np.testing.assert_allclose(got[:, b], ref[:, b], atol=5e-2), b
    # padding rows are zero
    np.testing.assert_allclose(np.asarray(out)[WSIZE * WSIZE :], 0.0)
