"""Grouped tile-DMA sampling (pallas_ncc group mode): K jittered
candidates of one (patch, view) share a single DMA'd tile. Numerics
must match the ungrouped kernel wherever the grouped fit bit holds
(interpret mode on CPU; the on-chip win is K x fewer DMA descriptors).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mvskit_tpu.geometry import camera as cam
from mvskit_tpu.ops import ncc as nccops
from mvskit_tpu.ops import pallas_ncc as pk
from mvskit_tpu.pipeline import refine as rf
from mvskit_tpu.utils import synthetic

LEVEL = 1
WSIZE = 7
A1 = np.deg2rad(60.0)
K = 4


def _grouped_batch(scene, n_base=8):
    """n_base base points, each with K slightly jittered variants
    (contiguous along the batch — the refine layout)."""
    Ps, _, _ = synthetic.plane_scene(n_views=4, width=160, height=120)
    coord, normal = synthetic.plane_points(Ps, n_base, extent=0.4)
    rng = np.random.default_rng(7)
    jit = rng.uniform(-1, 1, (n_base, K, 4)).astype(np.float32) * 0.004
    jit[..., 3] = 0.0
    jit[:, 0] = 0.0  # member 0 is the base point
    coords = (coord[:, None, :] + jit).reshape(n_base * K, 4)
    normals = np.repeat(normal, K, axis=0)
    return jnp.asarray(coords, jnp.float32), jnp.asarray(normals, jnp.float32)


def test_grouped_sampler_matches_ungrouped():
    _, _, scene = synthetic.plane_scene(n_views=4, width=160, height=120)
    coord, normal = _grouped_batch(scene)
    B = coord.shape[0]
    idx = jnp.zeros((B,), jnp.int32)
    px, py = cam.get_paxes(scene.cams, idx, coord, normal, LEVEL)
    tl, dx2, dy2, new_level, valid = nccops.window_geometry(
        scene, idx, coord, px, py, normal, LEVEL, WSIZE, A1
    )
    levels = pk.rgb_levels_from_scene(pk.enable_pallas(scene))

    out1, fit1 = pk.sample_windows(
        levels, idx, new_level, tl, dx2, dy2, rgb=True, interpret=True
    )
    outg, fitg = pk.sample_windows(
        levels, idx, new_level, tl, dx2, dy2, rgb=True, interpret=True,
        group=K,
    )
    f1 = np.asarray(fit1)
    fg = np.asarray(fitg)
    v = np.asarray(valid)
    # grouped fit only drops windows (bigger shared bbox, same guards)
    # and must keep the large majority of small-jitter candidates
    assert (fg & v).sum() >= 0.9 * (f1 & v).sum() > 0
    both = f1 & fg & v
    s = WSIZE * WSIZE
    a = np.asarray(out1)   # [B, 3*spad1] windows-major rows
    b = np.asarray(outg)   # [B, 3*spadg]
    spad1 = a.shape[-1] // 3
    spadg = b.shape[-1] // 3
    for c in range(3):
        np.testing.assert_allclose(
            b[:, c * spadg : c * spadg + s][both],
            a[:, c * spad1 : c * spad1 + s][both],
            atol=1e-3,
        )


def test_refine_group_dma_matches_ungrouped():
    """refine_batch with group_dma on/off must land on (nearly) the
    same refined patches — the grouped tile only changes which rare
    overflow candidates lose a view mid-search."""
    Ps, _, scene = synthetic.plane_scene(n_views=4, width=160, height=120)
    coord, normal = synthetic.plane_points(Ps, 10, extent=0.4)
    coord = jnp.asarray(coord, jnp.float32)
    normal = jnp.asarray(normal, jnp.float32)
    B = coord.shape[0]
    # perturb the start so refinement has work to do
    key = jax.random.PRNGKey(3)
    coord = coord + 0.01 * jax.random.normal(key, coord.shape)
    coord = coord.at[:, 3].set(1.0)
    images = jnp.broadcast_to(jnp.arange(4, dtype=jnp.int32)[None], (B, 4))
    dscale = jnp.full((B,), 0.01, jnp.float32)

    pscene = pk.enable_pallas(scene)
    kwargs = dict(
        level=LEVEL, wsize=WSIZE, tau=4, min_image_num=3,
        angle_threshold1=float(A1), ascale=float(np.pi / 48),
        rounds=4, n_cands=4, shrink=0.8,
        init_depth_radius=2.0, init_angle_radius=4.0,
    )
    r0 = rf.refine_batch(
        pscene, coord, normal, images, dscale, jax.random.PRNGKey(1),
        group_dma=False, **kwargs,
    )
    r1 = rf.refine_batch(
        pscene, coord, normal, images, dscale, jax.random.PRNGKey(1),
        group_dma=True, **kwargs,
    )
    d = np.linalg.norm(np.asarray(r0.coord - r1.coord)[:, :3], axis=1)
    # same RNG stream -> same candidates; allow a small minority to
    # diverge where the grouped fit dropped a view during the search
    assert np.median(d) < 1e-5, d
    assert (d < 1e-3).mean() >= 0.8, d
    nd = np.abs(np.asarray(r0.ncc - r1.ncc))
    assert np.median(nd) < 1e-4, nd
