"""Image pipeline tests: pyramid construction parity with the reference
algorithm (image/image.cpp:245-315, 717-747), bilinear sampling, masks."""

import jax.numpy as jnp
import numpy as np
import pytest

from mvskit_tpu.image import scene as sc
from mvskit_tpu.ops import sampling
from mvskit_tpu.utils import synthetic


def _reference_downsample(img):
    """Direct transcription of the reference pyramid loop semantics
    (image.cpp:260-312) for testing our vectorized version."""
    K = np.outer([1, 3, 3, 1], [1, 3, 3, 1]) / 64.0
    h, w = img.shape[:2]
    ho, wo = h // 2, w // 2
    out = np.zeros((ho, wo, 3), dtype=np.float64)
    for y in range(ho):
        for x in range(wo):
            c = np.zeros(3)
            for i in range(-1, 3):
                yt = 2 * y + i
                # image.cpp:270 skips only `h - 1 < ytmp`: the last
                # parent row/col contributes
                if yt < 0 or yt > h - 1:
                    continue
                for j in range(-1, 3):
                    xt = 2 * x + j
                    if xt < 0 or xt > w - 1:
                        continue
                    c += K[i + 1, j + 1] * img[yt, xt]
            out[y, x] = c
    return out


def test_pyramid_matches_reference_loop():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(20, 14, 3)).astype(np.uint8)
    ours = sc.downsample_once(img.astype(np.float32))
    ref = _reference_downsample(img.astype(np.float64))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_pyramid_quantization():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(32, 32, 3)).astype(np.uint8)
    levels = sc.build_pyramid(img, 3)
    assert levels[0].shape == (32, 32, 3)
    assert levels[1].shape == (16, 16, 3)
    assert levels[2].shape == (8, 8, 3)
    for lvl in levels:
        assert np.all(lvl == np.floor(lvl))  # integer-valued (u8 parity)
        assert lvl.min() >= 0 and lvl.max() <= 255


def test_mask_pyramid_or_dilates():
    mask = np.zeros((16, 16), dtype=np.uint8)
    mask[5, 7] = 255
    levels = sc.build_mask_pyramid(mask, 3)
    assert levels[1][2, 3] == 255  # 2x2 block containing (5,7)
    assert levels[1].sum() == 255  # only one cell set
    assert levels[2][1, 1] == 255


def test_scene_shapes():
    Ps, imgs, scene = synthetic.plane_scene(n_views=3, width=64, height=48)
    assert scene.planes.shape[0] == 3
    assert scene.widths == (64, 32, 16, 8)
    assert scene.heights == (48, 24, 12, 6)
    total = sum(w * h for w, h in zip(scene.widths, scene.heights))
    assert scene.planes.shape[2] == total


def test_bilinear_sampling_exact_on_lattice():
    Ps, imgs, scene = synthetic.plane_scene(n_views=2, width=64, height=48)
    # integer coords return the stored pixel
    col = sampling.sample_color(
        scene,
        jnp.asarray(1),
        jnp.asarray(10.0),
        jnp.asarray(7.0),
        jnp.asarray(0),
    )
    np.testing.assert_allclose(np.asarray(col), imgs[1][7, 10], atol=1e-4)
    # midpoint between two pixels = average
    col2 = sampling.sample_color(
        scene,
        jnp.asarray(1),
        jnp.asarray(10.5),
        jnp.asarray(7.0),
        jnp.asarray(0),
    )
    expect = (imgs[1][7, 10].astype(np.float64) + imgs[1][7, 11]) / 2.0
    np.testing.assert_allclose(np.asarray(col2), expect, atol=1e-4)


def test_sampling_levels():
    Ps, imgs, scene = synthetic.plane_scene(n_views=2, width=64, height=48)
    lvl1 = sc.build_pyramid(imgs[0], 2)[1]
    col = sampling.sample_color(
        scene,
        jnp.asarray(0),
        jnp.asarray(5.0),
        jnp.asarray(3.0),
        jnp.asarray(1),
    )
    np.testing.assert_allclose(np.asarray(col), lvl1[3, 5], atol=1e-4)


def test_mask_semantics():
    Ps = synthetic.ring_cameras(2, 32, 24)
    imgs = synthetic.render_plane_views(Ps, 32, 24)
    mask = np.full((24, 32), 255, dtype=np.uint8)
    mask[:, :16] = 0
    scene = sc.scene_from_arrays(Ps, list(imgs), masks=[mask, None], max_level=2)
    v = sampling.sample_mask(
        scene, jnp.asarray(0), jnp.asarray(20.0), jnp.asarray(5.0), jnp.asarray(0)
    )
    assert float(v) == 255.0
    v0 = sampling.sample_mask(
        scene, jnp.asarray(0), jnp.asarray(3.0), jnp.asarray(5.0), jnp.asarray(0)
    )
    assert float(v0) == 0.0
    oob = sampling.sample_mask(
        scene, jnp.asarray(0), jnp.asarray(-9.0), jnp.asarray(5.0), jnp.asarray(0)
    )
    assert float(oob) == -1.0


def test_scene_mask_ok_no_masks():
    Ps, imgs, scene = synthetic.plane_scene(n_views=2, width=32, height=24)
    coord = jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32)
    assert bool(sampling.scene_mask_ok(scene, coord, 0)[0])
