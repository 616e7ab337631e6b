"""Synthetic calibrated scenes for tests and benchmarks.

The reference repo ships no data and no tests (SURVEY.md §4); this
module provides analytically-known scenes: a textured plane (z = 0)
observed by a ring of pinhole cameras. The texture is a band-limited
random Fourier series, so images are smooth (bilinear-friendly) and the
true color at any surface point is known in closed form — which makes
NCC ground-truth assertions exact rather than golden-file based.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np


def procedural_texture(u, v, seed: int = 0, ncomp: int = 24):
    """Smooth RGB texture on the plane. u, v arbitrary-shaped arrays.

    Returns float in [0, 255] with shape u.shape + (3,)."""
    rng = np.random.RandomState(seed)
    freqs = rng.uniform(0.6, 6.0, size=(3, ncomp, 2))
    phases = rng.uniform(0, 2 * math.pi, size=(3, ncomp))
    amps = rng.uniform(0.3, 1.0, size=(3, ncomp))
    amps /= amps.sum(axis=1, keepdims=True)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    out = np.zeros(u.shape + (3,), dtype=np.float64)
    for c in range(3):
        acc = np.zeros_like(u)
        for k in range(ncomp):
            acc += amps[c, k] * np.sin(
                freqs[c, k, 0] * u + freqs[c, k, 1] * v + phases[c, k]
            )
        out[..., c] = acc
    return (out * 0.5 + 0.5) * 220.0 + 15.0


def ring_cameras(
    n_views: int,
    width: int,
    height: int,
    focal: float = 600.0,
    radius: float = 6.0,
    elevation: float = 4.0,
    target=(0.0, 0.0, 0.0),
) -> np.ndarray:
    """Pinhole cameras on a ring above the z=0 plane, looking at target.

    Returns P [n, 3, 4] float64."""
    target = np.asarray(target, dtype=np.float64)
    Ps = []
    for i in range(n_views):
        ang = 2 * math.pi * i / max(n_views, 1) * 0.6  # partial arc
        C = np.array(
            [radius * math.cos(ang), radius * math.sin(ang), elevation]
        )
        z = target - C
        z /= np.linalg.norm(z)
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(z, up)
        if np.linalg.norm(x) < 1e-8:
            x = np.array([1.0, 0.0, 0.0])
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])  # world -> cam rows
        t = -R @ C
        K = np.array(
            [
                [focal, 0.0, width / 2.0],
                [0.0, focal, height / 2.0],
                [0.0, 0.0, 1.0],
            ]
        )
        Ps.append(K @ np.concatenate([R, t[:, None]], axis=1))
    return np.stack(Ps)


def render_plane_views(
    Ps: np.ndarray,
    width: int,
    height: int,
    seed: int = 0,
) -> np.ndarray:
    """Render the textured z=0 plane into each view.

    Returns uint8 [n, H, W, 3]. Pixels whose ray misses the plane in
    front of the camera get mid-gray."""
    n = Ps.shape[0]
    out = np.zeros((n, height, width, 3), dtype=np.uint8)
    xs, ys = np.meshgrid(np.arange(width), np.arange(height))
    pix = np.stack([xs + 0.0, ys + 0.0, np.ones_like(xs, dtype=np.float64)], -1)
    for i in range(n):
        M = Ps[i][:, :3]
        q = Ps[i][:, 3]
        Minv = np.linalg.inv(M)
        C = -Minv @ q
        dirs = np.einsum("ij,hwj->hwi", Minv, pix)
        t = -C[2] / dirs[..., 2]
        pts = C[None, None, :] + t[..., None] * dirs
        tex = procedural_texture(pts[..., 0], pts[..., 1], seed=seed)
        good = (t > 0) & np.isfinite(t)
        img = np.where(good[..., None], tex, 128.0)
        out[i] = np.clip(np.floor(img + 0.5), 0, 255).astype(np.uint8)
    return out


def plane_scene(
    n_views: int = 6,
    width: int = 160,
    height: int = 120,
    max_level: int = 4,
    seed: int = 0,
    focal: float = 600.0,
):
    """Convenience: cameras + rendered images + Scene object."""
    from ..image.scene import scene_from_arrays

    Ps = ring_cameras(n_views, width, height, focal=focal)
    imgs = render_plane_views(Ps, width, height, seed=seed)
    scene = scene_from_arrays(Ps, list(imgs), max_level=max_level)
    return Ps, imgs, scene


def write_dataset(
    prefix: str,
    n_views: int = 6,
    width: int = 160,
    height: int = 120,
    n_seeds: int = 64,
    seed: int = 0,
    level: int = 1,
    csize: int = 2,
    wsize: int = 7,
    min_image_num: int = 3,
    normal_stride: int = 2,
) -> None:
    """Write a complete dataset directory in the reference's contract
    (SURVEY.md §1): option file, image/%04d%04d.ppm, txt/%08d.txt
    CONTOUR cameras, ply/00000000.ply seed cloud and per-view
    pixel-indexed camera-frame normal maps ply/%08d.ply."""
    import os

    from ..io import ply as plyio

    os.makedirs(os.path.join(prefix, "image"), exist_ok=True)
    os.makedirs(os.path.join(prefix, "txt"), exist_ok=True)
    os.makedirs(os.path.join(prefix, "ply"), exist_ok=True)

    Ps = ring_cameras(n_views, width, height)
    imgs = render_plane_views(Ps, width, height, seed=seed)

    with open(os.path.join(prefix, "option"), "w") as f:
        f.write(
            f"level {level}\ncsize {csize}\nthreshold 0.7\nwsize {wsize}\n"
            f"minImageNum {min_image_num}\nCPU 8\nmaxAngle 10\nquad 2.5\n"
            f"images -1 0 {n_views}\n"
        )

    for i in range(n_views):
        # binary PPM (P6)
        with open(
            os.path.join(prefix, "image", f"{i:04d}{0:04d}.ppm"), "wb"
        ) as f:
            f.write(f"P6\n{width} {height}\n255\n".encode())
            f.write(imgs[i].tobytes())
        # CONTOUR camera
        flat = Ps[i].reshape(-1)
        with open(os.path.join(prefix, "txt", f"{i:08d}.txt"), "w") as f:
            f.write("CONTOUR\n")
            f.write(" ".join(repr(float(v)) for v in flat[:6]) + "\n")
            f.write(" ".join(repr(float(v)) for v in flat[6:12]) + "\n")

    # seed cloud on the true surface
    coord, _ = plane_points(Ps, n_seeds, seed=seed + 1, extent=0.8)
    plyio.write_ply(
        os.path.join(prefix, "ply", "00000000.ply"), coord[:, :3]
    )

    # Per-view normal maps. The reference decodes these as
    # n_world = R @ n_file with R the world->camera rotation
    # (depth_normal_init.cpp:134-138), so the writer emits
    # n_file = R^T @ n_world to round-trip under that convention.
    from ..pipeline.seed import rq_decompose

    n_world = np.array([0.0, 0.0, 1.0])
    for i in range(n_views):
        _, R = rq_decompose(Ps[i][:, :3])
        n_cam = R.T @ n_world
        xs, ys = np.meshgrid(
            np.arange(0, width, normal_stride),
            np.arange(0, height, normal_stride),
        )
        pts = np.stack(
            [xs.ravel(), ys.ravel(), np.zeros(xs.size)], axis=1
        ).astype(np.float64)
        normals = np.tile(n_cam, (pts.shape[0], 1))
        plyio.write_ply(
            os.path.join(prefix, "ply", f"{i + 1:08d}.ply"), pts,
            normal=normals,
        )


def plane_points(
    Ps: np.ndarray, n_points: int, seed: int = 1, extent: float = 1.5
) -> Tuple[np.ndarray, np.ndarray]:
    """Random ground-truth surface points + normals on the z=0 plane,
    restricted to the region all cameras see. Returns (coord[N,4],
    normal[N,4]) with the plane normal pointing up (toward cameras)."""
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-extent, extent, size=(n_points, 2))
    coord = np.concatenate(
        [pts, np.zeros((n_points, 1)), np.ones((n_points, 1))], axis=1
    )
    normal = np.tile(
        np.array([[0.0, 0.0, 1.0, 0.0]]), (n_points, 1)
    )
    return coord, normal
