"""Host-side (numpy) data-prep ops for DataLoader workers.

These mirror the reference's CPU data path exactly (they run per-item inside
loader processes where touching the accelerator is wrong):
  * FPS with 5x-npoint random pre-subsample
    (/root/reference/datasets/data_utils.py:138-162)
  * ball crop with radius growth + duplicate-to-num_points
    (/root/reference/datasets/nocs_data/nocs_data_process.py:92-109)
  * perturbation vectors (nocs_data_process.py:112-130)
"""
from __future__ import annotations

import numpy as np


def farthest_point_sample(xyz: np.ndarray, npoint: int,
                          rng: np.random.RandomState | None = None,
                          presample_factor: int = 5) -> np.ndarray:
    """Exact iterative FPS on [N, 3] -> [npoint] indices, with the
    reference's random pre-subsample to 5*npoint for large inputs."""
    rng = rng or np.random
    n = len(xyz)
    if n > presample_factor * npoint:
        pre = rng.permutation(n)[:presample_factor * npoint]
        sub_idx = _fps_exact(xyz[pre], npoint, rng)
        return pre[sub_idx]
    return _fps_exact(xyz, npoint, rng)


def _fps_exact(xyz: np.ndarray, npoint: int, rng) -> np.ndarray:
    from captra_tpu.data import native
    if native.available():
        return native.fps(xyz, npoint)
    return _fps_numpy(xyz, npoint, rng)


def _fps_numpy(xyz: np.ndarray, npoint: int, rng) -> np.ndarray:
    n = len(xyz)
    centroids = np.zeros(npoint, dtype=np.int64)
    distance = np.full(n, 1e10)
    farthest = 0
    for i in range(npoint):
        centroids[i] = farthest
        d = np.sum((xyz - xyz[farthest]) ** 2, axis=-1)
        np.minimum(distance, d, out=distance)
        farthest = int(np.argmax(distance))
    return centroids


def crop_ball_from_pts(pts: np.ndarray, center: np.ndarray, radius: float,
                       num_points: int | None = None,
                       rng: np.random.RandomState | None = None) -> np.ndarray:
    """Reference crop_ball_from_pts (nocs_data_process.py:92-109): grow the
    radius x1.1 up to 10 times until >= 10 points, duplicate to num_points,
    FPS."""
    rng = rng or np.random
    distance = np.sqrt(np.sum((pts - center) ** 2, axis=-1))
    radius = max(float(radius), 0.05)
    idx = np.where(distance <= radius)[0]
    for _ in range(10):
        if len(idx) >= 10 or num_points is None:
            break
        radius *= 1.10
        idx = np.where(distance <= radius)[0]
    if num_points is not None:
        if len(idx) == 0:
            idx = np.where(distance <= 1e9)[0]
        if len(idx) == 0:
            return idx
        while len(idx) < num_points:
            idx = np.concatenate([idx, idx], axis=0)
        fps_idx = farthest_point_sample(pts[idx], num_points, rng)
        idx = idx[fps_idx]
    return idx


def random_vector(std: float, shape, kind: str = "normal",
                  rng: np.random.RandomState | None = None) -> np.ndarray:
    rng = rng or np.random
    if kind == "normal":
        return rng.randn(*shape) * std
    if kind == "uniform":
        return rng.rand(*shape) * 2 * std - std
    if kind == "exact":
        sign = np.sign(rng.randn(*shape))
        return np.where(sign == 0, 1.0, sign) * std
    raise ValueError(f"unsupported random type {kind}")


def random_translation(std: float, shape, kind: str = "normal",
                       rng: np.random.RandomState | None = None) -> np.ndarray:
    rng = rng or np.random
    norm = np.asarray(random_vector(std, shape, kind, rng))
    direction = rng.randn(*(tuple(shape) + (3,)))
    direction /= np.maximum(np.linalg.norm(direction, axis=-1, keepdims=True),
                            1e-8)
    return norm[..., None] * direction
