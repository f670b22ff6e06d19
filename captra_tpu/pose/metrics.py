"""Pose-error metrics (reference /root/reference/pose_utils/metrics.py)."""
from __future__ import annotations

import jax.numpy as jnp

from captra_tpu.utils.precision import f32_precision


@f32_precision
def rot_diff_rad(rot1: jnp.ndarray, rot2: jnp.ndarray,
                 yaxis_only: bool = False) -> jnp.ndarray:
    """Geodesic rotation distance in radians; for symmetric categories only
    the angle between the y columns counts (reference metrics.py:5-29)."""
    if yaxis_only:
        y1, y2 = rot1[..., 1], rot2[..., 1]
        d = jnp.clip(jnp.sum(y1 * y2, axis=-1), -1.0, 1.0)
        return jnp.arccos(d)
    mat_diff = rot1 @ jnp.swapaxes(rot2, -1, -2)
    tr = mat_diff[..., 0, 0] + mat_diff[..., 1, 1] + mat_diff[..., 2, 2]
    return jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0))


def rot_diff_degree(rot1, rot2, yaxis_only: bool = False) -> jnp.ndarray:
    return rot_diff_rad(rot1, rot2, yaxis_only=yaxis_only) / jnp.pi * 180.0


def trans_diff(t1: jnp.ndarray, t2: jnp.ndarray) -> jnp.ndarray:
    """L2 translation error; t [..., 3, 1] (reference metrics.py:36-38)."""
    return jnp.linalg.norm((t1 - t2)[..., 0], axis=-1)


def scale_diff(s1: jnp.ndarray, s2: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(s1 - s2)


def theta_diff(theta1: jnp.ndarray, theta2: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(theta1 - theta2)
