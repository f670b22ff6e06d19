"""Rotation representations and conversions, pure jnp.

Functional spec: /root/reference/pose_utils/rotations.py (quaternion algebra
:6-131, axis-angle :109-155, ortho-6D :330-343, Gram-Schmidt :356-372,
y-vector frame :375-387, jitter :220-230,277-292).  All functions are
shape-polymorphic over leading batch dims and safe under `jit`/`vmap`/`grad`
(zero-norm inputs fall back instead of producing NaNs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8


# ---------------------------------------------------------------------------
# basic vector helpers
# ---------------------------------------------------------------------------

def normalize_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize quaternion(s) [..., 4] (wxyz)."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def normalize_vector(v: jnp.ndarray, fallback=(1.0, 0.0, 0.0)) -> jnp.ndarray:
    """Unit-normalize [..., D]; zero-norm rows fall back to `fallback`.

    Matches reference `normalize_vector` (rotations.py:302-314), which
    substitutes (1,0,0) for degenerate inputs instead of dividing by ~0.
    The magnitude uses sqrt(sum(v^2) + tiny) so its gradient is 0 (not NaN)
    at v = 0 — `jnp.where` does not stop NaNs produced inside the selected
    branch's VJP.
    """
    mag = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-24)
    valid = mag > EPS
    backup = jnp.broadcast_to(jnp.asarray(fallback, dtype=v.dtype), v.shape)
    unit = v / jnp.maximum(mag, EPS)
    return jnp.where(valid, unit, backup)


# ---------------------------------------------------------------------------
# quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_multiply(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    real1, im1 = q[..., :1], q[..., 1:]
    real2, im2 = r[..., :1], r[..., 1:]
    real = real1 * real2 - jnp.sum(im1 * im2, axis=-1, keepdims=True)
    im = real1 * im2 + real2 * im1 + jnp.cross(im1, im2)
    return jnp.concatenate([real, im], axis=-1)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v [..., 3] by unit quaternions q [..., 4]."""
    qv = jnp.concatenate([jnp.zeros_like(v[..., :1]), v], axis=-1)
    out = quat_multiply(quat_multiply(q, qv), quat_conjugate(q))
    return out[..., 1:]


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] -> rotation matrix [..., 3, 3]."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    m = jnp.stack([
        1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w,
        2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w,
        2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y,
    ], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4].

    Uses the trace formula with clamping (reference rotations.py:90-106);
    adequate away from trace == -1 which the tracking deltas never hit.
    """
    trace = jnp.clip(1.0 + m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2], 0.0, None)
    r = jnp.sqrt(trace)
    s = 1.0 / (2.0 * r + 1e-7)
    w = 0.5 * r
    x = (m[..., 2, 1] - m[..., 1, 2]) * s
    y = (m[..., 0, 2] - m[..., 2, 0]) * s
    z = (m[..., 1, 0] - m[..., 0, 1]) * s
    return normalize_quat(jnp.stack([w, x, y, z], axis=-1))


def axis_theta_to_quat(axis: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    w = jnp.cos(theta / 2.0)
    xyz = axis * jnp.sin(theta / 2.0)[..., None]
    return normalize_quat(jnp.concatenate([w[..., None], xyz], axis=-1))


def quat_to_axis_theta(q: jnp.ndarray):
    q = normalize_quat(q)
    cosa = q[..., 0]
    sina = jnp.sqrt(jnp.clip(1.0 - cosa**2, 0.0, None))
    norm = sina[..., None]
    axis = q[..., 1:] / jnp.maximum(norm, EPS)
    theta = 2.0 * jnp.arccos(jnp.clip(cosa, -1.0, 1.0))
    return axis, theta


def axis_theta_to_matrix(axis, theta):
    return quat_to_matrix(axis_theta_to_quat(axis, theta))


def matrix_to_axis_theta(m):
    return quat_to_axis_theta(matrix_to_quat(m))


def matrix_to_rotvec(m: jnp.ndarray) -> jnp.ndarray:
    """Matches reference matrix_to_rotvec (rotations.py:139-142) incl. its
    (theta % 2pi + 2pi) offset, which only the exp_* losses consume as a diff."""
    axis, theta = matrix_to_axis_theta(m)
    theta = theta % (2 * jnp.pi) + 2 * jnp.pi
    return axis * theta[..., None]


def rotvec_to_matrix(rv: jnp.ndarray) -> jnp.ndarray:
    theta = jnp.linalg.norm(rv, axis=-1)
    axis = rv / jnp.maximum(theta[..., None], EPS)
    return axis_theta_to_matrix(axis, theta)


def so3_interpolate(ra: jnp.ndarray, rb: jnp.ndarray,
                    alpha: float) -> jnp.ndarray:
    """Geodesic interpolation from `ra` toward `rb` by fraction `alpha`
    along the short arc: ra @ exp(alpha * log(ra^T rb)).

    No reference counterpart (the reference never blends rotations); used
    by the opt-in `track_cfg/rot_fit=fused` complementary filter.  The
    relative angle comes from matrix_to_axis_theta, whose quaternion always
    has w >= 0, so theta is in [0, pi] (the short way) — NOT via
    matrix_to_rotvec, whose +2pi offset would break the scaling."""
    rel = jnp.swapaxes(ra, -1, -2) @ rb
    axis, theta = matrix_to_axis_theta(rel)
    return ra @ axis_theta_to_matrix(axis, alpha * theta)


# ---------------------------------------------------------------------------
# learned-representation decoders
# ---------------------------------------------------------------------------

def ortho6d_to_matrix(poses: jnp.ndarray) -> jnp.ndarray:
    """Ortho-6D [..., 6] -> R [..., 3, 3] with columns (x, y, z).

    Gram-Schmidt per Zhou et al.; matches reference
    compute_rotation_matrix_from_ortho6d (rotations.py:330-343).
    """
    x_raw, y_raw = poses[..., 0:3], poses[..., 3:6]
    x = normalize_vector(x_raw)
    z = normalize_vector(jnp.cross(x, y_raw))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)  # columns


def gram_schmidt_3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Orthonormalize the columns of [..., 3, 3] (reference
    compute_rotation_matrix_from_matrix, rotations.py:356-372)."""
    a1, a2, a3 = m[..., :, 0], m[..., :, 1], m[..., :, 2]

    def proj(u, a):
        top = jnp.sum(u * a, axis=-1, keepdims=True)
        bottom = jnp.maximum(jnp.sum(u * u, axis=-1, keepdims=True), EPS)
        return (top / bottom) * u

    u1 = a1
    u2 = a2 - proj(u1, a2)
    u3 = a3 - proj(u1, a3) - proj(u2, a3)
    return jnp.stack(
        [normalize_vector(u1), normalize_vector(u2), normalize_vector(u3)],
        axis=-1)


def yvec_to_matrix(vec: jnp.ndarray) -> jnp.ndarray:
    """Unit y-axis vector [..., 3] -> full frame [..., 3, 3] (columns x,y,z).

    For symmetric categories only the y column is supervised; the x/z frame is
    an arbitrary completion (reference compute_rotation_matrix_from_3d,
    rotations.py:375-387).
    """
    y = normalize_vector(vec)
    x_raw = jnp.zeros_like(y).at[..., 0].set(1.0)
    z = normalize_vector(jnp.cross(x_raw, y))
    x = jnp.cross(y, z)
    return jnp.stack([x, y, z], axis=-1)


# ---------------------------------------------------------------------------
# stochastic perturbation (explicit PRNG keys)
# ---------------------------------------------------------------------------

def random_quat(key: jax.Array, shape) -> jnp.ndarray:
    """Uniformly-ish random unit quaternion of batch `shape` (+ trailing 4)."""
    return normalize_quat(jax.random.normal(key, tuple(shape) + (4,)))


def jitter_quat(key: jax.Array, q: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rotate q by angle theta [..., 1] in a random great-circle direction
    (reference jitter_quaternion, rotations.py:220-230)."""
    new_q = random_quat(key, q.shape[:-1])
    dot = jnp.sum(q * new_q, axis=-1, keepdims=True)
    q_orth = normalize_quat(new_q - q * dot)
    return q * jnp.cos(theta / 2.0) + q_orth * jnp.sin(theta / 2.0)


def noisy_rot_matrix(key: jax.Array, matrix: jnp.ndarray, rad: float,
                     kind: str = "normal") -> jnp.ndarray:
    """Perturb rotation matrices by |N(0,1)|*rad (or U[0,1]*rad) geodesic angle
    (reference noisy_rot_matrix, rotations.py:277-285)."""
    k1, k2 = jax.random.split(key)
    base = matrix[..., 0, 0]
    if kind == "normal":
        theta = jnp.abs(jax.random.normal(k1, base.shape)) * rad
    elif kind == "uniform":
        theta = jax.random.uniform(k1, base.shape) * rad
    else:
        raise ValueError(f"unknown perturbation type {kind}")
    q = matrix_to_quat(matrix)
    return quat_to_matrix(jitter_quat(k2, q, theta[..., None]))
