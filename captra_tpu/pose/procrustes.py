"""Masked / weighted Procrustes (similarity-transform) fitting, pure jnp.

Functional spec: /root/reference/pose_utils/procrustes.py.  Differences by
design (TPU-first):

  * SVD runs **on device** via `jnp.linalg.svd` — the reference ships the 3x3
    cross-covariance to the CPU (procrustes.py:27-30) to dodge cuSolver
    convergence bugs; XLA's batched Jacobi SVD has no such issue.
  * The 2D (symmetric-category) solve uses the **closed-form SO(2) polar
    projection** instead of an SVD (procrustes.py:167-204): for a 2x2
    cross-covariance M the rotation maximizing trace(R^T M) is
    atan2-recoverable, which is both faster and unconditionally stable.
  * NaN-gradient protection is a custom-VJP guard (`_nan_guard`) mirroring the
    reference's backward hook (procrustes.py:19-22).

Layout convention: points are **rows**, `[..., N, 3]`; masks/weights are
`[..., N]`.  Rotations act as column-vector maps: `y = R x`, so for row
layout `posed = points @ R.T`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from captra_tpu.utils.precision import f32_precision

EPS = 1e-6


@jax.custom_vjp
def _nan_guard(x):
    return x


def _nan_guard_fwd(x):
    return x, None


def _nan_guard_bwd(_, g):
    return (jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)),)


_nan_guard.defvjp(_nan_guard_fwd, _nan_guard_bwd)


# ---------------------------------------------------------------------------
# rotation fits
# ---------------------------------------------------------------------------

@f32_precision
def kabsch_rotation(source: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Best rotation R with target ~= source @ R.T (both [..., N, 3], already
    centered and weighted).  Reflection-fixed Kabsch via on-device SVD
    (reference rotate_pts_batch, procrustes.py:25-56)."""
    M = jnp.swapaxes(target, -1, -2) @ source  # [..., 3, 3]
    M = _nan_guard(M)
    # Guard non-finite covariances so SVD never sees NaN/Inf; such parts are
    # already routed to fallbacks by callers (pose_fit.filter_valid).
    finite = jnp.all(jnp.isfinite(M), axis=(-1, -2), keepdims=True)
    M_safe = jnp.where(finite, M, jnp.broadcast_to(jnp.eye(3, dtype=M.dtype), M.shape))
    U, _, Vh = jnp.linalg.svd(M_safe, full_matrices=False)
    d = jnp.linalg.det(U @ Vh)
    mid = jnp.zeros_like(U).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    mid = mid.at[..., 2, 2].set(d)
    R = U @ mid @ Vh
    return jnp.where(finite, R, jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape))


@f32_precision
def rot2d_fit(source: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Best 2D rotation with target ~= source @ R.T ([..., N, 2], centered,
    weighted).  Closed-form SO(2) polar projection of M = target^T source:
    R = [[c, -s], [s, c]] with (c, s) ∝ (M00+M11, M10-M01).

    Degenerate (|M| ~ 0) inputs return identity, matching the reference's
    orthogonality-validation fallback (procrustes.py:197-204).  Gradients are
    stopped, matching the reference's `.detach()` (procrustes.py:170,195).
    """
    M = jnp.swapaxes(target, -1, -2) @ source  # [..., 2, 2]
    M = jax.lax.stop_gradient(M)
    c_raw = M[..., 0, 0] + M[..., 1, 1]
    s_raw = M[..., 1, 0] - M[..., 0, 1]
    r = jnp.sqrt(c_raw**2 + s_raw**2)
    valid = (r > 1e-12) & jnp.isfinite(r)
    r_safe = jnp.maximum(r, 1e-12)
    c = jnp.where(valid, c_raw / r_safe, 1.0)
    s = jnp.where(valid, s_raw / r_safe, 0.0)
    row0 = jnp.stack([c, -s], axis=-1)
    row1 = jnp.stack([s, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def rot_around_yaxis_to_3d(rot_2d: jnp.ndarray) -> jnp.ndarray:
    """Embed a 2D rotation of the (x, z) plane as a 3D y-axis rotation
    (reference procrustes.py:69-75)."""
    xx, xz = rot_2d[..., 0, 0], rot_2d[..., 0, 1]
    zx, zz = rot_2d[..., 1, 0], rot_2d[..., 1, 1]
    one = jnp.ones_like(xx)
    zero = jnp.zeros_like(xx)
    m = jnp.stack([xx, zero, xz, zero, one, zero, zx, zero, zz], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# masked moments
# ---------------------------------------------------------------------------

def masked_center(pts: jnp.ndarray, mask: jnp.ndarray,
                  detach_center: bool = False):
    """Masked centroid + centered-and-masked points.

    pts [..., N, 3] (broadcastable), mask [..., N] binary.  The point count in
    the denominator is clamped to >= 1 (reference procrustes.py:137-140).
    """
    w = mask[..., None]
    denom = jnp.clip(jnp.sum(w, axis=-2, keepdims=True), 1.0, None)
    center = jnp.sum(pts * w, axis=-2, keepdims=True) / denom
    if detach_center:
        center = jax.lax.stop_gradient(center)
    return center, (pts - center) * w


def scale_fit(source: jnp.ndarray, target: jnp.ndarray,
              w: jnp.ndarray) -> jnp.ndarray:
    """Least-squares scale with target ~= s * source (both centered),
    w [..., N] (reference scale_pts_mask, procrustes.py:117-120)."""
    ww = w[..., None]
    num = jnp.sum(source * target * ww, axis=(-1, -2))
    den = jnp.sum(source * source * ww, axis=(-1, -2)) + EPS
    return num / den


def translation_fit(source: jnp.ndarray, target: jnp.ndarray,
                    w: jnp.ndarray) -> jnp.ndarray:
    """Weighted mean of (target - source) over points -> [..., 3, 1]
    (reference translate_pts_mask, procrustes.py:123-129)."""
    denom = jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 1.0, None)
    wn = (w / denom)[..., None]
    t = jnp.sum((target - source) * wn, axis=-2)  # [..., 3]
    return t[..., None]


# ---------------------------------------------------------------------------
# full similarity solve
# ---------------------------------------------------------------------------

@f32_precision
def similarity_fit(source: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray,
                   given_scale: jnp.ndarray | None = None,
                   rotation: jnp.ndarray | None = None,
                   sym: bool = False):
    """Masked similarity transform: target ~= s * (source @ R.T) + t.

    source, target: [..., N, 3] (broadcast against mask's leading dims,
    typically [B, P, N, 3] vs mask [B, P, N]); mask binary.

    Returns (rotation [..., 3, 3], scale [...], translation [..., 3, 1]).
    Mirrors reference transform_pts_mask (procrustes.py:132-164): when
    `rotation` is given (the tracking path) no 3D SVD runs; `sym` refines with
    an extra y-axis 2D rotation; `given_scale` skips the scale fit.
    """
    _, src_c = masked_center(source, mask)
    _, tgt_c = masked_center(target, mask)

    if rotation is None:
        # sqrt-weighting per reference rotate_pts_mask (procrustes.py:110-114)
        w = jnp.sqrt(mask + EPS)[..., None]
        rotation = kabsch_rotation(src_c * w, tgt_c * w)

    if sym:
        # Residual rotation about the (canonical) y axis: compare source NPCS
        # with target brought into the canonical frame by R^T.
        canon_target = target @ rotation  # rows (R^T t_i)^T
        src2d = source[..., :, (0, 2)]
        tgt2d = canon_target[..., :, (0, 2)]
        _, src2d_c = masked_center(src2d, mask)
        _, tgt2d_c = masked_center(tgt2d, mask)
        rot2d = rot2d_fit(src2d_c, tgt2d_c)
        rotation = rotation @ rot_around_yaxis_to_3d(rot2d)

    if given_scale is not None:
        scale = given_scale
    else:
        scale = scale_fit(src_c @ jnp.swapaxes(rotation, -1, -2), tgt_c, mask)

    posed_src = scale[..., None, None] * (source @ jnp.swapaxes(rotation, -1, -2))
    translation = translation_fit(posed_src, target, mask)
    return rotation, scale, translation
