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


@f32_precision
def similarity_fit_ransac(source: jnp.ndarray, target: jnp.ndarray,
                          mask: jnp.ndarray, key: jax.Array,
                          num_hyps: int = 32, inlier_th: float = 0.01,
                          min_inliers: int = 4,
                          rotation: jnp.ndarray | None = None,
                          sym: bool = False):
    """RANSAC-robust masked similarity fit, fully in-graph (fixed shapes).

    Same contract as `similarity_fit` plus outlier rejection: `num_hyps`
    3-point hypotheses are drawn from the masked points (Gumbel top-3, so
    sampling is exact without materializing index lists), each is fit in
    closed form, scored by its inlier count (camera-space residual <
    `inlier_th`, metric units), and the best hypothesis's inliers get the
    final least-squares refit.  If the best hypothesis has fewer than
    `min_inliers` inliers the full-mask LS fit is returned instead (the
    degenerate-fit semantics of the plain path are preserved).

    The reference only runs RANSAC offline (align_pose.py:49-93, the
    preprocessing pose extraction — mirrored by data/preproc_nocs.py
    ::umeyama_ransac, whose hypothesis/score/refit scheme this follows);
    its tracking fit is explicitly `part_fit_st_no_ransac`
    (pose_utils/pose_fit.py:38-53).  Using this at tracking time is
    therefore an opt-in DEVIATION (TrackCfg.fit_ransac) for real sensor
    data where segmentation leaks background points into the part mask.

    Returns (rotation [..., 3, 3], scale [...], translation [..., 3, 1],
    inlier_mask [..., N]).
    """
    lead = mask.shape[:-1]          # e.g. (B, P)
    N = mask.shape[-1]
    src = jnp.broadcast_to(source, lead + (N, 3))
    tgt = jnp.broadcast_to(target, lead + (N, 3))

    if rotation is not None and sym:
        # Sym + given rotation: the carried spin is free up to azimuth, so
        # scoring residuals against the unrefined rotation would reject
        # every point whenever the spin is off and always fall back.
        # Azimuth-refine once (closed-form 2D, full-mask LS) before
        # hypothesis scoring; the final refit re-refines on the inliers.
        rotation, _, _ = similarity_fit(source, target, mask,
                                        rotation=rotation, sym=True)

    # --- hypothesis sampling: 3 distinct masked indices per hypothesis ----
    g = jax.random.gumbel(key, lead + (num_hyps, N))
    scores = jnp.where(mask[..., None, :] > 0, g, -jnp.inf)
    _, idx3 = jax.lax.top_k(scores, 3)                 # [..., H, 3]
    take = lambda pts: jnp.take_along_axis(            # [..., H, 3, 3]
        pts[..., None, :, :], idx3[..., None], axis=-2)
    s3, t3 = take(src), take(tgt)

    # --- closed-form hypothesis fits --------------------------------------
    s3_c = s3 - jnp.mean(s3, axis=-2, keepdims=True)
    t3_c = t3 - jnp.mean(t3, axis=-2, keepdims=True)
    if rotation is None:
        R_h = kabsch_rotation(s3_c, t3_c)              # [..., H, 3, 3]
    else:
        R_h = jnp.broadcast_to(rotation[..., None, :, :],
                               lead + (num_hyps, 3, 3))
    rot_s3 = s3_c @ jnp.swapaxes(R_h, -1, -2)
    scale_h = (jnp.sum(rot_s3 * t3_c, axis=(-1, -2)) /
               jnp.maximum(jnp.sum(s3_c * s3_c, axis=(-1, -2)), EPS))
    trans_h = jnp.mean(
        t3 - scale_h[..., None, None] * (s3 @ jnp.swapaxes(R_h, -1, -2)),
        axis=-2)                                       # [..., H, 3]

    # --- score every hypothesis against all masked points -----------------
    posed = (scale_h[..., None, None] *
             (src[..., None, :, :] @ jnp.swapaxes(R_h, -1, -2)) +
             trans_h[..., None, :])                    # [..., H, N, 3]
    err = jnp.linalg.norm(tgt[..., None, :, :] - posed, axis=-1)
    inl = (err < inlier_th) & (mask[..., None, :] > 0)  # [..., H, N]
    counts = jnp.sum(inl, axis=-1)                      # [..., H]
    best = jnp.argmax(counts, axis=-1)                  # [...]
    best_inl = jnp.take_along_axis(
        inl, best[..., None, None], axis=-2)[..., 0, :]  # [..., N]
    best_count = jnp.take_along_axis(counts, best[..., None],
                                     axis=-1)[..., 0]

    # --- final LS refit on the inliers (full mask if degenerate) ----------
    ok = best_count >= min_inliers
    refit_mask = jnp.where(ok[..., None], best_inl.astype(mask.dtype), mask)
    R, s, t = similarity_fit(source, target, refit_mask,
                             rotation=rotation, sym=sym)
    return R, s, t, refit_mask
