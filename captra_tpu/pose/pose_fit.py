"""Per-part scale/translation fit from predicted NPCS + labels.

Functional spec: /root/reference/pose_utils/pose_fit.py (part_fit_st_no_ransac
:38-53, validity filtering :26-35).  Runs fully on device inside the tracking
scan — rotation is given, so no 3D SVD is involved (only the closed-form 2D
y-axis refinement for symmetric categories).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from captra_tpu.utils.precision import f32_precision

from captra_tpu.pose.part_dof import Pose
from captra_tpu.pose.procrustes import similarity_fit, similarity_fit_ransac


def labels_to_part_mask(labels: jnp.ndarray, num_parts: int,
                        extra_rows: int = 2) -> jnp.ndarray:
    """labels [..., N] in [0, P + extra) -> binary mask [..., P, N].

    Labels >= num_parts (background / extra seg channels) select no part —
    the reference builds this with an eye matrix padded by `extra_rows` zero
    rows (pose_fit.py:44-45)."""
    del extra_rows  # any label >= num_parts maps to all-zeros; no pad needed
    part_ids = jnp.arange(num_parts)
    mask = labels[..., None, :] == part_ids[:, None]  # [..., P, N]
    return mask.astype(jnp.float32)


def filter_valid(pose: Pose, valid: jnp.ndarray,
                 min_scale: float | None = None) -> jnp.ndarray:
    """AND `valid` with finiteness of every pose component (reference
    filter_model_valid, pose_fit.py:26-35) and, when `min_scale` is given,
    with scale > min_scale.

    The scale floor is a tracking-only DEVIATION (the reference — and the
    default here — checks only finiteness): a ~zero fitted scale is always
    a degenerate fit (NOCS shapes have unit extent) and, once carried into
    the tracking recurrence, divides the next frame's canonicalization to
    inf — observed with a near-total sensor-dropout frame whose few stray
    returns collapse to one point.  compose_track_pose enables it."""
    valid = valid & jnp.isfinite(pose.scale)
    if min_scale is not None:
        valid = valid & (pose.scale > min_scale)
    valid = valid & jnp.all(jnp.isfinite(pose.translation), axis=(-1, -2))
    valid = valid & jnp.all(jnp.isfinite(pose.rotation), axis=(-1, -2))
    return valid


@f32_precision
def part_fit_st(labels: jnp.ndarray, source: jnp.ndarray,
                target: jnp.ndarray, rotation: jnp.ndarray,
                num_parts: int, sym: bool,
                given_scale: jnp.ndarray | None = None,
                min_scale: float | None = None,
                ransac_hyps: int = 0, ransac_th: float = 0.01,
                key: jnp.ndarray | None = None):
    """Fit per-part scale + translation given rotation.

    labels [B, N]; source (pred NPCS per part) [B, P, N, 3]; target (camera
    points) [B, P, N, 3]; rotation [B, P, 3, 3].  Returns (Pose [B, P],
    valid [B, P] bool) — valid requires > 3 in-part points and finite fit
    (reference part_fit_st_no_ransac, pose_fit.py:38-53; see filter_valid
    for the optional tracking-only min_scale floor).

    ransac_hyps > 0 (tracking-only DEVIATION, TrackCfg.fit_ransac — the
    reference fit is explicitly *_no_ransac) rejects outliers with a
    similarity_fit_ransac pass before the LS fit; incompatible with
    given_scale (a training-path argument the tracking path never sets)."""
    mask = labels_to_part_mask(labels, num_parts)  # [B, P, N]
    valid = jnp.sum(mask, axis=-1) > 3

    if ransac_hyps > 0 and given_scale is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        _, scale, translation, _ = similarity_fit_ransac(
            source, target, mask, key, num_hyps=ransac_hyps,
            inlier_th=ransac_th, rotation=rotation, sym=sym)
    else:
        _, scale, translation = similarity_fit(
            source, target, mask, given_scale=given_scale, rotation=rotation,
            sym=sym)
    # The sym-refined rotation is used only for the s/t fit; the returned pose
    # keeps the given rotation (reference pose_fit.py:48-50 discards it too).
    pose = Pose(rotation=rotation, translation=translation, scale=scale)
    return pose, filter_valid(pose, valid, min_scale=min_scale)
