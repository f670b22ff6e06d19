"""RotationNet: per-part rotation-delta regression + pose composition.

Functional spec: /root/reference/network/models/networks.py:113-240 and
blocks.py:168-193.  TPU-first redesign of the reference's replicate-and-diag
trick: the reference tiles the batch to B*P, applies *all* P heads to every
tile and keeps the diagonal (networks.py:179-203) — P x wasted head compute.
Here the encoder runs on the flattened [B*P] batch (one big MXU matmul), and
the P heads are a single head `nn.vmap`-ed over the part axis with per-part
parameters, applied only to their own part's features.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from captra_tpu.config.schema import Config
from captra_tpu.models.backbone import PointNet2Msg
from captra_tpu.models.blocks import PointMLP
from captra_tpu.pose import rotations as rot
from captra_tpu.pose.part_dof import (
    Pose, inverse_apply_pose, merge_delta_pose,
)
from captra_tpu.pose.pose_fit import labels_to_part_mask, part_fit_st


class RotationRegressor(nn.Module):
    """Per-part rotation heads: MLP [512, 512, 256] -> 6D (or 3D if sym),
    GroupNorm(group size 2) on hidden layers (reference RotationRegressor,
    blocks.py:168-193).  One head per part via nn.vmap with split params."""
    num_parts: int
    sym: bool
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> jnp.ndarray:
        # feat: [B, P, N, C]; head p sees feat[:, p]
        rot_dim = 3 if self.sym else 6
        head = nn.vmap(
            PointMLP,
            in_axes=1, out_axes=1,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True},
        )
        raw = head((512, 512, 256, rot_dim), norm="gn", final_acti="none",
                   dtype=self.dtype, name="heads")(feat)  # [B, P, N, rot_dim]
        raw = raw.astype(jnp.float32)  # rotation decode stays f32
        if self.sym:
            return rot.normalize_vector(raw)  # unit y-vec per point
        R = rot.ortho6d_to_matrix(raw)  # [B, P, N, 3, 3]
        return R.reshape(R.shape[:-2] + (9,))


class RotNet(nn.Module):
    """Encoder over per-part canonicalized clouds + per-part heads + masked
    mean (reference RotationRegressionBackbone, networks.py:113-141).

    Input: per-part canonical points [B, P, N, 3] and labels [B, N].
    Output dict:
      rtvec:       [B, P, 9|3]  masked-mean rotation rep (defaults for empty)
      point_rtvec: [B, P, N, 9|3] per-point reps (for the per-point loss)
    """
    cfg: Config
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, canon_parts: jnp.ndarray, labels: jnp.ndarray,
                 train: bool = False):
        B, P, N, _ = canon_parts.shape
        obj = self.cfg.obj
        dtype = jnp.dtype(self.cfg.network.compute_dtype) \
            if self.cfg.network.compute_dtype != "float32" else None
        flat = canon_parts.reshape(B * P, N, 3)
        feat = PointNet2Msg(self.cfg.pointnet,
                            self.cfg.network.backbone_out_dim,
                            use_xyz_feat=False, bn_momentum=self.bn_momentum,
                            dtype=dtype, fps_mode=self.cfg.network.fps_mode,
                            norm=self.cfg.network.norm,
                            name="encoder")(flat, train=train)
        feat = feat.reshape(B, P, N, -1)
        point_rtvec = RotationRegressor(obj.num_parts, obj.sym, dtype=dtype,
                                        name="regressor")(feat)

        # masked mean over in-part points (networks.py:127-138)
        mask = labels_to_part_mask(labels, obj.num_parts)  # [B, P, N]
        denom = jnp.clip(jnp.sum(mask, axis=-1, keepdims=True), 1.0, None)
        mean = jnp.sum(point_rtvec * mask[..., None], axis=-2) / denom
        valid = (jnp.sum(mask, axis=-1, keepdims=True) > 0)
        default = (jnp.asarray([0.0, 1.0, 0.0]) if obj.sym
                   else jnp.eye(3).reshape(9))
        mean = jnp.where(valid, mean, default)
        return {"rtvec": mean, "point_rtvec": point_rtvec}


def canonicalize_per_part(points: jnp.ndarray, points_mean: jnp.ndarray,
                          state: Pose) -> jnp.ndarray:
    """Centered camera points [B, N, 3] + mean [B, 3] -> per-part canonical
    clouds [B, P, N, 3] under the per-part poses `state` [B, P]
    (reference networks.py:179-187)."""
    cam = points + points_mean[:, None]  # [B, N, 3]
    return inverse_apply_pose(state, cam[:, None])


def decode_rotation(out: dict, sym: bool):
    """Network output -> (delta R [B, P, 3, 3], per-point R [B, P, N, 3, 3])
    (reference networks.py:191-198 + part_dof_utils.py:137-141)."""
    if sym:
        delta = rot.yvec_to_matrix(out["rtvec"])
        point = rot.yvec_to_matrix(out["point_rtvec"])
    else:
        delta = rot.gram_schmidt_3x3(
            out["rtvec"].reshape(out["rtvec"].shape[:-1] + (3, 3)))
        pr = out["point_rtvec"]
        point = rot.gram_schmidt_3x3(pr.reshape(pr.shape[:-1] + (3, 3)))
    return delta, point


def compose_track_pose(state: Pose, delta_rotation: jnp.ndarray,
                       labels: jnp.ndarray, pred_nocs: jnp.ndarray,
                       points: jnp.ndarray, points_mean: jnp.ndarray,
                       num_parts: int, sym: bool,
                       scale_clamp: float = 0.0,
                       rot_fit: str = "delta",
                       rot_fit_alpha: float = 0.5,
                       delta_gain: float = 1.0,
                       fit_ransac: int = 0,
                       fit_ransac_th: float = 0.01,
                       key: jnp.ndarray | None = None) -> Pose:
    """Tracking-mode pose update (reference networks.py:210-232):
    R_new = R_state @ R_delta, then fit s/t from predicted NPCS with validity
    fallback to the previous pose.

    pred_nocs: [B, P, N, 3]; labels: [B, N] (predicted seg at test time).

    scale_clamp > 0 bounds the per-frame scale *ratio* to
    [1/(1+c), 1+c] — a DEVIATION from the reference (whose only implicit
    bound is the crop-radius growth, nocs_data_process.py:95-99) that damps
    the scale random walk when the NPCS magnitudes are biased; off by
    default (see EVIDENCE.md "scale drift guard" for measurements).

    rot_fit != "delta" is a DEVIATION (see TrackCfg.rot_fit): the rotation
    is taken from ("npcs") or pulled toward ("fused", by rot_fit_alpha) an
    absolute masked Procrustes solve pred_nocs -> camera — an on-device 3x3
    SVD per part per frame, which the reference architecture avoids by
    regressing the delta (networks.py:210-232 always passes the composed
    rotation to the fit).  Parts whose NPCS solve is degenerate (<4 points
    or non-finite) keep the delta-composed rotation.  "npcs" always takes
    the full solve (for sym parts its y-spin is azimuth-locked to the
    observed cloud by the 2D refinement — measured better than an
    axis-only update); "fused" on sym parts blends only the y-axis
    direction, preserving the carried spin (see inline comment).
    """
    if delta_gain != 1.0:
        # DEVIATION (opt-in, TrackCfg.delta_gain): scale the delta's
        # rotation angle about its own axis — exp(g * log(delta)).  At
        # theta ~ 0 the decoded axis is arbitrary but g * theta ~ 0 too,
        # so the amplified delta stays ~identity (no guard needed).
        axis, theta = rot.matrix_to_axis_theta(delta_rotation)
        delta_rotation = rot.axis_theta_to_matrix(axis, delta_gain * theta)
    merged = merge_delta_pose(state, delta_rotation=delta_rotation)
    cam = (points + points_mean[:, None])[:, None]  # [B, 1, N, 3]
    cam = jnp.broadcast_to(cam, pred_nocs.shape)
    if fit_ransac > 0 and key is None:
        key = jax.random.PRNGKey(0)
    if rot_fit != "delta":
        mask = labels_to_part_mask(labels, num_parts)      # [B, P, N]
        if fit_ransac > 0:
            # RANSAC deviation (TrackCfg.fit_ransac): outlier-robust
            # absolute solve — segmentation leaks on real sensor data put
            # background points inside the part mask, and the LS solve has
            # no breakdown resistance
            from captra_tpu.pose.procrustes import similarity_fit_ransac
            kr, key = jax.random.split(key)
            r_abs, _, _, _ = similarity_fit_ransac(
                pred_nocs, cam, mask, kr, num_hyps=fit_ransac,
                inlier_th=fit_ransac_th, sym=sym)
        else:
            from captra_tpu.pose.procrustes import similarity_fit
            r_abs, _, _ = similarity_fit(pred_nocs, cam, mask, sym=sym)
        if rot_fit == "fused" and sym:
            # Sym + blend: the solve's y-spin can flip between competing
            # azimuth modes frame-to-frame (near-symmetric geometry), and
            # geodesic-blending toward a ~pi-flipped target mixes the spin
            # into the tilt (measured: full-scan rdiff 12.98 -> 19.77 on
            # bottle).  Blend the y-AXIS DIRECTION only: the minimal
            # camera-frame rotation taking the carried y-axis toward the
            # solved one, scaled by alpha; the carried spin is preserved.
            # ("npcs" keeps the full solve even for sym: its spin is
            # azimuth-locked to the observed cloud by similarity_fit's 2D
            # refinement, which measured BETTER than axis-only — 9.03 vs
            # 9.89 full-scan rdiff, 0.375 vs 0.276 5deg5cm.)
            y_c = merged.rotation[..., :, 1]               # carried y-axis
            y_a = r_abs[..., :, 1]                         # absolute y-axis
            axis = jnp.cross(y_c, y_a)
            norm = jnp.linalg.norm(axis, axis=-1)
            theta = jnp.arctan2(norm, jnp.sum(y_c * y_a, axis=-1))
            # cross ~ 0 happens BOTH at theta ~ 0 (no update needed) and at
            # theta ~ pi (antiparallel solve — the rotation axis is
            # ambiguous, and normalize_vector's fallback axis would commit
            # an arbitrary alpha*180deg tilt): skip the update in either
            # case by zeroing theta.  An antiparallel y-solve is exactly
            # the flip mode this branch exists to reject.
            theta = jnp.where(norm < 1e-6, 0.0, theta)
            axis = rot.normalize_vector(axis)
            r_abs = rot.axis_theta_to_matrix(
                axis, rot_fit_alpha * theta) @ merged.rotation
        elif rot_fit == "fused":
            r_abs = rot.so3_interpolate(merged.rotation, r_abs,
                                        rot_fit_alpha)
        ok = (jnp.sum(mask, axis=-1) > 3) \
            & jnp.all(jnp.isfinite(r_abs), axis=(-1, -2))  # [B, P]
        rotation = jnp.where(ok[..., None, None], r_abs, merged.rotation)
        merged = Pose(rotation=rotation, translation=merged.translation,
                      scale=merged.scale)
    # min_scale: a ~zero fitted scale (near-total sensor dropout) must take
    # the previous-pose fallback, not poison the recurrence — tracking-only
    # deviation, see pose_fit.filter_valid
    fitted, valid = part_fit_st(labels, pred_nocs, cam, merged.rotation,
                                num_parts=num_parts, sym=sym,
                                min_scale=1e-4,
                                ransac_hyps=fit_ransac,
                                ransac_th=fit_ransac_th, key=key)
    vf = valid.astype(jnp.float32)
    fitted_scale = fitted.scale
    if scale_clamp > 0.0:
        fitted_scale = jnp.clip(fitted_scale,
                                state.scale / (1.0 + scale_clamp),
                                state.scale * (1.0 + scale_clamp))
    scale = vf * fitted_scale + (1.0 - vf) * state.scale
    v3 = vf[..., None, None]
    translation = v3 * fitted.translation + (1.0 - v3) * state.translation
    return Pose(rotation=merged.rotation, translation=translation,
                scale=scale)
