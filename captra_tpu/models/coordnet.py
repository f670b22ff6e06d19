"""CoordinateNet: part segmentation + NPCS regression + analytic s/t solve.

Functional spec: /root/reference/network/models/networks.py:19-110.  The
module covers the learned part (backbone + heads); the in-graph scale /
translation solve is a pure function (`solve_st`) so the tracker and trainer
can call it inside jit/scan with either predicted or GT labels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from captra_tpu.config.schema import Config
from captra_tpu.models.backbone import PointNet2Msg
from captra_tpu.models.blocks import PointMLP
from captra_tpu.pose import procrustes
from captra_tpu.pose.part_dof import Pose, canonicalize_columns
from captra_tpu.pose.pose_fit import labels_to_part_mask
from captra_tpu.utils.precision import f32_precision


class CoordNet(nn.Module):
    """Backbone(use_xyz_feat) -> softmax seg [B, N, P+extra] and sigmoid-0.5
    NPCS [B, N, 3P] (reference CoordNet.__init__/forward,
    networks.py:19-52)."""
    cfg: Config
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, canon_points: jnp.ndarray, train: bool = False):
        """canon_points: [B, N, 3] already canonicalized camera points."""
        net = self.cfg.network
        dtype = jnp.dtype(net.compute_dtype) \
            if net.compute_dtype != "float32" else None
        feat = PointNet2Msg(self.cfg.pointnet, net.backbone_out_dim,
                            use_xyz_feat=True, bn_momentum=self.bn_momentum,
                            dtype=dtype, fps_mode=net.fps_mode,
                            norm=net.norm,
                            name="backbone")(canon_points, train=train)
        seg_logits = PointMLP((self.cfg.obj.num_seg,), norm="none",
                              final_acti="none", dtype=dtype,
                              name="seg_head")(feat, train)
        # probabilities and coordinates leave the net in f32
        seg = jax.nn.softmax(seg_logits.astype(jnp.float32), axis=-1)
        nocs = PointMLP(tuple(net.nocs_head_dims) + (3 * self.cfg.obj.num_parts,),
                        norm=net.norm, final_acti="none",
                        bn_momentum=self.bn_momentum, dtype=dtype,
                        name="nocs_head")(feat, train)
        nocs = jax.nn.sigmoid(nocs.astype(jnp.float32)) - 0.5
        out = {"seg": seg, "nocs": nocs}
        if net.basin_head:
            # Basin-confidence head (schema: network/basin_head).  Pooled
            # stop_gradient features -> 2-layer MLP -> one logit per cloud,
            # monotone in "how canonical does this canonicalized cloud
            # look" (trained by scripts/train_basin_head.py against the
            # known canonicalization offset).  stop_gradient keeps the
            # head strictly read-only w.r.t. the main task: seg/NPCS and
            # their gradients are bit-identical with the head on or off.
            pooled = jax.lax.stop_gradient(feat).astype(jnp.float32)
            g = jnp.concatenate([jnp.max(pooled, axis=1),
                                 jnp.mean(pooled, axis=1)], axis=-1)
            h = nn.relu(nn.Dense(128, name="basin_fc1")(g))
            out["basin"] = nn.Dense(1, name="basin_fc2")(h)[..., 0]
        return out


def canonicalize(points: jnp.ndarray, points_mean: jnp.ndarray,
                 canon_pose: Pose) -> jnp.ndarray:
    """(centered points [B, N, 3] + mean [B, 3]) -> canonical frame of
    `canon_pose` ([B] batch dims) (reference networks.py:38-41)."""
    cam = jnp.swapaxes(points, -1, -2) + points_mean[..., None]  # [B, 3, N]
    return jnp.swapaxes(canonicalize_columns(canon_pose, cam), -1, -2)


@f32_precision
def solve_st(seg: jnp.ndarray, nocs: jnp.ndarray, points: jnp.ndarray,
             points_mean: jnp.ndarray, labels: jnp.ndarray,
             gt_rotation: jnp.ndarray, init_pose: Pose, num_parts: int,
             sym: bool, given_scale: jnp.ndarray | None = None) -> Pose:
    """In-graph masked s/t solve given the (GT or tracked) rotation
    (reference networks.py:54-108).

    seg [B, N, S]; nocs [B, N, 3P]; points/points_mean: centered camera points
    [B, N, 3] + mean [B, 3]; labels [B, N] (pred at test, GT at train);
    gt_rotation [B, P, 3, 3]; init_pose: fallback for empty/NaN parts.
    given_scale: if set (training: GT scale), used to scale NPCS before the
    translation fit (networks.py:97-99).
    """
    B, N, _ = points.shape
    pred_npcs = nocs.reshape(B, N, num_parts, 3)
    pred_npcs = jnp.moveaxis(pred_npcs, 2, 1)           # [B, P, N, 3]
    cam = (points + points_mean[:, None])[:, None]       # [B, 1, N, 3]

    mask = labels_to_part_mask(labels, num_parts)        # [B, P, N]
    valid = (jnp.sum(mask, axis=-1) > 0).astype(jnp.float32)

    rotation = gt_rotation
    if sym:
        # 2D y-axis refinement in the canonical frame (networks.py:69-75)
        canon_cam = jnp.einsum("bpji,bqnj->bpni", rotation, cam)  # R^T x
        src2d = pred_npcs[..., (0, 2)]
        tgt2d = canon_cam[..., (0, 2)]
        _, s2c = procrustes.masked_center(src2d, mask)
        _, t2c = procrustes.masked_center(tgt2d, mask)
        rot2d = procrustes.rot2d_fit(s2c, t2c)
        rot3d = procrustes.rot_around_yaxis_to_3d(rot2d)
        rotated_npcs = jnp.einsum("bpij,bpjk,bpnk->bpni", rotation, rot3d,
                                  pred_npcs)
    else:
        rotated_npcs = jnp.einsum("bpij,bpnj->bpni", rotation, pred_npcs)

    # scale: masked, centered with detached centers (networks.py:81-90)
    _, rn_c = procrustes.masked_center(rotated_npcs, mask, detach_center=True)
    _, cam_c = procrustes.masked_center(
        jnp.broadcast_to(cam, rotated_npcs.shape), mask, detach_center=True)
    scale = procrustes.scale_fit(rn_c, cam_c, mask)      # [B, P]
    scale = valid * scale + (1.0 - valid) * init_pose.scale
    bad = ~jnp.isfinite(scale)
    scale = jnp.where(bad, init_pose.scale, scale)

    st_scale = given_scale if given_scale is not None else scale
    scaled_npcs = st_scale[..., None, None] * rotated_npcs
    translation = procrustes.translation_fit(scaled_npcs, cam, mask)
    v3 = valid[..., None, None]
    translation = v3 * translation + (1.0 - v3) * init_pose.translation
    badt = ~jnp.isfinite(jnp.sum(translation, axis=(-1, -2),
                                 keepdims=True))
    translation = jnp.where(badt, init_pose.translation, translation)

    return Pose(rotation=rotation, translation=translation, scale=scale)
