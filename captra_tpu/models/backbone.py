"""PointNet++ MSG backbone (flax.linen, channels-last).

Functional spec: /root/reference/network/models/backbones.py:15-69 and
pointnet_utils.py:191-343.  Shapes are fixed end-to-end (FPS/ball-query emit
constant-size index tensors), so the whole backbone jits into one XLA
program; the grouped-MLP stacks are (B*S*K, C) x (C, C') matmuls on the MXU.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from captra_tpu import ops
from captra_tpu.config.schema import PointNetCfg, SAMsgCfg
from captra_tpu.models.blocks import PointMLP


class SetAbstractionMsg(nn.Module):
    """FPS -> per-radius ball query -> grouped MLP -> max-pool, multi-scale
    (reference PointNetSetAbstractionMsg, pointnet_utils.py:191-250).

    fps_mode "grouped" swaps the exact centroid FPS for the stratified
    8-way approximation (deviation; ~0.25 ms/net saved at batch 1 — the
    exact kernel is latency-bound).  Train and test must use the same mode.
    """
    cfg: SAMsgCfg
    bn_momentum: float = 0.9
    dtype: jnp.dtype | None = None
    fps_mode: str = "exact"
    norm: str = "bn"

    @nn.compact
    def __call__(self, xyz, feats, train: bool = False):
        fps_idx = ops.farthest_point_sample(xyz, self.cfg.npoint,
                                            mode=self.fps_mode)
        new_xyz = ops.gather_xyz(xyz, fps_idx)  # [B, S, 3]
        outs = []
        for i, (radius, k, mlp) in enumerate(zip(
                self.cfg.radius_list, self.cfg.nsample_list,
                self.cfg.mlp_list)):
            g = ops.ball_group(radius, k, xyz, new_xyz, feats)
            g = PointMLP(mlp, norm=self.norm, final_acti="relu", last_norm=True,
                         bn_momentum=self.bn_momentum, dtype=self.dtype,
                         name=f"scale_{i}")(g, train=train)
            outs.append(jnp.max(g, axis=2))  # [B, S, C]
        return new_xyz, jnp.concatenate(outs, axis=-1)


class SetAbstractionAll(nn.Module):
    """Group-all global stage (reference PointNetSetAbstraction with
    group_all=True, pointnet_utils.py:302-343): xyz first, then features."""
    mlp: tuple
    bn_momentum: float = 0.9
    dtype: jnp.dtype | None = None
    norm: str = "bn"

    @nn.compact
    def __call__(self, xyz, feats, train: bool = False):
        g = xyz if feats is None else jnp.concatenate([xyz, feats], axis=-1)
        g = PointMLP(self.mlp, norm=self.norm, final_acti="relu", last_norm=True,
                     bn_momentum=self.bn_momentum, dtype=self.dtype,
                     name="mlp")(g, train=train)
        new_xyz = jnp.zeros_like(xyz[:, :1])
        return new_xyz, jnp.max(g, axis=1, keepdims=True)  # [B, 1, C]


class FeaturePropagation(nn.Module):
    """Inverse-distance 3-NN upsampling + unit MLP (reference
    PointNetFeaturePropagation, pointnet_utils.py:253-299)."""
    mlp: tuple
    bn_momentum: float = 0.9
    dtype: jnp.dtype | None = None
    norm: str = "bn"

    @nn.compact
    def __call__(self, xyz1, xyz2, feats1, feats2, train: bool = False):
        S = xyz2.shape[1]
        if S == 1:
            interp = jnp.broadcast_to(
                feats2, (feats2.shape[0], xyz1.shape[1], feats2.shape[-1]))
        else:
            sq_dist, idx = ops.three_nn(xyz1, xyz2)
            recip = 1.0 / (sq_dist + 1e-8)
            weight = recip / jnp.sum(recip, axis=-1, keepdims=True)
            interp = ops.three_interp_rows(feats2, idx, weight)
        x = interp if feats1 is None else jnp.concatenate(
            [feats1, interp], axis=-1)
        return PointMLP(self.mlp, norm=self.norm, final_acti="relu",
                        last_norm=True, bn_momentum=self.bn_momentum,
                        dtype=self.dtype, name="mlp")(x, train=train)


class PointNet2Msg(nn.Module):
    """3 SA stages + 3 FP stages + final unit conv, out_dim channels
    (reference PointNet2Msg, backbones.py:15-69).

    Input: xyz [B, N, 3] (row layout).  use_xyz_feat feeds xyz as the l0
    feature (CoordNet); otherwise l0 features are empty (RotationNet).
    """
    cfg: PointNetCfg
    out_dim: int = 128
    use_xyz_feat: bool = False
    bn_momentum: float = 0.9
    dtype: jnp.dtype | None = None
    fps_mode: str = "exact"
    # "bn" (reference parity) or "gn": GroupNorm has no train/eval gap —
    # BN-trained nets exploit per-batch statistics that running averages
    # cannot reproduce (measured: eval-mode NPCS magnitudes 2-3x shrunk
    # vs train-mode on synthetic training; see EVIDENCE.md round 2)
    norm: str = "bn"

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        l0_xyz = xyz
        l0_feats = xyz if self.use_xyz_feat else None

        l1_xyz, l1 = SetAbstractionMsg(self.cfg.sa1, self.bn_momentum,
                                       self.dtype, self.fps_mode, self.norm,
                                       name="sa1")(l0_xyz, l0_feats, train)
        l2_xyz, l2 = SetAbstractionMsg(self.cfg.sa2, self.bn_momentum,
                                       self.dtype, self.fps_mode, self.norm,
                                       name="sa2")(l1_xyz, l1, train)
        l3_xyz, l3 = SetAbstractionAll(self.cfg.sa3_mlp, self.bn_momentum,
                                       self.dtype, self.norm,
                                       name="sa3")(l2_xyz, l2, train)

        l2 = FeaturePropagation(self.cfg.fp3_mlp, self.bn_momentum,
                                self.dtype, self.norm,
                                name="fp3")(l2_xyz, l3_xyz, l2, l3, train)
        l1 = FeaturePropagation(self.cfg.fp2_mlp, self.bn_momentum,
                                self.dtype, self.norm,
                                name="fp2")(l1_xyz, l2_xyz, l1, l2, train)
        l0_in = l0_xyz if l0_feats is None else jnp.concatenate(
            [l0_xyz, l0_feats], axis=-1)
        l0 = FeaturePropagation(self.cfg.fp1_mlp, self.bn_momentum,
                                self.dtype, self.norm,
                                name="fp1")(l0_xyz, l1_xyz, l0_in, l1, train)

        return PointMLP((self.out_dim,), norm=self.norm, final_acti="relu",
                        last_norm=True, bn_momentum=self.bn_momentum,
                        dtype=self.dtype, name="out")(l0, train=train)
