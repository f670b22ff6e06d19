"""Loader + adapters for running the PyTorch reference (/root/reference) on
CPU inside the test suite, for cross-implementation parity tests.

The reference is CPU-runnable by design (network/models/pointnet_utils.py:8-10
has pure-torch fallbacks for every CUDA kernel; README.md:42 supports
CPU-only runs).  We import its modules verbatim — the only intervention is
`deterministic_fps()`, which pins the CPU fallback's random FPS start
(pointnet_utils.py:129 `torch.randint`) to index 0, matching the CUDA
kernel's convention (sampling_gpu.cu: first centroid = idx 0) and our
implementation (captra_tpu/ops/pointops.py:farthest_point_sample).
"""
from __future__ import annotations

import contextlib
import os
import sys
import types

import numpy as np
import yaml

REF = "/root/reference"
_loaded: types.SimpleNamespace | None = None


def load_ref() -> types.SimpleNamespace:
    """Import the reference torch modules (cached)."""
    global _loaded
    if _loaded is not None:
        return _loaded
    for p in (os.path.join(REF, "network", "models"),
              os.path.join(REF, "network"), REF):
        if p not in sys.path:
            sys.path.insert(0, p)
    import torch  # noqa: F401
    import networks            # reference network/models/networks.py
    import pointnet_utils      # reference op fallbacks
    import loss as ref_loss    # reference network/models/loss.py
    from pose_utils import (bbox_utils, part_dof_utils, pose_fit, procrustes,
                            rotations)
    from pose_utils import metrics as ref_metrics
    _loaded = types.SimpleNamespace(
        networks=networks, pointnet_utils=pointnet_utils, loss=ref_loss,
        part_dof_utils=part_dof_utils, pose_fit=pose_fit,
        procrustes=procrustes, rotations=rotations, metrics=ref_metrics,
        bbox_utils=bbox_utils)
    return _loaded


@contextlib.contextmanager
def deterministic_fps():
    """Pin the reference CPU-fallback FPS start index to 0 (see module doc)."""
    import torch
    ref = load_ref()
    pu = ref.pointnet_utils
    orig = pu.farthest_point_sample

    def fps_start0(xyz, npoint):  # reference pointnet_utils.py:112-138
        B, N, _ = xyz.shape
        centroids = torch.zeros(B, npoint, dtype=torch.long)
        distance = torch.ones(B, N) * 1e10
        farthest = torch.zeros(B, dtype=torch.long)
        batch_indices = torch.arange(B, dtype=torch.long)
        for i in range(npoint):
            centroids[:, i] = farthest
            centroid = xyz[batch_indices, farthest, :].view(B, 1, 3)
            dist = torch.sum((xyz - centroid) ** 2, -1)
            mask = dist < distance
            distance[mask] = dist[mask]
            farthest = torch.max(distance, -1)[1]
        return centroids

    pu.farthest_point_sample = fps_start0
    try:
        yield
    finally:
        pu.farthest_point_sample = orig


def make_ref_cfg(num_parts: int, sym: bool, extra_dims: int,
                 tree, net_type: str = "rot_coord_track",
                 backbone_out_dim: int = 128,
                 nocs_head_dims=(128,)) -> dict:
    """Reference-shaped cfg dict (mirrors configs/config.py:21-71 output) with
    the real pointnet2_camera.yml hyperparameters."""
    with open(os.path.join(REF, "configs", "pointnet_config",
                           "pointnet2_camera.yml")) as f:
        pn = yaml.safe_load(f)
    return {
        "pointnet": {"camera": pn},
        "network": {"backbone_out_dim": backbone_out_dim,
                    "nocs_head_dims": list(nocs_head_dims),
                    "type": net_type},
        "num_parts": num_parts,
        "obj_sym": sym,
        "obj": {"extra_dims": extra_dims},
        "obj_tree": list(tree),
        "device": "cpu",
    }


def randomize_torch_module(net, seed: int = 0) -> None:
    """Randomize every parameter AND BatchNorm running stat so the converted
    checkpoint exercises the full key layout (fresh-init running stats are
    trivially 0/1 and would mask mapping bugs)."""
    import torch
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for m in net.modules():
            if hasattr(m, "running_mean") and m.running_mean is not None:
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.05)
                m.running_var.copy_(
                    0.5 + torch.rand(m.running_var.shape, generator=g))


def prefixed_state_dict(net, prefix: str = "net") -> dict:
    """state_dict with the task-model prefix the released checkpoints use
    (reference model.py wraps nets as `self.net` / `self.npcs_net`)."""
    return {f"{prefix}.{k}": v.detach().numpy()
            for k, v in net.state_dict().items()}


def rand_pose_np(rng: np.random.RandomState, shape) -> dict:
    """Random valid per-part pose dict {rotation [..,3,3], translation
    [..,3,1], scale [..]} with numpy leaves."""
    import torch
    q = rng.randn(*shape, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = [q[..., i] for i in range(4)]
    R = np.stack([
        1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w,
        2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w,
        2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y,
    ], axis=-1).reshape(*shape, 3, 3).astype(np.float32)
    del torch
    return {
        "rotation": R,
        "translation": rng.randn(*shape, 3, 1).astype(np.float32) * 0.1,
        "scale": (0.8 + 0.4 * rng.rand(*shape)).astype(np.float32),
    }


def to_torch_pose(pose_np: dict):
    import torch
    return {k: torch.from_numpy(np.asarray(v)) for k, v in pose_np.items()}


def ref_track(ref, coord_net, rot_net, init_pose_t, frames_np, num_parts,
              root):
    """The reference tracking recurrence (model.py:409-478), verbatim
    semantics: CoordNet in the root's last frame, PartCanonNet per part,
    s/t fit with validity fallback.  Returns ([T] list of torch pose dicts,
    [T-1] list of np label arrays)."""
    import torch
    poses, labels_all = [init_pose_t], []
    with torch.no_grad(), deterministic_fps():
        for pts in frames_np[1:]:
            pts_t = torch.from_numpy(pts)                       # [B, N, 3]
            mean = pts_t.mean(dim=1)                            # [B, 3]
            centered = (pts_t - mean[:, None]).transpose(-1, -2)
            last = {k: v.clone() for k, v in poses[-1].items()}

            npcs_input = {
                "points": centered,
                "points_mean": mean.unsqueeze(-1),
                "canon_pose": {k: last[k][:, root].clone()
                               for k in ("rotation", "translation", "scale")},
                "init_part": last,
            }
            npcs_pred = coord_net(npcs_input)
            pred_seg, pred_npcs = npcs_pred["seg"], npcs_pred["nocs"]
            pred_labels = torch.max(pred_seg, dim=-2)[1]
            pred_npcs = pred_npcs.reshape(len(pred_npcs), num_parts, 3, -1)

            out = rot_net({
                "points": centered,
                "points_mean": mean.unsqueeze(-1),
                "state": {"part": last},
                "pred_labels": pred_labels,
                "pred_nocs": pred_npcs,
            }, test_mode=True)
            poses.append(out["part"])
            labels_all.append(pred_labels.numpy())
    return poses, labels_all


def to_jax_pose(pose_np: dict):
    from captra_tpu.pose.part_dof import Pose
    import jax.numpy as jnp
    return Pose(rotation=jnp.asarray(pose_np["rotation"]),
                translation=jnp.asarray(pose_np["translation"]),
                scale=jnp.asarray(pose_np["scale"]))
