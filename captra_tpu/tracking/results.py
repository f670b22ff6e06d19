"""Saving tracking results for the offline evaluator / visualizers.

Artifact spec: /root/reference/network/models/model.py:482-509 — one pickle
per (instance, track) holding predicted/GT pose arrays, NPCS-derived corners
and frame numbers.
"""
from __future__ import annotations

import os
import pickle
from os.path import join as pjoin

import numpy as np

from captra_tpu.pose.bbox import pred_nocs_corners
from captra_tpu.pose.part_dof import Pose


def pose_to_numpy(pose: Pose) -> dict:
    return {"rotation": np.asarray(pose.rotation),
            "translation": np.asarray(pose.translation),
            "scale": np.asarray(pose.scale)}


def corners_from_track_aux(aux, num_parts: int) -> np.ndarray:
    """Per-frame predicted NPCS corners from the tracked seg + nocs
    (reference model.py:483-493).  aux: TrackAux stacked [T, B, ...];
    returns [T, B, P, 2, 3] (index [:, b] for one trajectory)."""
    import jax
    import jax.numpy as jnp

    def per_frame(labels, nocs):
        B, N = labels.shape
        own = jnp.take_along_axis(
            nocs.reshape(B, N, num_parts, 3),
            jnp.clip(labels, 0, num_parts - 1)[..., None, None].repeat(3, -1),
            axis=-2)[..., 0, :]
        return pred_nocs_corners(labels, own, num_parts)

    corners = jax.vmap(per_frame)(aux.pred_labels, aux.nocs)  # [T, B, P,2,3]
    return np.asarray(corners)


def save_track_result(out_dir: str, name: str, pred_poses: Pose,
                      gt_poses: Pose | None, pred_corners: np.ndarray,
                      gt_corners: np.ndarray | None,
                      frame_nums: list | None = None) -> str:
    """Write results/data/<name>.pkl.  Pose leading dims [T, P];
    corners [T, P, 2, 3] / [P, 2, 3].  gt may be None (GT-less real
    captures): the artifact then carries predictions only."""
    data_dir = pjoin(out_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    payload = {
        "pred": {"poses": pose_to_numpy(pred_poses),
                 "corners": np.asarray(pred_corners)},
        "gt": (None if gt_poses is None else
               {"poses": pose_to_numpy(gt_poses),
                "corners": np.asarray(gt_corners)}),
        "frame_nums": frame_nums or [],
    }
    path = pjoin(data_dir, f"{name}.pkl")
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return path
