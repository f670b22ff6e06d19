"""Offline evaluation harness: per-frame pose errors, 3D IoU, joint states.

Functional spec: /root/reference/misc/eval/eval.py.  Consumes per-trajectory
result dicts (as saved by `captra_tpu.tracking.results.save_track_result`)
and writes err.pkl / err.csv + printed averages — same artifact shapes as
the reference so downstream tooling ports directly.

Unlike the reference (frame-by-frame numpy loops) whole trajectories
evaluate as single batched jnp calls.
"""
from __future__ import annotations

import csv
import os
import pickle
from os.path import join as pjoin

import jax.numpy as jnp
import numpy as np

from captra_tpu.config.schema import ObjCfg
from captra_tpu.pose.bbox import eval_single_part_iou
from captra_tpu.pose.metrics import rot_diff_degree
from captra_tpu.pose.part_dof import Pose, eval_part_full


def get_joint_state(obj: ObjCfg, pose: Pose) -> np.ndarray:
    """Per-joint state [..., J]: revolute = relative rotation angle (deg)
    between child and parent; prismatic = child-parent displacement along
    `main_axis` in the parent frame (reference get_joint_state,
    misc/eval/eval.py:59-78).  pose has part axis last: [..., P]."""
    states = []
    for c, p in enumerate(obj.tree):
        if p == -1:
            continue
        if obj.joint_type == "revolute":
            state = rot_diff_degree(pose.rotation[..., c, :, :],
                                    pose.rotation[..., p, :, :])
        else:
            p_rot = pose.rotation[..., p, :, :]
            rel = jnp.swapaxes(p_rot, -1, -2) @ (
                pose.translation[..., c, :, :] -
                pose.translation[..., p, :, :])
            axis_index = obj.main_axis[len(states)]
            state = rel[..., axis_index, 0]
        states.append(state)
    return jnp.stack(states, axis=-1) if states else jnp.zeros(
        pose.scale.shape[:-1] + (0,))


def eval_trajectory(pred_poses: Pose, gt_poses: Pose,
                    pred_corners: jnp.ndarray, gt_corners: jnp.ndarray,
                    obj: ObjCfg, eval_iou: bool = True) -> dict:
    """Per-frame errors over a trajectory; all pose args have leading dims
    [T, P]; corners [T, P, 2, 3] (pred) and [P, 2, 3] (gt).

    Frame 0 is excluded by the caller (its pose is given — eval.py:36-38).
    Returns {metric: [T] or [T, P]} numpy arrays.
    """
    rigid = obj.num_parts == 1
    out = {}
    diffs = eval_part_full(gt_poses, pred_poses, yaxis_only=obj.sym)
    for k, v in diffs.items():
        out[k] = np.asarray(v)  # [T, P]

    if eval_iou:
        gt_c = jnp.broadcast_to(gt_corners, pred_corners.shape)
        iou = eval_single_part_iou(gt_c, pred_corners, gt_poses, pred_poses,
                                   nocs=rigid, sym=obj.sym)
        for k, v in iou.items():
            out[k] = np.asarray(v)

    if not rigid:
        js = get_joint_state(obj, pred_poses)
        gt_js = get_joint_state(obj, gt_poses)
        out["theta_diff"] = np.asarray(jnp.abs(js - gt_js))  # [T, J]
    return out


def flatten_per_frame(name: str, traj_metrics: dict) -> dict:
    """-> {f'{name}_{frame}': {metric_part: float}} rows matching the
    reference csv schema (eval.py:40-56)."""
    rows = {}
    T = next(iter(traj_metrics.values())).shape[0]
    for t in range(T):
        row = {}
        for metric, arr in traj_metrics.items():
            vals = np.atleast_1d(arr[t])
            for j, v in enumerate(vals.reshape(-1)):
                key = metric if metric.startswith("iou") or \
                    metric.startswith("theta") else f"{metric}_{j}"
                if metric == "iou":
                    key = f"iou_{j}"
                elif metric == "theta_diff":
                    key = f"theta_diff_{j}"
                elif metric in ("npcs_iou", "gt_bbox_iou"):
                    key = f"{metric}_{j}"
                row[key] = float(v)
        rows[f"{name}_{t + 1}"] = row
    return rows


def summarize(error_dict: dict) -> dict:
    """Average every metric over rows (reference add_dict/log_loss_summary,
    utils.py:46-107)."""
    sums: dict[str, float] = {}
    counts: dict[str, int] = {}
    for row in error_dict.values():
        for k, v in row.items():
            sums[k] = sums.get(k, 0.0) + v
            counts[k] = counts.get(k, 0) + 1
    return {k: sums[k] / counts[k] for k in sums}


def write_outputs(error_dict: dict, out_dir: str, stem: str = "err"):
    """err.pkl + err.csv (reference eval.py:103-110 + per_dict_to_csv,
    utils.py:236-253)."""
    os.makedirs(out_dir, exist_ok=True)
    with open(pjoin(out_dir, f"{stem}.pkl"), "wb") as f:
        pickle.dump(error_dict, f)
    keys = sorted({k for row in error_dict.values() for k in row})
    with open(pjoin(out_dir, f"{stem}.csv"), "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["name"] + keys)
        for name in sorted(error_dict):
            row = error_dict[name]
            writer.writerow([name] + [row.get(k, "") for k in keys])
    return pjoin(out_dir, f"{stem}.pkl")


def evaluate_results_dir(results_dir: str, obj: ObjCfg,
                         eval_iou: bool = True, verbose: bool = True):
    """Evaluate every saved trajectory pickle (reference eval.py main)."""
    data_dir = pjoin(results_dir, "data")
    error_dict = {}
    for raw in sorted(os.listdir(data_dir)):
        if not raw.endswith(".pkl"):
            continue
        name = raw[:-4]
        with open(pjoin(data_dir, raw), "rb") as f:
            data = pickle.load(f)
        pred = data["pred"]
        gt = data["gt"]
        if gt is None:
            # GT-less real-capture artifact (tracking.results with
            # gt_poses=None): nothing to score
            continue
        pred_poses = Pose(**{k: jnp.asarray(v)
                             for k, v in pred["poses"].items()})
        gt_poses = Pose(**{k: jnp.asarray(v) for k, v in gt["poses"].items()})
        tm = eval_trajectory(pred_poses, gt_poses,
                             jnp.asarray(pred["corners"]),
                             jnp.asarray(gt["corners"]), obj,
                             eval_iou=eval_iou)
        error_dict.update(flatten_per_frame(name, tm))
    write_outputs(error_dict, results_dir)
    avg = summarize(error_dict)
    if verbose:
        for k in sorted(avg):
            print(f"{k}: {avg[k]:.6f}")
    return error_dict, avg
