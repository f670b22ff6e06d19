"""Tracking visualizers.

Functional spec: /root/reference/misc/visualize/ (vis_utils.py 3D point
plots; visualize_tracking_nocs.py:36-114 2D bbox overlays;
visualize_tracking_sapien.py 3D bbox + cloud plots).  Consumes the
results/data/*.pkl artifacts written by captra_tpu.tracking.results.
"""
from __future__ import annotations

import os
import pickle
from os.path import join as pjoin

import numpy as np

# box wireframe edges for the bbox_from_corners vertex ordering
# (vertex bits: x = bit from (i%4)//2, y = i//4, z = i%2)
_EDGES = [(0, 1), (0, 2), (1, 3), (2, 3),
          (4, 5), (4, 6), (5, 7), (6, 7),
          (0, 4), (1, 5), (2, 6), (3, 7)]


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_point_clouds(pt_lists, save_path: str | None = None,
                      titles=None, limits=None):
    """Rows of grouped 3D point clouds (reference plot3d_pts,
    vis_utils.py:57-150 in spirit).  pt_lists: list of list of [N, 3]."""
    plt = _plt()
    n = len(pt_lists)
    fig = plt.figure(figsize=(5 * n, 5))
    for i, groups in enumerate(pt_lists):
        ax = fig.add_subplot(1, n, i + 1, projection="3d")
        for pts in groups:
            pts = np.asarray(pts)
            ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=1)
        if titles:
            ax.set_title(titles[i])
        if limits:
            ax.set_xlim(*limits[0])
            ax.set_ylim(*limits[1])
            ax.set_zlim(*limits[2])
    if save_path:
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        fig.savefig(save_path, dpi=80, bbox_inches="tight")
    plt.close(fig)
    return save_path


def plot_tracked_boxes_3d(points: np.ndarray, boxes: np.ndarray,
                          gt_boxes: np.ndarray | None = None,
                          save_path: str | None = None):
    """Cloud + predicted (and GT) posed box wireframes for one frame
    (reference visualize_tracking_sapien.py).  boxes: [P, 8, 3]."""
    plt = _plt()
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    pts = np.asarray(points)
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=1, c="gray", alpha=0.5)

    def draw(bx, color):
        for part in np.asarray(bx):
            for a, b in _EDGES:
                ax.plot(*zip(part[a], part[b]), c=color, linewidth=1)

    draw(boxes, "tab:blue")
    if gt_boxes is not None:
        draw(gt_boxes, "tab:green")
    if save_path:
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        fig.savefig(save_path, dpi=80, bbox_inches="tight")
    plt.close(fig)
    return save_path


def project_box_2d(box: np.ndarray, intrinsics: np.ndarray,
                   image_height: int) -> np.ndarray:
    """Posed box vertices [8, 3] -> pixel (row, col) [8, 2] with the NOCS
    projection conventions (reference nocs_utils.project + the flip at
    visualize_tracking_nocs.py)."""
    pts = box * 1000.0
    pts = -pts / pts[:, -1:]
    pts[:, -1] = -pts[:, -1]
    uv = (intrinsics @ pts.T).T[:, :2]
    rc = np.stack([image_height - uv[:, 1], uv[:, 0]], axis=-1)
    return rc


def draw_boxes_on_image(image: np.ndarray, boxes: np.ndarray,
                        intrinsics: np.ndarray, color=(255, 80, 0),
                        thickness: int = 2) -> np.ndarray:
    """Overlay projected box wireframes on an RGB/depth image
    (reference visualize_tracking_nocs.py:36-114)."""
    import cv2
    img = np.ascontiguousarray(image).copy()
    H = img.shape[0]
    for box in np.asarray(boxes):
        rc = project_box_2d(box, intrinsics, H).astype(np.int32)
        for a, b in _EDGES:
            cv2.line(img, (rc[a, 1], rc[a, 0]), (rc[b, 1], rc[b, 0]),
                     color, thickness)
    return img


def visualize_scene_images(results_dir: str, img_dir: str, scene: str,
                           out_dir: str | None = None,
                           intrinsics: np.ndarray | None = None,
                           depth: bool = False, draw_gt: bool = False,
                           color=(255, 80, 0), gt_color=(0, 200, 0)):
    """Scene walkthrough: for every frame of `scene`, overlay each tracked
    instance's posed predicted box onto the scene's RGB (or depth) image and
    write a PNG sequence (reference visualize_tracking_nocs.py:36-114).

    Expects `results_dir/data/*.pkl` artifacts (tracking.results) whose file
    names contain the scene id as a full `_`-separated token, and NOCS-layout
    images `img_dir/<scene>/<frame>_color.png` (or `_depth.png`).  Frame
    alignment uses each pickle's `frame_nums`; pickles written without them
    (this repo's cli/track.py saves tracked frames only, no frame 0) fall
    back to 1..T.  A frame whose predicted corners are missing/non-finite
    (the reference stores None for frame 0, model.py:482-509) falls back to
    the GT corners.
    """
    import cv2
    import re

    if intrinsics is None:
        from captra_tpu.data.preprocess import NOCS_REAL_INTRINSICS
        intrinsics = np.asarray(NOCS_REAL_INTRINSICS)
    from captra_tpu.pose.bbox import posed_bbox_from_part
    from captra_tpu.pose.part_dof import Pose
    import jax.numpy as jnp

    out_dir = out_dir or pjoin(results_dir, "vis", scene)
    data_dir = pjoin(results_dir, "data")
    # exact token match: "scene_1" must not pull in "scene_10"
    pat = re.compile(r"(^|_)" + re.escape(scene) + r"(_|$)")
    instances = {}
    for raw in sorted(os.listdir(data_dir)):
        if raw.endswith(".pkl") and pat.search(raw[:-4]):
            with open(pjoin(data_dir, raw), "rb") as f:
                instances[raw[:-4]] = pickle.load(f)
    if not instances:
        return []

    # per-instance frame_num -> local index maps (instances may enter the
    # scene at different frames, visualize_tracking_nocs.py:44-49)
    frame_maps = {}
    for ins, data in instances.items():
        T = data["pred"]["poses"]["scale"].shape[0]
        # .get: pickles from other writers (reference-format artifacts) may
        # lack the key entirely — both absent and empty fall back to 1..T
        nums_raw = data.get("frame_nums", [])
        nums = [int(np.ravel(n)[0]) for n in nums_raw] \
            if len(nums_raw) else list(range(1, T + 1))
        frame_maps[ins] = {n: i for i, n in enumerate(nums)}
    all_frames = sorted({n for m in frame_maps.values() for n in m})

    suffix = "depth" if depth else "color"
    written = []
    os.makedirs(out_dir, exist_ok=True)
    depth_hi = None  # sequence-constant display scale (no frame flicker)
    for frame_num in all_frames:
        # NOCS real layout zero-pads frame prefixes to 4 digits
        # (preproc_nocs.py:167 '0001_color.png'); accept unpadded too
        for stem in (f"{frame_num:04d}", str(frame_num)):
            image_path = pjoin(img_dir, scene, f"{stem}_{suffix}.png")
            if os.path.exists(image_path):
                break
        else:
            continue
        if depth:
            raw16 = cv2.imread(image_path, -1).astype(np.float32)
            # normalize for display — a straight uint8 cast wraps uint16
            # depth (mm) mod 256 into banded noise; scale is fixed from the
            # first frame so the sequence doesn't flicker
            if depth_hi is None:
                depth_hi = max(float(raw16.max()), 1.0)
            img = np.stack([np.clip(raw16 / depth_hi * 255.0, 0, 255)
                            .astype(np.uint8)] * 3, axis=-1)
        else:
            img = cv2.imread(image_path)[..., ::-1]  # BGR -> RGB
        for ins, data in instances.items():
            if frame_num not in frame_maps[ins]:
                continue
            i = frame_maps[ins][frame_num]
            pred_pose = Pose(**{k: jnp.asarray(v[i]) for k, v in
                                data["pred"]["poses"].items()})
            corners = data["pred"]["corners"][i]
            if corners is None or not np.isfinite(np.asarray(
                    corners, dtype=np.float32)).all():
                if data.get("gt") is None:  # GT-less artifact, no fallback
                    continue
                corners = data["gt"]["corners"]
            boxes = np.asarray(posed_bbox_from_part(pred_pose,
                                                    jnp.asarray(corners)))
            img = draw_boxes_on_image(img, boxes, intrinsics, color=color)
            if draw_gt and data.get("gt") is not None:
                gt_pose = Pose(**{k: jnp.asarray(v[i]) for k, v in
                                  data["gt"]["poses"].items()})
                gt_boxes = np.asarray(posed_bbox_from_part(
                    gt_pose, jnp.asarray(data["gt"]["corners"])))
                img = draw_boxes_on_image(img, gt_boxes, intrinsics,
                                          color=gt_color)
        path = pjoin(out_dir, f"{frame_num}.png")
        cv2.imwrite(path, np.ascontiguousarray(img[..., ::-1]))
        written.append(path)
    return written


def visualize_results_dir(results_dir: str, out_dir: str | None = None,
                          max_frames: int = 10):
    """Render 3D box plots for saved trajectories (no raw images needed)."""
    from captra_tpu.pose.bbox import bbox_from_corners, posed_bbox_from_part
    from captra_tpu.pose.part_dof import Pose
    import jax.numpy as jnp

    out_dir = out_dir or pjoin(results_dir, "vis")
    data_dir = pjoin(results_dir, "data")
    written = []
    for raw in sorted(os.listdir(data_dir)):
        if not raw.endswith(".pkl"):
            continue
        with open(pjoin(data_dir, raw), "rb") as f:
            data = pickle.load(f)
        pred = data["pred"]
        gt = data["gt"]  # None for GT-less real-capture artifacts
        pred_pose = Pose(**{k: jnp.asarray(v)
                            for k, v in pred["poses"].items()})
        gt_pose = None if gt is None else \
            Pose(**{k: jnp.asarray(v) for k, v in gt["poses"].items()})
        T = pred_pose.scale.shape[0]
        for t in range(0, T, max(1, T // max_frames)):
            boxes = np.asarray(posed_bbox_from_part(
                pred_pose[t], jnp.asarray(pred["corners"][t])))
            gt_boxes = None if gt_pose is None else np.asarray(
                posed_bbox_from_part(gt_pose[t], jnp.asarray(gt["corners"])))
            path = pjoin(out_dir, f"{raw[:-4]}_{t:03d}.png")
            plot_tracked_boxes_3d(np.zeros((0, 3)), boxes, gt_boxes, path)
            written.append(path)
    return written
