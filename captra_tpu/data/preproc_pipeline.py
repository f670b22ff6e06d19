"""End-to-end offline NOCS preprocessing driver: raw release in, the
`render/` tree `captra_tpu.data.nocs` consumes out.

Functional spec: /root/reference/datasets/nocs_data/preproc_nocs/
generate_all.py:39-60 (stage ordering: get_gt_poses -> get_instance_list ->
gather_instance_data per category, then `ln -s render/val render/test`),
get_gt_poses.py:37-82 (per-frame pose recovery to `*_pose.pkl`),
get_instance_list.py:63-78 (per-instance occurrence lists),
gather_instance_data.py:27-128 (per-instance crop -> npz tree with
100-imgs/folder grouping for synthetic, per-track folders for real).

The numerical blocks live in `captra_tpu.data.preproc_nocs` (RANSAC Umeyama,
frame pose recovery, instance occurrence scan, crop); this module is the
orchestration: stage functions over the raw on-disk layout

    <raw_root>/nocs_full/<data_type>/<track>/<prefix>_{color,depth,coord,
                                                       mask,meta.txt}
    <raw_root>/obj_models/...                    # .obj sources for corners

producing

    <raw_root>/nocs_full/<data_type>/<track>/<prefix>_pose.pkl
    <raw_root>/instance_list/<data_type>/<cls>/<instance>.txt
    <raw_root>/model_corners/<instance>.npy      # [2, 3] NPCS min/max
    <raw_root>/render/<data_type>/<cls>/<instance>/<folder>/data/<frame>.npz

Every stage fans out over `preproc_nocs.run_parallel` (reference
--parallel --num_proc).  All stages are idempotent (re-runs overwrite).
"""
from __future__ import annotations

import glob
import os
import pickle
from os.path import join as pjoin

import numpy as np

from captra_tpu.data.preproc_nocs import (
    REAL_INTRINSICS, SYNTHETIC_INTRINSICS, crop_instance_frame,
    instance_occurrences, frame_poses, read_coord_map, read_depth,
    run_parallel,
)

SYN_TYPES = ("train", "val")
REAL_TYPES = ("real_train", "real_test")
ALL_TYPES = SYN_TYPES + REAL_TYPES


def _intrinsics(data_type: str) -> np.ndarray:
    return REAL_INTRINSICS if data_type in REAL_TYPES else SYNTHETIC_INTRINSICS


def _is_real(data_type: str) -> bool:
    return data_type in REAL_TYPES


def _is_flip(data_type: str) -> bool:
    # synthetic CAMERA frames are mirrored (reference get_gt_poses.py:105,
    # gather_instance_data.py:161)
    return data_type in SYN_TYPES


def _frame_prefixes(track_dir: str) -> list[str]:
    return sorted(f[:4] for f in os.listdir(track_dir)
                  if f.endswith("color.png"))


def remove_border(mask: np.ndarray, kernel_size: int = 2) -> np.ndarray:
    """Dilate the 255 (no-instance) region so real-capture mask borders do
    not leak mixed depth pixels into pose fitting (reference
    nocs_utils.py:44-53 — same semantics, vectorized with a box dilation
    instead of the reference's O(HW) python scan)."""
    import cv2
    grow = cv2.dilate((mask == 255).astype(np.uint8),
                      np.ones((2 * kernel_size, 2 * kernel_size), np.uint8))
    out = mask.copy()
    out[grow.astype(bool)] = 255
    return out


# ---------------------------------------------------------------------------
# stage 1: per-frame GT pose recovery (get_gt_poses.py spec)
# ---------------------------------------------------------------------------

def gt_poses_for_tracks(raw_path: str, tracks: list[str], data_type: str,
                        seed: int = 0) -> int:
    """Write `<prefix>_pose.pkl` beside every frame of the given track
    folders (reference get_pose, get_gt_poses.py:37-82).  Returns the
    number of frames processed."""
    import cv2
    intrinsics = _intrinsics(data_type)
    flip, real = _is_flip(data_type), _is_real(data_type)
    rng = np.random.RandomState(seed)
    done = 0
    for track in tracks:
        tdir = pjoin(raw_path, track)
        if not os.path.isdir(tdir):
            continue
        for prefix in _frame_prefixes(tdir):
            depth = read_depth(pjoin(tdir, f"{prefix}_depth.png"))
            coord_path = pjoin(tdir, f"{prefix}_coord.png")
            mask_img = cv2.imread(pjoin(tdir, f"{prefix}_mask.png"))
            meta = pjoin(tdir, f"{prefix}_meta.txt")
            if depth is None or mask_img is None \
                    or not os.path.exists(coord_path) \
                    or not os.path.exists(meta):
                continue
            mask = mask_img[:, :, 2]
            if flip:
                depth, mask = depth[:, ::-1], mask[:, ::-1]
            if real:
                mask = remove_border(mask, kernel_size=2)
            # read_coord_map applies the flip + channel + z-sign conventions
            # (get_gt_poses.py:73-76)
            coord = read_coord_map(coord_path, flip)
            with open(meta) as f:
                num_instances = sum(1 for line in f if line.strip())
            poses = frame_poses(depth, coord, mask, num_instances,
                                intrinsics, rng=rng)
            with open(pjoin(tdir, f"{prefix}_pose.pkl"), "wb") as f:
                pickle.dump(poses, f)
            done += 1
    return done


# ---------------------------------------------------------------------------
# stage 2: instance occurrence lists (get_instance_list.py spec)
# ---------------------------------------------------------------------------

def write_instance_lists(raw_path: str, data_type: str, list_path: str,
                         min_points: int = 50) -> dict:
    """instance_list/<data_type>/<cls>/<instance>.txt, one `track/prefix`
    per line (reference get_instance_list.py:63-78)."""
    folders = sorted(os.listdir(raw_path))
    occ = instance_occurrences(raw_path, folders, real=_is_real(data_type),
                               min_points=min_points)
    out_root = pjoin(list_path, data_type)
    for cls_id, instances in occ.items():
        cdir = pjoin(out_root, str(cls_id))
        os.makedirs(cdir, exist_ok=True)
        for inst_id, frames in instances.items():
            with open(pjoin(cdir, f"{inst_id}.txt"), "w") as f:
                f.writelines(line + "\n" for line in frames)
    return occ


# ---------------------------------------------------------------------------
# stage 3: model corners from the released .obj meshes
# ---------------------------------------------------------------------------

def obj_vertices(path: str) -> np.ndarray:
    """Vertex positions from a Wavefront OBJ ('v x y z' lines only)."""
    verts = []
    with open(path, errors="replace") as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
    return np.asarray(verts, np.float64)


def write_model_corners(model_root: str, out_path: str,
                        instances: list[str] | None = None) -> list[str]:
    """model_corners/<instance>.npy = [2, 3] vertex min/max in NPCS
    (the reference consumes these pre-built, nocs_dataset.py:56 and
    gather_instance_data.py:29; NOCS ships the meshes, so they are derived
    here from obj_models/**/{<instance>.obj | <instance>/model.obj})."""
    os.makedirs(out_path, exist_ok=True)
    candidates = glob.glob(pjoin(model_root, "**", "*.obj"), recursive=True)
    written = []
    for obj_path in sorted(candidates):
        name = os.path.basename(obj_path)[:-4]
        if name == "model":  # CAMERA layout: <instance>/model.obj
            name = os.path.basename(os.path.dirname(obj_path))
        if instances is not None and name not in instances:
            continue
        verts = obj_vertices(obj_path)
        if len(verts) == 0:
            continue
        corners = np.stack([verts.min(0), verts.max(0)]).astype(np.float32)
        np.save(pjoin(out_path, f"{name}.npy"), corners)
        written.append(name)
    return written


# ---------------------------------------------------------------------------
# stage 4: per-instance gathering (gather_instance_data.py spec)
# ---------------------------------------------------------------------------

def gather_instance(raw_path: str, list_path: str, model_path: str,
                    output_path: str, instance: str, data_type: str,
                    img_per_folder: int = 100) -> int:
    """Crop every listed frame of one instance into the render tree
    (reference gather_instance, gather_instance_data.py:27-128):
    synthetic -> <instance>/<folder:04d>/data/<img:02d>.npz grouped
    `img_per_folder` per folder; real -> <instance>/<track>/data/<prefix>.npz
    plus a per-track meta.txt.  Each npz holds
    all_dict = {points, labels, pose, path}."""
    import cv2
    intrinsics = _intrinsics(data_type)
    flip, real = _is_flip(data_type), _is_real(data_type)
    corners = np.load(pjoin(model_path, f"{instance}.npy"))
    with open(pjoin(list_path, f"{instance}.txt")) as f:
        lines = [ln.strip() for ln in f if ln.strip()]

    inst_root = pjoin(output_path, instance)
    folder_num, img_num = 0, -1
    track_dirs: dict[str, str] = {}
    written = 0
    for line in lines:
        track, prefix = line.split("/")[:2]
        tdir = pjoin(raw_path, track)
        suffix = "depth" if real else "composed"
        depth = read_depth(pjoin(tdir, f"{prefix}_{suffix}.png"))
        mask_img = cv2.imread(pjoin(tdir, f"{prefix}_mask.png"))
        meta_path = pjoin(tdir, f"{prefix}_meta.txt")
        pose_path = pjoin(tdir, f"{prefix}_pose.pkl")
        if depth is None or mask_img is None \
                or not os.path.exists(meta_path) \
                or not os.path.exists(pose_path):
            continue
        mask = mask_img[:, :, 2]
        if flip:
            depth, mask = depth[:, ::-1], mask[:, ::-1]
        inst_num = -1
        with open(meta_path) as f:
            for meta_line in f:
                parts = meta_line.split()
                if not parts:
                    continue
                # real meta ids may carry an extension / path
                # (get_instance_list.py:37-38 sanitization)
                mid = parts[-1].split(".")[0].replace("/", "_") if real \
                    else parts[-1]
                if mid == instance:
                    inst_num = int(parts[0])
                    break
        with open(pose_path, "rb") as f:
            pose_dict = pickle.load(f)
        if inst_num not in pose_dict:
            continue
        pose = pose_dict[inst_num]
        out = crop_instance_frame(depth, mask, inst_num, pose, corners,
                                  intrinsics)
        if out is None:
            continue
        data_dict = {"points": out["points"], "labels": out["labels"],
                     "pose": pose,
                     "path": pjoin(tdir, f"{prefix}_{suffix}.png")}
        if real:
            ddir = pjoin(inst_root, track, "data")
            os.makedirs(ddir, exist_ok=True)
            track_dirs[track] = tdir
            np.savez_compressed(pjoin(ddir, f"{prefix}.npz"),
                                all_dict=data_dict)
        else:
            img_num += 1
            if img_num >= img_per_folder:
                folder_num += 1
                img_num = 0
            ddir = pjoin(inst_root, f"{folder_num:04d}", "data")
            os.makedirs(ddir, exist_ok=True)
            np.savez_compressed(pjoin(ddir, f"{img_num:02d}.npz"),
                                all_dict=data_dict)
        written += 1
    # per-track raw-path pointers (reference writes these so the OTF
    # tracking path can find depth/meta back, gather_instance_data.py:123-128
    # — the reference loop overwrites one file per instance; here each track
    # gets its own meta.txt, which is what nocs_dataset.py actually reads)
    for track, tdir in track_dirs.items():
        with open(pjoin(inst_root, track, "meta.txt"), "w") as f:
            print(tdir, file=f)
    return written


def gather_category(raw_path: str, list_root: str, model_path: str,
                    render_root: str, category: int, data_type: str,
                    num_proc: int = 1, img_per_folder: int = 100) -> list[str]:
    """All instances of one (data_type, category), fanned out over
    processes (reference gather_instance_data.py main, :145-177)."""
    list_path = pjoin(list_root, data_type, str(category))
    if not os.path.isdir(list_path):
        return []
    output_path = pjoin(render_root, data_type, str(category))
    os.makedirs(output_path, exist_ok=True)
    instances = sorted(s[:-4] for s in os.listdir(list_path)
                       if s.endswith(".txt"))
    instances = [i for i in instances
                 if os.path.exists(pjoin(model_path, f"{i}.npy"))]

    def work(chunk):
        for inst in chunk:
            gather_instance(raw_path, list_path, model_path, output_path,
                            inst, data_type, img_per_folder)

    run_parallel(work, instances, num_proc)
    return instances


# ---------------------------------------------------------------------------
# the full pipeline (generate_all.py spec)
# ---------------------------------------------------------------------------

def run_pipeline(root_dset: str, data_types=ALL_TYPES,
                 categories=range(1, 7), num_proc: int = 1,
                 img_per_folder: int = 100, stages=("poses", "lists",
                                                    "corners", "gather"),
                 log=print) -> None:
    """raw NOCS release at <root_dset> -> the render tree
    (reference generate_all.py:39-60; plus the model-corner derivation the
    reference assumes pre-done, and the val->test link)."""
    ori_path = pjoin(root_dset, "nocs_full")
    list_path = pjoin(root_dset, "instance_list")
    model_path = pjoin(root_dset, "model_corners")
    render_path = pjoin(root_dset, "render")

    if "poses" in stages:
        for dt in data_types:
            raw = pjoin(ori_path, dt)
            tracks = sorted(os.listdir(raw)) if os.path.isdir(raw) else []
            log(f"[poses] {dt}: {len(tracks)} track folders")
            run_parallel(
                lambda chunk, raw=raw, dt=dt:
                    gt_poses_for_tracks(raw, chunk, dt),
                tracks, num_proc)

    if "lists" in stages:
        for dt in data_types:
            raw = pjoin(ori_path, dt)
            if not os.path.isdir(raw):
                continue
            occ = write_instance_lists(raw, dt, list_path)
            log(f"[lists] {dt}: " + " ".join(
                f"cls{c}={len(v)}" for c, v in occ.items() if v))

    if "corners" in stages:
        written = write_model_corners(pjoin(root_dset, "obj_models"),
                                      model_path)
        log(f"[corners] {len(written)} models")

    if "gather" in stages:
        for dt in data_types:
            for cat in categories:
                insts = gather_category(pjoin(ori_path, dt), list_path,
                                        model_path, render_path, cat, dt,
                                        num_proc, img_per_folder)
                if insts:
                    log(f"[gather] {dt} cls{cat}: {len(insts)} instances")
        # reference aliases the val render tree as test
        # (generate_all.py:59-60)
        val_dir, test_dir = pjoin(render_path, "val"), pjoin(render_path,
                                                             "test")
        if os.path.isdir(val_dir) and not os.path.exists(test_dir):
            os.symlink("val", test_dir)
            log("[link] render/test -> val")
