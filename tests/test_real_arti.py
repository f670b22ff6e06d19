"""BMVC / real-capture reader tests on fake on-disk trees."""
import json
import os
import pickle
from os.path import join as pjoin

import numpy as np

from captra_tpu.data.real_arti import (
    BMVCDataset, REAL_AXIS_PERMUTATION, SAPIENRealDataset,
    real_pose_and_corners,
)


def test_bmvc_dataset(tmp_path, rng):
    d = pjoin(str(tmp_path), "preproc", "laptop", "0", "0")
    os.makedirs(d)
    for i in range(3):
        full = {"points": rng.randn(100, 3).astype(np.float32),
                "labels": rng.randint(0, 2, 100),
                "nocs": rng.randn(100, 3).astype(np.float32),
                "nocs2camera": [{"rotation": np.eye(3),
                                 "translation": np.zeros((3, 1)),
                                 "scale": 1.0}] * 2}
        with open(pjoin(d, f"{i:05d}.pkl"), "wb") as f:
            pickle.dump(full, f)
    ds = BMVCDataset(str(tmp_path), "laptop")
    assert len(ds) == 3
    item = ds[1]
    assert item["data"]["points"].shape == (100, 3)
    assert len(item["meta"]["pose"]) == 2


def test_real_pose_and_corners():
    meta = {name: {"size": [0.3, 0.2, 0.1]} for name in
            ("drawer1", "drawer2", "drawer3", "body")}
    frame_pose = {name: {"R": np.eye(3).ravel().tolist(),
                         "t": [0.1, 0.2, 0.3]} for name in meta}
    poses, corners = real_pose_and_corners([frame_pose], meta, 0)
    assert len(poses) == 4 and corners.shape == (4, 2, 3)
    diag = np.linalg.norm([0.3, 0.2, 0.1])
    np.testing.assert_allclose(poses[0]["scale"], diag, rtol=1e-6)
    # camera-axis permutation applied
    np.testing.assert_allclose(poses[0]["rotation"], REAL_AXIS_PERMUTATION)
    np.testing.assert_allclose(
        poses[0]["translation"].reshape(3),
        REAL_AXIS_PERMUTATION @ np.array([0.1, 0.2, 0.3]), atol=1e-6)
    # normalized corners have unit diagonal
    np.testing.assert_allclose(
        np.linalg.norm(corners[:, 1] - corners[:, 0], axis=-1), 1.0,
        rtol=1e-6)


def test_sapien_real_dataset(tmp_path, rng):
    root = str(tmp_path)
    cdir = pjoin(root, "render", "drawers", "real01", "t0", "cloud")
    os.makedirs(cdir)
    for i in range(2):
        np.savez(pjoin(cdir, f"{i}.npz"),
                 point=rng.randn(300, 3).astype(np.float32))
    pdir = pjoin(root, "real_pose", "drawers", "real01")
    os.makedirs(pdir)
    meta = {name: {"size": [0.3, 0.2, 0.1]} for name in
            ("drawer1", "drawer2", "drawer3", "body")}
    frame_pose = {name: {"R": np.eye(3).ravel().tolist(),
                         "t": [0, 0, 1.0]} for name in meta}
    with open(pjoin(pdir, "t0.json"), "w") as f:
        json.dump([frame_pose, frame_pose], f)
    with open(pjoin(pdir, "meta.json"), "w") as f:
        json.dump(meta, f)

    ds = SAPIENRealDataset(root, "drawers", num_points=128)
    assert len(ds) == 2
    item = ds[0]
    assert item["data"]["points"].shape == (128, 3)
    assert len(item["meta"]["pose"]) == 4
    assert item["meta"]["nocs_corners"].shape == (4, 2, 3)
    assert ds.track_index() == {"real01/t0": [0, 1]}
