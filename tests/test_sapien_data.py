"""SAPIEN reader tests against a fake rendered tree (OpenGL depth format,
reference arti_data_process.py:33-91 + sapien_dataset.py:38-85)."""
import os
import pickle
from os.path import join as pjoin

import numpy as np
import pytest

from captra_tpu.config.schema import ObjCfg
from captra_tpu.data.sapien import (
    SAPIENDataset, base_generate_data, get_obj2norm_pose, inv_pose,
    multiply_pose, opengl_depth_to_points, pose2srt, pose_pq_to_mat,
)


def test_pose_pq_roundtrip(rng):
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    p = rng.randn(3)
    mat = pose_pq_to_mat((p, q))
    R = mat[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)
    np.testing.assert_allclose(mat[:3, 3], p)


def test_pose_chain_identity():
    a = np.eye(4)
    a[3, 3] = 2.0  # scale 0.5
    srt = pose2srt(a)
    assert srt["scale"] == pytest.approx(0.5)
    d = {0: np.eye(4), 1: np.eye(4)}
    out = multiply_pose(d, np.eye(4))
    assert set(out.keys()) == {0, 1}
    np.testing.assert_allclose(inv_pose(a) @ a, np.eye(4))


def test_obj2norm():
    corner = [np.array([-1.0, -2, -3]), np.array([1.0, 2, 3])]
    factor = 0.25
    m = get_obj2norm_pose(corner, factor)
    # obj point at center -> 0; homogeneous semantics w/ scale in [3,3]
    pt = np.array([0.0, 0, 0, 1.0])
    out = m @ pt
    np.testing.assert_allclose(out[:3] / out[3], np.zeros(3), atol=1e-6)
    ext = np.array([1.0, 2, 3, 1.0])
    out = m @ ext
    np.testing.assert_allclose(out[:3] / out[3], corner[1] * factor)


def _fake_cloud_dict(rng, H=32, W=40):
    """OpenGL depth buffer with two segments at distinct depths."""
    depth = np.ones((H, W), np.float32)  # 1 = background (invalid)
    seg = np.zeros((H, W), np.int64)
    depth[4:16, 4:20] = 0.4  # part 0
    seg[4:16, 4:20] = 0
    depth[18:30, 20:36] = 0.6  # part 1
    seg[18:30, 20:36] = 1
    camera_matrix = np.array([[200.0, 0, W / 2], [0, 200.0, H / 2],
                              [0, 0, 1]])
    return {"depth": depth, "seg": seg, "camera_matrix": camera_matrix,
            "near": 0.1, "far": 10.0}


def test_opengl_depth_to_points(rng):
    cd = _fake_cloud_dict(rng)
    pts, seg = opengl_depth_to_points(cd)
    assert pts.shape[1] == 3 and len(pts) == len(seg)
    assert len(pts) == (12 * 16) + (12 * 16)
    assert set(np.unique(seg)) == {0, 1}


def _model_info(num_parts=2):
    corners = [[np.full(3, -0.5), np.full(3, 0.5)]
               for _ in range(num_parts)]
    return {"obj2link": {p: np.eye(4) for p in range(num_parts)},
            "factor": [1.0] * num_parts,
            "corner": corners,
            "tree": [-1, 0]}


def test_base_generate_data_nocs_consistency(rng):
    info = _model_info()
    n = 200
    seg = rng.randint(0, 2, n)
    cam_points = rng.randn(n, 3).astype(np.float32)
    cam2world = pose_pq_to_mat((rng.randn(3), rng.randn(4)))
    link2world = {p: pose_pq_to_mat((rng.randn(3), rng.randn(4)))
                  for p in range(2)}
    out = base_generate_data(info, cam_points, seg, cam2world, link2world)
    # consistency: posing nocs by nocs2camera recovers the camera points
    for p in range(2):
        srt = out["nocs2camera"][p]
        m = seg == p
        reposed = srt["scale"] * (out["nocs"][m] @ srt["rotation"].T) + \
            srt["translation"].reshape(1, 3)
        np.testing.assert_allclose(reposed, cam_points[m], atol=1e-4)


@pytest.fixture
def fake_sapien_root(tmp_path, rng):
    root = str(tmp_path)
    cat = "laptop"
    for instance in ("10101", "20001"):  # 10101 is in the test list
        for track in ("0000",):
            base = pjoin(root, "render", cat, instance, track)
            os.makedirs(pjoin(base, "cloud"), exist_ok=True)
            os.makedirs(pjoin(base, "gt"), exist_ok=True)
            for f in range(2):
                np.savez(pjoin(base, "cloud", f"{f}.npz"),
                         all_dict=_fake_cloud_dict(rng))
                q = rng.randn(4)
                gt = {"camera_pose": (rng.randn(3) * 0.1, q),
                      "link_pose": {p: (rng.randn(3) * 0.1, rng.randn(4))
                                    for p in range(2)}}
                with open(pjoin(base, "gt", f"{f}.pkl"), "wb") as fh:
                    pickle.dump(gt, fh)
    return root


def test_sapien_dataset(fake_sapien_root):
    obj = ObjCfg(category="laptop", num_parts=2, num_joints=1, tree=(-1, 0),
                 test_list=("10101",))
    ds = SAPIENDataset(fake_sapien_root, "laptop", obj, num_points=256,
                       mode="test", synthetic=True,
                       model_info_loader=lambda ins: _model_info())
    assert len(ds) == 2  # only the test instance's frames
    item = ds[0]
    assert item["data"]["points"].shape == (256, 3)
    assert len(item["meta"]["pose"]) == 2
    assert item["meta"]["nocs_corners"].shape == (2, 2, 3)
    # cache created; second read hits it
    item2 = ds[0]
    np.testing.assert_allclose(item["data"]["points"],
                               item2["data"]["points"])
    # train mode sees the other instance
    ds_train = SAPIENDataset(fake_sapien_root, "laptop", obj, num_points=256,
                             mode="train", synthetic=True,
                             model_info_loader=lambda ins: _model_info())
    assert len(ds_train) == 2


def test_read_cloud_perturb(rng):
    from captra_tpu.data.sapien import read_cloud
    cd = _fake_cloud_dict(rng)
    pts0, seg0 = read_cloud(cd, 128, synthetic=True, num_parts=2,
                            rng=np.random.RandomState(0))
    pts1, seg1 = read_cloud(cd, 128, synthetic=True, num_parts=2,
                            rng=np.random.RandomState(0), perturb=True)
    assert pts1.shape == (128, 3)
    # perturbation moves points but keeps them in the same ballpark
    assert np.abs(pts1).max() < np.abs(pts0).max() * 3 + 1.0
