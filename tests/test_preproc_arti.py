import os
import pickle
from os.path import join as pjoin

import numpy as np

from captra_tpu.data.preproc_arti import (
    bmvc_frame, point_cloud_from_depth, process_capture_pickle,
)
from captra_tpu.data.real_arti import REAL_AXIS_PERMUTATION


def test_point_cloud_from_depth():
    K = np.array([[100.0, 0, 20], [0, 100.0, 15], [0, 0, 1]])
    depth = np.zeros((30, 40))
    depth[10, 25] = 2.0
    pts = point_cloud_from_depth(depth, K)
    assert pts.shape == (1, 3)
    # pixel (row 10, col 25): px=25, py=30-1-10=19
    np.testing.assert_allclose(pts[0], [(25 - 20) * 2 / 100,
                                        (19 - 15) * 2 / 100, -2.0])


def test_bmvc_frame(rng):
    K = np.array([[100.0, 0, 20], [0, 100.0, 15], [0, 0, 1]])
    depth = np.zeros((30, 40))
    depth[5:15, 5:15] = 1.0
    depth[16:26, 20:30] = 1.5
    m0 = np.zeros((30, 40))
    m0[5:15, 5:15] = 1
    m1 = np.zeros((30, 40))
    m1[16:26, 20:30] = 1
    pose_mats = {p: np.eye(4) for p in range(2)}
    info = {"corner": [[np.full(3, -1.0), np.full(3, 1.0)]] * 2,
            "factor": [0.5, 0.5]}
    out = bmvc_frame(depth, [m0, m1], pose_mats, info, K)
    assert set(np.unique(out["labels"])) == {0, 1}
    assert len(out["nocs2camera"]) == 2
    # nocs round trip through the returned sRt
    for p in range(2):
        srt = out["nocs2camera"][p]
        m = out["labels"] == p
        reposed = srt["scale"] * (out["nocs"][m] @ srt["rotation"].T) + \
            srt["translation"].reshape(1, 3)
        np.testing.assert_allclose(reposed, out["points"][m], atol=1e-4)


def test_process_capture_pickle(tmp_path, rng):
    raw = rng.randn(3, 50, 3).astype(np.float32)
    pkl = pjoin(str(tmp_path), "0_kinect2.pkl")
    with open(pkl, "wb") as f:
        pickle.dump({"point_cloud": list(raw), "image": [None] * 3}, f)
    out = pjoin(str(tmp_path), "out")
    n = process_capture_pickle(pkl, out, save_rgb=False)
    assert n == 3
    got = np.load(pjoin(out, "cloud", "0.npz"))["point"]
    want = raw[0].reshape(-1, 3) @ np.asarray(REAL_AXIS_PERMUTATION).T
    np.testing.assert_allclose(got, want, atol=1e-6)
