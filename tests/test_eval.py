"""Eval harness tests: save -> evaluate -> err.pkl/csv round trip."""
import os

import jax.numpy as jnp
import numpy as np

from captra_tpu.config.schema import ObjCfg
from captra_tpu.eval.evaluator import (
    eval_trajectory, evaluate_results_dir, get_joint_state, summarize,
)
from captra_tpu.pose.part_dof import Pose
from captra_tpu.tracking.results import save_track_result

from tests.test_models import _make_pose


def test_joint_state_revolute(rng):
    obj = ObjCfg(num_parts=2, num_joints=1, tree=(-1, 0),
                 joint_type="revolute", main_axis=(1,))
    pose = _make_pose(rng, 3, 2)  # [B=3, P=2]
    js = np.asarray(get_joint_state(obj, pose))
    assert js.shape == (3, 1)
    # identical part rotations -> zero state
    same = Pose(rotation=jnp.broadcast_to(pose.rotation[:, :1],
                                          pose.rotation.shape),
                translation=pose.translation, scale=pose.scale)
    js0 = np.asarray(get_joint_state(obj, same))
    assert np.allclose(js0, 0.0, atol=0.2)


def test_joint_state_prismatic(rng):
    obj = ObjCfg(num_parts=2, num_joints=1, tree=(-1, 0),
                 joint_type="prismatic", main_axis=(2,))
    R = jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3))
    t = jnp.zeros((1, 2, 3, 1)).at[0, 1, 2, 0].set(0.37)  # child offset in z
    pose = Pose(rotation=R, translation=t, scale=jnp.ones((1, 2)))
    js = np.asarray(get_joint_state(obj, pose))
    np.testing.assert_allclose(js, [[0.37]], atol=1e-6)


def test_eval_trajectory_and_outputs(rng, tmp_path):
    obj = ObjCfg(num_parts=1, num_joints=0, tree=(-1,), sym=False)
    T, P = 4, 1
    gt = _make_pose(rng, T, P)
    pred = Pose(rotation=gt.rotation, translation=gt.translation + 0.01,
                scale=gt.scale)
    corners = np.tile(np.array([[[-0.3, -0.3, -0.3], [0.3, 0.3, 0.3]]],
                               np.float32), (P, 1, 1))
    pred_corners = np.tile(corners, (T, 1, 1, 1))

    tm = eval_trajectory(pred, gt, jnp.asarray(pred_corners),
                         jnp.asarray(corners), obj)
    assert tm["rdiff"].shape == (T, P)
    assert np.allclose(tm["tdiff"], np.sqrt(3) * 0.01, atol=1e-4)
    assert (tm["npcs_iou"] > 0.99).all()

    # save + evaluate directory round trip
    out_dir = str(tmp_path / "results")
    save_track_result(out_dir, "insA_0000", pred, gt, pred_corners, corners)
    err, avg = evaluate_results_dir(out_dir, obj, verbose=False)
    assert len(err) == T
    assert "rdiff_0" in next(iter(err.values()))
    assert os.path.exists(out_dir + "/err.csv")
    assert 0 < avg["5deg5cm_0"] <= 1.0


def test_eval_articulated_theta(rng, tmp_path):
    obj = ObjCfg(num_parts=2, num_joints=1, tree=(-1, 0),
                 joint_type="revolute", main_axis=(1,))
    T, P = 3, 2
    gt = _make_pose(rng, T, P)
    tm = eval_trajectory(gt, gt, None, None, obj, eval_iou=False)
    assert "theta_diff" in tm
    assert np.allclose(tm["theta_diff"], 0.0, atol=0.5)
