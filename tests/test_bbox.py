import jax.numpy as jnp
import numpy as np

from captra_tpu.pose import bbox
from captra_tpu.pose.part_dof import Pose


def test_bbox_from_corners_unit_cube():
    corners = jnp.asarray([[[-1.0, -1, -1], [1, 1, 1]]])  # [1, 2, 3]
    box = np.asarray(bbox.bbox_from_corners(corners))[0]
    # reference ordering (bbox_utils.py:13): corner 0 = (-1, -1... check a few
    assert box.shape == (8, 3)
    expected = np.array([[(-1) ** (((i % 4) // 2) == 0),
                          (-1) ** ((i // 4) == 0),
                          (-1) ** ((i % 2) == 0)] for i in range(8)],
                        dtype=np.float32) * -1.0
    # corner i coords: x from row (i%4)//2, y from row i//4, z from row i%2
    exp = np.zeros((8, 3))
    c = np.array([[-1.0, -1, -1], [1, 1, 1]])
    for i in range(8):
        exp[i] = [c[(i % 4) // 2, 0], c[i // 4, 1], c[i % 2, 2]]
    np.testing.assert_allclose(box, exp)


def test_iou_identical_box():
    corners = jnp.asarray([[[-0.5, -0.4, -0.3], [0.5, 0.4, 0.3]]])
    box = bbox.bbox_from_corners(corners)
    iou = np.asarray(bbox.iou_3d(box, box))
    np.testing.assert_allclose(iou, 1.0, atol=0.02)


def test_iou_disjoint_box():
    b1 = bbox.bbox_from_corners(jnp.asarray([[[0.0, 0, 0], [1, 1, 1]]]))
    b2 = bbox.bbox_from_corners(jnp.asarray([[[5.0, 5, 5], [6, 6, 6]]]))
    iou = np.asarray(bbox.iou_3d(b1, b2))
    np.testing.assert_allclose(iou, 0.0, atol=1e-6)


def test_iou_half_overlap():
    b1 = bbox.bbox_from_corners(jnp.asarray([[[0.0, 0, 0], [2, 2, 2]]]))
    b2 = bbox.bbox_from_corners(jnp.asarray([[[1.0, 0, 0], [3, 2, 2]]]))
    iou = np.asarray(bbox.iou_3d(b1, b2))
    np.testing.assert_allclose(iou, 1.0 / 3.0, atol=0.05)


def test_aabb_iou():
    b1 = bbox.bbox_from_corners(jnp.asarray([[[0.0, 0, 0], [2, 2, 2]]]))
    b2 = bbox.bbox_from_corners(jnp.asarray([[[1.0, 0, 0], [3, 2, 2]]]))
    np.testing.assert_allclose(np.asarray(bbox.aabb_iou_3d(b1, b2)),
                               1.0 / 3.0, atol=1e-5)


def test_pred_nocs_corners(rng):
    B, N, P = 2, 100, 2
    labels = rng.randint(0, P, (B, N))
    nocs = rng.randn(B, N, 3).astype(np.float32) * 0.2
    out = np.asarray(bbox.pred_nocs_corners(jnp.asarray(labels),
                                            jnp.asarray(nocs), P))
    assert out.shape == (B, P, 2, 3)
    for b in range(B):
        for p in range(P):
            m = labels[b] == p
            if m.sum() == 0:
                np.testing.assert_allclose(out[b, p], 0.0)
            else:
                size = np.abs(nocs[b, m]).max(0)
                np.testing.assert_allclose(out[b, p, 1], size, atol=1e-6)
                np.testing.assert_allclose(out[b, p, 0], -size, atol=1e-6)


def test_eval_single_part_iou_perfect(rng):
    B, P = 1, 1
    corners = jnp.asarray(
        np.stack([np.full((B, P, 3), -0.4), np.full((B, P, 3), 0.4)], axis=2),
        dtype=jnp.float32)
    pose = Pose.identity((B, P))
    out = bbox.eval_single_part_iou(corners, corners, pose, pose,
                                    nocs=False, sym=False)
    for k in ("npcs_iou", "iou", "gt_bbox_iou"):
        np.testing.assert_allclose(np.asarray(out[k]), 1.0, atol=0.03)


def test_eval_single_part_iou_sym_yrotation(rng):
    """Symmetric eval: a y-rotated GT pose should still reach max IoU."""
    B, P = 1, 1
    corners = jnp.asarray(
        np.stack([np.array([[[-0.5, -0.2, -0.3]]]),
                  np.array([[[0.5, 0.2, 0.3]]])], axis=2), dtype=jnp.float32)
    theta = 2 * np.pi * 3 / 20  # exactly one of the swept angles
    c, s = np.cos(theta), np.sin(theta)
    Ry = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32)
    gt_pose = Pose.identity((B, P))
    pred_pose = Pose(rotation=jnp.asarray(Ry)[None, None],
                     translation=jnp.zeros((B, P, 3, 1)),
                     scale=jnp.ones((B, P)))
    out_sym = bbox.eval_single_part_iou(corners, corners, gt_pose, pred_pose,
                                        sym=True)
    out_nosym = bbox.eval_single_part_iou(corners, corners, gt_pose, pred_pose,
                                          sym=False)
    assert np.asarray(out_sym["iou"]) > 0.95
    assert np.asarray(out_nosym["iou"]) < 0.9
