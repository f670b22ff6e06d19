import numpy as np

from captra_tpu.data.nocs2d import (
    compute_2d_bbox_iou, projected_track_bbox, select_nocs2d_mask,
)
from captra_tpu.data.preproc_nocs import SYNTHETIC_INTRINSICS


def test_bbox_iou():
    box = np.array([0, 0, 10, 10])
    boxes = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    iou = compute_2d_bbox_iou(box, boxes)
    np.testing.assert_allclose(iou[0], 1.0)
    assert 0.1 < iou[1] < 0.2  # 25 / 175
    assert iou[2] == 0.0


def test_projected_track_bbox():
    center = np.array([0.0, 0.0, -1.0])
    box = projected_track_bbox((480, 640), center, 0.2,
                               SYNTHETIC_INTRINSICS)
    y1, x1, y2, x2 = box
    assert 0 <= y1 < y2 <= 479 and 0 <= x1 < x2 <= 639
    # roughly centered on the principal point
    assert abs((x1 + x2) / 2 - 319.5) < 30
    assert abs((y1 + y2) / 2 - (480 - 239.5)) < 30


def test_select_nocs2d_mask():
    H, W = 480, 640
    center = np.array([0.0, 0.0, -1.0])
    near_box = projected_track_bbox((H, W), center, 0.2,
                                    SYNTHETIC_INTRINSICS)
    masks = np.zeros((H, W, 3), bool)
    masks[:50, :50, 0] = True          # far detection (wrong place)
    masks[near_box[0]:near_box[2], near_box[1]:near_box[3], 1] = True
    masks[:20, :20, 2] = True          # wrong class
    result = {
        "pred_class_ids": np.array([1, 1, 2]),
        "pred_bboxes": np.array([[0, 0, 50, 50], near_box, [0, 0, 20, 20]]),
        "pred_masks": masks,
    }
    mask = select_nocs2d_mask(result, category=1, image_hw=(H, W),
                              center=center, radius=0.2,
                              intrinsics=SYNTHETIC_INTRINSICS)
    np.testing.assert_array_equal(mask, masks[..., 1])
    # no same-class detection -> None
    assert select_nocs2d_mask({**result,
                               "pred_class_ids": np.array([2, 2, 2])},
                              1, (H, W), center, 0.2,
                              SYNTHETIC_INTRINSICS) is None


def test_select_detection_mask_on_device():
    """jittable selection matches the host-side version."""
    import jax.numpy as jnp
    from captra_tpu.data.preprocess import select_detection_mask

    H, W = 96, 128
    K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    center = np.array([0.0, 0.0, -1.0], np.float32)
    near_box = projected_track_bbox((H, W), center, 0.2, K).astype(np.float32)
    masks = np.zeros((3, H, W), bool)
    masks[0, :10, :10] = True
    masks[1, 20:60, 40:90] = True
    masks[2, :5, :5] = True
    boxes = np.array([[0, 0, 10, 10], near_box, [0, 0, 5, 5]], np.float32)
    valid = np.array([True, True, False])

    m, found = select_detection_mask(
        jnp.asarray(masks), jnp.asarray(boxes), jnp.asarray(valid),
        jnp.asarray(center), jnp.float32(0.2), jnp.asarray(K), (H, W))
    assert bool(found)
    np.testing.assert_array_equal(np.asarray(m), masks[1])
