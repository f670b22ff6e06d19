import numpy as np

from captra_tpu.utils.misc import (
    Timer, add_dict, divide_dict, get_ith_from_batch, log_loss_summary,
)


def test_add_divide_dict():
    total = {}
    add_dict(total, {"a": 1.0, "b": {"c": 2.0}})
    add_dict(total, {"a": 3.0, "b": {"c": 4.0}})
    assert total == {"a": 4.0, "b": {"c": 6.0}}
    assert divide_dict(total, 2) == {"a": 2.0, "b": {"c": 3.0}}


def test_log_loss_summary(capsys):
    out = []
    log_loss_summary({"x": 4.0, "nested": {"y": 2.0}}, 2,
                     lambda k, v: out.append((k, v)))
    assert ("x", 2.0) in out and ("nested_y", 1.0) in out


def test_timer():
    t = Timer(True)
    dt = t.tick()
    assert dt >= 0.0
    assert Timer(False).tick() == 0.0


def test_get_ith_from_batch():
    data = {"a": np.arange(6).reshape(3, 2), "b": [np.ones((3,))]}
    out = get_ith_from_batch(data, 1)
    np.testing.assert_array_equal(out["a"], [2, 3])
    assert out["b"][0] == 1.0


def test_visualize_results_dir(tmp_path, rng):
    import jax.numpy as jnp
    from captra_tpu.tracking.results import save_track_result
    from captra_tpu.eval.visualize import visualize_results_dir
    from tests.test_models import _make_pose

    T, P = 3, 1
    gt = _make_pose(rng, T, P)
    corners = np.tile(np.array([[[-0.3, -0.3, -0.3], [0.3, 0.3, 0.3]]],
                               np.float32), (P, 1, 1))
    save_track_result(str(tmp_path), "x_0", gt, gt,
                      np.tile(corners, (T, 1, 1, 1)), corners)
    written = visualize_results_dir(str(tmp_path))
    assert len(written) >= 1
    import os
    assert all(os.path.exists(p) for p in written)


def test_visualize_scene_images(tmp_path, rng):
    """Scene walkthrough: fake NOCS-layout scene images + two instance
    result pickles -> per-frame overlay PNGs (reference
    visualize_tracking_nocs.py:36-114)."""
    import cv2
    from captra_tpu.tracking.results import save_track_result
    from captra_tpu.eval.visualize import visualize_scene_images
    from tests.test_models import _make_pose

    T, P = 3, 1
    corners = np.tile(np.array([[[-0.1, -0.1, -0.1], [0.1, 0.1, 0.1]]],
                               np.float32), (P, 1, 1))
    results = str(tmp_path / "results")
    for ins, frames in [("bottle_a_scene_1", [0, 1, 2]),
                        ("can_b_scene_1", [1, 2, 3])]:
        pose = _make_pose(rng, T, P)
        # park the object in front of the camera (z < 0 in NOCS convention)
        pose = pose.replace(
            translation=np.tile(np.array([0, 0, -1.0], np.float32)
                                .reshape(1, 1, 3, 1), (T, P, 1, 1)))
        save_track_result(results, ins, pose, pose,
                          np.tile(corners, (T, 1, 1, 1)), corners,
                          frame_nums=[[f] for f in frames])

    img_dir = tmp_path / "imgs"
    (img_dir / "scene_1").mkdir(parents=True)
    for f in range(4):
        # NOCS real layout zero-pads prefixes to 4 digits
        cv2.imwrite(str(img_dir / "scene_1" / f"{f:04d}_color.png"),
                    np.full((480, 640, 3), 30, np.uint8))
        cv2.imwrite(str(img_dir / "scene_1" / f"{f:04d}_depth.png"),
                    np.full((480, 640), 1000, np.uint16))

    written = visualize_scene_images(results, str(img_dir), "scene_1",
                                     draw_gt=True)
    assert len(written) == 4          # union of both instances' frames
    img = cv2.imread(written[1])
    assert img is not None and img.sum() > 30 * img.size  # boxes drawn

    depth_written = visualize_scene_images(results, str(img_dir), "scene_1",
                                           depth=True)
    assert len(depth_written) == 4

    # a scene id that is a prefix of another must not match it
    assert visualize_scene_images(results, str(img_dir), "scene_") == []


def test_draw_boxes_on_image(rng):
    from captra_tpu.eval.visualize import draw_boxes_on_image
    img = np.zeros((480, 640, 3), np.uint8)
    box = np.array([[[-.1, -.1, -1.], [-.1, -.1, -.8], [.1, -.1, -1.],
                     [.1, -.1, -.8], [-.1, .1, -1.], [-.1, .1, -.8],
                     [.1, .1, -1.], [.1, .1, -.8]]])
    K = np.array([[577.5, 0, 319.5], [0, 577.5, 239.5], [0, 0, 1]])
    out = draw_boxes_on_image(img, box, K)
    assert out.sum() > 0  # something was drawn
