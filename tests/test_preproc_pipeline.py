"""End-to-end offline preprocessing driver test: a miniature synthetic raw
NOCS release -> run_pipeline -> the golden `render/` tree layout -> consumed
by NOCSDataset (round-3 verdict item 4).

The raw frames are built pixel-first: each object pixel's camera point is
the exact backprojection of its (row, col, depth) triple, and its NOCS coord
is R^T (cam - t) / s quantized to the uint8 coord-png grid — so the pipeline
must recover (R, s, t) from real 8-bit/1mm-quantized inputs, like on the
actual release.
"""
import os
import pickle
from os.path import join as pjoin

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from captra_tpu.data import preproc_pipeline as pipe

H, W = 480, 640
K = np.array([[577.5, 0, 319.5], [0., 577.5, 239.5], [0., 0., 1.]])
INSTANCE = "bottle_a"
CLS = 1


def _rot(rng):
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2*y*y - 2*z*z, 2*x*y - 2*z*w, 2*x*z + 2*y*w],
        [2*x*y + 2*z*w, 1 - 2*x*x - 2*z*z, 2*y*z - 2*x*w],
        [2*x*z - 2*y*w, 2*y*z + 2*x*w, 1 - 2*x*x - 2*y*y]])


def _cam_from_pixels(rows, cols, depth_raw):
    """The pipeline backprojection (preproc_nocs.backproject), inverted by
    construction: pixel (r, c, d) -> camera meters."""
    x = (cols - K[0, 2]) / K[0, 0] * depth_raw
    y = (H - rows - K[1, 2]) / K[1, 1] * depth_raw
    return np.stack([x, y, -depth_raw], -1) * 0.001


def _write_frame(tdir, prefix, R, s, t, flip):
    """One synthetic frame: a 20x20 object block + background shelf, stored
    mirrored when flip=True (the raw CAMERA frames are)."""
    depth = np.zeros((H, W), np.uint16)
    mask = np.full((H, W), 255, np.uint8)
    coord_rgb = np.zeros((H, W, 3), np.uint8)

    rr, cc = np.meshgrid(np.arange(230, 250), np.arange(315, 335),
                         indexing="ij")
    d = (950 + (rr - 230) * 5 + (cc - 315) * 3).astype(np.uint16)
    depth[rr, cc] = d
    mask[rr, cc] = 1
    cam = _cam_from_pixels(rr.ravel(), cc.ravel(), d.ravel().astype(float))
    npcs = ((cam - t) / s) @ R  # R^T (cam - t) / s
    assert np.abs(npcs).max() < 0.5, np.abs(npcs).max()
    q = np.clip(np.round((npcs + 0.5) * 255), 0, 255).astype(np.uint8)
    # coord png channels: imread -> BGR; read_coord_map takes (2,1,0)=RGB
    coord_rgb[rr.ravel(), cc.ravel()] = q[:, ::-1]  # store as BGR

    # background shelf inside the eventual crop window (labels 0 coverage)
    depth[255:265, 315:335] = 1000
    # mask stays 255 there (no instance)

    if flip:
        depth, mask, coord_rgb = (depth[:, ::-1], mask[:, ::-1],
                                  coord_rgb[:, ::-1])
    cv2.imwrite(pjoin(tdir, f"{prefix}_depth.png"), depth)
    cv2.imwrite(pjoin(tdir, f"{prefix}_composed.png"), depth)
    # mask png: channel 2 carries the instance ids
    cv2.imwrite(pjoin(tdir, f"{prefix}_mask.png"),
                np.stack([mask] * 3, -1))
    cv2.imwrite(pjoin(tdir, f"{prefix}_coord.png"), coord_rgb)
    cv2.imwrite(pjoin(tdir, f"{prefix}_color.png"),
                np.zeros((H, W, 3), np.uint8))
    with open(pjoin(tdir, f"{prefix}_meta.txt"), "w") as f:
        print(f"1 {CLS} 02876657 {INSTANCE}", file=f)


@pytest.fixture(scope="module")
def mini_release(tmp_path_factory):
    """2 track folders x 2 frames of one instance, plus its obj model."""
    root = tmp_path_factory.mktemp("nocs_raw")
    rng = np.random.RandomState(3)
    R = _rot(rng)
    s, t = 0.3, np.array([0.015, -0.02, -1.0])
    for track in ("00000", "00001"):
        tdir = pjoin(root, "nocs_full", "train", track)
        os.makedirs(tdir)
        for prefix in ("0000", "0001"):
            _write_frame(tdir, prefix, R, s, t, flip=True)
    mdir = pjoin(root, "obj_models", "train", "02876657", INSTANCE)
    os.makedirs(mdir)
    with open(pjoin(mdir, "model.obj"), "w") as f:
        f.write("v -0.5 -0.5 -0.5\nv 0.5 0.5 0.5\nf 1 2 1\n")
    pipe.run_pipeline(str(root), data_types=("train",), categories=[CLS],
                      num_proc=1, img_per_folder=3, log=lambda *_: None)
    return str(root), {"rotation": R, "scale": s, "translation": t}


def test_pose_stage_recovers_gt(mini_release):
    root, gt = mini_release
    for track in ("00000", "00001"):
        for prefix in ("0000", "0001"):
            p = pjoin(root, "nocs_full", "train", track,
                      f"{prefix}_pose.pkl")
            assert os.path.exists(p)
            with open(p, "rb") as f:
                poses = pickle.load(f)
            assert 1 in poses
            got = poses[1]
            assert abs(got["scale"] - gt["scale"]) < 0.02
            np.testing.assert_allclose(got["translation"].reshape(3),
                                       gt["translation"], atol=0.02)
            tr = np.trace(got["rotation"].T @ gt["rotation"])
            rdiff = np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))
            assert rdiff < 5.0, rdiff


def test_instance_list_stage(mini_release):
    root, _ = mini_release
    lst = pjoin(root, "instance_list", "train", str(CLS), f"{INSTANCE}.txt")
    assert os.path.exists(lst)
    with open(lst) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    assert lines == ["00000/0000", "00000/0001", "00001/0000", "00001/0001"]


def test_model_corners_stage(mini_release):
    root, _ = mini_release
    corners = np.load(pjoin(root, "model_corners", f"{INSTANCE}.npy"))
    np.testing.assert_allclose(corners, [[-0.5] * 3, [0.5] * 3])


def test_gather_stage_layout(mini_release):
    """Golden layout: img_per_folder=3 splits the 4 frames 3 + 1 across two
    numbered folders (reference gather_instance_data.py:108-115)."""
    root, gt = mini_release
    base = pjoin(root, "render", "train", str(CLS), INSTANCE)
    files = {"0000": ["00.npz", "01.npz", "02.npz"], "0001": ["00.npz"]}
    for folder, names in files.items():
        for name in names:
            path = pjoin(base, folder, "data", name)
            assert os.path.exists(path), path
            d = np.load(path, allow_pickle=True)["all_dict"].item()
            assert set(d) == {"points", "labels", "pose", "path"}
            assert d["points"].shape[1] == 3
            assert d["labels"].shape == d["points"].shape[:1]
            assert d["labels"].any() and not d["labels"].all()  # both classes
            # object points follow the recovered pose
            obj = d["points"][d["labels"].astype(bool)]
            ctr = np.asarray(d["pose"]["translation"]).reshape(3)
            assert np.linalg.norm(obj - ctr, axis=-1).max() < 0.5


def test_render_tree_feeds_nocs_dataset(mini_release):
    """The produced tree is directly consumable by the online dataset."""
    from captra_tpu.config.schema import ObjCfg
    from captra_tpu.data.nocs import NOCSDataset

    root, gt = mini_release
    obj_cfg = ObjCfg(num_parts=1, num_joints=0, tree=(-1,), sym=True)
    ds = NOCSDataset(root, str(CLS), obj_cfg, num_expr="pipe_test",
                     num_points=256, mode="train")
    assert len(ds) == 4
    item = ds[0]
    data, meta = item["data"], item["meta"]
    assert data["points"].shape == (256, 3)
    assert set(np.unique(data["labels"])) <= {0, 1}
    # NPCS labels must land inside the model box (accounting for the
    # recovered-pose tolerance)
    obj_pts = data["nocs"][data["labels"] == 0]
    assert len(obj_pts) > 0
    assert np.abs(obj_pts).max() < 0.55
    np.testing.assert_allclose(float(meta["pose"]["scale"]), gt["scale"],
                               atol=0.02)
    assert meta["nocs_corners"].shape == (1, 2, 3)


def test_cli_stages_subset(mini_release, capsys):
    """The CLI re-runs a single stage idempotently."""
    from captra_tpu.cli.preproc import main
    root, _ = mini_release
    main(["--data_path", root, "--data_type", "train",
          "--categories", str(CLS), "--stages", "lists"])
    out = capsys.readouterr().out
    assert "[lists] train" in out and "cls1=1" in out


def test_cli_rejects_unknown(mini_release):
    from captra_tpu.cli.preproc import main
    root, _ = mini_release
    with pytest.raises(SystemExit):
        main(["--data_path", root, "--data_type", "nope"])
    with pytest.raises(SystemExit):
        main(["--data_path", root, "--stages", "nope"])
