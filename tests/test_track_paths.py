"""E2e coverage for the tracking data paths wired in round 3:

  * batched multi-trajectory tracking ([T, B] through one scan) matching
    per-trajectory results of B=1 runs (reference DataLoader batching over
    SequenceData, dataset.py:197-205; scripts/track/sapien/laptop.sh
    --batch_size=6);
  * NOCS-2D mask-free tracking end-to-end: detection pickles on disk ->
    dataset pre-fetch -> collation -> in-graph mask selection inside the
    scan (reference nocs_data_process.py:206-229, model.py:426-447);
  * sim-to-real entry: BMVC-layout fixtures and GT-less real captures
    drivable through the dataset factory + tracking loop (reference
    network/data/dataset.py:43-63).
"""
import os
import pickle
from os.path import join as pjoin

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from captra_tpu.config.schema import ObjCfg, TrackCfg
from captra_tpu.data.factory import make_dataset
from captra_tpu.data.loader import sequence_batches
from captra_tpu.data.synthetic import batch_trajectories, make_trajectory
from captra_tpu.tracking.tracker import make_track_step

from tests.test_models import tiny_config


# ---------------------------------------------------------------------------
# batched trajectory tracking
# ---------------------------------------------------------------------------

def _net_step(cfg):
    """Deterministic random-init nets (not oracles): batched and single
    tracking must agree for *any* fixed function."""
    from captra_tpu.models.coordnet import CoordNet
    from captra_tpu.models.rotnet import RotNet
    coord, rotn = CoordNet(cfg), RotNet(cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    N, P = cfg.num_points, cfg.obj.num_parts
    cv = coord.init(k1, jnp.zeros((1, N, 3)), train=False)
    rv = rotn.init(k2, jnp.zeros((1, P, N, 3)), jnp.zeros((1, N), jnp.int32),
                   train=False)
    return make_track_step(
        cfg,
        lambda p: coord.apply(cv, p, train=False),
        lambda p, l: rotn.apply(rv, p, l, train=False))


def test_batched_tracking_matches_single():
    from captra_tpu.cli.track import track_sequences

    obj = ObjCfg(num_parts=1, num_joints=0, tree=(-1,))
    cfg = tiny_config(num_parts=1).replace(
        obj=obj, num_points=128, track=TrackCfg(init_frame_gt=True))
    step = _net_step(cfg)

    T, B = 6, 3
    trajs = [make_trajectory(seed=100 + s, obj=obj, num_frames=T,
                             num_points=cfg.num_points) for s in range(B)]

    def single_seqs():
        for s, tr in enumerate(trajs):
            yield f"traj/{s}", batch_trajectories([tr])

    def batched_seqs():
        yield tuple(f"traj/{s}" for s in range(B)), \
            batch_trajectories(trajs)

    avg1 = track_sequences(cfg, step, single_seqs())
    avgB = track_sequences(cfg, step, batched_seqs())
    assert set(avg1) == set(avgB)
    for k in avg1:
        # per-trajectory error lists must match pairwise, in order
        np.testing.assert_allclose(avg1[k], avgB[k], rtol=1e-4, atol=1e-5)


def test_sequence_batches_batch_size(tmp_path):
    from tests.test_data import _dataset, _write_fake_nocs
    ds = _dataset(_write_fake_nocs(str(tmp_path)))  # 2 ins x 2 tracks x 3 fr
    out = list(sequence_batches(ds, batch_size=2))
    assert len(out) == 2  # 4 equal-length tracks grouped 2 per batch
    names, batch = out[0]
    assert isinstance(names, tuple) and len(names) == 2
    assert batch["points"].shape == (3, 2, 128, 3)
    assert batch["pose"].rotation.shape == (3, 2, 1, 3, 3)
    # odd batch size: remainder batch carries the leftover track alone
    out3 = list(sequence_batches(ds, batch_size=3))
    sizes = sorted(b["points"].shape[1] for _, b in out3)
    assert sizes == [1, 3]


# ---------------------------------------------------------------------------
# NOCS-2D mask-free tracking
# ---------------------------------------------------------------------------

H, W = 64, 80


def _write_otf_root(root, frames=3, with_dets=True, det_offset=18):
    """NOCS-real layout: raw depth/mask/meta images + npz frame tree +
    (optionally) NOCS-2D detection pickles whose mask blob sits at a
    *different* location than the GT instance mask."""
    cv2 = pytest.importorskip("cv2")
    raw = pjoin(root, "nocs_full", "real_test", "scene_1")
    nocs2d = pjoin(root, "nocs2d")
    ddir = pjoin(root, "render", "real_test", "1", "insA", "scene_1", "data")
    for d in (raw, nocs2d, ddir, pjoin(root, "model_corners")):
        os.makedirs(d, exist_ok=True)
    np.save(pjoin(root, "model_corners", "insA.npy"),
            np.array([[-0.3, -0.3, -0.3], [0.3, 0.3, 0.3]]))

    for f in range(frames):
        depth = np.full((H, W), 1500, np.uint16)
        gt_mask = np.zeros((H, W), bool)
        gt_mask[24:36, 30 + f:42 + f] = True          # GT instance blob
        det_mask = np.zeros((H, W), bool)
        oy, ox = 24, 30 + f + det_offset               # detector blob
        det_mask[oy:oy + 12, ox:ox + 12] = True
        depth[gt_mask] = 1000
        depth[det_mask] = 1000
        cv2.imwrite(pjoin(raw, f"{f:04d}_depth.png"), depth)
        mask_img = np.zeros((H, W, 3), np.uint8)
        mask_img[gt_mask, 2] = 7
        cv2.imwrite(pjoin(raw, f"{f:04d}_mask.png"), mask_img)
        with open(pjoin(raw, f"{f:04d}_meta.txt"), "w") as fh:
            fh.write("7 1 insA\n")

        if with_dets:
            boxes = np.array([[0, 0, 4, 4],            # wrong class
                              [oy, ox, oy + 12, ox + 12]], np.float32)
            result = {"pred_class_ids": np.array([3, 1]),
                      "pred_bboxes": boxes,
                      "pred_masks": np.stack(
                          [np.zeros((H, W), bool), det_mask], axis=-1)}
            with open(pjoin(nocs2d, f"results_test_scene_1_{f:04d}.pkl"),
                      "wb") as fh:
                pickle.dump(result, fh)

        R, s = np.eye(3, dtype=np.float32), np.float32(0.25)
        t = np.array([[0.0], [0.0], [-1.0]], np.float32)
        npcs = (np.random.RandomState(f).rand(200, 3)
                .astype(np.float32) - 0.5) * 0.5
        all_dict = {"points": s * npcs + t.T, "labels": np.ones(200, np.int64),
                    "pose": {"rotation": R, "translation": t, "scale": s},
                    "path": pjoin(raw, f"{f:04d}_depth.png")}
        np.savez(pjoin(ddir, f"{f:02d}.npz"), all_dict=all_dict)
    return root


def _otf_cfg(root, nocs2d=False):
    obj = ObjCfg(category="1", num_parts=1, num_joints=0, tree=(-1,),
                 extra_dims=1, nocs_data=True, basepath=root)
    return tiny_config(num_parts=1).replace(
        obj=obj, num_points=64, batch_size=1,
        track=TrackCfg(init_frame_gt=True, nocs_otf=True,
                       nocs2d_label=nocs2d,
                       nocs2d_path=pjoin(root, "nocs2d") if nocs2d else ""))


def _oracle_step(cfg, intrinsics):
    def coord_fn(canon_pts):
        B, N, _ = canon_pts.shape
        seg = jnp.zeros((B, N, 2)).at[..., 0].set(1.0)
        # radially-distorted NOCS: a *label-sensitive* oracle.  A perfectly
        # self-consistent oracle (nocs == canon) fits the same pose for any
        # labeled subset, which would hide whether the detector mask drives
        # the s/t fit at all.
        r = jnp.linalg.norm(canon_pts, axis=-1, keepdims=True)
        return {"seg": seg, "nocs": canon_pts * (1.0 + r)}

    def rot_fn(parts, labels):
        B, P, N, _ = parts.shape
        eye9 = jnp.broadcast_to(jnp.eye(3).reshape(9), (B, P, 9))
        return {"rtvec": eye9,
                "point_rtvec": jnp.broadcast_to(eye9[:, :, None],
                                                (B, P, N, 9))}

    return make_track_step(cfg, coord_fn, rot_fn, intrinsics=intrinsics)


def _track_translations(cfg, root):
    """Drive dataset -> collate -> scan; return tracked xyz [T-1, 3]."""
    from captra_tpu.cli.track import track_sequences
    from captra_tpu.data.preprocess import NOCS_CAMERA_INTRINSICS

    ds = make_dataset(cfg, "real_test")
    seqs = list(sequence_batches(ds, None, batch_size=cfg.batch_size))
    assert len(seqs) == 1
    step = _oracle_step(cfg, jnp.asarray(NOCS_CAMERA_INTRINSICS))

    captured = {}

    def wrapped(pose, frame):
        new_pose, aux = step(pose, frame)
        return new_pose, aux

    # run through track_sequences for the full CLI-shaped path
    track_sequences(cfg, wrapped, iter(seqs), save=True, no_eval=True)
    res_dir = pjoin(cfg.experiment_dir, "results", "data")
    with open(pjoin(res_dir, os.listdir(res_dir)[0]), "rb") as f:
        data = pickle.load(f)
    return np.asarray(data["pred"]["poses"]["translation"])[..., 0]


def test_nocs2d_dataset_prefetch(tmp_path):
    root = _write_otf_root(str(tmp_path))
    cfg = _otf_cfg(root, nocs2d=True)
    ds = make_dataset(cfg, "real_test")
    item = ds[0]
    pre = item["meta"]["pre_fetched"]
    # masks are bit-packed along W (8x memory), same-class dets only
    assert pre["det_masks"].shape == (16, H, W // 8)
    assert pre["det_masks"].dtype == np.uint8
    assert pre["det_boxes"].shape == (16, 4)
    # the wrong-class detection is filtered out host-side; the single
    # same-class detection lands in slot 0
    assert pre["det_valid"].sum() == 1 and pre["det_valid"][0]
    # in-graph unpack restores the exact detector mask
    import jax.numpy as jnp

    from captra_tpu.data.preprocess import unpack_detection_masks
    unpacked = np.asarray(unpack_detection_masks(
        jnp.asarray(pre["det_masks"]), (H, W)))
    assert unpacked.shape == (16, H, W)
    assert unpacked[0].sum() == 12 * 12  # the detector blob
    # collation ships the packed det arrays
    _, batch = next(iter(sequence_batches(ds)))
    assert batch["det_masks"].shape == (3, 1, 16, H, W // 8)
    assert batch["det_valid"].shape == (3, 1, 16)


def test_nocs2d_mask_free_tracking(tmp_path):
    """The tracked pose must follow the DETECTOR blob (disjoint from the GT
    instance mask) when nocs2d_label is on — proving the in-graph selection
    actually drives the crop."""
    root = _write_otf_root(str(tmp_path))
    cfg_gt = _otf_cfg(root, nocs2d=False).replace(
        experiment_dir=str(tmp_path / "exp_gt"))
    cfg_det = _otf_cfg(root, nocs2d=True).replace(
        experiment_dir=str(tmp_path / "exp_det"))

    t_gt = _track_translations(cfg_gt, root)
    t_det = _track_translations(cfg_det, root)
    assert np.isfinite(t_gt).all() and np.isfinite(t_det).all()
    # labels feed the s/t fit only when nocs2d_label/gt_label is on
    # (reference model.py:474-475): with the label-sensitive oracle, the
    # fit over the detector-blob subset must differ from the fit over the
    # GT-mask run's pred-label subset
    dx = np.abs(t_det - t_gt).max()
    assert dx > 1e-3, (t_gt, t_det)


# ---------------------------------------------------------------------------
# sim-to-real: BMVC + GT-less real capture
# ---------------------------------------------------------------------------

def _write_bmvc_root(root, frames=4, n=256):
    """BMVC preproc layout: preproc/<cat>/0/<track>/<frame>.pkl with
    {points, labels, nocs, nocs2camera} (reference bmvc_dataset.py:13-37)."""
    rng = np.random.RandomState(0)
    d = pjoin(root, "preproc", "laptop", "0", "0")
    os.makedirs(d, exist_ok=True)
    for f in range(frames):
        npcs = (rng.rand(n, 3).astype(np.float32) - 0.5) * 0.6
        labels = (np.arange(n) % 2).astype(np.int64)
        R = np.eye(3, dtype=np.float32)
        t = np.array([[0.0], [0.0], [1.0]], np.float32) + f * 0.01
        s = np.float32(0.3)
        poses = [{"rotation": R, "translation": t.astype(np.float32),
                  "scale": s} for _ in range(2)]
        pts = (s * npcs + t.T).astype(np.float32)
        frame = {"points": pts, "labels": labels, "nocs": npcs,
                 "nocs2camera": poses,
                 "nocs_corners": np.stack(
                     [np.full((2, 3), -0.3, np.float32),
                      np.full((2, 3), 0.3, np.float32)], axis=1)}
        with open(pjoin(d, f"{f:05d}.pkl"), "wb") as fh:
            pickle.dump(frame, fh)
    return root


def test_bmvc_tracking_e2e(tmp_path):
    from captra_tpu.cli.track import track_sequences

    root = _write_bmvc_root(str(tmp_path))
    obj = ObjCfg(category="laptop", num_parts=2, num_joints=1, tree=(-1, 0),
                 basepath=root)
    cfg = tiny_config(num_parts=2).replace(
        obj=obj, num_points=256, batch_size=1,
        track=TrackCfg(init_frame_gt=True, gt_label=True),
        experiment_dir=str(tmp_path / "exp"))

    ds = make_dataset(cfg, "bmvc_0")
    assert len(ds) == 4
    seqs = list(sequence_batches(ds, None, batch_size=1))
    assert len(seqs) == 1
    name, batch = seqs[0]
    assert batch["points"].shape == (4, 1, 256, 3)
    assert batch["pose"].rotation.shape == (4, 1, 2, 3, 3)

    step = _net_step(cfg)
    avgs = track_sequences(cfg, step, iter(seqs), save=True)
    assert all(np.isfinite(v).all() for v in avgs.values())
    assert os.path.isdir(pjoin(cfg.experiment_dir, "results", "data"))


def _write_real_root(root, frames=4, n=300, with_gt=False):
    """Captured-real layout: render/<cat>/<ins>/<track>/cloud/<i>.npz
    (reference real_arti_dataset.py:33-120); no pose JSONs -> GT-less."""
    rng = np.random.RandomState(1)
    d = pjoin(root, "render", "drawers", "0", "0", "cloud")
    os.makedirs(d, exist_ok=True)
    for f in range(frames):
        pts = rng.randn(n, 3).astype(np.float32) * 0.1 + \
            np.array([0, 0, 1.0], np.float32)
        np.savez(pjoin(d, f"{f}.npz"), point=pts)
    return root


def test_real_gtless_tracking_e2e(tmp_path):
    from captra_tpu.cli.track import track_sequences

    root = _write_real_root(str(tmp_path))
    obj = ObjCfg(category="drawers", num_parts=4, num_joints=3,
                 tree=(-1, 0, 0, 0), joint_type="prismatic",
                 main_axis=(0, 0, 0), basepath=root)
    cfg = tiny_config(num_parts=4).replace(
        obj=obj, num_points=128, batch_size=1,
        track=TrackCfg(init_frame_gt=True),
        experiment_dir=str(tmp_path / "exp"))

    ds = make_dataset(cfg, "real_test")
    assert len(ds) == 4
    item = ds[0]
    assert "pose" not in item["meta"]          # GT-less
    seqs = list(sequence_batches(ds, None, batch_size=1))
    name, batch = seqs[0]
    assert "pose" not in batch                  # bare points collation
    assert batch["points"].shape == (4, 1, 128, 3)

    step = _net_step(cfg)
    # no GT: init pose must come from the cloud, eval must be skipped,
    # saved artifact carries predictions only
    avgs = track_sequences(cfg, step, iter(seqs), save=True)
    assert avgs == {}
    res_dir = pjoin(cfg.experiment_dir, "results", "data")
    with open(pjoin(res_dir, os.listdir(res_dir)[0]), "rb") as f:
        data = pickle.load(f)
    assert data["gt"] is None
    assert np.isfinite(data["pred"]["poses"]["translation"]).all()

    # GT-less artifacts must also flow through the offline consumers
    from captra_tpu.eval.evaluator import evaluate_results_dir
    from captra_tpu.eval.visualize import visualize_results_dir
    err, _ = evaluate_results_dir(pjoin(cfg.experiment_dir, "results"),
                                  cfg.obj, eval_iou=False, verbose=False)
    assert err == {}  # nothing scoreable, but no crash
    images = visualize_results_dir(pjoin(cfg.experiment_dir, "results"),
                                   max_frames=2)
    assert len(images) > 0


def test_mesh_sharded_tracking_matches_unsharded():
    """track_sequences with a device mesh shards the trajectory batch
    (params replicated) and must reproduce the single-device results."""
    from captra_tpu.cli.track import track_sequences
    from captra_tpu.parallel.mesh import data_parallel_mesh

    obj = ObjCfg(num_parts=1, num_joints=0, tree=(-1,))
    cfg = tiny_config(num_parts=1).replace(
        obj=obj, num_points=128, track=TrackCfg(init_frame_gt=True))
    step = _net_step(cfg)
    T, B = 5, 4
    trajs = [make_trajectory(seed=200 + s, obj=obj, num_frames=T,
                             num_points=cfg.num_points) for s in range(B)]

    def seqs():
        yield tuple(f"t/{s}" for s in range(B)), batch_trajectories(trajs)

    plain = track_sequences(cfg, step, seqs())
    mesh = data_parallel_mesh(4)
    sharded = track_sequences(cfg, step, seqs(), mesh=mesh)
    assert set(plain) == set(sharded)
    for k in plain:
        np.testing.assert_allclose(plain[k], sharded[k], rtol=1e-4,
                                   atol=1e-5)
