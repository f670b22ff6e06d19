"""Dataset reader + loader tests against a fake on-disk NOCS tree
(the reference npz layout, nocs_dataset.py:18-35)."""
import os
from os.path import join as pjoin

import numpy as np
import pytest

from captra_tpu.config.schema import ObjCfg, PerturbCfg
from captra_tpu.data import numpy_ops as nops
from captra_tpu.data.loader import (
    Mixture, collate_frames, sequence_batches, single_frame_batches,
)
from captra_tpu.data.nocs import NOCSDataset, base_generate_data


def _write_fake_nocs(root, category="1", instances=("insA", "insB"),
                     tracks=2, frames=3, n=600, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(pjoin(root, "model_corners"), exist_ok=True)
    for ins in instances:
        np.save(pjoin(root, "model_corners", f"{ins}.npy"),
                np.array([[-0.3, -0.4, -0.2], [0.3, 0.4, 0.2]]))
        for tr in range(tracks):
            ddir = pjoin(root, "render", "real_test", category, ins,
                         f"{tr:04d}", "data")
            os.makedirs(ddir, exist_ok=True)
            for f in range(frames):
                R = np.linalg.qr(rng.randn(3, 3))[0]
                if np.linalg.det(R) < 0:
                    R[:, 0] *= -1
                t = rng.randn(3, 1) * 0.1 + np.array([[0], [0], [1.0]])
                s = rng.uniform(0.2, 0.3)
                npcs = (rng.rand(n, 3) - 0.5) * 0.5
                seg = (rng.rand(n) < 0.7).astype(np.int64)  # 1 = object
                pts = np.where(seg[:, None] == 1,
                               s * (npcs @ R.T) + t.T,
                               rng.randn(n, 3) * 0.5 + t.T)
                all_dict = {"points": pts.astype(np.float32), "labels": seg,
                            "pose": {"rotation": R.astype(np.float32),
                                     "translation": t.astype(np.float32),
                                     "scale": np.float32(s)},
                            "path": f"fake/{ins}/{tr}/{f}_depth.png"}
                np.savez(pjoin(ddir, f"{f:02d}.npz"), all_dict=all_dict)
    return root


@pytest.fixture
def fake_root(tmp_path):
    return _write_fake_nocs(str(tmp_path))


def _dataset(fake_root, **kw):
    obj = ObjCfg(category="1", num_parts=1, num_joints=0, tree=(-1,),
                 sym=True, extra_dims=1)
    defaults = dict(num_points=128, mode="real_test", radius=0.6,
                    perturb=PerturbCfg(t=0.01, s=0.01))
    defaults.update(kw)
    return NOCSDataset(fake_root, "1", obj, **defaults)


def test_split_generation_and_len(fake_root):
    ds = _dataset(fake_root)
    assert len(ds) == 2 * 2 * 3
    assert os.path.exists(pjoin(fake_root, "splits", "1", "exp",
                                "real_test.txt"))


def test_frame_contents(fake_root):
    ds = _dataset(fake_root)
    item = ds[0]
    data, meta = item["data"], item["meta"]
    assert data["points"].shape == (128, 3)
    assert data["labels"].shape == (128,)
    assert set(np.unique(data["labels"])) <= {0, 1}
    # labels: 0 = object; nocs zero on background
    bg = data["labels"] == 1
    np.testing.assert_allclose(data["nocs"][bg], 0.0)
    # nocs consistency: pose(nocs) == points for object points
    obj = data["labels"] == 0
    p = meta["pose"]
    reposed = p["scale"] * (data["nocs"][obj] @ np.asarray(p["rotation"]).T) \
        + np.asarray(p["translation"]).reshape(1, 3)
    np.testing.assert_allclose(reposed, data["points"][obj], atol=1e-4)
    assert meta["nocs_corners"].shape == (1, 2, 3)


def test_crop_within_radius(fake_root):
    ds = _dataset(fake_root)
    item = ds[3]
    p = item["meta"]["crop_pose"]
    d = np.linalg.norm(item["data"]["points"] -
                       np.asarray(p["translation"]).reshape(1, 3), axis=-1)
    # crop ball radius = scale * 0.6, with up to 10x growth x1.1
    assert (d <= max(p["scale"] * 0.6, 0.05) * 1.1**10 + 1e-5).all()


def test_collate_and_batches(fake_root):
    ds = _dataset(fake_root)
    batches = list(single_frame_batches(ds, batch_size=4, seed=1))
    assert len(batches) == 3  # 12 frames / 4
    b = batches[0]
    assert b["points"].shape == (4, 128, 3)
    assert b["pose"].rotation.shape == (4, 1, 3, 3)
    assert b["corners"].shape == (4, 1, 2, 3)


def test_sequence_batches(fake_root):
    ds = _dataset(fake_root)
    seqs = dict(sequence_batches(ds))
    assert len(seqs) == 4  # 2 instances x 2 tracks
    name, batch = next(iter(seqs.items()))
    first = list(seqs.values())[0]
    assert first["points"].shape == (3, 1, 128, 3)
    assert first["pose"].rotation.shape == (3, 1, 1, 3, 3)


def test_mixture():
    it_a = iter(range(0, 1000, 2))
    it_b = iter(range(1, 1000, 2))
    mix = Mixture({"a": it_a, "b": it_b}, {"a": 3, "b": 1}, seed=0)
    keys = [next(mix)[0] for _ in range(200)]
    frac_a = keys.count("a") / len(keys)
    assert 0.6 < frac_a < 0.9


def test_numpy_fps_spread():
    centers = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0], [0, 0, 10]],
                       np.float32)
    rng = np.random.RandomState(1)
    pts = np.concatenate([c + rng.randn(50, 3) * 0.1 for c in centers])
    idx = nops.farthest_point_sample(pts, 4, rng)
    assert set(idx // 50) == {0, 1, 2, 3}


def test_base_generate_data_matches_reference_semantics(rng):
    n = 100
    R = np.linalg.qr(rng.randn(3, 3))[0]
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    pose = {"rotation": R, "translation": rng.randn(3, 1), "scale": 0.25}
    seg = (rng.rand(n) < 0.5).astype(np.int64)
    pts = rng.randn(n, 3).astype(np.float32)
    out = base_generate_data(pts, seg, pose)
    assert (out["labels"] == 1 - seg).all()
    obj = seg == 1
    expected = ((pts[obj] - pose["translation"].reshape(1, 3)) /
                pose["scale"]) @ pose["rotation"]
    np.testing.assert_allclose(out["nocs"][obj], expected, atol=1e-5)


def test_real_prefetch_and_otf_batches(tmp_path, rng):
    """Real-mode frames pre-fetch depth + instance masks; sequence batches
    expose them for the in-scan OTF crop."""
    cv2 = pytest.importorskip("cv2")
    root = str(tmp_path)
    H, W = 48, 64
    # depth/mask/meta files the cloud_dict paths will reference
    raw = pjoin(root, "raw", "scene_1")
    os.makedirs(raw)
    for f in range(2):
        depth = rng.randint(500, 2000, (H, W)).astype(np.uint16)
        cv2.imwrite(pjoin(raw, f"{f:04d}_depth.png"), depth)
        mask = np.zeros((H, W, 3), np.uint8)
        mask[10:20, 10:20, 2] = 7  # instance number 7
        cv2.imwrite(pjoin(raw, f"{f:04d}_mask.png"), mask)
        with open(pjoin(raw, f"{f:04d}_meta.txt"), "w") as fh:
            fh.write("7 1 insA\n")

    # npz tree pointing at those depth files
    ddir = pjoin(root, "render", "real_test", "1", "insA", "scene_1", "data")
    os.makedirs(ddir)
    os.makedirs(pjoin(root, "model_corners"), exist_ok=True)
    np.save(pjoin(root, "model_corners", "insA.npy"),
            np.array([[-0.3, -0.3, -0.3], [0.3, 0.3, 0.3]]))
    for f in range(2):
        R, t, s = np.eye(3, dtype=np.float32), \
            np.array([[0.0], [0.0], [-1.0]], np.float32), np.float32(0.25)
        npcs = (rng.rand(200, 3).astype(np.float32) - 0.5) * 0.5
        seg = np.ones(200, np.int64)
        pts = s * npcs + t.T
        all_dict = {"points": pts, "labels": seg,
                    "pose": {"rotation": R, "translation": t, "scale": s},
                    "path": pjoin(raw, f"{f:04d}_depth.png")}
        np.savez(pjoin(ddir, f"{f:02d}.npz"), all_dict=all_dict)

    from captra_tpu.config.schema import ObjCfg
    obj = ObjCfg(category="1", num_parts=1, num_joints=0, tree=(-1,),
                 extra_dims=1)
    ds = NOCSDataset(root, "1", obj, num_points=64, mode="real_test")
    item = ds[0]
    assert "pre_fetched" in item["meta"]
    assert item["meta"]["pre_fetched"]["depth"].shape == (H, W)
    assert item["meta"]["pre_fetched"]["mask"].sum() == 100

    seqs = dict(sequence_batches(ds))
    batch = next(iter(seqs.values()))
    assert batch["depth"].shape == (2, 1, H, W)
    assert batch["mask"].shape == (2, 1, H, W)


def test_prefetch_order_and_errors():
    from captra_tpu.data.loader import prefetch

    assert list(prefetch(iter(range(10)), size=3)) == list(range(10))

    def boom():
        yield 1
        raise ValueError("boom")

    it = prefetch(boom(), size=2)
    assert next(it) == 1
    import pytest
    with pytest.raises(ValueError):
        list(it)


def test_device_pose_batch_consistency():
    """Device-side pose resampling (synthetic.device_pose_batch): the
    rendered points must equal each point's own-part pose applied to its
    NPCS (up to the injected sensor noise), for rigid, revolute and
    prismatic categories."""
    import jax

    from captra_tpu.config.schema import ObjCfg
    from captra_tpu.data.synthetic import device_pose_batch, geometry_pool

    for obj in (
        ObjCfg(num_parts=1, num_joints=0, tree=(-1,), sym=True),
        ObjCfg(num_parts=2, num_joints=1, tree=(-1, 0), main_axis=(1,),
               joint_type="revolute"),
        ObjCfg(num_parts=3, num_joints=2, tree=(-1, 0, 0), main_axis=(0, 0),
               joint_type="prismatic"),
    ):
        pool = geometry_pool(seed=3, obj=obj, count=4, num_points=96)
        batch = device_pose_batch(jax.random.PRNGKey(5), pool["npcs"],
                                  pool["labels"], pool["corners"], obj,
                                  noise=0.0)
        pts = np.asarray(batch["points"])
        labels = np.asarray(batch["labels"])
        nocs = np.asarray(batch["nocs"])
        R = np.asarray(batch["pose"].rotation)
        t = np.asarray(batch["pose"].translation)[..., 0]
        s = np.asarray(batch["pose"].scale)
        B, N, _ = pts.shape
        for b in range(B):
            for p in range(obj.num_parts):
                m = labels[b] == p
                expect = s[b, p] * nocs[b][m] @ R[b, p].T + t[b, p]
                np.testing.assert_allclose(pts[b][m], expect, atol=1e-5)
        # poses differ across batch items (fresh draws)
        assert not np.allclose(R[0, 0], R[1, 0])
