"""End-to-end CLI slice on synthetic data (SURVEY.md §7 step 4): train a
tiny CoordNet + RotationNet for an epoch each, compose their checkpoints,
track synthetic trajectories, save results, evaluate."""
import os
from os.path import join as pjoin

import numpy as np
import pytest

TINY_POINTNET = """\
sa1:
  npoint: 32
  radius_list: [0.1, 0.2]
  nsample_list: [8, 16]
  mlp_list:
    - [8, 16]
    - [8, 16]
sa2:
  npoint: 8
  radius_list: [0.4]
  nsample_list: [8]
  mlp_list:
    - [16, 32]
sa3:
  mlp: [32, 64]
fp3:
  mlp: [32]
fp2:
  mlp: [32]
fp1:
  mlp: [32]
"""


@pytest.fixture
def config_dir(tmp_path):
    """Bundled configs + a tiny pointnet, via the config_dir override."""
    import shutil
    from captra_tpu.config.loader import DEFAULTS_DIR
    d = tmp_path / "configs"
    shutil.copytree(DEFAULTS_DIR, d)
    (d / "pointnet_config" / "pointnet2_tiny.yml").write_text(TINY_POINTNET)
    return str(d)


def _common_args(config_dir, exp_dir, extra=()):
    return [
        "--config_dir", config_dir,
        "--experiment_dir", exp_dir,
        "--obj_config", "obj_info_sapien.yml",
        "--obj_category", "laptop",
        "--pointnet_cfg/camera", "pointnet2_tiny.yml",
        "--num_points", "128",
        "--batch_size", "2",
        "--network/backbone_out_dim", "32",
        "--synthetic_data",
        *extra,
    ]


def test_full_pipeline(config_dir, tmp_path, monkeypatch):
    from captra_tpu.cli import evaluate as eval_cli
    from captra_tpu.cli import track as track_cli
    from captra_tpu.cli import train as train_cli

    coord_dir = str(tmp_path / "coord_exp")
    rot_dir = str(tmp_path / "rot_exp")

    # 1 epoch each, few steps (monkeypatch the synthetic epoch length)
    monkeypatch.setattr(train_cli, "synthetic_epoch",
                        lambda cfg, epoch, steps=50: iter(
                            [train_cli.make_frame_batch(
                                epoch * 3 + i, cfg.obj, batch=2,
                                num_points=128) for i in range(3)]))

    train_cli.main(_common_args(config_dir, coord_dir,
                                ["--config", "config_coordnet.yml",
                                 "--total_epoch", "1"]))
    assert os.path.exists(pjoin(coord_dir, "ckpt", "model_0000"))

    train_cli.main(_common_args(config_dir, rot_dir,
                                ["--config", "config_rotnet.yml",
                                 "--total_epoch", "1"]))
    assert os.path.exists(pjoin(rot_dir, "ckpt", "model_0000"))

    # tracking with composed checkpoints
    track_cli.main(_common_args(config_dir, rot_dir,
                                ["--config", "config_track.yml",
                                 "--coord_exp/dir", coord_dir,
                                 "--init_frame/gt", "true",
                                 "--save"]))
    results = pjoin(rot_dir, "results", "data")
    assert len(os.listdir(results)) == 4  # 4 synthetic trajectories

    # offline evaluation over the saved pickles
    eval_cli.main(_common_args(config_dir, rot_dir,
                               ["--config", "config_track.yml", "--no_iou"]))
    assert os.path.exists(pjoin(rot_dir, "results", "err.csv"))
    import pickle
    with open(pjoin(rot_dir, "results", "err.pkl"), "rb") as f:
        err = pickle.load(f)
    row = next(iter(err.values()))
    assert "rdiff_0" in row and "theta_diff_0" in row
    assert np.isfinite(list(row.values())).all()


def test_track_bucket_helpers():
    import jax.numpy as jnp
    import numpy as np
    from captra_tpu.cli.track import _bucket_length, _pad_frames

    assert _bucket_length(5) == 8
    assert _bucket_length(8) == 8
    assert _bucket_length(9) == 16
    assert _bucket_length(33) == 64
    assert _bucket_length(100) == 128
    assert _bucket_length(130) == 160  # not 256: multiples of 32 above 32
    assert _bucket_length(160) == 160

    frames = {"points": jnp.arange(5 * 2 * 3, dtype=jnp.float32)
              .reshape(5, 2, 3), "key": jnp.arange(5)}
    padded = _pad_frames(frames, 5, 8)
    assert padded["points"].shape == (8, 2, 3)
    # padded steps replicate the final frame
    np.testing.assert_array_equal(np.asarray(padded["points"][5]),
                                  np.asarray(frames["points"][4]))
    assert _pad_frames(frames, 5, 5) is frames


def _tiny_synth_epochs(monkeypatch):
    from captra_tpu.cli import train as train_cli
    monkeypatch.setattr(train_cli, "synthetic_epoch",
                        lambda cfg, epoch, steps=50: iter(
                            [train_cli.make_frame_batch(
                                epoch * 3 + i, cfg.obj, batch=2,
                                num_points=128) for i in range(3)]))
    return train_cli


def test_save_frequency(config_dir, tmp_path, monkeypatch):
    """--freq/save controls checkpoint cadence (reference train.py:94-95:
    save iff (epoch+1) % freq == 0); the final epoch is always saved."""
    train_cli = _tiny_synth_epochs(monkeypatch)
    exp = str(tmp_path / "freq_exp")
    train_cli.main(_common_args(config_dir, exp,
                                ["--config", "config_coordnet.yml",
                                 "--total_epoch", "4", "--freq/save", "2"]))
    saved = sorted(os.listdir(pjoin(exp, "ckpt")))
    assert saved == ["model_0001", "model_0003"]


def test_resume_mid_recipe_bit_deterministic(config_dir, tmp_path,
                                             monkeypatch):
    """Train 2 epochs straight vs train 1 + resume for 1 more: identical
    final checkpoint (per-epoch fold_in key streams + deterministic
    synthetic batches + tolerant opt-state restore)."""
    import pickle

    import jax
    train_cli = _tiny_synth_epochs(monkeypatch)

    a = str(tmp_path / "straight")
    train_cli.main(_common_args(config_dir, a,
                                ["--config", "config_coordnet.yml",
                                 "--total_epoch", "2"]))

    b = str(tmp_path / "resumed")
    train_cli.main(_common_args(config_dir, b,
                                ["--config", "config_coordnet.yml",
                                 "--total_epoch", "1"]))
    assert os.path.exists(pjoin(b, "ckpt", "model_0000"))
    train_cli.main(_common_args(config_dir, b,
                                ["--config", "config_coordnet.yml",
                                 "--total_epoch", "2"]))

    with open(pjoin(a, "ckpt", "model_0001"), "rb") as f:
        pa = pickle.load(f)
    with open(pjoin(b, "ckpt", "model_0001"), "rb") as f:
        pb = pickle.load(f)
    assert pa["epoch"] == pb["epoch"] == 1
    assert pa["step"] == pb["step"]
    leaves_a = jax.tree.leaves(pa["params"])
    leaves_b = jax.tree.leaves(pb["params"])
    assert len(leaves_a) == len(leaves_b)
    for xa, xb in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(xa, xb, rtol=0, atol=0)


def test_train_orbax_format_resume(config_dir, tmp_path, monkeypatch):
    """--ckpt_format orbax through the real CLI: checkpoints land as orbax
    directories under the same model_%04d naming, and a later run resumes
    from them (load_checkpoint auto-detects the directory format) and keeps
    the bit-deterministic stream vs an uninterrupted pickle run."""
    import jax
    train_cli = _tiny_synth_epochs(monkeypatch)

    a = str(tmp_path / "straight_pickle")
    train_cli.main(_common_args(config_dir, a,
                                ["--config", "config_coordnet.yml",
                                 "--total_epoch", "2"]))

    b = str(tmp_path / "resumed_orbax")
    train_cli.main(_common_args(config_dir, b,
                                ["--config", "config_coordnet.yml",
                                 "--total_epoch", "1",
                                 "--ckpt_format", "orbax"]))
    assert os.path.isdir(pjoin(b, "ckpt", "model_0000"))
    train_cli.main(_common_args(config_dir, b,
                                ["--config", "config_coordnet.yml",
                                 "--total_epoch", "2",
                                 "--ckpt_format", "orbax"]))

    from captra_tpu.training import checkpoint as ckpt
    pa = ckpt.load_checkpoint(pjoin(a, "ckpt", "model_0001"))
    pb = ckpt.load_checkpoint(pjoin(b, "ckpt", "model_0001"))
    assert pa["epoch"] == pb["epoch"] == 1
    assert pa["step"] == pb["step"]
    for xa, xb in zip(jax.tree.leaves(pa["params"]),
                      jax.tree.leaves(pb["params"])):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=0, atol=0)


def test_train_device_aug(config_dir, tmp_path):
    """--device_aug trains on device-side pose resampling (fresh poses per
    step over the geometry pool) through the real CLI."""
    from captra_tpu.cli import train as train_cli
    exp = str(tmp_path / "aug_exp")
    train_cli.main(_common_args(config_dir, exp,
                                ["--config", "config_coordnet.yml",
                                 "--total_epoch", "1", "--device_aug",
                                 "--geom_pool", "8"]))
    assert os.path.exists(pjoin(exp, "ckpt", "model_0000"))


def test_train_use_val_split(config_dir, tmp_path):
    """--use_val evaluates an extra split each epoch under its own tag
    (reference train.py:52-80)."""
    from captra_tpu.cli import train as train_cli
    from tests.test_data import _write_fake_nocs

    root = str(tmp_path / "data")
    # real_test last: _write_fake_nocs always writes under render/real_test
    # and the other modes are produced by renaming it away
    for mi, mode in enumerate(("train", "val", "real_test")):
        _write_fake_nocs(root, instances=("insA",), tracks=1, frames=4,
                         n=300, seed=mi)
        if mode != "real_test":
            os.rename(pjoin(root, "render", "real_test"),
                      pjoin(root, "render", mode))

    exp = str(tmp_path / "exp")
    train_cli.main([
        "--config_dir", config_dir, "--config", "config_coordnet.yml",
        "--obj_config", "obj_info_nocs.yml", "--obj_category", "1",
        "--basepath", root, "--experiment_dir", exp,
        "--pointnet_cfg/camera", "pointnet2_tiny.yml",
        "--network/backbone_out_dim", "32", "--num_points", "128",
        "--batch_size", "2", "--total_epoch", "1", "--use_val", "val",
    ])
    log = open(pjoin(exp, "log", "log.txt")).read()
    assert "Test epoch 0" in log and "val epoch 0" in log
