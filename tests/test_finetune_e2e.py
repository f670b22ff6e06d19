"""Finetune CLI e2e: CAMERA-synthetic + Real mixing over fake NOCS trees."""
import os
from os.path import join as pjoin

import numpy as np

from tests.test_cli_e2e import TINY_POINTNET, config_dir  # noqa: F401
from tests.test_data import _write_fake_nocs


def test_finetune_pipeline(config_dir, tmp_path):  # noqa: F811
    from captra_tpu.cli import finetune as ft_cli

    root = str(tmp_path / "data")
    # synthetic CAMERA split ('train') + real split ('real_train')
    for mode, tracks in (("train", 1), ("real_train", 1)):
        _write_fake_nocs(root, instances=("insA",), tracks=tracks, frames=4,
                         n=300, seed=1)
        # _write_fake_nocs writes under real_test; move to the right split
        src = pjoin(root, "render", "real_test")
        dst = pjoin(root, "render", mode)
        os.rename(src, dst)

    exp = str(tmp_path / "exp")
    ft_cli.main([
        "--config_dir", config_dir,
        "--config", "config_coordnet.yml",
        "--obj_config", "obj_info_nocs.yml",
        "--obj_category", "1",
        "--basepath", root,
        "--experiment_dir", exp,
        "--pointnet_cfg/camera", "pointnet2_tiny.yml",
        "--network/backbone_out_dim", "32",
        "--num_points", "128",
        "--batch_size", "2",
        "--total_epoch", "1",
        "--syn_n", "1",
    ])
    assert os.path.exists(pjoin(exp, "ckpt", "model_0000"))
    log = open(pjoin(exp, "log", "log.txt")).read()
    assert "Syn_Train" in log and "Real_Train" in log


def test_syn_stream_fast_forward(tmp_path):
    """syn_stream(consumed=k) must continue exactly where an uninterrupted
    stream would be after k batches (resume continuity of the persistent
    synthetic iterator, reference train_nocs_finetune.py:52-60)."""
    from itertools import islice

    from captra_tpu.cli.finetune import syn_stream

    root = str(tmp_path / "data")
    _write_fake_nocs(root, instances=("insA",), tracks=2, frames=4,
                     n=300, seed=5)
    os.rename(pjoin(root, "render", "real_test"),
              pjoin(root, "render", "train"))

    from captra_tpu.config.schema import ObjCfg
    from captra_tpu.data.nocs import NOCSDataset
    obj = ObjCfg(category="1", num_parts=1, num_joints=0, tree=(-1,),
                 extra_dims=1)
    ds = NOCSDataset(root, "1", obj, num_points=64, mode="train")

    straight = list(islice(syn_stream(ds, 2, consumed=0), 7))
    resumed = list(islice(syn_stream(ds, 2, consumed=5), 2))
    for a, b in zip(straight[5:], resumed):
        # same frames in the same order (identical shuffled index streams);
        # compare by per-frame point means (point order itself may differ —
        # the skipped point-shuffle RNG draws are not replayed)
        np.testing.assert_allclose(
            np.asarray(a["points"]).mean(axis=1),
            np.asarray(b["points"]).mean(axis=1), atol=2e-2)
