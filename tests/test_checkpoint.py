import jax
import numpy as np

from captra_tpu.config.schema import NetworkCfg, ObjCfg
from captra_tpu.data.synthetic import make_frame_batch
from captra_tpu.training import checkpoint as ckpt
from captra_tpu.training.trainer import Trainer

from tests.test_models import tiny_config


def _setup(key, tmp_path, net_type="canon_coord"):
    obj = ObjCfg(num_parts=1, num_joints=0, tree=(-1,), extra_dims=1)
    cfg = tiny_config().replace(
        obj=obj, network=NetworkCfg(type=net_type, backbone_out_dim=32,
                                    nocs_head_dims=(16,)))
    trainer = Trainer(cfg, steps_per_epoch=10)
    batch = make_frame_batch(0, obj, batch=2, num_points=128)
    state = trainer.init_state(key, batch)
    return trainer, batch, state, str(tmp_path)


def test_save_load_roundtrip(key, tmp_path):
    trainer, batch, state, d = _setup(key, tmp_path)
    state, _, _ = trainer.train_step(state, batch, key)
    ckpt.save_checkpoint(d, epoch=3, state=state)
    path = ckpt.latest_checkpoint(d)
    assert path and path.endswith("model_0003")
    loaded = ckpt.load_checkpoint(path)
    restored = ckpt.restore_state(loaded, state)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)


def test_latest_and_pinned(key, tmp_path):
    trainer, batch, state, d = _setup(key, tmp_path)
    for e in (1, 2, 5):
        ckpt.save_checkpoint(d, epoch=e, state=state)
    assert ckpt.latest_checkpoint(d).endswith("model_0005")
    assert ckpt.latest_checkpoint(d, epoch=2).endswith("model_0002")
    assert ckpt.latest_checkpoint(d, epoch=9) is None
    # resume continues training
    loaded = ckpt.load_checkpoint(ckpt.latest_checkpoint(d))
    restored = ckpt.restore_state(loaded, state)
    state2, loss, _ = trainer.train_step(restored, batch, key)
    assert np.isfinite(float(loss["total_loss"]))


def test_track_composition(key, tmp_path):
    """CoordNet + RotNet checkpoints from separate experiments compose into
    tracking variables (reference trainer.py:159-170 splice)."""
    trainer_c, batch, state_c, d = _setup(key, tmp_path)
    import os
    dc, dr = os.path.join(d, "coord"), os.path.join(d, "rot")
    ckpt.save_checkpoint(dc, epoch=1, state=state_c)

    obj = ObjCfg(num_parts=1, num_joints=0, tree=(-1,), extra_dims=1)
    cfg_r = tiny_config().replace(
        obj=obj, network=NetworkCfg(type="rot", backbone_out_dim=32,
                                    nocs_head_dims=(16,)))
    trainer_r = Trainer(cfg_r, steps_per_epoch=10)
    state_r = trainer_r.init_state(key, batch)
    ckpt.save_checkpoint(dr, epoch=1, state=state_r)

    cv, rv = ckpt.load_track_variables(
        ckpt.latest_checkpoint(dc), ckpt.latest_checkpoint(dr))
    # usable by the tracking step
    from captra_tpu.models.coordnet import CoordNet
    import jax.numpy as jnp
    coord = CoordNet(trainer_c.cfg)
    pts = batch["points"] - batch["points"].mean(axis=1, keepdims=True)
    out = coord.apply(cv, pts, train=False)
    assert out["seg"].shape[-1] == 2


def test_orbax_format_roundtrip(key, tmp_path):
    """--ckpt_format orbax: same payload behind the same model_%04d naming;
    load auto-detects the directory format and restore_state rebuilds the
    optax NamedTuple opt_state exactly from the flat leaves."""
    trainer, batch, state, d = _setup(key, tmp_path)
    state, _, _ = trainer.train_step(state, batch, key)
    ckpt.save_checkpoint(d, epoch=4, state=state, extra={"note": "x"},
                         format="orbax")
    path = ckpt.latest_checkpoint(d)
    assert path and path.endswith("model_0004")
    import os
    assert os.path.isdir(path)
    loaded = ckpt.load_checkpoint(path)
    assert loaded["extra"] == {"note": "x"}
    restored = ckpt.restore_state(loaded, state)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # opt_state preserved exactly (not the fresh-fallback): moments match
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)
    # overwrite same epoch (reference save semantics allow re-saving)
    ckpt.save_checkpoint(d, epoch=4, state=state, format="orbax")
    # a further step from the restored state runs fine
    state2, loss, _ = trainer.train_step(restored, batch, key)
    assert np.isfinite(float(loss["total_loss"]))


def test_orbax_pickle_interop(key, tmp_path):
    """Formats can be mixed in one ckpt dir; latest_checkpoint and the
    tracking-time composition loader see both."""
    trainer, batch, state, d = _setup(key, tmp_path)
    ckpt.save_checkpoint(d, epoch=1, state=state, format="pickle")
    ckpt.save_checkpoint(d, epoch=2, state=state, format="orbax")
    assert ckpt.latest_checkpoint(d).endswith("model_0002")
    a = ckpt.load_checkpoint(ckpt.latest_checkpoint(d, epoch=1))
    b = ckpt.load_checkpoint(ckpt.latest_checkpoint(d, epoch=2))
    for x, y in zip(jax.tree.leaves(a["params"]),
                    jax.tree.leaves(b["params"])):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
