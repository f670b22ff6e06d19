"""Trainer smoke + learning tests: one step runs under jit, loss decreases
when overfitting a fixed tiny batch (SURVEY.md §4 implication d)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from captra_tpu.config.schema import NetworkCfg, ObjCfg
from captra_tpu.data.synthetic import make_frame_batch
from captra_tpu.training.trainer import (
    Trainer, bn_momentum_for_epoch, make_lr_schedule,
)

from tests.test_models import tiny_config


def _trainer(net_type, obj=None, **cfg_kw):
    cfg = tiny_config()
    if obj is not None:
        cfg = cfg.replace(obj=obj)
    cfg = cfg.replace(network=NetworkCfg(type=net_type, backbone_out_dim=32,
                                         nocs_head_dims=(16,)), **cfg_kw)
    return Trainer(cfg, steps_per_epoch=10), cfg


def test_lr_schedule():
    _, cfg = _trainer("canon_coord")
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    lr0 = float(sched(0))
    assert lr0 == pytest.approx(cfg.optim.learning_rate)
    # after lr_step_size epochs: halved
    assert float(sched(10 * cfg.optim.lr_step_size)) == pytest.approx(lr0 / 2)
    # far future: clipped
    assert float(sched(10 * cfg.optim.lr_step_size * 50)) == pytest.approx(
        cfg.optim.lr_clip)


def test_bn_momentum_schedule():
    _, cfg = _trainer("canon_coord")
    m0 = bn_momentum_for_epoch(cfg, 0)
    assert m0 == pytest.approx(1.0 - 0.1)
    m20 = bn_momentum_for_epoch(cfg, 20)
    assert m20 == pytest.approx(1.0 - 0.05)
    m_inf = bn_momentum_for_epoch(cfg, 10_000)
    assert m_inf == pytest.approx(1.0 - 0.01)


def test_coordnet_train_step_learns(key):
    obj = ObjCfg(num_parts=1, num_joints=0, tree=(-1,), sym=False,
                 extra_dims=1)
    trainer, cfg = _trainer("canon_coord", obj=obj)
    batch = make_frame_batch(0, obj, batch=2, num_points=128)
    state = trainer.init_state(key, batch)

    losses = []
    k = key
    for i in range(12):
        k, sub = jax.random.split(k)
        state, loss_dict, metrics = trainer.train_step(state, batch, sub)
        losses.append(float(loss_dict["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert "seg_loss" in loss_dict and "nocs_loss" in loss_dict
    assert "5deg5cm" in metrics


def test_coordnet_sym_losses(key):
    obj = ObjCfg(num_parts=1, num_joints=0, tree=(-1,), sym=True,
                 extra_dims=1)
    trainer, cfg = _trainer("canon_coord", obj=obj)
    batch = make_frame_batch(0, obj, batch=2, num_points=128)
    state = trainer.init_state(key, batch)
    state, loss_dict, _ = trainer.train_step(state, batch, key)
    assert "nocs_dist_loss" in loss_dict and "nocs_pwm_loss" in loss_dict
    assert np.isfinite(float(loss_dict["total_loss"]))


def test_rotnet_train_step_learns(key):
    obj = ObjCfg(num_parts=2, num_joints=1, tree=(-1, 0), main_axis=(1,))
    trainer, cfg = _trainer("rot", obj=obj)
    batch = make_frame_batch(0, obj, batch=2, num_points=128)
    state = trainer.init_state(key, batch)
    losses = []
    k = key
    for i in range(12):
        k, sub = jax.random.split(k)
        state, loss_dict, metrics = trainer.train_step(state, batch, sub)
        losses.append(float(loss_dict["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert "rloss" in loss_dict


def test_eval_step(key):
    obj = ObjCfg(num_parts=1, num_joints=0, tree=(-1,), extra_dims=1)
    trainer, cfg = _trainer("canon_coord", obj=obj)
    batch = make_frame_batch(0, obj, batch=2, num_points=128)
    state = trainer.init_state(key, batch)
    loss_dict, metrics = trainer.eval_step(state, batch, key)
    assert np.isfinite(float(loss_dict["total_loss"]))


def test_bn_stats_update(key):
    obj = ObjCfg(num_parts=1, num_joints=0, tree=(-1,), extra_dims=1)
    trainer, cfg = _trainer("canon_coord", obj=obj)
    batch = make_frame_batch(0, obj, batch=2, num_points=128)
    state = trainer.init_state(key, batch)
    before = jax.tree.leaves(state.batch_stats)[0].copy()
    state, _, _ = trainer.train_step(state, batch, key)
    after = jax.tree.leaves(state.batch_stats)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_optimizer_chain_survives_inf_nan_grads(key):
    """zero_nans -> elementwise clip -> global-norm clip: inf/NaN gradient
    spikes must produce finite updates (plain clip_by_global_norm turns an
    inf grad into NaN params via inf * 0)."""
    import optax
    from captra_tpu.training.trainer import make_optimizer

    import dataclasses
    cfg = tiny_config().replace(
        optim=dataclasses.replace(tiny_config().optim, grad_clip=1.0))
    tx = make_optimizer(cfg, steps_per_epoch=10)
    params = {"a": jnp.ones((3,)), "b": jnp.ones((2,))}
    state = tx.init(params)
    grads = {"a": jnp.array([jnp.inf, -jnp.inf, 1.0]),
             "b": jnp.array([jnp.nan, 2.0])}
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree.leaves(new)), new


def test_train_step_nan_batch_keeps_state_finite(key):
    """A poisoned batch (NaN points) must not contaminate params OR the BN
    running stats (one NaN forward used to stick in the stats EMA forever)."""
    from captra_tpu.config.schema import NetworkCfg, ObjCfg
    from captra_tpu.data.synthetic import make_frame_batch
    from captra_tpu.training.trainer import Trainer

    obj = ObjCfg(num_parts=1, num_joints=0, tree=(-1,), extra_dims=1)
    import dataclasses
    cfg = tiny_config().replace(
        obj=obj, network=NetworkCfg(type="canon_coord", backbone_out_dim=32,
                                    nocs_head_dims=(16,)),
        optim=dataclasses.replace(tiny_config().optim, grad_clip=1.0))
    trainer = Trainer(cfg, steps_per_epoch=10)
    batch = make_frame_batch(0, obj, batch=4, num_points=128)
    state = trainer.init_state(key, batch)
    state, _, _ = trainer.train_step(state, batch, key)

    bad = dict(batch)
    bad["points"] = batch["points"].at[0, 0].set(jnp.nan)
    state2, _, _ = trainer.train_step(state, bad, key)
    for leaf in jax.tree.leaves(state2.params) + \
            jax.tree.leaves(state2.batch_stats):
        assert np.isfinite(np.asarray(leaf)).all()

    # and training continues normally on the next clean batch
    state3, loss, _ = trainer.train_step(state2, batch, key)
    assert np.isfinite(float(loss["total_loss"]))


def test_set_epoch_no_retrace_within_momentum_step():
    """The jit cache is keyed on hash(trainer); the hash must be stable
    across epochs that share the effective BN momentum and change only at
    schedule boundaries (VERDICT r2: per-epoch retraces cost minutes each
    through a remote-compile tunnel)."""
    trainer, cfg = _trainer("canon_coord")
    step = cfg.optim.bn_momentum_step_size
    h0 = hash(trainer)
    mod0 = trainer.module
    for e in range(1, step):
        trainer.set_epoch(e)
        assert hash(trainer) == h0 and trainer.module is mod0, e
    trainer.set_epoch(step)  # momentum halves -> one legitimate rebuild
    assert hash(trainer) != h0 and trainer.module is not mod0


def test_set_epoch_never_retraces_with_groupnorm():
    import dataclasses
    _, cfg = _trainer("canon_coord")
    cfg = dataclasses.replace(cfg, network=dataclasses.replace(
        cfg.network, norm="gn"))
    trainer = Trainer(cfg, steps_per_epoch=10)
    h0, mod0 = hash(trainer), trainer.module
    for e in (1, 20, 40, 200):
        trainer.set_epoch(e)
        assert hash(trainer) == h0 and trainer.module is mod0, e


def test_eval_step_uses_pred_labels(key):
    """Test semantics (reference networks.py:55, model.py:151-153): the
    eval path must select coordinates / solve s-t with PREDICTED labels."""
    from captra_tpu.training.trainer import coordnet_loss

    obj = ObjCfg(num_parts=2, num_joints=1, tree=(-1, 0), extra_dims=0)
    trainer, cfg = _trainer("canon_coord", obj=obj)
    batch = make_frame_batch(0, cfg.obj, batch=2, num_points=128)
    state = trainer.init_state(key, batch)

    loss_dict, metrics = trainer.eval_step(state, batch, key)
    ref_pred = coordnet_loss(cfg, trainer.module, state.params,
                             state.batch_stats, batch, key, train=False,
                             use_pred_labels=True)[0]
    ref_gt = coordnet_loss(cfg, trainer.module, state.params,
                           state.batch_stats, batch, key, train=False,
                           use_pred_labels=False)[0]
    total = float(loss_dict["total_loss"])
    assert total == pytest.approx(float(ref_pred), rel=1e-5)
    # with an untrained net pred labels differ from GT -> the two paths
    # must be distinguishable (guards against the test passing vacuously)
    assert abs(float(ref_pred) - float(ref_gt)) > 1e-6
