"""On-policy rollout fine-tuning (training/rollout.py): device trajectory
synthesis, carried-pose harvesting, and the fused train round.  No reference
counterpart (the reference trains only on GT+noise, model.py:224-240); this
is the opt-in DAgger-style extension motivated by the round-3 drift-bias
attribution (EVIDENCE.md)."""
import jax
import jax.numpy as jnp
import numpy as np

from captra_tpu.config.schema import NetworkCfg, TrackCfg
from captra_tpu.data.synthetic import (
    device_trajectory_batch, geometry_pool,
)
from captra_tpu.pose.part_dof import Pose
from captra_tpu.training.rollout import collect_states, make_finetune_round
from captra_tpu.training.trainer import Trainer, rotnet_loss

from tests.test_models import tiny_config
from tests.test_tracker import _oracle_fns, arti_obj


def _traj(cfg, key, T=5, B=2, G=4, N=128):
    pool = geometry_pool(seed=3, obj=cfg.obj, count=G, num_points=N)
    geo = jax.tree.map(lambda x: x[:B], pool)
    return device_trajectory_batch(key, geo["npcs"], geo["labels"],
                                   geo["corners"], cfg.obj, num_frames=T)


def test_device_trajectory_batch_consistency(key):
    cfg = tiny_config().replace(obj=arti_obj())
    T, B, N = 6, 3, 128
    traj = _traj(cfg, key, T=T, B=B, N=N)
    assert traj["points"].shape == (T, B, N, 3)
    assert traj["pose"].rotation.shape == (T, B, cfg.obj.num_parts, 3, 3)

    # observed points = own part's NPCS under that frame's pose (+noise)
    R, t = traj["pose"].rotation, traj["pose"].translation
    s = traj["pose"].scale
    posed = jnp.einsum("tbpij,tbnj->tbpni", R, traj["nocs"]) \
        * s[..., None, None] + jnp.swapaxes(t, -1, -2)
    own = jnp.take_along_axis(
        posed, traj["labels"][:, :, None, :, None].repeat(3, -1),
        axis=2)[:, :, 0]
    err = jnp.abs(traj["points"] - own)
    assert float(jnp.max(err)) < 0.02  # noise=0.002, 5 sigma padding

    # smooth root motion: consecutive-frame geodesic rotation ~ motion_rad
    root_R = R[:, :, 0]
    dR = jnp.swapaxes(root_R[:-1], -1, -2) @ root_R[1:]
    tr = jnp.trace(dR, axis1=-2, axis2=-1)
    ang = jnp.arccos(jnp.clip((tr - 1) / 2, -1, 1))
    np.testing.assert_allclose(np.asarray(ang), 0.03, atol=1e-3)


def test_collect_states_carried_pose(key):
    obj = arti_obj()
    cfg = tiny_config().replace(obj=obj, track=TrackCfg(init_frame_gt=True))
    T, B, N = 5, 2, 128
    traj = _traj(cfg, key, T=T, B=B, N=N)

    # oracle predictors over per-frame GT => the tracker refits GT poses
    delta9 = (jnp.swapaxes(traj["pose"].rotation[:-1], -1, -2)
              @ traj["pose"].rotation[1:]).reshape(T - 1, B,
                                                   obj.num_parts, 9)
    frames = {
        "points": traj["points"], "labels": traj["labels"],
        "nocs": traj["nocs"],
        "gt_delta_rt9": jnp.concatenate([delta9[:1], delta9], axis=0),
    }
    coord_from, rot_from = _oracle_fns(cfg, frames)

    # collect_states applies (coord_fn, rot_fn) uniformly; wrap the oracle
    # closures so each scan step sees its own frame's GT
    gt0 = traj["pose"].map(lambda p: p[0])
    init_pose = Pose(rotation=gt0.rotation, translation=gt0.translation,
                     scale=gt0.scale)

    from captra_tpu.tracking.tracker import track_trajectory

    def step(pose, frame):
        from captra_tpu.tracking.tracker import make_track_step
        inner = make_track_step(cfg, coord_from(frame), rot_from(frame))
        return inner(pose, frame)

    _, aux = track_trajectory(step, init_pose, frames)

    # now harvest through collect_states with fns that reproduce that run
    # (single uniform fns are enough: assert structure + frame-1 rows)
    states, errs = collect_states(
        cfg, coord_from(jax.tree.map(lambda x: x[1], frames)),
        lambda cp, lb: rot_from(jax.tree.map(lambda x: x[1], frames))(cp, lb),
        {"points": traj["points"], "labels": traj["labels"],
         "nocs": traj["nocs"], "pose": traj["pose"],
         "corners": jnp.broadcast_to(
             jnp.zeros((obj.num_parts, 2, 3)), (B, obj.num_parts, 2, 3))},
        init_pose)

    M = (T - 1) * B
    assert states["points"].shape == (M, N, 3)
    assert states["pose"].rotation.shape == (M, obj.num_parts, 3, 3)
    assert states["init_pose"].rotation.shape == (M, obj.num_parts, 3, 3)
    # time-major flatten: rows [0, B) are frame 1, whose carried pose is
    # exactly the frame-0 init
    np.testing.assert_allclose(np.asarray(states["init_pose"].rotation[:B]),
                               np.asarray(init_pose.rotation), atol=1e-6)
    for v in errs.values():
        assert np.isfinite(float(v))


def test_rotnet_loss_init_pose_override(key):
    """With batch['init_pose'] present the perturbation config is dead code:
    wildly different perturb settings give bit-identical losses."""
    import dataclasses
    cfg_a = tiny_config().replace(obj=arti_obj())
    cfg_b = cfg_a.replace(
        perturb=dataclasses.replace(cfg_a.perturb, r=180.0, t=9.9))
    net = NetworkCfg(type="rot", backbone_out_dim=32, nocs_head_dims=(16,))
    cfg_a, cfg_b = cfg_a.replace(network=net), cfg_b.replace(network=net)

    tr = Trainer(cfg_a, steps_per_epoch=10)
    from captra_tpu.data.synthetic import make_frame_batch
    batch = make_frame_batch(0, cfg_a.obj, batch=2, num_points=128)
    state = tr.init_state(key, batch)
    batch = dict(batch)
    batch["init_pose"] = batch["pose"]

    la, _ = rotnet_loss(cfg_a, tr.module, state.params, state.batch_stats,
                        batch, key, train=False)
    lb, _ = rotnet_loss(cfg_b, tr.module, state.params, state.batch_stats,
                        batch, key, train=False)
    assert float(la) == float(lb)


def test_finetune_round_runs_and_updates(key):
    obj = arti_obj()
    base = tiny_config().replace(obj=obj, track=TrackCfg(init_frame_gt=True))
    coord_cfg = base.replace(network=NetworkCfg(
        type="canon_coord", backbone_out_dim=32, nocs_head_dims=(16,)))
    rot_cfg = base.replace(network=NetworkCfg(
        type="rot", backbone_out_dim=32, nocs_head_dims=(16,)))

    coord_tr = Trainer(coord_cfg, steps_per_epoch=10)
    rot_tr = Trainer(rot_cfg, steps_per_epoch=10)
    from captra_tpu.data.synthetic import make_frame_batch
    b0 = make_frame_batch(0, obj, batch=3, num_points=128)
    cs = coord_tr.init_state(key, b0)
    rs = rot_tr.init_state(key, b0)

    pool = geometry_pool(seed=3, obj=obj, count=4, num_points=128)
    round_fn = make_finetune_round(base, coord_tr, rot_tr, pool,
                                   traj_batch=2, traj_frames=4,
                                   minibatch=3, plain_steps=1)
    cs2, rs2, logs = round_fn(cs, rs, key)
    # (T-1)*B = 6 states -> 2 rollout minibatches + 1 plain step
    assert int(cs2.step) == 3 and int(rs2.step) == 3
    for k in ("coord_loss", "rot_loss", "rot_rdiff", "rollout_rdiff",
              "rollout_5deg5cm"):
        assert k in logs and np.isfinite(float(logs[k])), k
    # params moved
    moved = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         cs.params, cs2.params)
    assert max(jax.tree.leaves(moved)) > 0

    # freeze_coord: CoordNet passes through bit-identical, RotNet trains
    frozen_fn = make_finetune_round(base, coord_tr, rot_tr, pool,
                                    traj_batch=2, traj_frames=4,
                                    minibatch=3, plain_steps=1,
                                    freeze_coord=True)
    cs3, rs3, logs3 = frozen_fn(cs, rs, key)
    same = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        cs.params, cs3.params)
    assert max(jax.tree.leaves(same)) == 0
    assert int(cs3.step) == 0 and int(rs3.step) == 3
    assert np.isfinite(float(logs3["rot_loss"]))
