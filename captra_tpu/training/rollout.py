"""On-policy rollout fine-tuning: close the train/track distribution gap.

The reference trains RotationNet on GT poses perturbed by freshly sampled
noise (/root/reference/network/models/model.py:224-240) while its tracker
feeds each frame the PREVIOUS frame's fitted pose (model.py:409-478) — the
network never trains on its own error distribution.  Measured consequence
on synthetic data: a correlated ~0.6 deg/frame rotation bias that dominates
full-scan drift and survives every tracking-time lever (EVIDENCE.md
round-3 attribution experiments).  This module closes the loop
DAgger-style (Ross et al., AISTATS 2011): roll out the CURRENT policy (the
full tracking scan), harvest each tracked frame's carried pose as an
init-pose training state, and fine-tune both networks on those states with
the expert (GT) supervision the standard losses already compute.

TPU-native shape: one round = ONE jitted program — on-device trajectory
synthesis (data/synthetic.py:device_trajectory_batch) -> the lax.scan
tracker (tracking/tracker.py) -> state harvest -> a lax.scan over train
minibatches for both nets (optionally interleaved with standard
noise-perturbation batches so the off-policy skill is retained).  Through
a remote-dispatch tunnel this is the difference between 1 and ~50
dispatches per round.  No reference counterpart; strictly opt-in
(scripts/rollout_finetune.py) — the standard recipes are untouched.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from captra_tpu.config.schema import Config
from captra_tpu.pose.part_dof import Pose
from captra_tpu.tracking.tracker import (
    evaluate_track, init_pose_from_gt, make_track_step, track_trajectory,
)


def collect_states(cfg: Config, coord_fn, rot_fn, traj: dict,
                   init_pose: Pose) -> tuple[dict, dict]:
    """Track `traj` with the current policy and harvest per-frame training
    states.

    traj: {points [T, B, N, 3], labels [T, B, N], nocs [T, B, N, 3],
           pose Pose[T, B, P], corners [B, P, 2, 3]} (leading time axis).

    Returns (states, rollout_errs): `states` is a single-frame training
    batch of M = (T-1)*B rows — the standard loss-stack keys plus
    `init_pose`, the pose the tracker actually carried INTO each frame
    (frame 1 gets `init_pose`, frame t>1 gets the fitted pose of t-1);
    `rollout_errs` are the rollout's own per-frame pose errors (free
    training-progress signal)."""
    step = make_track_step(cfg, coord_fn, rot_fn)
    _, aux = track_trajectory(step, init_pose, {"points": traj["points"]})

    # pose carried into tracked frame t: init for t=1, fit of t-1 after
    carried = jax.tree.map(
        lambda i, s: jnp.concatenate([i[None], s[:-1]], axis=0),
        init_pose, aux.pose)

    T1, B = traj["points"].shape[0] - 1, traj["points"].shape[1]

    def flat(x):
        return x.reshape((T1 * B,) + x.shape[2:])

    states = {
        "points": flat(traj["points"][1:]),
        "labels": flat(traj["labels"][1:]),
        "nocs": flat(traj["nocs"][1:]),
        "pose": jax.tree.map(lambda x: flat(x[1:]), traj["pose"]),
        "corners": flat(jnp.broadcast_to(
            traj["corners"][None], (T1,) + traj["corners"].shape)),
        "init_pose": jax.tree.map(flat, carried),
    }
    gt_rest = jax.tree.map(lambda x: x[1:], traj["pose"])
    errs = evaluate_track(aux.pose, gt_rest, sym=cfg.obj.sym)
    return states, {k: jnp.mean(v) for k, v in errs.items()}


def make_finetune_round(cfg_track: Config, coord_trainer, rot_trainer,
                        pool: dict, *, traj_batch: int, traj_frames: int,
                        minibatch: int, plain_steps: int = 0,
                        motion_rad: float = 0.03,
                        freeze_coord: bool = False):
    """Build the fused one-dispatch fine-tune round.

    pool: geometry pool from data/synthetic.py:geometry_pool (HBM-resident).
    Returns round_fn(coord_state, rot_state, key) ->
    (coord_state, rot_state, logs).  Each round: sample `traj_batch`
    geometries, synthesize fresh trajectories on device, track them with
    the current params, then train both nets over every rollout state once
    (shuffled minibatches) plus `plain_steps` standard noise-perturbation
    batches (off-policy retention, the DAgger beta-mixing term).
    """
    from captra_tpu.data.synthetic import (
        device_pose_batch, device_trajectory_batch,
    )
    from captra_tpu.models.coordnet import CoordNet
    from captra_tpu.models.rotnet import RotNet

    coord_mod = CoordNet(cfg_track)
    rot_mod = RotNet(cfg_track)
    obj = cfg_track.obj
    G = pool["npcs"].shape[0]
    M = (traj_frames - 1) * traj_batch
    n_mb = M // minibatch
    if n_mb == 0:
        raise ValueError(f"minibatch {minibatch} exceeds rollout states {M}")

    def round_fn(coord_state, rot_state, key: jax.Array):
        k_geo, k_traj, k_init, k_perm, k_train, k_plain = \
            jax.random.split(key, 6)
        idx = jax.random.randint(k_geo, (traj_batch,), 0, G)
        geo = jax.tree.map(lambda x: x[idx], pool)
        traj = device_trajectory_batch(
            k_traj, geo["npcs"], geo["labels"], geo["corners"], obj,
            num_frames=traj_frames, motion_rad=motion_rad)

        cv = {"params": coord_state.params,
              "batch_stats": coord_state.batch_stats}
        rv = {"params": rot_state.params,
              "batch_stats": rot_state.batch_stats}
        init_pose = init_pose_from_gt(
            k_init, traj["pose"].map(lambda x: x[0]), cfg_track)
        states, roll_errs = collect_states(
            cfg_track,
            lambda p: coord_mod.apply(cv, p, train=False),
            lambda p, l: rot_mod.apply(rv, p, l, train=False),
            traj, init_pose)

        perm = jax.random.permutation(k_perm, M)[:n_mb * minibatch]
        mbs = jax.tree.map(
            lambda x: x[perm].reshape((n_mb, minibatch) + x.shape[1:]),
            states)

        def body(carry, inp):
            cs, rs = carry
            mb, k = inp
            kc, kr = jax.random.split(k)
            if freeze_coord:
                # rotation-only fine-tune: CoordNet passes through untouched
                # (the first experiment showed joint fine-tuning destabilizes
                # the NPCS scale fit — EVIDENCE.md round-3)
                closs = {"total_loss": jnp.zeros(())}
            else:
                cs, closs, _ = coord_trainer.train_step(cs, mb, kc)
            rs, rloss, rmet = rot_trainer.train_step(rs, mb, kr)
            return (cs, rs), {"coord_loss": closs["total_loss"],
                              "rot_loss": rloss["total_loss"],
                              "rot_rdiff": rmet["rdiff"]}

        (coord_state, rot_state), logs = jax.lax.scan(
            body, (coord_state, rot_state),
            (mbs, jax.random.split(k_train, n_mb)))
        logs = {k: jnp.mean(v) for k, v in logs.items()}

        if plain_steps:
            def plain_body(carry, k):
                cs, rs = carry
                ks, kp, kc, kr = jax.random.split(k, 4)
                pidx = jax.random.randint(ks, (minibatch,), 0, G)
                pgeo = jax.tree.map(lambda x: x[pidx], pool)
                pb = device_pose_batch(kp, pgeo["npcs"], pgeo["labels"],
                                       pgeo["corners"], obj)
                if not freeze_coord:
                    cs, _, _ = coord_trainer.train_step(cs, pb, kc)
                rs, _, _ = rot_trainer.train_step(rs, pb, kr)
                return (cs, rs), 0.0

            (coord_state, rot_state), _ = jax.lax.scan(
                plain_body, (coord_state, rot_state),
                jax.random.split(k_plain, plain_steps))

        logs.update({f"rollout_{k}": v for k, v in roll_errs.items()})
        return coord_state, rot_state, logs

    return jax.jit(round_fn)
