"""End-to-end learning smoke: train tiny CoordNet + RotationNet on synthetic
single-category data, then track trajectories with the trained nets and
compare against (a) untrained nets and (b) the frozen init pose.

Run: python scripts/smoke_train_track.py [--steps 300] [--cpu]
This is evidence that the full pipeline (data -> train -> compose -> scan
-> eval) learns; it is not part of the default pytest run (minutes-long).
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--num_points", type=int, default=256)
    args = ap.parse_args()

    if args.cpu:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from captra_tpu.config.schema import (
        Config, NetworkCfg, ObjCfg, PointNetCfg, SAMsgCfg, TrackCfg,
    )
    from captra_tpu.data.synthetic import (
        batch_trajectories, make_frame_batch, make_trajectory,
    )
    from captra_tpu.models.coordnet import CoordNet
    from captra_tpu.models.rotnet import RotNet
    from captra_tpu.pose.part_dof import Pose
    from captra_tpu.tracking.tracker import (
        evaluate_track, make_track_step, track_trajectory,
    )
    from captra_tpu.training.trainer import Trainer

    pn = PointNetCfg(
        sa1=SAMsgCfg(npoint=64, radius_list=(0.1, 0.2), nsample_list=(16, 32),
                     mlp_list=((16, 32), (16, 32))),
        sa2=SAMsgCfg(npoint=16, radius_list=(0.4,), nsample_list=(16,),
                     mlp_list=((32, 64),)),
        sa3_mlp=(64, 128), fp3_mlp=(64,), fp2_mlp=(64,), fp1_mlp=(64,),
    )
    obj = ObjCfg(num_parts=1, num_joints=0, tree=(-1,), extra_dims=0)
    base = Config(obj=obj, pointnet=pn, num_points=args.num_points,
                  batch_size=8, track=TrackCfg(init_frame_gt=True))

    key = jax.random.PRNGKey(0)
    states = {}
    for net_type in ("canon_coord", "rot"):
        cfg = base.replace(network=NetworkCfg(
            type=net_type, backbone_out_dim=64, nocs_head_dims=(64,)))
        trainer = Trainer(cfg, steps_per_epoch=100)
        batch0 = make_frame_batch(0, obj, batch=8,
                                  num_points=args.num_points)
        state = trainer.init_state(key, batch0)
        states[net_type + "_untrained"] = (trainer, state)
        t0 = time.time()
        k = key
        for i in range(args.steps):
            batch = make_frame_batch(i % 37, obj, batch=8,
                                     num_points=args.num_points)
            k, sub = jax.random.split(k)
            state, loss, metrics = trainer.train_step(state, batch, sub)
            if i % 50 == 0:
                print(f"[{net_type}] step {i}: total={float(loss['total_loss']):.4f} "
                      f"5d5cm={float(metrics['5deg5cm']):.3f}", flush=True)
        print(f"[{net_type}] {args.steps} steps in {time.time()-t0:.1f}s")
        states[net_type] = (trainer, state)

    # --- tracking with trained vs untrained nets --------------------------
    track_cfg = base.replace(network=NetworkCfg(
        type="rot_coord_track", backbone_out_dim=64, nocs_head_dims=(64,)))
    trajs = [make_trajectory(seed=100 + s, obj=obj, num_frames=15,
                             num_points=args.num_points) for s in range(4)]
    data = batch_trajectories(trajs)
    gt = data["pose"]
    init_pose = Pose(rotation=gt.rotation[0], translation=gt.translation[0],
                     scale=gt.scale[0])

    def run_track(coord_state, rot_state):
        coord = CoordNet(track_cfg)
        rotn = RotNet(track_cfg)
        cv = {"params": coord_state.params,
              "batch_stats": coord_state.batch_stats}
        rv = {"params": rot_state.params,
              "batch_stats": rot_state.batch_stats}
        step = make_track_step(
            track_cfg, lambda p: coord.apply(cv, p, train=False),
            lambda p, l: rotn.apply(rv, p, l, train=False))
        _, aux = jax.jit(lambda ip, fr: track_trajectory(step, ip, fr))(
            init_pose, {"points": data["points"]})
        gt_rest = gt.map(lambda x: x[1:])
        errs = evaluate_track(aux.pose, gt_rest, sym=False)
        return {kk: float(jnp.mean(vv)) for kk, vv in errs.items()}

    trained = run_track(states["canon_coord"][1], states["rot"][1])
    untrained = run_track(states["canon_coord_untrained"][1],
                          states["rot_untrained"][1])
    # frozen-init baseline: keep the frame-0 pose for every frame
    frozen = Pose(rotation=jnp.repeat(gt.rotation[:1], 14, 0),
                  translation=jnp.repeat(gt.translation[:1], 14, 0),
                  scale=jnp.repeat(gt.scale[:1], 14, 0))
    gt_rest = gt.map(lambda x: x[1:])
    froz = evaluate_track(frozen, gt_rest, sym=False)
    froz = {kk: float(jnp.mean(vv)) for kk, vv in froz.items()}

    print("\n=== tracking results (mean over 4 trajs x 14 frames) ===")
    for name, d in (("trained", trained), ("untrained", untrained),
                    ("frozen-init", froz)):
        print(f"{name:12s} rdiff={d['rdiff']:7.3f}deg tdiff={d['tdiff']:.4f} "
              f"sdiff={d['sdiff']:.4f} 5d5cm={d['5deg5cm']:.3f}")
    assert trained["tdiff"] < froz["tdiff"], "training did not help tdiff"
    print("OK: trained tracker beats the frozen-init baseline")


if __name__ == "__main__":
    main()
