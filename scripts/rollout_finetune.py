"""On-policy (DAgger-style) rollout fine-tuning experiment driver.

Loads trained CoordNet + RotationNet checkpoints, runs fused fine-tune
rounds (training/rollout.py: on-device trajectory synthesis -> tracking
scan -> train both nets on the harvested carried-pose states — ONE dispatch
per round), and evaluates tracking quality on the held-out synthetic eval
set (seeds 1000+, the eval_checkpoint_track.py protocol) at the requested
round budgets.  Writes EVIDENCE.json with the trend.

Usage:
  python scripts/rollout_finetune.py \
      --coord runs/trend_bottle_aug/canon_coord/ckpt/model_0000 \
      --rot   runs/trend_bottle_aug/rot/ckpt/model_0000 \
      --out runs/rollout_ft_bottle [--rounds 100 --eval_at 25,50,100]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coord", required=True)
    ap.add_argument("--rot", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--obj_config", default="obj_info_nocs.yml")
    ap.add_argument("--category", default="1")
    ap.add_argument("--rounds", type=int, default=100)
    ap.add_argument("--eval_at", type=str, default=None,
                    help="comma-separated round budgets to evaluate at "
                         "(default: just the final round)")
    ap.add_argument("--traj_batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--minibatch", type=int, default=12)
    ap.add_argument("--plain_steps", type=int, default=0,
                    help="standard noise-perturbation steps per round "
                         "(off-policy retention mixing)")
    ap.add_argument("--freeze_coord", action="store_true",
                    help="fine-tune RotationNet only (CoordNet frozen)")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--geom_pool", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--norm", default="gn", choices=["bn", "gn"])
    ap.add_argument("--motion_rad", type=float, default=0.03)
    ap.add_argument("--eval_trajs", type=int, default=8)
    ap.add_argument("--eval_frames", type=int, default=20)
    args = ap.parse_args()
    eval_at = sorted({int(s) for s in args.eval_at.split(",")}) \
        if args.eval_at else [args.rounds]
    # budgets past --rounds would silently never fire, and rounds after the
    # last budget would train without ever being evaluated or checkpointed
    # (snapshots happen only at eval rounds) — reconcile loudly instead
    if eval_at[-1] != args.rounds:
        bad = [b for b in eval_at if b > args.rounds]
        if bad:
            ap.error(f"--eval_at budgets {bad} exceed --rounds={args.rounds}")
        print(f"# note: appending final budget {args.rounds} to eval_at "
              f"(rounds after {eval_at[-1]} would otherwise be discarded)")
        eval_at.append(args.rounds)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from captra_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from captra_tpu.config import get_config
    from captra_tpu.data.synthetic import (
        batch_trajectories, geometry_pool, make_frame_batch, make_trajectory,
    )
    from captra_tpu.models.coordnet import CoordNet
    from captra_tpu.models.rotnet import RotNet
    from captra_tpu.tracking.tracker import (
        evaluate_track, init_pose_from_gt, make_track_step, track_trajectory,
    )
    from captra_tpu.training import checkpoint as ckpt
    from captra_tpu.training.rollout import make_finetune_round
    from captra_tpu.training.trainer import Trainer

    os.makedirs(args.out, exist_ok=True)

    common = {"obj_config": args.obj_config, "obj_category": args.category,
              "network/compute_dtype": args.dtype,
              "network/norm": args.norm,
              "learning_rate": args.lr, "lr_step_size": 10_000}
    cfg_track = get_config("config_track.yml", overrides={
        **common, "init_frame/gt": True})
    obj = cfg_track.obj

    trainers, states = {}, {}
    for net_type, config, path in (
            ("canon_coord", "config_coordnet.yml", args.coord),
            ("rot", "config_rotnet.yml", args.rot)):
        cfg = get_config(config, overrides=common)
        tr = Trainer(cfg, steps_per_epoch=10_000)
        b0 = make_frame_batch(0, obj, batch=args.minibatch,
                              num_points=cfg.num_points)
        st = tr.init_state(jax.random.PRNGKey(0), b0)
        payload = ckpt.load_checkpoint(path)
        st = st.replace(
            params=jax.tree.map(jnp.asarray, payload["params"]),
            batch_stats=jax.tree.map(jnp.asarray, payload["batch_stats"]))
        trainers[net_type], states[net_type] = tr, st

    pool = geometry_pool(seed=0, obj=obj, count=args.geom_pool,
                         num_points=cfg_track.num_points)
    round_fn = make_finetune_round(
        cfg_track, trainers["canon_coord"], trainers["rot"], pool,
        traj_batch=args.traj_batch, traj_frames=args.frames,
        minibatch=args.minibatch, plain_steps=args.plain_steps,
        motion_rad=args.motion_rad, freeze_coord=args.freeze_coord)

    # held-out eval set (generator seeds disjoint from the training pool)
    T, B = args.eval_frames, args.eval_trajs
    trajs = [make_trajectory(seed=1000 + s, obj=obj, num_frames=T,
                             num_points=cfg_track.num_points)
             for s in range(B)]
    data = batch_trajectories(trajs)
    gt = data["pose"]
    init_pose = init_pose_from_gt(jax.random.PRNGKey(0),
                                  gt.map(lambda x: x[0]), cfg_track)
    gt_rest = gt.map(lambda x: x[1:])
    coord_mod, rot_mod = CoordNet(cfg_track), RotNet(cfg_track)

    def track_fn(cv, rv, ip, frames):
        step = make_track_step(
            cfg_track, lambda p: coord_mod.apply(cv, p, train=False),
            lambda p, l: rot_mod.apply(rv, p, l, train=False))
        return track_trajectory(step, ip, frames)

    run_eval = jax.jit(track_fn)

    def eval_now(tag):
        cv = {"params": states["canon_coord"].params,
              "batch_stats": states["canon_coord"].batch_stats}
        rv = {"params": states["rot"].params,
              "batch_stats": states["rot"].batch_stats}
        _, aux = run_eval(cv, rv, init_pose, {"points": data["points"]})
        errs = evaluate_track(aux.pose, gt_rest, sym=obj.sym)
        out = {"frame1": {k: float(jnp.mean(v[0])) for k, v in errs.items()},
               "full": {k: float(jnp.mean(v)) for k, v in errs.items()}}
        print(f"[eval @{tag}] frame1 rdiff={out['frame1']['rdiff']:.3f} "
              f"full rdiff={out['full']['rdiff']:.2f} "
              f"5d5cm={out['full']['5deg5cm']:.3f} "
              f"tdiff={out['full']['tdiff']:.4f} "
              f"sdiff={out['full']['sdiff']:.4f}", flush=True)
        return out

    report = {"args": vars(args), "trend": {}}
    report["trend"]["0"] = eval_now(0)

    base = jax.random.PRNGKey(7)
    t0 = time.time()
    for r in range(1, args.rounds + 1):
        states["canon_coord"], states["rot"], logs = round_fn(
            states["canon_coord"], states["rot"], jax.random.fold_in(base, r))
        if r % 5 == 0 or r == 1:
            logs = {k: float(v) for k, v in logs.items()}
            print(f"round {r}: coord_loss={logs['coord_loss']:.4f} "
                  f"rot_loss={logs['rot_loss']:.4f} "
                  f"rot_rdiff={logs['rot_rdiff']:.3f} "
                  f"rollout_rdiff={logs['rollout_rdiff']:.2f} "
                  f"rollout_5d5cm={logs['rollout_5deg5cm']:.3f} "
                  f"({(time.time() - t0) / r:.2f}s/round)", flush=True)
        if r in eval_at:
            report["trend"][str(r)] = eval_now(r)
            for net_type in ("canon_coord", "rot"):
                ckpt.save_checkpoint(
                    os.path.join(args.out, f"round_{r}", net_type, "ckpt"),
                    epoch=0, state=states[net_type])

    with open(os.path.join(args.out, "EVIDENCE.json"), "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", os.path.join(args.out, "EVIDENCE.json"))


if __name__ == "__main__":
    main()
