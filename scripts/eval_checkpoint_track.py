"""Track the synthetic eval set with trained checkpoints under arbitrary
track flags — the quality-experiment harness behind the EVIDENCE.md round-3
tables (budget trend, device-aug, conf-weighted delta).

Usage:
  python scripts/eval_checkpoint_track.py \
      --coord runs/trend_bottle_aug/canon_coord/ckpt/model_0000 \
      --rot   runs/trend_bottle_aug/rot/ckpt/model_0000 \
      [--category 1 --obj_config obj_info_nocs.yml] \
      [--trajs 8 --frames 20] [--conf_weighted_delta] [--scale_clamp 0.0]

Prints frame-1 and full-scan metrics (rdiff/tdiff/sdiff/5deg5cm/10deg10cm)
plus the frozen-init baseline.
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coord", required=True,
                    help="CoordNet checkpoint path (training.checkpoint)")
    ap.add_argument("--rot", required=True, help="RotationNet checkpoint")
    ap.add_argument("--obj_config", default="obj_info_nocs.yml")
    ap.add_argument("--category", default="1")
    ap.add_argument("--trajs", type=int, default=8)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--norm", default="gn", choices=["bn", "gn"])
    ap.add_argument("--conf_weighted_delta", action="store_true")
    ap.add_argument("--scale_clamp", type=float, default=0.0)
    ap.add_argument("--refine_iters", type=int, default=1)
    ap.add_argument("--refine_mode", default="debias",
                    choices=["forward", "debias"])
    ap.add_argument("--rot_fit", default="delta",
                    choices=["delta", "npcs", "fused"])
    ap.add_argument("--rot_fit_alpha", type=float, default=0.5)
    ap.add_argument("--delta_gain", type=str, default="1.0",
                    help="amplify the regressed delta's rotation angle "
                         "(track_cfg/delta_gain); comma-separated values "
                         "sweep in one process")
    ap.add_argument("--fit_ransac", type=int, default=0,
                    help="RANSAC hypotheses for the tracking-time fits "
                         "(track_cfg/fit_ransac)")
    ap.add_argument("--fit_ransac_th", type=float, default=0.01)
    ap.add_argument("--motion_model", default="none",
                    choices=["none", "const_vel"])
    ap.add_argument("--motion_gain", type=float, default=0.8)
    ap.add_argument("--motion_beta", type=float, default=0.5)
    ap.add_argument("--quality_profile", default="reference",
                    choices=["reference", "best"],
                    help="category-aware preset (track_cfg/quality_profile);"
                         " explicitly-passed track flags still win")
    ap.add_argument("--sweep", default=None,
                    help="semicolon-separated rot_fit:refine_iters"
                         "[:refine_mode] specs evaluated in one process "
                         "(e.g. 'delta:1;npcs:1;npcs:3:forward'); "
                         "overrides --rot_fit/--refine_*")
    ap.add_argument("--eval_seed_base", type=int, default=1000,
                    help="trajectory seed base for the eval set; vary to "
                         "measure stack-ranking noise across eval draws")
    ap.add_argument("--init_noise", action="store_true",
                    help="perturb the frame-0 pose (reference protocol "
                         "init_frame/gt=False) instead of GT init")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from captra_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from captra_tpu.config import get_config
    from captra_tpu.data.synthetic import batch_trajectories, make_trajectory
    from captra_tpu.models.coordnet import CoordNet
    from captra_tpu.models.rotnet import RotNet
    from captra_tpu.pose.part_dof import Pose
    from captra_tpu.tracking.tracker import (
        evaluate_track, init_pose_from_gt, make_track_step, track_trajectory,
    )
    from captra_tpu.training import checkpoint as ckpt

    def vars_of(path):
        p = ckpt.load_checkpoint(path)
        return {"params": jax.tree.map(jnp.asarray, p["params"]),
                "batch_stats": jax.tree.map(jnp.asarray, p["batch_stats"])}

    cv, rv = vars_of(args.coord), vars_of(args.rot)
    # track flags enter the config only when explicitly passed, so the
    # quality_profile preset can fill the rest (explicit always wins)
    track_keys = ("conf_weighted_delta", "scale_clamp", "refine_iters",
                  "refine_mode", "rot_fit", "rot_fit_alpha", "fit_ransac",
                  "fit_ransac_th", "motion_model", "motion_gain",
                  "motion_beta", "quality_profile")
    overrides = {
        "obj_config": args.obj_config, "obj_category": args.category,
        "init_frame/gt": not args.init_noise,
        "network/compute_dtype": args.dtype, "network/norm": args.norm,
    }
    for k in track_keys:
        if getattr(args, k) != ap.get_default(k):
            overrides[f"track_cfg/{k}"] = getattr(args, k)
    cfg = get_config("config_track.yml", overrides=overrides)
    gains = [float(g) for g in args.delta_gain.split(",")]

    T, B = args.frames, args.trajs
    trajs = [make_trajectory(seed=args.eval_seed_base + s, obj=cfg.obj,
                             num_frames=T,
                             num_points=cfg.num_points) for s in range(B)]
    data = batch_trajectories(trajs)
    gt = data["pose"]
    init_pose = init_pose_from_gt(jax.random.PRNGKey(0), gt.map(
        lambda x: x[0]), cfg)
    gt_rest = gt.map(lambda x: x[1:])

    coord, rotn = CoordNet(cfg), RotNet(cfg)

    frozen = Pose(rotation=jnp.repeat(gt.rotation[:1], T - 1, 0),
                  translation=jnp.repeat(gt.translation[:1], T - 1, 0),
                  scale=jnp.repeat(gt.scale[:1], T - 1, 0))
    fr = {k: float(jnp.mean(v)) for k, v in
          evaluate_track(frozen, gt_rest, sym=cfg.obj.sym).items()}

    import dataclasses
    variants = [(f"gain={g}" if len(gains) > 1 else "",
                 {"delta_gain": g}) for g in gains]
    if args.sweep:
        variants = []
        for spec in args.sweep.split(";"):
            parts = spec.split(":")
            rep = {"rot_fit": parts[0],
                   "refine_iters": int(parts[1]) if len(parts) > 1 else 1}
            if len(parts) > 2:
                rep["refine_mode"] = parts[2]
            variants.append((spec, rep))
    for tag0, rep in variants:
        cfg_g = cfg.replace(track=dataclasses.replace(cfg.track, **rep))

        def track_fn(cv, rv, ip, frames, cfg_g=cfg_g):
            step = make_track_step(
                cfg_g, lambda p: coord.apply(cv, p, train=False),
                lambda p, l: rotn.apply(rv, p, l, train=False))
            return track_trajectory(step, ip, frames)

        run = jax.jit(track_fn)
        t0 = time.time()
        _, aux = run(cv, rv, init_pose, {"points": data["points"]})
        jax.block_until_ready(aux.pose.scale)
        errs = evaluate_track(aux.pose, gt_rest, sym=cfg.obj.sym)
        f1 = {k: float(jnp.mean(v[0])) for k, v in errs.items()}
        full = {k: float(jnp.mean(v)) for k, v in errs.items()}
        tag = f"[{tag0}] " if tag0 else ""
        print(f"{tag}({time.time() - t0:.0f}s incl. compile)")
        print(tag + "frame-1    ", {k: round(v, 4) for k, v in f1.items()})
        print(tag + "full-scan  ", {k: round(v, 4) for k, v in full.items()})
    print("frozen-init", {k: round(v, 4) for k, v in fr.items()})


if __name__ == "__main__":
    main()
