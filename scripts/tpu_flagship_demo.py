"""Full-size flagship demo on real TPU hardware: train CoordinateNet +
RotationNet (pointnet2_camera size, 4096 points) on synthetic bottle-like
data, compose them, track trajectories in the lax.scan loop, report accuracy
and throughput.

Run: python scripts/tpu_flagship_demo.py [--steps 600]
Writes results to runs/flagship_demo/ (checkpoints + EVIDENCE.txt).
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
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--track_trajs", type=int, default=8)
    ap.add_argument("--out", type=str, default="runs/flagship_demo")
    ap.add_argument("--category", type=str, default="1")
    ap.add_argument("--obj_config", type=str, default="obj_info_nocs.yml")
    ap.add_argument("--dtype", type=str, default="float32")
    ap.add_argument("--rot_steps", type=int, default=None)
    ap.add_argument("--grad_clip", type=float, default=None,
                    help="override optim grad_clip (None = config value)")
    ap.add_argument("--norm", default=None, choices=[None, "bn", "gn"],
                    help="override network/norm (gn: no train/eval BN gap)")
    ap.add_argument("--eval_at", type=str, default=None,
                    help="comma-separated step budgets: snapshot both nets "
                         "at each and track with every matched pair "
                         "(accuracy-vs-budget trend in one run)")
    ap.add_argument("--distinct_batches", type=int, default=157,
                    help="size of the cycled synthetic-batch pool "
                         "(training-data diversity knob)")
    ap.add_argument("--rot_perturb_r", type=float, default=None,
                    help="override pose_perturb/r (deg) for RotationNet "
                         "training only: match the delta-supervision scale "
                         "to the ~1-2 deg per-frame deltas tracking "
                         "actually sees, instead of the 5 deg init-noise "
                         "scale")
    ap.add_argument("--coord_perturb_r", type=float, default=None,
                    help="override pose_perturb/r (deg) for CoordNet "
                         "training only: tracking canonicalizes by the "
                         "DRIFTED carried pose (10-15 deg off mid-scan), "
                         "far outside the 5 deg init-noise train regime — "
                         "a wider perturbation trains the NPCS head to "
                         "stay accurate there (the absolute-fit lever)")
    ap.add_argument("--skip_coord", action="store_true", default=False,
                    help="load an existing <out>/canon_coord/ckpt "
                         "checkpoint instead of training the CoordNet "
                         "(rot-leg-only retrain after an interrupted run)")
    ap.add_argument("--device_aug", action="store_true", default=False,
                    help="device-side pose resampling: every step draws a "
                         "fresh random pose over an HBM-resident geometry "
                         "pool (unbounded pose diversity, zero host cost)")
    ap.add_argument("--geom_pool", type=int, default=512,
                    help="geometry pool size for --device_aug")
    args = ap.parse_args()
    eval_at = sorted({int(s) for s in args.eval_at.split(",")}) \
        if args.eval_at else []

    import jax
    import jax.numpy as jnp
    import numpy as np

    from captra_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from captra_tpu.config import get_config
    from captra_tpu.data.synthetic import (
        batch_trajectories, make_frame_batch, make_trajectory,
    )
    from captra_tpu.models.coordnet import CoordNet
    from captra_tpu.models.rotnet import RotNet
    from captra_tpu.pose.part_dof import Pose
    from captra_tpu.tracking.tracker import (
        evaluate_track, make_track_step, track_trajectory,
    )
    from captra_tpu.training import checkpoint as ckpt
    from captra_tpu.training.trainer import Trainer

    os.makedirs(args.out, exist_ok=True)
    report = {"steps": args.steps, "batch": args.batch}

    key = jax.random.PRNGKey(0)
    states = {}
    for net_type, config in (("canon_coord", "config_coordnet.yml"),
                             ("rot", "config_rotnet.yml")):
        overrides = {
            "obj_config": args.obj_config, "obj_category": args.category,
            "batch_size": args.batch,
            "network/compute_dtype": args.dtype}
        if args.grad_clip is not None:
            overrides["grad_clip"] = args.grad_clip
        if args.norm is not None:
            overrides["network/norm"] = args.norm
        if args.rot_perturb_r is not None and net_type == "rot":
            overrides["pose_perturb/r"] = args.rot_perturb_r
        if args.coord_perturb_r is not None and net_type == "canon_coord":
            overrides["pose_perturb/r"] = args.coord_perturb_r
        cfg = get_config(config, overrides=overrides)
        trainer = Trainer(cfg, steps_per_epoch=200)
        batch0 = make_frame_batch(0, cfg.obj, batch=args.batch,
                                  num_points=cfg.num_points)
        state = trainer.init_state(key, batch0)
        coord_ckpt = os.path.join(args.out, "canon_coord", "ckpt",
                                  "model_0000")
        if net_type == "canon_coord" and args.skip_coord \
                and os.path.exists(coord_ckpt):
            loaded = ckpt.load_checkpoint(coord_ckpt)
            state = state.replace(
                params=jax.tree.map(jnp.asarray, loaded["params"]),
                batch_stats=jax.tree.map(jnp.asarray,
                                         loaded["batch_stats"]))
            print("[canon_coord] loaded existing checkpoint "
                  f"({coord_ckpt}); skipping coord training", flush=True)
            report["canon_coord"] = {"final": {}, "sec": 0.0,
                                     "loaded": True}
            states["canon_coord"] = state
            states["canon_coord/snapshots"] = {}
            continue
        steps = args.steps if net_type == "canon_coord" else \
            (args.rot_steps or args.steps)
        steps = max([steps] + eval_at)
        t0 = time.time()
        k = key
        last = {}
        # distinct-batch pool; host generation is slow, so cache (the pool
        # size is the training-data-diversity knob for the budget trend)
        batch_cache = {}
        snapshots = {}  # budget -> host copy of (params, batch_stats)
        fused = None
        if args.device_aug:
            from captra_tpu.cli.train import make_device_aug_sampler
            sample = make_device_aug_sampler(
                cfg, args.geom_pool,
                pool_seed=0 if net_type == "canon_coord" else 1)
            # ONE dispatch per step: the sampler inlines into the train
            # step under a single jit — through the remote-dispatch tunnel
            # the separate sampler dispatch cost ~15 ms/step (47 vs 32)
            fused = jax.jit(lambda st, skey, tkey:
                            trainer.train_step(st, sample(skey), tkey))
        for i in range(steps):
            k, sub = jax.random.split(k)
            if fused is not None:
                state, loss, metrics = fused(
                    state, jax.random.fold_in(jax.random.PRNGKey(42), i),
                    sub)
            else:
                ci = i % args.distinct_batches
                if ci not in batch_cache:
                    batch_cache[ci] = make_frame_batch(
                        ci, cfg.obj, batch=args.batch,
                        num_points=cfg.num_points)
                b = batch_cache[ci]
                state, loss, metrics = trainer.train_step(state, b, sub)
            if (i + 1) in eval_at:
                snapshots[i + 1] = jax.tree.map(
                    np.asarray, (state.params, state.batch_stats))
            if i % 100 == 0 or i == steps - 1:
                last = {kk: float(vv) for kk, vv in
                        {**loss, **metrics}.items()}
                print(f"[{net_type}] step {i}: total="
                      f"{last['total_loss']:.4f} "
                      f"5d5cm={last.get('5deg5cm', 0):.3f} "
                      f"rdiff={last.get('rdiff', 0):.2f}", flush=True)
        dt = time.time() - t0
        print(f"[{net_type}] {steps} steps in {dt:.1f}s "
              f"({dt / steps * 1e3:.0f} ms/step)", flush=True)
        report[net_type] = {"final": last, "sec": round(dt, 1)}
        ckpt.save_checkpoint(os.path.join(args.out, net_type, "ckpt"),
                             epoch=0, state=state)
        states[net_type] = state
        states[net_type + "/snapshots"] = snapshots

    # --- tracking ---------------------------------------------------------
    track_overrides = {
        "obj_config": args.obj_config, "obj_category": args.category,
        "init_frame/gt": True, "network/compute_dtype": args.dtype}
    if args.norm is not None:
        track_overrides["network/norm"] = args.norm
    cfg = get_config("config_track.yml", overrides=track_overrides)
    coord, rotn = CoordNet(cfg), RotNet(cfg)
    cv = {"params": states["canon_coord"].params,
          "batch_stats": states["canon_coord"].batch_stats}
    rv = {"params": states["rot"].params,
          "batch_stats": states["rot"].batch_stats}

    # weights enter the jit as ARGUMENTS (not closure constants): remote
    # execution layers may cache (program, inputs) pairs, and a
    # constant-folded program with identical explicit inputs across runs
    # can be served stale results
    def track_fn(cv, rv, ip, frames):
        step = make_track_step(
            cfg, lambda p: coord.apply(cv, p, train=False),
            lambda p, l: rotn.apply(rv, p, l, train=False))
        return track_trajectory(step, ip, frames)

    T = 20
    trajs = [make_trajectory(seed=1000 + s, obj=cfg.obj, num_frames=T,
                             num_points=cfg.num_points)
             for s in range(args.track_trajs)]
    data = batch_trajectories(trajs)
    gt = data["pose"]
    init_pose = Pose(rotation=gt.rotation[0], translation=gt.translation[0],
                     scale=gt.scale[0])
    run = jax.jit(track_fn)
    out = run(cv, rv, init_pose, {"points": data["points"]})
    jax.block_until_ready(out)
    # the timed dispatch must differ from the warm-up: identical
    # (program, input) pairs can be served from the tunnel's result cache
    pts_timed = data["points"] + jnp.float32(1e-9)
    t0 = time.perf_counter()
    final, aux = run(cv, rv, init_pose, {"points": pts_timed})
    jax.block_until_ready(aux.pose.scale)
    dt = time.perf_counter() - t0
    fps = (T - 1) * args.track_trajs / dt

    gt_rest = gt.map(lambda x: x[1:])
    errs = evaluate_track(aux.pose, gt_rest, sym=cfg.obj.sym)
    tracked = {kk: float(jnp.mean(vv)) for kk, vv in errs.items()}
    # first tracked frame separates per-frame fit quality from drift cascade
    report["tracking_frame1"] = {kk: float(jnp.mean(vv[0]))
                                 for kk, vv in errs.items()}
    print("frame-1    ", {k: round(v, 4) for k, v in
                          report["tracking_frame1"].items()})
    frozen = Pose(rotation=jnp.repeat(gt.rotation[:1], T - 1, 0),
                  translation=jnp.repeat(gt.translation[:1], T - 1, 0),
                  scale=jnp.repeat(gt.scale[:1], T - 1, 0))
    fr = evaluate_track(frozen, gt_rest, sym=cfg.obj.sym)
    frozen_m = {kk: float(jnp.mean(vv)) for kk, vv in fr.items()}

    report["tracking"] = {"fps_per_chip": round(fps, 1),
                          "tracked": tracked, "frozen_init": frozen_m}
    print(f"\ntracking: {fps:.1f} frames/s/chip")
    print("tracked    ", {k: round(v, 4) for k, v in tracked.items()})
    print("frozen-init", {k: round(v, 4) for k, v in frozen_m.items()})

    # --- accuracy-vs-budget trend: track with every snapshot pair ---------
    # (weights are jit ARGUMENTS, so each budget reuses the compiled scan)
    coord_snaps = states["canon_coord/snapshots"]
    rot_snaps = states["rot/snapshots"]
    trend = {}
    for budget in sorted(set(coord_snaps) & set(rot_snaps)):
        cparams, cstats = coord_snaps[budget]
        rparams, rstats = rot_snaps[budget]
        cvb = jax.tree.map(jnp.asarray, {"params": cparams,
                                         "batch_stats": cstats})
        rvb = jax.tree.map(jnp.asarray, {"params": rparams,
                                         "batch_stats": rstats})
        _, aux_b = run(cvb, rvb, init_pose, {"points": data["points"]})
        errs_b = evaluate_track(aux_b.pose, gt_rest, sym=cfg.obj.sym)
        trend[budget] = {
            "frame1": {kk: float(jnp.mean(vv[0]))
                       for kk, vv in errs_b.items()},
            "full": {kk: float(jnp.mean(vv)) for kk, vv in errs_b.items()},
        }
        print(f"budget {budget}: frame1 rdiff="
              f"{trend[budget]['frame1'].get('rdiff', 0):.2f} "
              f"full rdiff={trend[budget]['full'].get('rdiff', 0):.2f} "
              f"full 5d5cm={trend[budget]['full'].get('5deg5cm', 0):.3f}",
              flush=True)
    if trend:
        report["trend"] = trend

    with open(os.path.join(args.out, "EVIDENCE.json"), "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", os.path.join(args.out, "EVIDENCE.json"))


if __name__ == "__main__":
    main()
