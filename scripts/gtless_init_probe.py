"""GT-less frame-0 init operating envelope (round-3 verdict item 9).

`tracking/tracker.py::init_pose_from_cloud` (cloud mean + covering-radius
scale + IDENTITY rotation) is this framework's init for real captures
without annotation JSONs — a capability the reference lacks (its
EvalTrackModel always receives gt_part at frame 0, model.py:390-400), so
there is no reference oracle.  This probe measures the consequence of the
identity-rotation guess directly: synthetic scans with KNOWN GT whose
frame-0 orientation is re-posed to a controlled angle theta from identity,
tracked from the cloud-only init, evaluated against GT.

  python scripts/gtless_init_probe.py --coord ... --rot ... \
      [--category 1] [--thetas 0,10,20,30,45,60,90]

Prints per-theta frame-1 / full-scan metrics plus the GT-init reference row.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _axis_angle(axis, theta):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return (np.eye(3) + np.sin(theta) * K +
            (1 - np.cos(theta)) * (K @ K)).astype(np.float32)


def repose_to_theta(data, theta_deg, rng):
    """Rigidly re-pose the whole scan (camera frame, pivot = frame-0 root
    translation) so the frame-0 root rotation sits exactly theta degrees
    from identity: R' = Q R, t' = Q (t - t0) + t0, pts' likewise."""
    import jax.numpy as jnp
    from captra_tpu.pose.part_dof import Pose

    gt = data["pose"]
    R = np.asarray(gt.rotation)          # [T, B, P, 3, 3]
    t = np.asarray(gt.translation)       # [T, B, P, 3, 1]
    pts = np.asarray(data["points"])     # [T, B, N, 3]
    T, B, P = R.shape[:3]
    root = 0
    R2, t2, pts2 = R.copy(), t.copy(), pts.copy()
    for b in range(B):
        R0 = R[0, b, root]
        ax = rng.randn(3)
        target = _axis_angle(ax, np.deg2rad(theta_deg))
        Q = target @ R0.T                # frame-0 root -> exactly theta
        pivot = t[0, b, root, :, 0]
        R2[:, b] = np.einsum("ij,tpjk->tpik", Q, R[:, b])
        t2[:, b] = np.einsum(
            "ij,tpjk->tpik", Q, t[:, b] - pivot[None, None, :, None]) \
            + pivot[None, None, :, None]
        pts2[:, b] = (pts[:, b] - pivot) @ Q.T + pivot
    pose = Pose(rotation=jnp.asarray(R2), translation=jnp.asarray(t2),
                scale=gt.scale)
    return {"points": jnp.asarray(pts2), "pose": pose}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coord", required=True)
    ap.add_argument("--rot", required=True)
    ap.add_argument("--obj_config", default="obj_info_nocs.yml")
    ap.add_argument("--category", default="1")
    ap.add_argument("--trajs", type=int, default=8)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--norm", default="gn", choices=["bn", "gn"])
    ap.add_argument("--thetas", default="0,10,20,30,45,60,90")
    ap.add_argument("--init_search", type=int, default=0,
                    help="K>0 runs the frame-0 orientation search "
                         "(track_cfg/init_search) on the cloud init rows")
    ap.add_argument("--init_search_steps", type=int, default=2)
    ap.add_argument("--init_search_tau", type=float, default=10.0,
                    help="mode-clustering radius in degrees (<=0 = the "
                         "rejected v1/v2 pure-residual selection)")
    ap.add_argument("--init_search_scorer", default="mode",
                    choices=["mode", "basin"],
                    help="basin = the supervised basin-confidence head "
                         "(--coord must be a checkpoint fine-tuned by "
                         "scripts/train_basin_head.py)")
    ap.add_argument("--quality_profile", default="reference",
                    choices=["reference", "best"])
    ap.add_argument("--out", default=None, help="optional JSON report path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from captra_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from captra_tpu.config import get_config
    from captra_tpu.data.synthetic import batch_trajectories, make_trajectory
    from captra_tpu.models.coordnet import CoordNet
    from captra_tpu.models.rotnet import RotNet
    from captra_tpu.tracking.tracker import (
        evaluate_track, init_pose_from_cloud, init_pose_from_gt,
        make_track_step, search_init_orientation, track_trajectory,
    )
    from captra_tpu.training import checkpoint as ckpt

    def vars_of(path):
        p = ckpt.load_checkpoint(path)
        return {"params": jax.tree.map(jnp.asarray, p["params"]),
                "batch_stats": jax.tree.map(jnp.asarray, p["batch_stats"])}

    cv, rv = vars_of(args.coord), vars_of(args.rot)
    cfg = get_config("config_track.yml", overrides={
        "obj_config": args.obj_config, "obj_category": args.category,
        "init_frame/gt": True, "network/compute_dtype": args.dtype,
        "network/norm": args.norm,
        "track_cfg/init_search": args.init_search,
        "track_cfg/init_search_steps": args.init_search_steps,
        "track_cfg/init_search_tau": args.init_search_tau,
        "track_cfg/init_search_scorer": args.init_search_scorer,
        "network/basin_head": args.init_search_scorer == "basin",
        "track_cfg/quality_profile": args.quality_profile})
    coord, rotn = CoordNet(cfg), RotNet(cfg)

    search = None
    if args.init_search > 0:
        search = jax.jit(lambda cv, pts, ip: search_init_orientation(
            lambda p: coord.apply(cv, p, train=False), pts, ip, cfg))

    def track_fn(cv, rv, ip, frames):
        step = make_track_step(
            cfg, lambda p: coord.apply(cv, p, train=False),
            lambda p, l: rotn.apply(rv, p, l, train=False))
        return track_trajectory(step, ip, frames)

    run = jax.jit(track_fn)

    T, B = args.frames, args.trajs
    trajs = [make_trajectory(seed=1000 + s, obj=cfg.obj, num_frames=T,
                             num_points=cfg.num_points) for s in range(B)]
    base = batch_trajectories(trajs)
    rng = np.random.RandomState(7)

    report = {"args": vars(args), "rows": []}

    def eval_run(tag, init_pose, data):
        gt_rest = data["pose"].map(lambda x: x[1:])
        t0 = time.time()
        _, aux = run(cv, rv, init_pose, {"points": data["points"]})
        jax.block_until_ready(aux.pose.scale)
        errs = evaluate_track(aux.pose, gt_rest, sym=cfg.obj.sym)
        f1 = {k: round(float(jnp.mean(v[0])), 4) for k, v in errs.items()}
        full = {k: round(float(jnp.mean(v)), 4) for k, v in errs.items()}
        print(f"[{tag}] ({time.time() - t0:.0f}s) frame-1 {f1}")
        print(f"[{tag}]        full-scan {full}", flush=True)
        report["rows"].append({"tag": tag, "frame1": f1, "full": full})

    # reference rows: GT init on the unmodified scan
    gt0 = base["pose"].map(lambda x: x[0])
    eval_run("gt-init", init_pose_from_gt(jax.random.PRNGKey(0), gt0, cfg),
             base)
    def cloud_init(data):
        ip = init_pose_from_cloud(data["points"][0], cfg.obj.num_parts,
                                  cfg.data_radius)
        if search is not None:
            ip = search(cv, data["points"][0], ip)
        return ip

    # cloud init on the unmodified scan (theta = whatever the random draw is)
    eval_run("cloud-init/raw-draw", cloud_init(base), base)

    for theta in [float(x) for x in args.thetas.split(",")]:
        data = repose_to_theta(base, theta, rng)
        eval_run(f"cloud-init/theta={theta:g}", cloud_init(data), data)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
