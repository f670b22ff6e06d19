"""Diagnose frame-0 orientation-search scorers against ground truth.

The v1 scorer (camera-space similarity-fit residual) picked essentially
random candidates (EVIDENCE.md round 5, "v1 scorer: REJECTED").  This
probe measures, on a REAL trained CoordNet, how each candidate scorer
varies with the candidate's true angular offset from GT:

  residual  — v1: camera-space fit residual after the descent passes
  drift     — geodesic angle between candidate rotation and its pass-1 fit
  spread    — perturbation-disagreement: re-canonicalize each candidate by
              J known in-basin rotations delta; in-basin candidates give
              equivariant predictions whose fits AGREE (spread ~ 0), while
              out-of-basin "copy the input" predictions make each perturbed
              copy fit back to its own input pose (spread ~ |delta|)

For each scorer it prints the mean score per offset bucket and the argmin
candidate's true offset per trajectory (the number that matters: does the
scorer select a near-GT candidate?).

  python scripts/init_search_scorer_diag.py \
      --coord runs/q4_n1_r5/canon_coord/ckpt/model_0000 \
      --rot runs/q4_n1_r5/rot/ckpt/model_0000
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def _axis_angle(rng, theta_deg):
    ax = rng.randn(3)
    ax = ax / np.linalg.norm(ax)
    th = np.deg2rad(theta_deg)
    K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]],
                  [-ax[1], ax[0], 0]])
    return (np.eye(3) + np.sin(th) * K +
            (1 - np.cos(th)) * (K @ K)).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coord", required=True)
    ap.add_argument("--rot", required=True)  # unused; kept arg-compatible
    ap.add_argument("--obj_config", default="obj_info_nocs.yml")
    ap.add_argument("--category", default="1")
    ap.add_argument("--trajs", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--norm", default="gn")
    ap.add_argument("--offsets", default="0,10,20,30,60,90,120,180")
    ap.add_argument("--perturb_j", type=int, default=4)
    ap.add_argument("--perturb_deg", type=float, default=12.0)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from captra_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from captra_tpu.config import get_config
    from captra_tpu.data.synthetic import batch_trajectories, make_trajectory
    from captra_tpu.models.coordnet import CoordNet
    from captra_tpu.pose.part_dof import Pose
    from captra_tpu.pose.pose_fit import filter_valid, labels_to_part_mask
    from captra_tpu.pose.procrustes import similarity_fit
    from captra_tpu.tracking.tracker import (canonicalize,
                                             init_pose_from_cloud, tree_root)
    from captra_tpu.training import checkpoint as ckpt

    p = ckpt.load_checkpoint(args.coord)
    cv = {"params": jax.tree.map(jnp.asarray, p["params"]),
          "batch_stats": jax.tree.map(jnp.asarray, p["batch_stats"])}
    cfg = get_config("config_track.yml", overrides={
        "obj_config": args.obj_config, "obj_category": args.category,
        "network/compute_dtype": args.dtype, "network/norm": args.norm})
    coord = CoordNet(cfg)
    obj = cfg.obj
    P, root = obj.num_parts, tree_root(obj.tree)

    offsets = [float(x) for x in args.offsets.split(",")]
    B, K, J = args.trajs, len(offsets), args.perturb_j

    trajs = [make_trajectory(seed=1000 + s, obj=cfg.obj, num_frames=2,
                             num_points=cfg.num_points) for s in range(B)]
    base = batch_trajectories(trajs)
    pts = base["points"][0]                                   # [B, N, 3]
    gt0 = base["pose"].map(lambda x: x[0])                    # [B, P]
    rng = np.random.RandomState(11)

    # candidates: GT root rotation composed with a known offset; t/s from
    # the cloud guess (the realistic GT-less situation)
    guess = init_pose_from_cloud(pts, P, cfg.data_radius)
    cand_R = np.zeros((B, K, P, 3, 3), np.float32)
    for b in range(B):
        for k, off in enumerate(offsets):
            Q = _axis_angle(rng, off)
            cand_R[b, k] = np.einsum(
                "ij,pjk->pik", Q, np.asarray(gt0.rotation[b]))
    # perturbations: J in-basin deltas shared across candidates
    perts = np.stack([np.eye(3, dtype=np.float32)] + [
        _axis_angle(rng, args.perturb_deg) for _ in range(J - 1)])

    N = pts.shape[1]
    BKJ = B * K * J
    R0 = jnp.asarray(np.einsum("jac,bkpcd->bkjpad",
                               perts, cand_R).reshape(BKJ, P, 3, 3))
    t0 = jnp.broadcast_to(guess.translation[:, None, None],
                          (B, K, J, P, 3, 1)).reshape(BKJ, P, 3, 1)
    s0 = jnp.broadcast_to(guess.scale[:, None, None],
                          (B, K, J, P)).reshape(BKJ, P)
    pose = Pose(rotation=R0, translation=t0, scale=s0)
    pts_r = jnp.broadcast_to(pts[:, None, None],
                             (B, K, J, N, 3)).reshape(BKJ, N, 3)
    mean = jnp.mean(pts_r, axis=1)
    centered = pts_r - mean[:, None]
    cam = pts_r[:, None]

    @jax.jit
    def passes(pose):
        score = None
        for _ in range(args.steps):
            rp = Pose(rotation=pose.rotation[:, root],
                      translation=pose.translation[:, root],
                      scale=pose.scale[:, root])
            out = coord.apply(cv, canonicalize(centered, mean, rp),
                              train=False)
            labels = jnp.argmax(out["seg"], axis=-1)
            pn = jnp.moveaxis(out["nocs"].reshape(BKJ, N, P, 3), 2, 1)
            mask = labels_to_part_mask(labels, P)
            r_f, s_f, t_f = similarity_fit(pn, cam, mask, sym=obj.sym)
            fitted = Pose(rotation=r_f, translation=t_f, scale=s_f)
            valid = filter_valid(fitted, jnp.sum(mask, -1) > 3,
                                 min_scale=1e-4)

            def sel(n, o):
                v = valid.reshape(valid.shape + (1,) * (n.ndim - 2))
                return jnp.where(v, n, o)

            prev = pose
            pose = jax.tree.map(sel, fitted, pose)
            posed = s_f[..., None, None] * (
                pn @ jnp.swapaxes(r_f, -1, -2)) + jnp.swapaxes(t_f, -1, -2)
            resid = jnp.sum((posed - cam) ** 2, axis=-1)
            w = mask * valid[..., None].astype(mask.dtype)
            tot = jnp.sum(w, axis=(-1, -2))
            score = jnp.sum(resid * w, axis=(-1, -2)) / jnp.maximum(tot, 1.)
            score = jnp.where(tot > 3, score, jnp.inf)
        return pose, prev, score

    fitted, first_in, resid = passes(pose)

    def geo_deg(Ra, Rb):
        tr = jnp.einsum("...ij,...ij->...", Ra, Rb)
        c = jnp.clip((tr - 1) / 2, -1, 1)
        return jnp.rad2deg(jnp.arccos(c))

    def yaxis_deg(Ra, Rb):
        # sym-aware: angle between the rotated canonical y axes (the only
        # observable rotation DoF for a symmetric category)
        c = jnp.clip(jnp.sum(Ra[..., :, 1] * Rb[..., :, 1], -1), -1, 1)
        return jnp.rad2deg(jnp.arccos(c))

    ang = yaxis_deg if obj.sym else geo_deg
    # drift: candidate rotation vs its own fit (root part), identity copy
    drift = ang(R0[:, root], fitted.rotation[:, root]).reshape(B, K, J)
    resid = np.asarray(resid).reshape(B, K, J)
    # spread: disagreement of the J fitted rotations per candidate
    fr = fitted.rotation.reshape(B, K, J, P, 3, 3)[:, :, :, root]
    sp = []
    for a in range(J):
        for bb in range(a + 1, J):
            sp.append(ang(fr[:, :, a], fr[:, :, bb]))
    spread = np.asarray(jnp.mean(jnp.stack(sp), axis=0))      # [B, K]
    # npcs-range: out-of-basin "copy input" predictions are a similarity of
    # the raw cloud, which for a wrong orientation places NPCS mass outside
    # the canonical [-r, r] box along axes the category constrains
    # (cheap shape prior: fraction of |npcs| > data_radius)
    # drift measured on the FIRST pass (before the fit re-centers)
    drift_first = ang(R0[:, root],
                      first_in.rotation[:, root]).reshape(B, K, J)

    # convergence map: fitted pose error to GT per offset — tells whether
    # in-basin candidates actually descend to GT (prerequisite for any
    # mode-clustering scorer)
    gtR = jnp.broadcast_to(gt0.rotation[:, None, None, root],
                           (B, K, J, 3, 3))
    err_gt = ang(fr, gtR)                                     # [B, K, J]

    resid_id = resid[:, :, 0]
    drift_id = np.asarray(drift)[:, :, 0]
    drift1_id = np.asarray(drift_first)[:, :, 0]
    err_id = np.asarray(err_gt)[:, :, 0]
    print(f"(angle metric: {'y-axis' if obj.sym else 'geodesic'})")
    print(f"\n{'offset':>8} {'resid(v1)':>12} {'drift':>8} {'drift1':>8} "
          f"{'spread':>8} {'err->GT':>8}")
    for k, off in enumerate(offsets):
        print(f"{off:8.0f} {np.nanmean(resid_id[:, k]):12.6f} "
              f"{np.nanmean(drift_id[:, k]):8.2f} "
              f"{np.nanmean(drift1_id[:, k]):8.2f} "
              f"{np.nanmean(spread[:, k]):8.2f} "
              f"{np.nanmean(err_id[:, k]):8.2f}")

    offs = np.asarray(offsets)
    for name, sc in [("resid(v1)", resid_id), ("drift", drift_id),
                     ("drift1", drift1_id), ("spread", spread),
                     ("spread+resid", spread + 100.0 * resid_id)]:
        pick = np.nanargmin(sc, axis=1)
        chosen = offs[pick]
        print(f"argmin[{name:>12}] chooses offsets: {chosen.tolist()} "
              f"(mean {chosen.mean():.0f} deg)")


if __name__ == "__main__":
    main()
