"""Fine-tune the basin-confidence head on a trained CoordNet checkpoint.

The frame-0 orientation search for GT-less init needs a per-candidate
scorer with orientation signal; every UNSUPERVISED scorer measured flat in
the canonicalization offset (EVIDENCE.md round-5 scorer diagnosis: the
CoordNet "copies" out-of-basin canonicalized geometry, which is
similarity-consistent at any orientation).  This script trains the one
scorer that cannot be flat by construction: a small pooled head on
stop_gradient(backbone features) supervised on the offset itself
(network/basin_head, models/coordnet.py).

Because the head reads stop_gradient(features), this fine-tune provably
cannot move the seg/NPCS outputs: the saved checkpoint is the input
checkpoint plus head weights (tests/test_basin_head.py asserts
bit-identical seg/nocs).

Training distribution matches what `search_init_orientation` scores at
pass 0: synthetic clouds canonicalized by (candidate rotation,
cloud-mean translation, covering-radius scale).  Candidate rotations are
GT composed with a random-axis offset; the label is the OBSERVABLE
orientation error (y-axis angle for sym categories, geodesic angle
otherwise), squashed to y = clip(1 - ang/90deg, 0, 1) and trained with
sigmoid cross-entropy so the logit ranks candidates by basin proximity.

  python scripts/train_basin_head.py --coord runs/X/canon_coord/ckpt/model_0000 \
      --out runs/X_basin [--category 1] [--steps 1500]

No reference counterpart (the reference never operates GT-less,
real_arti_dataset.py:33-81 always ships pose JSONs).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coord", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--obj_config", default="obj_info_nocs.yml")
    ap.add_argument("--category", default="1")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--pool_trajs", type=int, default=32)
    ap.add_argument("--pool_frames", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--norm", default="gn", choices=["bn", "gn"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from captra_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from captra_tpu.config import get_config
    from captra_tpu.data.synthetic import batch_trajectories, make_trajectory
    from captra_tpu.models.coordnet import CoordNet, canonicalize
    from captra_tpu.pose import rotations as rot
    from captra_tpu.pose.part_dof import Pose, tree_root
    from captra_tpu.training import checkpoint as ckpt

    cfg = get_config("config_track.yml", overrides={
        "obj_config": args.obj_config, "obj_category": args.category,
        "network/compute_dtype": args.dtype, "network/norm": args.norm,
        "network/basin_head": True})
    obj = cfg.obj
    root = tree_root(obj.tree)
    N = cfg.num_points
    coord = CoordNet(cfg)

    # --- merge: trained weights + freshly-initialized head ----------------
    loaded = ckpt.load_checkpoint(args.coord)
    init_vars = coord.init(jax.random.PRNGKey(0), jnp.zeros((1, N, 3)),
                           train=False)
    params = dict(init_vars["params"])
    for k, v in loaded["params"].items():
        params[k] = jax.tree.map(jnp.asarray, v)
    batch_stats = jax.tree.map(jnp.asarray, loaded["batch_stats"])
    missing = [k for k in ("basin_fc1", "basin_fc2") if k not in params]
    assert not missing, f"head params missing after merge: {missing}"

    # --- cloud pool with GT root rotations (host-generated once) ----------
    trajs = [make_trajectory(seed=5000 + s, obj=obj,
                             num_frames=args.pool_frames, num_points=N)
             for s in range(args.pool_trajs)]
    data = batch_trajectories(trajs)
    pts = np.asarray(data["points"])                       # [T, B, N, 3]
    rgt = np.asarray(data["pose"].rotation)[:, :, root]    # [T, B, 3, 3]
    S = args.pool_trajs * args.pool_frames
    pool_pts = jnp.asarray(pts.transpose(1, 0, 2, 3).reshape(S, N, 3))
    pool_rgt = jnp.asarray(
        rgt.transpose(1, 0, 2, 3).reshape(S, 3, 3))
    print(f"pool: {S} clouds, {N} points, sym={obj.sym}", flush=True)

    data_radius = float(cfg.data_radius)
    sym = bool(obj.sym)

    def make_inputs(key, idx):
        """Canonicalize pool clouds by GT-composed offset rotations and
        return (canon_points [M, N, 3], label angle deg [M])."""
        kth, kax = jax.random.split(key)
        M = idx.shape[0]
        p = pool_pts[idx]                                  # [M, N, 3]
        rg = pool_rgt[idx]                                 # [M, 3, 3]
        # offset: random axis, theta uniform with a dense low-angle band
        # (ranking near the basin boundary is what selection needs)
        u = jax.random.uniform(kth, (M,))
        theta = jnp.where(u < 0.25, u * 4.0 * 30.0,
                          (u - 0.25) / 0.75 * 180.0)
        axis = jax.random.normal(kax, (M, 3))
        axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
        q = rot.axis_theta_to_matrix(axis, jnp.deg2rad(theta))
        rc = jnp.einsum("mij,mjk->mik", q, rg)             # candidate rot
        if sym:
            ang = jnp.rad2deg(jnp.arccos(jnp.clip(
                jnp.sum(rc[:, :, 1] * rg[:, :, 1], -1), -1.0, 1.0)))
        else:
            ang = theta
        mean = jnp.mean(p, axis=1)                         # [M, 3]
        ctr = p - mean[:, None]
        r = jnp.max(jnp.linalg.norm(ctr, axis=-1), axis=1)
        pose = Pose(rotation=rc, translation=mean[..., None],
                    scale=r / data_radius)
        return canonicalize(ctr, mean, pose), ang

    def loss_fn(p, key, idx):
        canon, ang = make_inputs(key, idx)
        out = coord.apply({"params": p, "batch_stats": batch_stats},
                          canon, train=False)
        target = jnp.clip(1.0 - ang / 90.0, 0.0, 1.0)
        loss = jnp.mean(optax.sigmoid_binary_cross_entropy(
            out["basin"], target))
        return loss, (out["basin"], ang)

    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, o, key):
        ki, kd = jax.random.split(key)
        idx = jax.random.randint(ki, (args.batch,), 0, S)
        (loss, (logit, ang)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, kd, idx)
        updates, o = tx.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        lo_in = jnp.sum(jnp.where(ang <= 30.0, logit, 0.0)) / \
            jnp.maximum(jnp.sum(ang <= 30.0), 1)
        lo_out = jnp.sum(jnp.where(ang > 45.0, logit, 0.0)) / \
            jnp.maximum(jnp.sum(ang > 45.0), 1)
        return p, o, loss, lo_in, lo_out

    t0 = time.time()
    key = jax.random.PRNGKey(7)
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss, li, lo = step(params, opt_state, sub)
        if i % 100 == 0 or i == args.steps - 1:
            print(f"step {i}: bce={float(loss):.4f} "
                  f"logit(in<=30)={float(li):.2f} "
                  f"logit(out>45)={float(lo):.2f}", flush=True)
    dt = time.time() - t0
    print(f"{args.steps} steps in {dt:.1f}s ({dt / args.steps * 1e3:.0f} "
          f"ms/step)", flush=True)

    # --- held-out separation report ---------------------------------------
    htr = [make_trajectory(seed=9000 + s, obj=obj, num_frames=4,
                           num_points=N) for s in range(8)]
    hd = batch_trajectories(htr)
    hp = jnp.asarray(np.asarray(hd["points"]).transpose(1, 0, 2, 3)
                     .reshape(-1, N, 3))
    hr = jnp.asarray(np.asarray(hd["pose"].rotation)[:, :, root]
                     .transpose(1, 0, 2, 3).reshape(-1, 3, 3))
    Sh = hp.shape[0]

    @jax.jit
    def probe_logits(theta_deg, key):
        axis = jax.random.normal(key, (Sh, 3))
        axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
        q = rot.axis_theta_to_matrix(
            axis, jnp.full((Sh,), jnp.deg2rad(theta_deg)))
        rc = jnp.einsum("mij,mjk->mik", q, hr)
        mean = jnp.mean(hp, axis=1)
        ctr = hp - mean[:, None]
        r = jnp.max(jnp.linalg.norm(ctr, axis=-1), axis=1)
        pose = Pose(rotation=rc, translation=mean[..., None],
                    scale=r / data_radius)
        out = coord.apply({"params": params, "batch_stats": batch_stats},
                          canonicalize(ctr, mean, pose), train=False)
        return out["basin"]

    report = {"sep": {}}
    for th in [0, 10, 20, 30, 45, 60, 90, 135, 180]:
        lg = probe_logits(float(th), jax.random.PRNGKey(th))
        report["sep"][th] = round(float(jnp.mean(lg)), 3)
        print(f"held-out theta={th:3d}: mean logit "
              f"{report['sep'][th]:+.3f}", flush=True)

    state = SimpleNamespace(params=params, batch_stats=batch_stats,
                            opt_state=opt_state, step=args.steps)
    path = ckpt.save_checkpoint(os.path.join(args.out, "ckpt"), epoch=0,
                                state=state)
    with open(os.path.join(args.out, "REPORT.json"), "w") as f:
        json.dump({"args": vars(args), **report}, f, indent=1)
    print("saved", path, flush=True)


if __name__ == "__main__":
    main()
