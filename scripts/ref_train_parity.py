"""Two-stack trained-quality parity: train the PyTorch reference AND this
framework with the same recipe on the same synthetic data, then track the
same scans and compare metrics.

This is the strongest accuracy-parity evidence available without the real
corpora: tests/test_reference_parity.py already proves the two stacks agree
numerically given identical weights; this experiment asks whether they
*train* to the same tracked quality.  Both sides follow the reference
recipe (Adam lr 1e-3, weight decay 1e-4, BN, loss weights from
configs/all_config/config_{coordnet,rotnet}.yml) at a reduced scale the
torch CPU fallbacks can afford.

Reference semantics replicated below (cited):
  CoordNet training update  = network/models/model.py:107-205
  RotationNet training update = model.py:205-306
  tracking recurrence       = model.py:409-478 (tests/ref_compat.ref_track)

Usage:
  JAX_PLATFORMS=cpu python scripts/ref_train_parity.py \
      --category 1 --steps 800 --batch 8 --points 512 --out runs/ref_parity
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build_pool(cfg_obj, num_points, batch, distinct):
    """Distinct training batches as numpy (shared verbatim by both stacks)."""
    from captra_tpu.data.synthetic import make_frame_batch
    pool = []
    for i in range(distinct):
        b = make_frame_batch(i, cfg_obj, batch=batch, num_points=num_points)
        pool.append({
            "points": np.asarray(b["points"]),
            "labels": np.asarray(b["labels"]),
            "nocs": np.asarray(b["nocs"]),
            "rotation": np.asarray(b["pose"].rotation),
            "translation": np.asarray(b["pose"].translation),
            "scale": np.asarray(b["pose"].scale),
            "corners": np.asarray(b["corners"]),
        })
    return pool


# ---------------------------------------------------------------------------
# reference-side training (torch CPU)
# ---------------------------------------------------------------------------

def ref_perturb_cfg(r_deg=5.0, t=0.03, s=0.02):
    # reference BaseModel.__init__ (model.py:36-40)
    return {"type": "normal", "scale": s, "translation": t,
            "rotation": float(np.deg2rad(r_deg))}


def ref_feed(batch, torch):
    """numpy batch -> reference-shaped tensors (network/data/dataset.py:76-84
    reshape + data_transforms.subtract_mean)."""
    pts = torch.from_numpy(batch["points"])                  # [B, N, 3]
    mean = pts.mean(dim=1, keepdim=True)                     # [B, 1, 3]
    centered = (pts - mean).transpose(-1, -2).contiguous()   # [B, 3, N]
    gt_part = {
        "rotation": torch.from_numpy(batch["rotation"]),     # [B, P, 3, 3]
        "translation": torch.from_numpy(batch["translation"]),
        "scale": torch.from_numpy(batch["scale"]),
    }
    return {
        "points": centered,
        "points_mean": mean.transpose(-1, -2).contiguous(),  # [B, 3, 1]
        "labels": torch.from_numpy(batch["labels"]).long(),
        "nocs": torch.from_numpy(batch["nocs"]).transpose(-1, -2).contiguous(),
        "corners": torch.from_numpy(batch["corners"]),       # [B, P, 2, 3]
        "gt_part": gt_part,
    }


def train_reference(ref, args, pool, sym, num_parts, tree, root,
                    coord_weights, rot_weights, pose_loss_type, out, log):
    import torch
    from tests.ref_compat import make_ref_cfg

    perturb = ref_perturb_cfg()

    def gt_bbox(corners):
        # reference model.py:164-168
        if sym:
            return ref.bbox_utils.yaxis_from_corners(corners, "cpu")
        return ref.bbox_utils.tensor_bbox_from_corners(corners, "cpu")

    def resumable(name, net, opt, total_steps, body):
        """Run body(i) for steps [start, total_steps), checkpointing the net
        + optimizer + torch RNG every 100 steps so an interrupted run loses
        at most 100 steps (torch CPU phases here take ~1h each)."""
        final = os.path.join(out, f"{name}.pt")
        prog = os.path.join(out, f"{name}_progress.pt")
        if os.path.exists(final):
            net.load_state_dict(torch.load(final, weights_only=True))
            log(f"[{name}] loaded finished net from {final}")
            return
        start = 0
        if os.path.exists(prog):
            ck = torch.load(prog, weights_only=False)
            net.load_state_dict(ck["model"])
            opt.load_state_dict(ck["opt"])
            torch.set_rng_state(ck["rng"])
            start = ck["step"] + 1
            log(f"[{name}] resumed at step {start}")
        t0 = time.time()
        for i in range(start, total_steps):
            body(i)
            if i % 100 == 99 and i != total_steps - 1:
                # atomic: a session kill mid-save must not truncate the
                # checkpoint (resume would crash in torch.load forever)
                torch.save({"step": i, "model": net.state_dict(),
                            "opt": opt.state_dict(),
                            "rng": torch.get_rng_state()}, prog + ".tmp")
                os.replace(prog + ".tmp", prog)
        torch.save(net.state_dict(), final + ".tmp")
        os.replace(final + ".tmp", final)
        log(f"[{name}] {total_steps - start} steps in {time.time() - t0:.0f}s")

    # --- CoordNet (reference CanonCoordModel.update, model.py:195-205) ----
    torch.manual_seed(0)
    cfg_c = make_ref_cfg(num_parts, sym, 1, tree, net_type="canon_coord")
    cfg_c["network"]["pwm_num"] = 128
    coord = ref.networks.CoordNet(cfg_c)
    opt = torch.optim.Adam(coord.parameters(), lr=1e-3, weight_decay=1e-4)

    def coord_body(i):
        b = ref_feed(pool[i % len(pool)], torch)
        init_part = ref.part_dof_utils.add_noise_to_part_dof(
            b["gt_part"], perturb)
        feed = {
            "points": b["points"], "points_mean": b["points_mean"],
            "labels": b["labels"],
            "canon_pose": {k: init_part[k][:, root]
                           for k in ("rotation", "translation", "scale")},
            "init_part": init_part, "gt_part": b["gt_part"],
        }
        opt.zero_grad()
        pred = coord(feed, test=False)
        loss_dict = {"seg_loss": ref.loss.compute_miou_loss(
            pred["seg"], b["labels"], per_instance=False)}
        nocs_loss = ref.loss.compute_nocs_loss(
            pred["nocs"], b["nocs"], labels=b["labels"], confidence=None,
            loss="l2", self_supervise=False, per_instance=False, sym=sym,
            pwm_num=128)
        if sym:
            loss_dict["nocs_dist_loss"], loss_dict["nocs_pwm_loss"] = nocs_loss
        else:
            loss_dict["nocs_loss"] = nocs_loss
        loss_dict.update(ref.loss.compute_part_dof_loss(
            b["gt_part"], pred["part"], pose_loss_type))
        corner_loss, _ = ref.loss.compute_point_pose_loss(
            b["gt_part"], pred["part"], gt_bbox(b["corners"]),
            metric=pose_loss_type["point"])
        loss_dict["corner_loss"] = corner_loss
        total = sum(loss_dict[k] * w for k, w in coord_weights.items()
                    if k in loss_dict and w)
        total.backward()
        opt.step()
        if i % 50 == 0 or i == args.steps - 1:
            log(f"[ref coord] step {i}: total={float(total):.4f} " +
                " ".join(f"{k}={float(v):.4f}" for k, v in loss_dict.items()
                         if coord_weights.get(k)))

    resumable("ref_coord", coord, opt, args.steps, coord_body)

    # --- RotationNet (reference RotationModel.update, model.py:296-301) ---
    rsteps = args.rot_steps or args.steps
    torch.manual_seed(1)
    cfg_r = make_ref_cfg(num_parts, sym, 1, tree, net_type="rot")
    rot = ref.networks.PartCanonNet(cfg_r)
    opt_r = torch.optim.Adam(rot.parameters(), lr=1e-3, weight_decay=1e-4)
    eye = torch.cat([torch.eye(num_parts), torch.zeros(2, num_parts)], dim=0)

    def rot_body(i):
        b = ref_feed(pool[i % len(pool)], torch)
        init_part = ref.part_dof_utils.add_noise_to_part_dof(
            b["gt_part"], perturb)
        canon_flat = {k: init_part[k].reshape((-1,) + init_part[k].shape[2:])
                      for k in ("rotation", "translation", "scale")}
        B = len(b["labels"])
        root_delta = ref.part_dof_utils.compute_parts_delta_pose(
            init_part, b["gt_part"],
            {k: v.reshape((B, num_parts) + v.shape[1:])
             for k, v in canon_flat.items()})
        feed = {
            "points": b["points"], "points_mean": b["points_mean"],
            "labels": b["labels"], "state": {"part": init_part},
            "canon_pose": canon_flat, "gt_part": b["gt_part"],
        }
        opt_r.zero_grad()
        pred = rot(feed, test_mode=False)
        # RotationModel.compute_loss (model.py:243-294): the part-dof rloss
        # is overwritten by the masked per-point rloss; effective training
        # loss = 10 * rloss + 1 * corner_loss (config_rotnet.yml:44-52)
        part_mask = eye[b["labels"]].transpose(-1, -2)  # [B, P, N]
        point_rotation = pred["point_rotation"]
        gt_rotation = root_delta["rotation"].unsqueeze(-3)
        if sym:
            rl = ref.loss.rot_yaxis_loss(gt_rotation, point_rotation)
        else:
            rl = ref.loss.rot_trace_loss(gt_rotation, point_rotation,
                                         metric=pose_loss_type["r"])
        rloss = (rl * part_mask).sum() / part_mask.sum().clamp(min=1.0)
        corner_loss, _ = ref.loss.compute_point_pose_loss(
            b["gt_part"], pred["part"], gt_bbox(b["corners"]),
            metric=pose_loss_type["point"])
        total = (rot_weights["rloss"] * rloss
                 + rot_weights["corner_loss"] * corner_loss)
        total.backward()
        opt_r.step()
        if i % 50 == 0 or i == rsteps - 1:
            log(f"[ref rot] step {i}: total={float(total):.4f} "
                f"rloss={float(rloss):.4f} corner={float(corner_loss):.4f}")

    resumable("ref_rot", rot, opt_r, rsteps, rot_body)
    return coord, rot


# ---------------------------------------------------------------------------
# our-side training (captra_tpu, CPU ok at this scale)
# ---------------------------------------------------------------------------

def train_ours(args, pool, cfg_name, net_type, out, log):
    import pickle

    import jax
    import jax.numpy as jnp
    from captra_tpu.config import get_config
    from captra_tpu.pose.part_dof import Pose
    from captra_tpu.training.trainer import Trainer

    cfg = get_config(cfg_name, overrides={
        "obj_config": args.obj_config, "obj_category": args.category,
        "batch_size": args.batch, "num_points": args.points,
        "network/norm": args.norm})
    final = os.path.join(out, f"ours_{net_type}.pkl")
    if os.path.exists(final):
        with open(final, "rb") as f:
            var_np = pickle.load(f)
        log(f"[ours {net_type}] loaded finished variables from {final}")
        return cfg, jax.tree.map(jnp.asarray, var_np)
    trainer = Trainer(cfg, steps_per_epoch=200)

    def to_jax(b):
        return {"points": jnp.asarray(b["points"]),
                "labels": jnp.asarray(b["labels"]),
                "nocs": jnp.asarray(b["nocs"]),
                "pose": Pose(rotation=jnp.asarray(b["rotation"]),
                             translation=jnp.asarray(b["translation"]),
                             scale=jnp.asarray(b["scale"])),
                "corners": jnp.asarray(b["corners"])}

    jb = [to_jax(b) for b in pool]
    key = jax.random.PRNGKey(0)
    state = trainer.init_state(key, jb[0])
    steps = (args.rot_steps or args.steps) if net_type == "rot" \
        else args.steps
    k = key
    prog = os.path.join(out, f"ours_{net_type}_progress.pkl")
    start = 0
    if os.path.exists(prog):
        with open(prog, "rb") as f:
            ck = pickle.load(f)
        state = jax.tree.map(jnp.asarray, ck["state"])
        k = jnp.asarray(ck["key"])
        start = ck["step"] + 1
        log(f"[ours {net_type}] resumed at step {start}")
    t0 = time.time()
    for i in range(start, steps):
        k, sub = jax.random.split(k)
        state, loss, metrics = trainer.train_step(state, jb[i % len(jb)], sub)
        if i % 100 == 0 or i == steps - 1:
            log(f"[ours {net_type}] step {i}: "
                f"total={float(loss['total_loss']):.4f} "
                f"rdiff={float(metrics.get('rdiff', 0)):.3f}")
        if i % 200 == 199 and i != steps - 1:
            # atomic (see the torch side): temp file + os.replace
            with open(prog + ".tmp", "wb") as f:
                pickle.dump({"step": i, "state": jax.device_get(state),
                             "key": jax.device_get(k)}, f)
            os.replace(prog + ".tmp", prog)
    log(f"[ours {net_type}] {steps - start} steps in {time.time() - t0:.0f}s")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    with open(final + ".tmp", "wb") as f:
        pickle.dump(jax.device_get(variables), f)
    os.replace(final + ".tmp", final)
    return cfg, variables


# ---------------------------------------------------------------------------
# tracking comparison
# ---------------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--obj_config", default="obj_info_nocs.yml")
    ap.add_argument("--category", default="1")
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--rot_steps", type=int, default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=512)
    ap.add_argument("--distinct", type=int, default=40)
    ap.add_argument("--trajs", type=int, default=4)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--norm", default="bn", choices=["bn", "gn"],
                    help="ours-side norm; the reference is always BN "
                         "(its backbone hard-codes BatchNorm)")
    ap.add_argument("--platform", default="cpu",
                    help="JAX platform for the ours-side training/tracking "
                         "(the torch reference always runs CPU here). "
                         "'cpu' keeps both stacks on the same silicon; the "
                         "TPU plugin name runs ours in its shipping "
                         "configuration — quality is what's compared, and "
                         "the report records the platform")
    ap.add_argument("--out", default="runs/ref_parity")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    logf = open(os.path.join(args.out, "LOG.txt"), "a")
    logf.write(f"--- invocation {time.strftime('%H:%M:%S')} ---\n")

    def log(msg):
        print(msg, flush=True)
        logf.write(msg + "\n")
        logf.flush()

    import jax
    jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import torch

    from captra_tpu.config import get_config
    from captra_tpu.data.synthetic import batch_trajectories, make_trajectory
    from captra_tpu.models.coordnet import CoordNet
    from captra_tpu.models.rotnet import RotNet
    from captra_tpu.pose.part_dof import Pose, tree_root
    from captra_tpu.tracking.tracker import (
        evaluate_track, init_pose_from_gt, make_track_step, track_trajectory,
    )
    from tests.ref_compat import load_ref, make_ref_cfg, ref_track

    ref = load_ref()
    base_cfg = get_config("config_track.yml", overrides={
        "obj_config": args.obj_config, "obj_category": args.category,
        "init_frame/gt": True, "network/norm": args.norm})
    obj = base_cfg.obj
    sym, num_parts, tree = obj.sym, obj.num_parts, list(obj.tree)
    root = tree_root(obj.tree)

    # loss weights from the reference configs (config_coordnet.yml:35-50,
    # config_rotnet.yml:44-52)
    coord_weights = {"tloss": 5.0, "sloss": 5.0, "corner_loss": 10.0,
                     "nocs_loss": 10.0, "seg_loss": 1.0,
                     "nocs_dist_loss": 5.0, "nocs_pwm_loss": 5.0}
    rot_weights = {"rloss": 10.0, "corner_loss": 1.0}
    pose_loss_type = {"r": "frob", "s": "l1", "t": "l1", "point": "l1"}

    log(f"category={args.category} sym={sym} parts={num_parts} "
        f"steps={args.steps} batch={args.batch} N={args.points}")

    pool = build_pool(obj, args.points, args.batch, args.distinct)
    log(f"pool: {len(pool)} distinct batches")

    coord_t, rot_t = train_reference(
        ref, args, pool, sym, num_parts, tree, root,
        coord_weights, rot_weights, pose_loss_type, args.out, log)

    cfg_c, var_c = train_ours(args, pool, "config_coordnet.yml",
                              "canon_coord", args.out, log)
    cfg_r, var_r = train_ours(args, pool, "config_rotnet.yml", "rot",
                              args.out, log)

    # --- identical eval scans ---------------------------------------------
    T, B = args.frames, args.trajs
    trajs = [make_trajectory(seed=1000 + s, obj=obj, num_frames=T,
                             num_points=args.points) for s in range(B)]
    data = batch_trajectories(trajs)
    gt = data["pose"]
    gt_rest = gt.map(lambda x: x[1:])
    frames_np = np.asarray(data["points"])

    # ours
    cfg = base_cfg.replace(num_points=args.points)
    coord_m, rotn_m = CoordNet(cfg), RotNet(cfg)
    cv, rv = var_c, var_r
    init_pose = init_pose_from_gt(jax.random.PRNGKey(0),
                                  gt.map(lambda x: x[0]), cfg)
    step = make_track_step(
        cfg, lambda p: coord_m.apply(cv, p, train=False),
        lambda p, l: rotn_m.apply(rv, p, l, train=False))
    _, aux = jax.jit(lambda ip, fr: track_trajectory(step, ip, fr))(
        init_pose, {"points": jnp.asarray(frames_np)})
    ours_errs = evaluate_track(aux.pose, gt_rest, sym=sym)

    # reference: same init pose (GT frame 0), eval() mode
    coord_t.eval()
    rot_t.eval()
    # rebuild PartCanonNet with tracking type but trained weights
    cfg_track_ref = make_ref_cfg(num_parts, sym, 1, tree,
                                 net_type="rot_coord_track")
    rot_track = ref.networks.PartCanonNet(cfg_track_ref)
    rot_track.load_state_dict(rot_t.state_dict())
    rot_track.eval()
    init_t = {
        "rotation": torch.from_numpy(np.asarray(init_pose.rotation)),
        "translation": torch.from_numpy(np.asarray(init_pose.translation)),
        "scale": torch.from_numpy(np.asarray(init_pose.scale)),
    }
    t0 = time.time()
    ref_poses, _ = ref_track(ref, coord_t, rot_track, init_t, frames_np,
                             num_parts, root)
    log(f"[ref track] {T - 1} frames x {B} trajs in {time.time() - t0:.0f}s")
    ref_pose = Pose(
        rotation=jnp.asarray(np.stack(
            [p["rotation"].numpy() for p in ref_poses[1:]])),
        translation=jnp.asarray(np.stack(
            [p["translation"].numpy() for p in ref_poses[1:]])),
        scale=jnp.asarray(np.stack(
            [p["scale"].numpy() for p in ref_poses[1:]])))
    ref_errs = evaluate_track(ref_pose, gt_rest, sym=sym)

    report = {"args": vars(args), "sym": sym, "num_parts": num_parts}
    for name, errs in (("reference", ref_errs), ("ours", ours_errs)):
        f1 = {k: round(float(jnp.mean(v[0])), 4) for k, v in errs.items()}
        full = {k: round(float(jnp.mean(v)), 4) for k, v in errs.items()}
        log(f"[{name}] frame-1   {f1}")
        log(f"[{name}] full-scan {full}")
        report[name] = {"frame1": f1, "full": full}

    with open(os.path.join(args.out, "REPORT.json"), "w") as f:
        json.dump(report, f, indent=1)
    log(f"report -> {args.out}/REPORT.json")


if __name__ == "__main__":
    main()
