"""OTF tracking throughput at the reference's own speed protocol.

The reference measures tracking FPS with batch_size=1 *including* per-frame
data preprocessing (/root/reference/network/test.py:77-96, README.md:267:
"use --batch_size=1").  Here the equivalent is the nocs_otf scan: raw
480x640 depth frames enter the jitted loop, and backprojection + ball crop +
FPS + CoordNet + RotationNet + analytic s/t fit all run on device.

`measure_otf` is the single implementation of the protocol — bench.py calls
it for the driver-recorded JSON, and `python scripts/bench_otf.py` is the
interactive CLI.  fps_mode="grouped" means the full latency-optimized
configuration: stratified FPS in BOTH the crop (track_cfg/otf_fps_mode) and
the backbone SA layers (network/fps_mode) — deviations quantified in
tests/test_approx_parity.py.

Usage: python scripts/bench_otf.py [--batches 1,8] [--fps-mode grouped]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def make_depth_frames(T: int, B: int, H: int = 480, W: int = 640, seed=0):
    """Synthetic depth video: flat background at 1.5 m + a moving square
    object blob at ~1.0 m, NOCS-real shaped."""
    rng = np.random.RandomState(seed)
    depths = np.full((T, B, H, W), 1500, np.int32)
    masks = np.zeros((T, B, H, W), bool)
    for b in range(B):
        ox, oy = rng.randint(200, 360), rng.randint(150, 260)
        for t in range(T):
            m = np.zeros((H, W), bool)
            m[oy + t:oy + t + 90, ox + t:ox + t + 90] = True
            depths[t, b][m] = 1000 + rng.randint(-20, 20)
            masks[t, b] = m
    return jnp.asarray(depths), jnp.asarray(masks)


def make_det_frames(depths, masks, K: int = 8):
    """Detection-result frames for the mask-free path: per frame, det 0 is
    the object blob (bit-packed like data/nocs.py:_pre_fetch_dets)."""
    T, B, H, W = depths.shape
    m = np.asarray(masks)
    packed = np.packbits(m, axis=-1, bitorder="little")      # [T, B, H, W8]
    det_masks = np.zeros((T, B, K) + packed.shape[-2:], np.uint8)
    det_masks[:, :, 0] = packed
    det_boxes = np.zeros((T, B, K, 4), np.float32)
    for t in range(T):
        for b in range(B):
            ys, xs = np.nonzero(m[t, b])
            det_boxes[t, b, 0] = (ys.min(), xs.min(), ys.max(), xs.max())
    det_valid = np.zeros((T, B, K), bool)
    det_valid[:, :, 0] = True
    import jax.numpy as jnp
    return {"det_masks": jnp.asarray(det_masks),
            "det_boxes": jnp.asarray(det_boxes),
            "det_valid": jnp.asarray(det_valid)}


def measure_otf(batches, num_frames: int = 100, fps_mode: str = "exact",
                work_factor: int = 5, dtype: str | None = None,
                nocs2d: bool = False, log=print) -> dict:
    """Run the OTF protocol for each batch size; returns {B: frames/sec}.

    num_frames defaults to 100 — the reference's own trajectory length
    (obj_info_sapien.yml num_frames: 100; NOCS real scenes are hundreds of
    frames, README.md:267 suggests --dataset_length=500).  Short scans
    would bill the fixed per-invocation dispatch overhead to the per-frame
    number."""
    if not batches:
        return {}
    from captra_tpu.config import get_config
    from captra_tpu.data.preprocess import (NOCS_REAL_INTRINSICS,
                                            backproject_depth)
    from captra_tpu.models.coordnet import CoordNet
    from captra_tpu.models.rotnet import RotNet
    from captra_tpu.pose.part_dof import Pose
    from captra_tpu.tracking.tracker import make_track_step, track_trajectory

    cfg = get_config("config_track.yml", overrides={
        "obj_config": "obj_info_nocs.yml", "obj_category": "1",
        "init_frame/gt": True, "nocs_otf": True,
        "track_cfg/otf_fps_mode": fps_mode,
        "track_cfg/otf_work_factor": work_factor,
        "track_cfg/nocs2d_label": nocs2d,
        "track_cfg/nocs2d_path": "bench" if nocs2d else "",
        "network/fps_mode": fps_mode,
        "network/compute_dtype": dtype or os.environ.get(
            "CAPTRA_BENCH_DTYPE", "bfloat16"),
    })
    N, P = cfg.num_points, cfg.obj.num_parts
    coord, rotn = CoordNet(cfg), RotNet(cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    cv = coord.init(k1, jnp.zeros((1, N, 3)), train=False)
    rv = rotn.init(k2, jnp.zeros((1, P, N, 3)), jnp.zeros((1, N), jnp.int32),
                   train=False)
    step = make_track_step(
        cfg,
        lambda p: coord.apply(cv, p, train=False),
        lambda p, l: rotn.apply(rv, p, l, train=False))
    run = jax.jit(lambda ip, fr: track_trajectory(step, ip, fr))

    T = num_frames
    results = {}
    for B in batches:
        try:
            depths, masks = make_depth_frames(T, B)
            pts0, _ = backproject_depth(depths[0, 0], NOCS_REAL_INTRINSICS)
            c0 = np.asarray(pts0).reshape(480, 640, 3)[
                np.asarray(masks[0, 0])].mean(0)
            init_pose = Pose(
                rotation=jnp.broadcast_to(jnp.eye(3), (B, P, 3, 3)),
                translation=jnp.broadcast_to(
                    jnp.asarray(c0).reshape(1, 1, 3, 1), (B, P, 3, 1)),
                scale=jnp.full((B, P), 0.3))
            frames = {"depth": depths, "mask": masks,
                      "key": jnp.arange(T, dtype=jnp.int32)}
            if nocs2d:
                frames.update(make_det_frames(depths, masks))
            t0 = time.time()
            # warm on ZEROED inputs and perturb the depth per timed rep:
            # identical (program, input) dispatches can be served from the
            # tunnel's result cache (see cli/track.py warm-up note)
            out = run(jax.tree.map(jnp.zeros_like, init_pose),
                      jax.tree.map(jnp.zeros_like, frames))
            jax.block_until_ready(out)
            log(f"# otf batch={B} fps_mode={fps_mode} "
                f"compile+warm: {time.time() - t0:.1f}s")
            best = np.inf
            for rep in (range(5) if B == 1 else range(3)):
                fr = dict(frames)
                fr["depth"] = frames["depth"] + rep  # 1 mm/rep: fresh input
                t0 = time.perf_counter()
                out = run(init_pose, fr)
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            results[B] = (T - 1) * B / best
            log(f"# otf batch={B} fps_mode={fps_mode}: "
                f"{results[B]:.1f} frames/sec/chip "
                f"({best / (T - 1) * 1e3:.2f} ms/frame-batch)")
        except Exception as e:  # noqa: BLE001 — report what we can
            log(f"# otf batch={B} failed: {e}")
    return results


def main():
    from captra_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8")
    ap.add_argument("--work-factor", type=int, default=5)
    ap.add_argument("--fps-mode", default="exact",
                    choices=["exact", "grouped"])
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--nocs2d", action="store_true", default=False,
                    help="mask-free path: in-graph NOCS-2D detection "
                         "selection from bit-packed per-frame results")
    args = ap.parse_args()
    measure_otf([int(b) for b in args.batches.split(",")],
                num_frames=args.frames, fps_mode=args.fps_mode,
                work_factor=args.work_factor, dtype=args.dtype,
                nocs2d=args.nocs2d)


if __name__ == "__main__":
    main()
