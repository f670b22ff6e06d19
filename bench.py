"""Headline benchmark: tracked frames/sec/chip on the flagship tracking loop.

Runs the full-size CoordNet + RotationNet + analytic-fit tracking scan
(NOCS-bottle-shaped config: 4096 points, pointnet2_camera backbone) over
batched synthetic trajectories and reports throughput against the 200
frames/sec/chip north star (BASELINE.json).

Two protocols, both reported in the JSON line:
  * network path (batched, points pre-cropped): the throughput headline;
  * OTF (reference speed protocol, network/test.py:77-96 + README.md:267):
    batch_size=1 *including data preprocessing* — raw 480x640 depth frames
    enter the jitted scan and backprojection + ball crop + FPS run
    on device from the carried pose.  Reported as `otf_b1` / `otf_b8`.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "otf_b1",
"otf_b8"}.
Env: CAPTRA_BENCH_BATCHES="16,32" to sweep network-path batch sizes;
CAPTRA_BENCH_OTF_BATCHES="1,8" (set "" to skip the OTF runs).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: full-size net compiles are minutes through the
# remote-compile tunnel; cache them across bench runs
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from captra_tpu.utils.cache import enable_compile_cache  # noqa: E402
enable_compile_cache()

BASELINE_FPS = 200.0  # north-star target, BASELINE.json


def _cfg():
    from captra_tpu.config import get_config
    return get_config("config_track.yml", overrides={
        "obj_config": "obj_info_nocs.yml", "obj_category": "1",
        "init_frame/gt": True,
        "network/compute_dtype": os.environ.get("CAPTRA_BENCH_DTYPE",
                                                "bfloat16"),
    })


def _init_variables(cfg):
    """Initialize both nets once at B=1 (params are batch-size independent)."""
    from captra_tpu.models.coordnet import CoordNet
    from captra_tpu.models.rotnet import RotNet

    N, P = cfg.num_points, cfg.obj.num_parts
    coord, rotn = CoordNet(cfg), RotNet(cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    cv = coord.init(k1, jnp.zeros((1, N, 3)), train=False)
    rv = rotn.init(k2, jnp.zeros((1, P, N, 3)), jnp.zeros((1, N), jnp.int32),
                   train=False)
    return coord, rotn, cv, rv


def build_runner(cfg, coord, rotn, cv, rv):
    from captra_tpu.pose.part_dof import Pose
    from captra_tpu.tracking.tracker import make_track_step, track_trajectory

    step = make_track_step(
        cfg,
        lambda p: coord.apply(cv, p, train=False),
        lambda p, l: rotn.apply(rv, p, l, train=False))
    return jax.jit(lambda ip, fr: track_trajectory(step, ip, fr))


def make_data(cfg, batch: int, num_frames: int):
    from captra_tpu.data.synthetic import batch_trajectories, make_trajectory
    from captra_tpu.pose.part_dof import Pose

    trajs = [make_trajectory(seed=s, obj=cfg.obj, num_frames=num_frames,
                             num_points=cfg.num_points) for s in range(batch)]
    data = batch_trajectories(trajs)
    gt = data["pose"]
    init_pose = Pose(rotation=gt.rotation[0], translation=gt.translation[0],
                     scale=gt.scale[0])
    return init_pose, {"points": data["points"]}


def main():
    num_frames = 20
    batches = [int(b) for b in
               os.environ.get("CAPTRA_BENCH_BATCHES", "16").split(",")]
    cfg = _cfg()
    t0 = time.time()
    coord, rotn, cv, rv = _init_variables(cfg)
    print(f"# init: {time.time() - t0:.1f}s")

    best_fps, best_cfg = 0.0, None
    for batch in batches:
        try:
            run = build_runner(cfg, coord, rotn, cv, rv)
            init_pose, frames = make_data(cfg, batch, num_frames)
            t0 = time.time()
            out = run(init_pose, frames)
            jax.block_until_ready(out)
            print(f"# batch={batch} compile+warm: {time.time() - t0:.1f}s")
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                out = run(init_pose, frames)
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            fps = (num_frames - 1) * batch / best
        except Exception as e:  # noqa: BLE001 — report what we can
            print(f"# batch={batch} failed: {e}")
            continue
        print(f"# batch={batch}: {fps:.1f} tracked frames/sec/chip")
        if fps > best_fps:
            best_fps, best_cfg = fps, batch

    otf_env = os.environ.get("CAPTRA_BENCH_OTF_BATCHES", "1,8")
    otf, otf_grouped = {}, {}
    if otf_env:
        from scripts.bench_otf import measure_otf
        otf_batches = [int(b) for b in otf_env.split(",") if b]
        otf = measure_otf(otf_batches)
        # "grouped" = latency-optimized config (stratified FPS in crop AND
        # backbone), deviation quantified in tests/test_approx_parity.py
        otf_grouped = measure_otf([b for b in otf_batches if b == 1],
                                  fps_mode="grouped")
    def maybe(d, b):
        # null (not 0.0) for batch sizes whose measurement failed — a
        # failed run must be distinguishable from a measured value
        return round(d[b], 2) if b in d else None

    print(json.dumps({
        "metric": "tracked_frames_per_sec_per_chip",
        "value": round(best_fps, 2),
        "unit": f"frames/s (NOCS-bottle-shaped, 4096 pts, batch={best_cfg})",
        "vs_baseline": round(best_fps / BASELINE_FPS, 3),
        "otf_b1": maybe(otf, 1),
        "otf_b8": maybe(otf, 8),
        "otf_b1_grouped": maybe(otf_grouped, 1),
    }))


if __name__ == "__main__":
    main()
