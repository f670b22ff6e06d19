"""Sym-category pwm-term ablation (ROADMAP item 2).

The pairwise-distance-matrix (pwm) term of the symmetric NOCS loss
(reference loss.py:84-119, pwm_num=128 sampled points) is the only thing
pinning per-point azimuthal consistency for sym categories and converges
slowly.  This trains full-size CoordNet on synthetic bottle data at
different pwm_num values and reports the loss decomposition + pose metrics
at matched step budgets.

Run: python scripts/sym_pwm_ablation.py --steps 3000 --pwm 128,384
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--pwm", default="128,384")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--grad_clip", type=float, default=1.0)
    ap.add_argument("--norm", default="gn", choices=["bn", "gn"])
    ap.add_argument("--category", default="1")  # bottle: sym
    args = ap.parse_args()

    import jax
    import numpy as np

    from captra_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from captra_tpu.config import get_config
    from captra_tpu.data.synthetic import make_frame_batch
    from captra_tpu.training.trainer import Trainer

    results = {}
    for pwm in [int(x) for x in args.pwm.split(",")]:
        cfg = get_config("config_coordnet.yml", overrides={
            "obj_config": "obj_info_nocs.yml",
            "obj_category": args.category,
            "batch_size": args.batch,
            "grad_clip": args.grad_clip,
            "network/pwm_num": pwm,
            "network/norm": args.norm,
            "network/compute_dtype": args.dtype})
        assert cfg.obj.sym, "pwm ablation needs a sym category"
        trainer = Trainer(cfg, steps_per_epoch=200)
        key = jax.random.PRNGKey(0)
        cache = {}
        b0 = make_frame_batch(0, cfg.obj, batch=args.batch,
                              num_points=cfg.num_points)
        state = trainer.init_state(key, b0)
        t0, k, last = time.time(), key, {}
        for i in range(args.steps):
            ci = i % 157
            if ci not in cache:
                cache[ci] = make_frame_batch(ci, cfg.obj, batch=args.batch,
                                             num_points=cfg.num_points)
            k, sub = jax.random.split(k)
            state, loss, metrics = trainer.train_step(state, cache[ci], sub)
            if i % 200 == 0 or i == args.steps - 1:
                last = {kk: float(vv) for kk, vv in
                        {**loss, **metrics}.items()}
                print(f"[pwm={pwm}] step {i}: total={last['total_loss']:.4f}"
                      f" pwm={last.get('nocs_pwm_loss', 0):.4f}"
                      f" dist={last.get('nocs_dist_loss', 0):.4f}"
                      f" sdiff={last.get('sdiff', 0):.4f}", flush=True)
        print(f"[pwm={pwm}] {args.steps} steps in {time.time()-t0:.0f}s")
        results[pwm] = last
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
