"""A/B the exact-FPS kernels on the real chip (wide vs blocked lazy-update).

Shapes mirror the OTF b1 crop: one cloud of work_factor*num_points = 20480
scan-order points, 4096 picks (data/preprocess.py::crop_and_sample_depth),
plus the backbone SA sizes.  Verifies bit-identical picks, then times with
DISTINCT inputs per rep (the remote tunnel caches identical dispatches).

  python scripts/bench_fps_kernels.py [--n 20480] [--npoint 4096]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20480)
    ap.add_argument("--npoint", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from captra_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from captra_tpu.ops.fps_pallas import (fps_pallas_blocked_t,
                                           fps_pallas_wide_t)

    rng = np.random.RandomState(0)
    clouds = []
    for r in range(args.reps):
        xyz = rng.randn(1, args.n, 3).astype(np.float32) * 0.3
        xyz = xyz[:, np.argsort(xyz[0, :, 1])]  # scan-order-ish coherence
        clouds.append(jnp.asarray(np.swapaxes(xyz, 1, 2)))

    for name, fn in [("wide", fps_pallas_wide_t),
                     ("blocked", fps_pallas_blocked_t)]:
        f = jax.jit(lambda x, fn=fn: fn(x, args.npoint))
        t0 = time.time()
        out = jax.block_until_ready(f(clouds[0]))
        print(f"# {name} compile+warm {time.time() - t0:.1f}s")
        t0 = time.perf_counter()
        for c in clouds:
            out = f(c)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.reps
        print(f"# {name}: {dt * 1e3:.3f} ms/call "
              f"({dt / args.npoint * 1e9:.0f} ns/pick)")

    a = jax.jit(lambda x: fps_pallas_wide_t(x, args.npoint))(clouds[0])
    b = jax.jit(lambda x: fps_pallas_blocked_t(x, args.npoint))(clouds[0])
    same = bool(jnp.all(a == b))
    print(f"# picks identical: {same}")
    if not same:
        d = np.flatnonzero(np.asarray(a[0]) != np.asarray(b[0]))
        print(f"# FIRST DIVERGENCE at pick {d[0]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
