"""A/B the exact-FPS kernels on the real chip (wide vs blocked lazy-update).

Shapes mirror the OTF b1 crop: one cloud of work_factor*num_points = 20480
scan-order points, 4096 picks (data/preprocess.py::crop_and_sample_depth),
plus the backbone SA sizes.  Verifies bit-identical picks.

Timing caveat — DO NOT TRUST THE ABSOLUTE NUMBERS.  Even with every
iteration's input depending on the previous iteration's OUTPUT (a roll by
picks[-1] % 8) inside one jitted lax.fori_loop, the measured per-call
times through the remote tunnel came back physically impossible
(~1 ns/pick for a 4096-pick serial kernel), so some layer still serves or
overlaps the work.  The only honest verdict for kernel changes is the
END-TO-END tracking bench (`bench.py` otf_b1), which is how the blocked
kernel was evaluated (and rejected: 150.7 vs 251.5 fps in-dispatch).
This script remains useful for pick-identity verification only.

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
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--coherent", type=int, default=1,
                    help="1: sort points scan-order-ish (spatially coherent "
                         "128-point rows, the blocked kernel's best case); "
                         "0: random order (its worst case)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from captra_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from captra_tpu.ops.fps_pallas import (fps_pallas_blocked_t,
                                           fps_pallas_wide_t)

    rng = np.random.RandomState(0)
    def cloud():
        xyz = rng.randn(1, args.n, 3).astype(np.float32) * 0.3
        if args.coherent:
            xyz = xyz[:, np.argsort(xyz[0, :, 1])]
        return jnp.asarray(np.swapaxes(xyz, 1, 2))        # [1, 3, N]

    # distinct warmup vs timed inputs: the tunnel serves repeated
    # (program, input) pairs from cache
    x0, x1 = cloud(), cloud()

    def chained(fn):
        @jax.jit
        def run(x):
            def body(_, x):
                idx = fn(x, args.npoint)                  # [1, npoint]
                # next input depends on this output: roll the lane axis by
                # the last pick (mod 8, keeps geometry statistics intact)
                sh = idx[0, -1] % 8
                return jnp.roll(x, sh, axis=-1)
            return jax.lax.fori_loop(0, args.iters, body, x)
        return run

    for name, fn in [("wide", fps_pallas_wide_t),
                     ("blocked", fps_pallas_blocked_t)]:
        f = chained(fn)
        t0 = time.time()
        jax.block_until_ready(f(x0))
        print(f"# {name} compile+warm {time.time() - t0:.1f}s")
        t0 = time.perf_counter()
        jax.block_until_ready(f(x1))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"# {name}: {dt * 1e3:.3f} ms/call "
              f"({dt / args.npoint * 1e9:.0f} ns/pick)")

    a = jax.jit(lambda x: fps_pallas_wide_t(x, args.npoint))(x0)
    b = jax.jit(lambda x: fps_pallas_blocked_t(x, args.npoint))(x0)
    same = bool(jnp.all(a == b))
    print(f"# picks identical: {same}")


if __name__ == "__main__":
    main()
