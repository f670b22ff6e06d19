"""Pallas TPU kernel for furthest-point sampling.

FPS is the one genuinely sequential hot op (npoint dependent iterations —
reference sampling_gpu.cu:92-253 runs one CUDA block per batch with a shared
-memory tree reduction).  The XLA `fori_loop` version round-trips the running
min-distance vector through HBM every step; this kernel keeps coordinates and
the min-distance vector resident in VMEM for the whole sweep, so each
iteration is a pure VPU pass.

Batching strategy: TPU grid cells execute sequentially on a core, so instead
of one batch row per grid step we pack `SUBLANE` (8) point clouds into the 8
sublanes of each [8, N] register tile — the per-iteration argmax/update then
serves 8 clouds at once, and wall time grows with ceil(B/8), not B.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANE = 8


def _fps_kernel(npoint: int, xyz_ref, out_ref, dist_ref):
    # xyz_ref: [3, SUBLANE, N]; out_ref: [SUBLANE, npoint]; dist_ref scratch
    x = xyz_ref[0]  # [SUBLANE, N]
    y = xyz_ref[1]
    z = xyz_ref[2]
    dist_ref[:] = jnp.full_like(dist_ref, 1e10)
    n = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)         # [S, N]
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (SUBLANE, npoint), 1)

    out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, farthest):  # farthest: [S, 1] int32
        # accumulate picks in the output ref (a loop-carried vector hits a
        # Mosaic relayout bug; the ref read-modify-write lowers cleanly)
        out_ref[:] = jnp.where(out_lane == i, farthest, out_ref[:])
        sel = lane == farthest
        neg_inf = jnp.float32(-jnp.inf)
        cx = jnp.max(jnp.where(sel, x, neg_inf), axis=-1, keepdims=True)
        cy = jnp.max(jnp.where(sel, y, neg_inf), axis=-1, keepdims=True)
        cz = jnp.max(jnp.where(sel, z, neg_inf), axis=-1, keepdims=True)
        d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        dist = jnp.minimum(dist_ref[:], d)
        dist_ref[:] = dist
        # per-row argmax: max value then smallest lane attaining it
        m = jnp.max(dist, axis=-1, keepdims=True)
        nxt = jnp.min(jnp.where(dist == m, lane, n), axis=-1,
                      keepdims=True).astype(jnp.int32)
        return nxt

    jax.lax.fori_loop(0, npoint, body, jnp.zeros((SUBLANE, 1), jnp.int32))


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas(xyz: jnp.ndarray, npoint: int,
               interpret: bool = False) -> jnp.ndarray:
    """xyz [B, N, 3] -> int32 indices [B, npoint]; deterministic start 0."""
    B, N, _ = xyz.shape
    Bp = -(-B // SUBLANE) * SUBLANE
    xyz_t = jnp.swapaxes(xyz, -1, -2).astype(jnp.float32)  # [B, 3, N]
    if Bp != B:
        xyz_t = jnp.pad(xyz_t, ((0, Bp - B), (0, 0), (0, 0)))
    xyz_t = jnp.swapaxes(xyz_t, 0, 1)  # [3, Bp, N]
    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint),
        grid=(Bp // SUBLANE,),
        in_specs=[pl.BlockSpec((3, SUBLANE, N), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SUBLANE, npoint), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((SUBLANE, N), jnp.float32)],
        interpret=interpret,
    )(xyz_t)
    return out[:B]
