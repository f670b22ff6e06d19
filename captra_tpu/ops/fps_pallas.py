"""Pallas TPU kernels for furthest-point sampling.

FPS is the one genuinely sequential hot op (npoint dependent iterations —
reference sampling_gpu.cu:92-253 runs one CUDA block per batch with a shared
-memory tree reduction).  The XLA `fori_loop` version round-trips the running
min-distance vector through HBM every step; these kernels keep coordinates
and the min-distance vector resident in VMEM for the whole sweep, so each
iteration is a pure VPU pass.

Two layouts, picked by batch size:

* packed (B >= 8): `SUBLANE` (8) point clouds fill the 8 sublanes of each
  [8, N] register tile — one per-iteration argmax/update serves 8 clouds at
  once, and wall time grows with ceil(B/8), not B.
* wide (B < 8): ONE cloud is spread across all 8 sublanes as [8, N/8], with
  a global (both-axes) argmax — per-iteration work is N/8 lanes instead of
  N, which is what the reference speed protocol (batch_size=1,
  network/test.py:95-96) needs.

Both are exact max-min FPS with deterministic start 0 and smallest-index
tie-breaking (bit-identical picks to the numpy oracle).

Planes entry points (`*_t`, input [B, 3, N]): the OTF crop pipeline keeps
clouds as coordinate planes so the [N, 3] <-> [3, N] transpose (pathological
on TPU: minor dim 3) never materializes on the hot path.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANE = 8
_OUT_CHUNK = 128  # flush picks to the out ref one lane-tile at a time


def _store_chunked(npoint: int, out_ref, buf_ref, pick_loop):
    """Drive `pick_loop(i, farthest) -> farthest [rows, 1]` for npoint
    iterations, accumulating picks in a [rows, 128] VMEM scratch that is
    flushed to `out_ref` once per 128 picks.  Writing each pick straight
    into the [SUBLANE, npoint] out_ref costs a full npoint/128-register
    masked pass per iteration — at npoint=4096 that (32 vregs) exceeds the
    distance-update work itself.  (A loop-carried register buffer instead
    of the scratch ref trips a Mosaic replicated-layout relayout bug.)"""
    CH = _OUT_CHUNK
    rows = out_ref.shape[0]
    if npoint % CH == 0:
        buf_lane = jax.lax.broadcasted_iota(jnp.int32, (rows, CH), 1)

        def chunk(j, farthest):
            def body(k, far):
                buf_ref[:] = jnp.where(buf_lane == k, far, buf_ref[:])
                return pick_loop(j * CH + k, far)

            farthest = jax.lax.fori_loop(0, CH, body, farthest)
            out_ref[:, pl.ds(pl.multiple_of(j * CH, CH), CH)] = buf_ref[:]
            return farthest

        jax.lax.fori_loop(0, npoint // CH, chunk,
                          jnp.zeros((rows, 1), jnp.int32))
    else:
        out_idx = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
        out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, farthest):
            out_ref[:] = jnp.where(out_idx == i, farthest, out_ref[:])
            return pick_loop(i, farthest)

        jax.lax.fori_loop(0, npoint, body, jnp.zeros((rows, 1), jnp.int32))


def _fps_kernel(npoint: int, xyz_ref, out_ref, dist_ref, buf_ref):
    # packed: xyz_ref [3, SUBLANE, N] (8 independent clouds, one per
    # sublane); out_ref [SUBLANE, npoint]; dist_ref scratch [SUBLANE, N].
    x = xyz_ref[0]  # [SUBLANE, N]
    y = xyz_ref[1]
    z = xyz_ref[2]
    dist_ref[:] = jnp.full_like(dist_ref, 1e10)
    n = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)         # [S, N]

    def pick(i, farthest):  # farthest: [S, 1] int32
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
        return jnp.min(jnp.where(dist == m, lane, n), axis=-1,
                       keepdims=True).astype(jnp.int32)

    _store_chunked(npoint, out_ref, buf_ref, pick)


def _fps_wide_kernel(npoint: int, xyz_ref, rows_ref, out_ref, dist_ref,
                     buf_ref):
    # wide: ONE cloud per grid cell, blocked across all 8 sublanes:
    # xyz_ref [3, SUBLANE, C] where point i lives at (i // C, i % C);
    # rows_ref [3, W/128, 128] view of the same points for O(1) extraction;
    # out_ref [SUBLANE, npoint] (all rows identical — Mosaic wants 8-row
    # blocks); dist_ref scratch [SUBLANE, C].
    x = xyz_ref[0]  # [S, C]
    y = xyz_ref[1]
    z = xyz_ref[2]
    S, C = x.shape
    dist_ref[:] = jnp.full_like(dist_ref, 1e10)
    gidx = (jax.lax.broadcasted_iota(jnp.int32, (S, C), 0) * C +
            jax.lax.broadcasted_iota(jnp.int32, (S, C), 1))
    total = S * C
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def pick(i, farthest):  # farthest: [S, 1] int32, rows identical
        f = farthest[0, 0]
        # dynamic point load from the [3, W/128, 128] row-view: the chunk
        # index is a (supported) dynamic *sublane* index and the lane slice
        # is static, then one 1-register masked reduce per coordinate — vs
        # three masked max-reductions over the full [S, C] tile
        chunk = rows_ref[:, pl.ds(f // 128, 1), :]            # [3, 1, 128]
        sel = lane128 == f % 128
        v = jnp.max(jnp.where(sel[None], chunk, jnp.float32(-jnp.inf)),
                    axis=-1)                                  # [3, 1]
        d = ((x - v[0, 0]) ** 2 + (y - v[1, 0]) ** 2 + (z - v[2, 0]) ** 2)
        dist = jnp.minimum(dist_ref[:], d)
        dist_ref[:] = dist
        # global argmax with smallest-flat-index tie-break (same convention
        # as the packed kernel's per-row lane min, and as jnp.argmax)
        m = jnp.max(dist)
        nxt = jnp.min(jnp.where(dist == m, gidx, total)).astype(jnp.int32)
        return jnp.broadcast_to(nxt.reshape(1, 1), (SUBLANE, 1))

    _store_chunked(npoint, out_ref, buf_ref, pick)


def _fps_blocked_kernel(npoint: int, ntiles: int, xyz_rows_ref, out_ref,
                        dist_ref, bm_ref, bb_ref, buf_ref):
    """Blocked lazy-update exact FPS for LARGE single clouds.

    The wide kernel pays a full distance-update pass (N/1024 vregs x 3
    coords) plus a full-array argmax tree per pick; at the OTF crop size
    (N ~ 20k, npoint 4096) that is ~2.3 ms of the 4 ms frame.  This kernel
    keeps two auxiliary structures so most of that work is skipped:

    * `bm[s, j]` — the running max of dist over row `8*j + s` (rows are 128
      CONTIGUOUS input points; the crop feeds scan-order points, so rows
      are spatially coherent);
    * per-row axis-aligned bounding boxes (`bb`, computed once).

    Per pick: a ONE-vreg lower-bound test (point-to-bbox distance vs bm)
    selects which 8-row tiles the new pick could possibly shrink —
    `min(dist_j, d_j) == dist_j` whenever `lb^2 >= max_row(dist)`, so
    skipped tiles are bit-identical, not approximated (an ulp-safety
    factor keeps the f32-rounded lb conservative).  The global argmax then
    reduces over `bm` (one vreg) instead of the full array, followed by a
    single dynamic-row load for the in-row index.  Late in the sweep a
    pick touches only a few tiles, so per-pick cost drops from O(N) to
    O(touched) + O(ntiles).

    Same max-min semantics, deterministic start 0, smallest-flat-index
    tie-breaking as the other kernels (sampling_gpu.cu:92-253 /
    pointnet_utils.py:127-138 conventions).
    """
    T = ntiles
    R = T * SUBLANE
    dist_ref[:] = jnp.full_like(dist_ref, 1e10)
    bm_ref[:] = jnp.full_like(bm_ref, 1e10)
    # per-row bounding boxes, once: column j <- rows 8j..8j+8
    for j in range(T):
        sl = pl.ds(j * SUBLANE, SUBLANE)
        xt = xyz_rows_ref[0, sl, :]
        yt = xyz_rows_ref[1, sl, :]
        zt = xyz_rows_ref[2, sl, :]
        cj = pl.ds(j, 1)
        bb_ref[0, :, cj] = jnp.min(xt, axis=-1, keepdims=True)
        bb_ref[1, :, cj] = jnp.max(xt, axis=-1, keepdims=True)
        bb_ref[2, :, cj] = jnp.min(yt, axis=-1, keepdims=True)
        bb_ref[3, :, cj] = jnp.max(yt, axis=-1, keepdims=True)
        bb_ref[4, :, cj] = jnp.min(zt, axis=-1, keepdims=True)
        bb_ref[5, :, cj] = jnp.max(zt, axis=-1, keepdims=True)

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    # block id (s, j) -> row 8j + s; flat point = row * 128 + lane
    bidx = (jax.lax.broadcasted_iota(jnp.int32, (SUBLANE, T), 0) +
            SUBLANE * jax.lax.broadcasted_iota(jnp.int32, (SUBLANE, T), 1))
    pow2 = jax.lax.shift_left(
        jnp.int32(1),
        jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)).astype(jnp.float32)

    def pick(i, farthest):  # farthest: [SUBLANE, 1] int32, rows identical
        f = farthest[0, 0]
        chunk = xyz_rows_ref[:, pl.ds(f // 128, 1), :]        # [3, 1, 128]
        sel = lane128 == f % 128
        v = jnp.max(jnp.where(sel[None], chunk, jnp.float32(-jnp.inf)),
                    axis=-1)                                  # [3, 1]
        px, py, pz = v[0, 0], v[1, 0], v[2, 0]
        # lower-bound (point -> row bbox) distance^2, [SUBLANE, T]
        dx = jnp.maximum(jnp.maximum(bb_ref[0] - px, px - bb_ref[1]), 0.0)
        dy = jnp.maximum(jnp.maximum(bb_ref[2] - py, py - bb_ref[3]), 0.0)
        dz = jnp.maximum(jnp.maximum(bb_ref[4] - pz, pz - bb_ref[5]), 0.0)
        lb2 = (dx * dx + dy * dy + dz * dz) * jnp.float32(0.999999)
        need = lb2 < bm_ref[:]
        bits = jnp.sum(jnp.max(jnp.where(need, pow2, 0.0), axis=0,
                               keepdims=True)).astype(jnp.int32)
        for j in range(T):
            @pl.when(((bits >> j) & 1) == 1)
            def _update(j=j):
                sl = pl.ds(j * SUBLANE, SUBLANE)
                d = ((xyz_rows_ref[0, sl, :] - px) ** 2 +
                     (xyz_rows_ref[1, sl, :] - py) ** 2 +
                     (xyz_rows_ref[2, sl, :] - pz) ** 2)
                dc = jnp.minimum(dist_ref[sl, :], d)
                dist_ref[sl, :] = dc
                bm_ref[:, pl.ds(j, 1)] = jnp.max(dc, axis=-1, keepdims=True)
        # argmax over row maxima, then within the winning row
        bm = bm_ref[:]
        m = jnp.max(bm)
        rbest = jnp.min(jnp.where(bm == m, bidx, R)).astype(jnp.int32)
        row = dist_ref[pl.ds(rbest, 1), :]                    # [1, 128]
        lbest = jnp.min(jnp.where(row == m, lane128, 128),
                        axis=-1, keepdims=True)               # [1, 1]
        nxt = rbest * 128 + lbest[0, 0].astype(jnp.int32)
        return jnp.broadcast_to(jnp.reshape(nxt, (1, 1)), (SUBLANE, 1))

    _store_chunked(npoint, out_ref, buf_ref, pick)


# the bits mask packs one tile-needs-update flag per power of two in an
# exactly-representable f32 sum: 24 tiles (24576 points) is the cap
_BLOCKED_MAX_TILES = 24
_BLOCKED_MIN_POINTS = 8 * SUBLANE * 128  # below this the wide kernel wins


def _use_blocked() -> bool:
    """Opt-in (CAPTRA_FPS_BLOCKED=1): measured END-TO-END in the OTF b1
    tracking scan, the blocked lazy-update kernel REGRESSED the frame time
    (6.6 ms vs 4.0 ms wide, bench.py otf_b1 150.7 vs 251.5 fps) despite
    winning isolated microbenches — the per-pick tile-mask bookkeeping and
    20-way unrolled @pl.when chain cost more than the pruning saves at the
    crop's ~20k-point scale (and isolated timings through the remote
    tunnel are unreliable: repeated (program, input) dispatches get served
    from a cache).  Kept for experimentation on bigger clouds."""
    return os.environ.get("CAPTRA_FPS_BLOCKED") == "1"


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas_blocked_t(xyz_t: jnp.ndarray, npoint: int,
                         interpret: bool = False) -> jnp.ndarray:
    """Blocked lazy-update FPS on planes input [B, 3, N] -> [B, npoint]."""
    B, _, N = xyz_t.shape
    TILE = SUBLANE * 128
    T = -(-N // TILE)
    assert T <= _BLOCKED_MAX_TILES, "use the wide kernel beyond 24k points"
    Np = T * TILE
    R = T * SUBLANE
    xyz_t = xyz_t.astype(jnp.float32)
    if Np != N:
        # pad with copies of point 0 (distance-0 duplicates; see wide)
        pad = jnp.broadcast_to(xyz_t[:, :, :1], (B, 3, Np - N))
        xyz_t = jnp.concatenate([xyz_t, pad], axis=-1)
    rows = xyz_t.reshape(B, 3, R, 128)
    rows = jnp.swapaxes(rows, 0, 1).reshape(3, B * R, 128)
    out = pl.pallas_call(
        functools.partial(_fps_blocked_kernel, npoint, T),
        grid=(B,),
        in_specs=[pl.BlockSpec((3, R, 128), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SUBLANE, npoint), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * SUBLANE, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((R, 128), jnp.float32),
                        pltpu.VMEM((SUBLANE, T), jnp.float32),
                        pltpu.VMEM((6, SUBLANE, T), jnp.float32),
                        pltpu.VMEM((SUBLANE, _OUT_CHUNK), jnp.int32)],
        interpret=interpret,
    )(rows)
    return out.reshape(B, SUBLANE, npoint)[:, 0]


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas_wide(xyz: jnp.ndarray, npoint: int,
                    interpret: bool = False) -> jnp.ndarray:
    """Wide-layout FPS on [B, N, 3] input (see module docstring)."""
    return fps_pallas_wide_t(jnp.swapaxes(xyz, -1, -2), npoint,
                             interpret=interpret)


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas_wide_t(xyz_t: jnp.ndarray, npoint: int,
                      interpret: bool = False) -> jnp.ndarray:
    """Wide-layout FPS on planes input xyz_t [B, 3, N] -> [B, npoint]."""
    B, _, N = xyz_t.shape
    C = -(-N // (SUBLANE * 128)) * 128      # lane-aligned row length
    Np = SUBLANE * C
    xyz_t = xyz_t.astype(jnp.float32)
    if Np != N:
        # pad with copies of point 0: distance-0 duplicates that can never
        # win a max-min pick while any real point remains (ties break to
        # the smaller flat index, and pads sit at the end)
        pad = jnp.broadcast_to(xyz_t[:, :, :1], (B, 3, Np - N))
        xyz_t = jnp.concatenate([xyz_t, pad], axis=-1)
    blocked = xyz_t.reshape(B, 3, SUBLANE, C)
    blocked = jnp.swapaxes(blocked, 0, 1).reshape(3, B * SUBLANE, C)
    R = Np // 128  # 128-wide row-view for O(1) point extraction
    rows = xyz_t.reshape(B, 3, R, 128)
    rows = jnp.swapaxes(rows, 0, 1).reshape(3, B * R, 128)
    out = pl.pallas_call(
        functools.partial(_fps_wide_kernel, npoint),
        grid=(B,),
        in_specs=[pl.BlockSpec((3, SUBLANE, C), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((3, R, 128), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SUBLANE, npoint), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * SUBLANE, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((SUBLANE, C), jnp.float32),
                        pltpu.VMEM((SUBLANE, _OUT_CHUNK), jnp.int32)],
        interpret=interpret,
    )(blocked, rows)
    return out.reshape(B, SUBLANE, npoint)[:, 0]


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas_t(xyz_t: jnp.ndarray, npoint: int,
                 interpret: bool = False) -> jnp.ndarray:
    """Planes-input FPS dispatch: xyz_t [B, 3, N] -> indices [B, npoint].

    Small batches go to the wide single-cloud kernel (full VPU row
    utilization per cloud); full sublane tiles use the packed kernel —
    reached from planes layout by a cheap batch-axis transpose only.
    """
    B, _, N = xyz_t.shape
    if (B < SUBLANE and _use_blocked()
            and _BLOCKED_MIN_POINTS <= N <= _BLOCKED_MAX_TILES * SUBLANE * 128):
        return fps_pallas_blocked_t(xyz_t, npoint, interpret=interpret)
    if B < SUBLANE and N >= SUBLANE * 128:
        return fps_pallas_wide_t(xyz_t, npoint, interpret=interpret)
    Bp = -(-B // SUBLANE) * SUBLANE
    xyz_t = xyz_t.astype(jnp.float32)
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
        scratch_shapes=[pltpu.VMEM((SUBLANE, N), jnp.float32),
                        pltpu.VMEM((SUBLANE, _OUT_CHUNK), jnp.int32)],
        interpret=interpret,
    )(xyz_t)
    return out[:B]


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas(xyz: jnp.ndarray, npoint: int,
               interpret: bool = False) -> jnp.ndarray:
    """xyz [B, N, 3] -> int32 indices [B, npoint]; deterministic start 0."""
    return fps_pallas_t(jnp.swapaxes(xyz, -1, -2), npoint,
                        interpret=interpret)
