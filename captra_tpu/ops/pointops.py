"""Point-cloud ops: FPS, ball query, kNN, 3-NN interpolation, gather/group.

TPU-native equivalents of the reference CUDA extension
(/root/reference/network/models/pointnet_lib/src/*.cu) whose executable spec
is the pure-torch fallback path (/root/reference/network/models/
pointnet_utils.py:12-168).  Everything here is fixed-shape, jittable and
differentiable through XLA (gathers get scatter-add gradients for free — the
reference hand-writes atomicAdd backward kernels, sampling_gpu.cu:45-62).

A Pallas VMEM-resident FPS kernel lives in `captra_tpu.ops.fps_pallas`;
`farthest_point_sample` dispatches to it on TPU for large inputs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared L2: src [B, N, C], dst [B, M, C] -> [B, N, M]
    (reference pointnet_utils.py:56-77).  Uses one MXU matmul + rank-1 terms
    instead of materializing [B, N, M, C] differences."""
    d = -2.0 * (src @ jnp.swapaxes(dst, -1, -2))
    d += jnp.sum(src**2, axis=-1, keepdims=True)
    d += jnp.sum(dst**2, axis=-1)[..., None, :]
    return d


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("npoint", "use_pallas", "mode"))
def farthest_point_sample(xyz: jnp.ndarray, npoint: int,
                          use_pallas: bool | None = None,
                          mode: str = "exact") -> jnp.ndarray:
    """Iterative max-min sampling: xyz [B, N, 3] -> indices [B, npoint].

    Deterministic start at index 0 (the CUDA kernel's convention,
    sampling_gpu.cu:92-253; the torch fallback randomizes —
    pointnet_utils.py:129).  Invalid/padded points can be pushed to the end by
    setting their coords to a far sentinel before calling.

    mode "grouped" is the stratified 8-way approximation (see
    `farthest_point_sample_grouped_t`): npoint/8 sequential picks per
    stratum, all strata in parallel — a latency win at small batch, a
    documented deviation from exact FPS.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if mode == "grouped":
        B, N, _ = xyz.shape
        G = 8
        if npoint < 2 * G:
            # with <2 picks per stratum every stratum returns only its
            # deterministic start (local index 0) — the "sample" would be
            # global points 0..G-1 regardless of geometry; exact FPS at
            # this npoint is cheap anyway
            return farthest_point_sample(xyz, npoint, use_pallas=use_pallas)
        idx = farthest_point_sample(
            jnp.moveaxis(xyz.reshape(B, N // G, G, 3), 2, 1)
            .reshape(B * G, N // G, 3),
            npoint // G, use_pallas=use_pallas)
        g = jnp.arange(G, dtype=idx.dtype)[None, :, None]
        return (idx.reshape(B, G, npoint // G) * G + g).reshape(B, npoint)
    if use_pallas:
        from captra_tpu.ops.fps_pallas import fps_pallas
        return fps_pallas(xyz, npoint)
    return _fps_xla(xyz, npoint)


@functools.partial(jax.jit, static_argnames=("npoint", "groups",
                                             "use_pallas"))
def farthest_point_sample_grouped_t(xyz_t: jnp.ndarray, npoint: int,
                                    groups: int = 8,
                                    use_pallas: bool | None = None
                                    ) -> jnp.ndarray:
    """Grouped (stratified-approximate) FPS on planes input xyz_t [B, 3, N]
    -> indices [B, npoint].

    Splits each cloud into `groups` interleaved strata (point i -> group
    i % groups) and FPS-samples npoint/groups from each stratum
    independently — on TPU all strata run as parallel sublane rows of the
    packed Pallas kernel, so the sequential pick count drops from npoint to
    npoint/groups (the exact single-cloud kernel is latency-bound at
    ~0.5 us/pick regardless of width).

    DEVIATION from exact FPS: per-stratum quotas are fixed, so the sample
    is "FPS of a random 1/groups subsample, x groups" rather than one
    global max-min sweep.  This is the same species of approximation the
    reference itself applies before FPS (random 5x-npoint subsample,
    data_utils.py:147-153); tracking-metric deltas are quantified in
    tests/test_approx_parity.py.
    """
    B, _, N = xyz_t.shape
    if N % groups or npoint % groups:
        raise ValueError(f"N={N} and npoint={npoint} must divide groups="
                         f"{groups}")
    if npoint < 2 * groups:
        # degenerate stratification (1 pick/stratum = the deterministic
        # start): exact FPS instead — see farthest_point_sample
        return farthest_point_sample(jnp.swapaxes(xyz_t, -1, -2), npoint,
                                     use_pallas=use_pallas)
    Ng = N // groups
    xg = xyz_t.reshape(B, 3, Ng, groups)
    xg = jnp.moveaxis(xg, -1, 1).reshape(B * groups, 3, Ng)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from captra_tpu.ops.fps_pallas import fps_pallas_t
        idx = fps_pallas_t(xg, npoint // groups)
    else:
        idx = _fps_xla(jnp.swapaxes(xg, -1, -2), npoint // groups)
    g = jnp.arange(groups, dtype=idx.dtype)[None, :, None]
    flat = idx.reshape(B, groups, npoint // groups) * groups + g
    return flat.reshape(B, npoint)


def _fps_xla(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    B, N, _ = xyz.shape

    def body(i, state):
        dist, farthest, centroids = state
        centroids = centroids.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)
        d = jnp.sum((xyz - centroid) ** 2, axis=-1)  # [B, N]
        dist = jnp.minimum(dist, d)
        farthest = jnp.argmax(dist, axis=-1).astype(jnp.int32)
        return dist, farthest, centroids

    init = (jnp.full((B, N), 1e10, xyz.dtype),
            jnp.zeros((B,), jnp.int32),
            jnp.zeros((B, npoint), jnp.int32))
    _, _, centroids = jax.lax.fori_loop(0, npoint, body, init)
    return centroids


# ---------------------------------------------------------------------------
# neighborhood queries
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("nsample", "method"))
def ball_query(radius: float, nsample: int, xyz: jnp.ndarray,
               new_xyz: jnp.ndarray, method: str | None = None
               ) -> jnp.ndarray:
    """`nsample` in-radius neighbors, slots padded with the first hit:
    xyz [B, N, 3], new_xyz [B, S, 3] -> idx [B, S, nsample] (reference
    pointnet_utils.py:141-168 / ball_query_gpu.cu:9-46; queries with zero
    hits return index 0).

    method:
      "exact"  — first nsample in-radius points in index order, bit-exact
                 with the reference fallback (lax.top_k; slow on TPU — a full
                 [B, S, N] sort, ~18 ms at B=16/N=4096).
      "approx" — TPU-native `lax.approx_max_k` selection (~20x faster).
                 Picks an approximate lowest-index subset of the in-radius
                 points.  Since the data pipeline shuffles point order, the
                 reference's index-order criterion is itself a uniform random
                 subset — the sampling distribution is preserved.
      None     — "approx" on TPU, "exact" elsewhere.
    """
    if method is None:
        method = "approx" if jax.default_backend() == "tpu" else "exact"
    N = xyz.shape[1]
    sqr = square_distance(new_xyz, xyz)  # [B, S, N]
    in_ball = sqr <= radius * radius
    order = jax.lax.broadcasted_iota(jnp.int32, sqr.shape, 2)
    key = jnp.where(in_ball, order, N)  # out-of-ball -> sentinel N
    if method == "exact":
        # nsample smallest keys in ascending order == top_k of negated keys
        neg_vals, _ = jax.lax.top_k(-key, nsample)
        sel = -neg_vals  # [B, S, nsample], ascending; N where missing
        first = sel[..., :1]
        first = jnp.where(first < N, first, 0)
        return jnp.where(sel < N, sel, first)
    neg_vals, _ = jax.lax.approx_max_k(-key.astype(jnp.float32), nsample,
                                       recall_target=0.95)
    sel = (-neg_vals).astype(jnp.int32)
    valid = sel < N
    # pad misses with the first (lowest-index) hit; 0 if no hit at all
    first = jnp.min(jnp.where(valid, sel, N), axis=-1, keepdims=True)
    first = jnp.where(first < N, first, 0)
    return jnp.where(valid, sel, first)


@functools.partial(jax.jit, static_argnames=("k",))
def knn(k: int, query: jnp.ndarray, data: jnp.ndarray):
    """k nearest neighbors of `query` [B, S, 3] among `data` [B, N, 3]
    -> (dists [B, S, k] L2, idx [B, S, k]) (reference knn_point,
    pointnet_utils.py:12-32)."""
    sqr = square_distance(query, data)
    neg, idx = jax.lax.top_k(-sqr, k)
    return jnp.sqrt(jnp.clip(-neg, 0.0, None)), idx


@jax.jit
def three_nn(xyz1: jnp.ndarray, xyz2: jnp.ndarray):
    """3 nearest neighbors of xyz1 [B, N, 3] among xyz2 [B, M, 3]
    -> (sq_dists [B, N, 3], idx [B, N, 3]); distances stay **squared**, as
    both reference paths feed them to inverse-distance weights unrooted
    (pointnet_utils.py:35-43, interpolate_gpu.cu:82-146).

    Implemented as 3 successive masked argmins — exact, and pure VPU passes
    instead of lax.top_k's full sort (~10x faster on TPU for M=512)."""
    sqr = square_distance(xyz1, xyz2)
    col = jax.lax.broadcasted_iota(jnp.int32, sqr.shape, 2)
    dists, idxs = [], []
    for _ in range(3):
        # min + argmin as fused reductions — a take_along_axis(argmin) gather
        # from the [B, N, M] matrix costs ~1 ms at B=16 on v5e
        v = jnp.min(sqr, axis=-1)
        i = jnp.argmin(sqr, axis=-1).astype(jnp.int32)   # [B, N]
        dists.append(v)
        idxs.append(i)
        sqr = jnp.where(col == i[..., None], jnp.inf, sqr)
    return jnp.stack(dists, axis=-1), jnp.stack(idxs, axis=-1)


@jax.jit
def three_interpolate(points: jnp.ndarray, idx: jnp.ndarray,
                      weight: jnp.ndarray) -> jnp.ndarray:
    """Weighted 3-NN feature interpolation: points [B, C, M], idx [B, N, 3],
    weight [B, N, 3] -> [B, C, N] (reference pointnet_utils.py:46-53)."""
    gathered = jnp.take_along_axis(points[:, :, None, :], idx[:, None, :, :],
                                   axis=-1)  # [B, C, N, 3]
    return jnp.sum(gathered * weight[:, None], axis=-1)


@functools.partial(jax.jit, static_argnames=("method",))
def three_interp_rows(feats: jnp.ndarray, idx: jnp.ndarray,
                      weight: jnp.ndarray, method: str | None = None
                      ) -> jnp.ndarray:
    """Row-layout 3-NN interpolation: feats [B, M, C], idx/weight [B, N, 3]
    -> [B, N, C].

    method "dense" (TPU default for M <= 1024) builds the sparse
    interpolation operator as a dense [B, N, M] matrix (3 compare+select
    passes) and applies it as one MXU matmul — ~2x faster than the
    [B*N*3, C] row gather on v5e.  "gather" is the direct formulation.
    """
    if method is None:
        method = ("dense" if jax.default_backend() == "tpu"
                  and feats.shape[1] <= 1024 else "gather")
    if method == "gather":
        g = jnp.take_along_axis(feats[:, None], idx[..., None], axis=-2)
        # g: [B, N, 3, C]
        return jnp.sum(g * weight[..., None], axis=-2)
    B, M, C = feats.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (B, idx.shape[1], M), 2)
    W = jnp.zeros((B, idx.shape[1], M), feats.dtype)
    for j in range(3):
        W = W + jnp.where(col == idx[..., j][..., None],
                          weight[..., j][..., None], 0.0).astype(feats.dtype)
    return jnp.einsum("bnm,bmc->bnc", W, feats)


@functools.partial(jax.jit, static_argnames=("nsample", "method"))
def ball_group(radius: float, nsample: int, xyz: jnp.ndarray,
               new_xyz: jnp.ndarray, feats: jnp.ndarray | None = None,
               method: str | None = None) -> jnp.ndarray:
    """Fused ball query + neighborhood grouping:
    -> [B, S, nsample, D+3] of (features..., xyz - query_center).

    method "bucket" (TPU default) is the sort-free, gather-free design:
    candidates split into `nsample` contiguous buckets of G = N/nsample;
    each bucket contributes its first in-radius point, selected by a one-hot
    built from a per-bucket argmax and applied as a dense MXU contraction
    ('bskg,bkgc->bskc').  Profiling on v5e shows the alternative paths are
    dominated by a full [B, S, N] sort (lax.top_k / approx_top_k fallback)
    plus 1M-row 3-float gathers (latency-bound) — the bucket path replaces
    both with VPU mask passes + one matmul.

    With shuffled point order (the data pipeline guarantees it) a one-per-
    bucket pick is a uniform spread subset of the in-ball points, matching
    the reference's effective sampling distribution ("first K in index
    order" over shuffled indices, pointnet_utils.py:141-168).  Empty buckets
    fall back to the query's first in-radius point (the reference's pad
    rule); queries with zero hits contribute point 0.

    Other methods route through `ball_query` + gather (exact reference
    semantics — the CPU/test default).
    """
    if method is None:
        method = "bucket" if jax.default_backend() == "tpu" else "exact"
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]

    if method != "bucket" or N % nsample != 0:
        src = xyz if feats is None else jnp.concatenate([feats, xyz],
                                                        axis=-1)
        C = src.shape[-1] - 3  # feature channels before the xyz block
        idx = ball_query(radius, nsample, xyz, new_xyz,
                         method=None if method == "bucket" else method)
        flat = idx.reshape(B, S * nsample)
        g = jnp.take_along_axis(src, flat[..., None], axis=1)
        g = g.reshape(B, S, nsample, src.shape[-1])
        rel = g[..., C:] - new_xyz[:, :, None]
        return jnp.concatenate([g[..., :C], rel], axis=-1) \
            if C else rel

    G = N // nsample
    sqr = square_distance(new_xyz, xyz)                   # [B, S, N]
    in_ball = sqr <= radius * radius
    m = in_ball.reshape(B, S, nsample, G)
    found = jnp.any(m, axis=-1)                           # [B, S, K]
    first_in_bucket = jnp.argmax(m, axis=-1)              # [B, S, K]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, S, nsample, G), 3)
    oh = (lane == first_in_bucket[..., None]) & found[..., None]

    # pad empty buckets with the query's first hit (small [B, S] gather)
    any_hit = jnp.any(in_ball, axis=-1)
    first_idx = jnp.where(any_hit, jnp.argmax(in_ball, axis=-1), 0)

    # contract features and xyz separately: features stay in their (possibly
    # bf16) dtype for the MXU, xyz stays f32 for geometry — avoids an
    # upcast-to-f32 materialization of the whole [B, S, K, C+3] block
    def contract(values):
        vr = values.reshape(B, nsample, G, values.shape[-1])
        g = jnp.einsum("bskg,bkgc->bskc", oh.astype(values.dtype), vr)
        first_row = jnp.take_along_axis(values, first_idx[..., None], axis=1)
        return jnp.where(found[..., None], g, first_row[:, :, None])

    g_xyz = contract(xyz)
    rel = g_xyz - new_xyz[:, :, None]
    if feats is None:
        return rel
    g_feats = contract(feats)
    return jnp.concatenate([g_feats, rel.astype(feats.dtype)], axis=-1)


# ---------------------------------------------------------------------------
# gather / group
# ---------------------------------------------------------------------------

@jax.jit
def gather_points(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """features [B, C, N], idx [B, M] -> [B, C, M]
    (reference gather_operation, pointnet_utils.py:100-103)."""
    return jnp.take_along_axis(features, idx[:, None, :], axis=-1)


@jax.jit
def group_points(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """features [B, C, N], idx [B, M, K] -> [B, C, M, K]
    (reference group_operation, pointnet_utils.py:106-109)."""
    B, C, N = features.shape
    M, K = idx.shape[1:]
    flat = idx.reshape(B, 1, M * K)
    out = jnp.take_along_axis(features, flat, axis=-1)
    return out.reshape(B, C, M, K)


def gather_xyz(xyz: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """xyz [B, N, 3], idx [B, M] -> [B, M, 3] (row-layout gather)."""
    return jnp.take_along_axis(xyz, idx[..., None], axis=1)
