"""Kernel parity tests: XLA/Pallas point ops vs numpy ports of the reference
torch fallbacks (/root/reference/network/models/pointnet_utils.py:12-168),
which are the executable spec for the CUDA kernels (SURVEY.md §4.3)."""
import jax.numpy as jnp
import numpy as np
import pytest

from captra_tpu import ops


# ---------------------------------------------------------------------------
# numpy oracles (ports of the reference fallback algorithms)
# ---------------------------------------------------------------------------

def np_fps(xyz, npoint, start=0):
    B, N, _ = xyz.shape
    centroids = np.zeros((B, npoint), np.int64)
    distance = np.full((B, N), 1e10)
    farthest = np.full((B,), start, np.int64)
    for i in range(npoint):
        centroids[:, i] = farthest
        centroid = xyz[np.arange(B), farthest][:, None]
        dist = np.sum((xyz - centroid) ** 2, -1)
        distance = np.minimum(distance, dist)
        farthest = np.argmax(distance, -1)
    return centroids


def np_ball_query(radius, nsample, xyz, new_xyz):
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    sqrdists = np.sum((new_xyz[:, :, None] - xyz[:, None]) ** 2, -1)
    group_idx = np.broadcast_to(np.arange(N), (B, S, N)).copy()
    group_idx[sqrdists > radius**2] = N
    group_idx = np.sort(group_idx, -1)[:, :, :nsample]
    group_first = np.broadcast_to(group_idx[:, :, :1], group_idx.shape).copy()
    group_first[group_first == N] = 0
    mask = group_idx == N
    group_idx[mask] = group_first[mask]
    return group_idx


def np_three_nn(xyz1, xyz2):
    d = np.sum((xyz1[:, :, None] - xyz2[:, None]) ** 2, -1)
    idx = np.argsort(d, -1)[:, :, :3]
    dist = np.take_along_axis(d, idx, -1)
    return dist, idx


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_square_distance(rng):
    a = rng.randn(2, 30, 3).astype(np.float32)
    b = rng.randn(2, 20, 3).astype(np.float32)
    got = np.asarray(ops.square_distance(jnp.asarray(a), jnp.asarray(b)))
    want = np.sum((a[:, :, None] - b[:, None]) ** 2, -1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fps_matches_oracle(rng):
    xyz = rng.randn(3, 256, 3).astype(np.float32)
    got = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 64,
                                               use_pallas=False))
    want = np_fps(xyz, 64)
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_interpret_matches_xla(rng):
    from captra_tpu.ops.fps_pallas import fps_pallas
    xyz = rng.randn(2, 256, 3).astype(np.float32)
    want = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 32,
                                                use_pallas=False))
    got = np.asarray(fps_pallas(jnp.asarray(xyz), 32, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_wide_interpret_matches_oracle(rng):
    # single-cloud wide kernel (one cloud across all 8 sublanes): exact
    # max-min picks with first-index tie-break, vs the numpy oracle
    from captra_tpu.ops.fps_pallas import fps_pallas_wide
    xyz = rng.randn(2, 1024, 3).astype(np.float32)
    want = np_fps(xyz, 64)
    got = np.asarray(fps_pallas_wide(jnp.asarray(xyz), 64, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_wide_interpret_padded(rng):
    # N not a multiple of 8*128: pads with copies of point 0, which must
    # never displace a real pick
    from captra_tpu.ops.fps_pallas import fps_pallas_wide
    xyz = rng.randn(1, 1100, 3).astype(np.float32)
    want = np_fps(xyz, 48)
    got = np.asarray(fps_pallas_wide(jnp.asarray(xyz), 48, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_blocked_interpret_matches_oracle(rng):
    # blocked lazy-update kernel (per-row maxima + bbox pruning): the
    # pruning must be bit-invisible — identical picks to the numpy oracle
    from captra_tpu.ops.fps_pallas import fps_pallas_blocked_t
    xyz = rng.randn(1, 8192, 3).astype(np.float32)
    want = np_fps(xyz, 96)
    got = np.asarray(fps_pallas_blocked_t(
        jnp.swapaxes(jnp.asarray(xyz), -1, -2), 96, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_blocked_interpret_padded(rng):
    # N not a multiple of 8*8*128, scan-order-ish coherent data (sorted by
    # one axis, the layout the OTF crop feeds): pads are copies of point 0
    from captra_tpu.ops.fps_pallas import fps_pallas_blocked_t
    xyz = rng.randn(1, 9000, 3).astype(np.float32)
    xyz = xyz[:, np.argsort(xyz[0, :, 1])]
    want = np_fps(xyz, 64)
    got = np.asarray(fps_pallas_blocked_t(
        jnp.swapaxes(jnp.asarray(xyz), -1, -2), 64, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fps_spreads_points():
    # A cloud with 4 well-separated clusters: FPS(4) must hit all of them.
    centers = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0], [0, 0, 10]],
                       np.float32)
    rng = np.random.RandomState(1)
    pts = np.concatenate(
        [c + rng.randn(50, 3).astype(np.float32) * 0.1 for c in centers])
    idx = np.asarray(ops.farthest_point_sample(jnp.asarray(pts[None]), 4,
                                               use_pallas=False))[0]
    clusters = set(idx // 50)
    assert clusters == {0, 1, 2, 3}


def test_ball_query_matches_oracle(rng):
    xyz = rng.rand(2, 128, 3).astype(np.float32)
    new_xyz = xyz[:, :16]
    got = np.asarray(ops.ball_query(0.2, 8, jnp.asarray(xyz),
                                    jnp.asarray(new_xyz)))
    want = np_ball_query(0.2, 8, xyz, new_xyz)
    np.testing.assert_array_equal(got, want)


def test_ball_query_no_hits():
    xyz = jnp.ones((1, 16, 3)) * 100.0
    new_xyz = jnp.zeros((1, 2, 3))
    got = np.asarray(ops.ball_query(0.1, 4, xyz, new_xyz))
    np.testing.assert_array_equal(got, 0)  # reference pads misses with 0


def test_knn(rng):
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    q = rng.randn(2, 10, 3).astype(np.float32)
    d, idx = ops.knn(4, jnp.asarray(q), jnp.asarray(xyz))
    sq = np.sum((q[:, :, None] - xyz[:, None]) ** 2, -1)
    want_idx = np.argsort(sq, -1)[:, :, :4]
    want_d = np.sqrt(np.take_along_axis(sq, want_idx, -1))
    np.testing.assert_allclose(np.sort(np.asarray(d), -1),
                               np.sort(want_d, -1), atol=1e-3)
    # index sets must agree (ties aside)
    assert (np.sort(np.asarray(idx), -1) == np.sort(want_idx, -1)).mean() > 0.99


def test_three_nn_matches_oracle(rng):
    xyz1 = rng.randn(2, 40, 3).astype(np.float32)
    xyz2 = rng.randn(2, 12, 3).astype(np.float32)
    d, idx = ops.three_nn(jnp.asarray(xyz1), jnp.asarray(xyz2))
    want_d, want_idx = np_three_nn(xyz1, xyz2)
    np.testing.assert_allclose(np.asarray(d), want_d, atol=1e-4)
    np.testing.assert_array_equal(np.sort(np.asarray(idx), -1),
                                  np.sort(want_idx, -1))


def test_three_interpolate(rng):
    B, C, M, N = 2, 5, 8, 20
    points = rng.randn(B, C, M).astype(np.float32)
    idx = rng.randint(0, M, (B, N, 3))
    w = rng.rand(B, N, 3).astype(np.float32)
    got = np.asarray(ops.three_interpolate(jnp.asarray(points),
                                           jnp.asarray(idx), jnp.asarray(w)))
    want = np.zeros((B, C, N), np.float32)
    for b in range(B):
        for n in range(N):
            for j in range(3):
                want[b, :, n] += points[b, :, idx[b, n, j]] * w[b, n, j]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gather_group(rng):
    feats = rng.randn(2, 4, 32).astype(np.float32)
    idx = rng.randint(0, 32, (2, 8))
    got = np.asarray(ops.gather_points(jnp.asarray(feats), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_allclose(got[b], feats[b][:, idx[b]])

    gidx = rng.randint(0, 32, (2, 8, 5))
    got = np.asarray(ops.group_points(jnp.asarray(feats), jnp.asarray(gidx)))
    for b in range(2):
        np.testing.assert_allclose(got[b], feats[b][:, gidx[b]])


def test_ops_differentiable(rng):
    import jax
    feats = jnp.asarray(rng.randn(1, 3, 16).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 16, (1, 4, 2)))

    def f(x):
        return jnp.sum(ops.group_points(x, idx) ** 2)

    g = jax.grad(f)(feats)
    assert np.isfinite(np.asarray(g)).all()
    # scatter-add gradient: each index occurrence contributes
    counts = np.zeros(16)
    for i in np.asarray(idx).ravel():
        counts[i] += 1
    assert (np.asarray(jnp.abs(g).sum(axis=1))[0] > 0).sum() == (counts > 0).sum()


def test_ball_group_exact_matches_manual(rng):
    """ball_group('exact') == ball_query + gather + recenter."""
    xyz = rng.rand(2, 64, 3).astype(np.float32)
    feats = rng.randn(2, 64, 5).astype(np.float32)
    new_xyz = xyz[:, :8]
    g = np.asarray(ops.ball_group(0.3, 16, jnp.asarray(xyz),
                                  jnp.asarray(new_xyz), jnp.asarray(feats),
                                  method="exact"))
    idx = np.asarray(ops.ball_query(0.3, 16, jnp.asarray(xyz),
                                    jnp.asarray(new_xyz), method="exact"))
    for b in range(2):
        for s in range(8):
            want_f = feats[b, idx[b, s]]
            want_x = xyz[b, idx[b, s]] - new_xyz[b, s]
            np.testing.assert_allclose(g[b, s, :, :5], want_f, atol=1e-6)
            np.testing.assert_allclose(g[b, s, :, 5:], want_x, atol=1e-6)


def test_ball_group_bucket_semantics(rng):
    """Bucket method: every emitted row is a real point within the radius
    (or the first-hit pad), re-centered on the query."""
    B, N, S, K, r = 2, 64, 8, 16, 0.35
    xyz = rng.rand(B, N, 3).astype(np.float32)
    feats = rng.randn(B, N, 4).astype(np.float32)
    new_xyz = xyz[:, :S]
    g = np.asarray(ops.ball_group(r, K, jnp.asarray(xyz),
                                  jnp.asarray(new_xyz), jnp.asarray(feats),
                                  method="bucket"))
    assert g.shape == (B, S, K, 7)
    src = np.concatenate([feats, xyz], axis=-1)
    for b in range(B):
        for s in range(S):
            rows = np.concatenate(
                [g[b, s, :, :4], g[b, s, :, 4:] + new_xyz[b, s]], axis=-1)
            # each row must equal some source point's row
            d = np.linalg.norm(rows[:, None] - src[b][None], axis=-1)
            src_match = d.argmin(-1)
            assert d.min(-1).max() < 1e-5
            # and every matched point is inside the ball (queries always
            # have hits here: the query is its own neighbor)
            dist = np.linalg.norm(xyz[b, src_match] - new_xyz[b, s], axis=-1)
            assert (dist <= r + 1e-6).all()


def test_ball_group_bucket_no_hits(rng):
    xyz = (rng.rand(1, 32, 3) + 100).astype(np.float32)
    new_xyz = np.zeros((1, 2, 3), np.float32)
    g = np.asarray(ops.ball_group(0.1, 8, jnp.asarray(xyz),
                                  jnp.asarray(new_xyz), method="bucket"))
    # zero hits -> pad with point 0 (reference rule)
    want = np.broadcast_to(xyz[0, 0] - 0.0, (2, 8, 3))
    np.testing.assert_allclose(g[0], want, atol=1e-5)


def test_three_interp_rows_dense_matches_gather(rng):
    B, M, C, N = 2, 32, 7, 40
    feats = rng.randn(B, M, C).astype(np.float32)
    idx = rng.randint(0, M, (B, N, 3))
    w = rng.rand(B, N, 3).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    a = np.asarray(ops.three_interp_rows(jnp.asarray(feats), jnp.asarray(idx),
                                         jnp.asarray(w), method="gather"))
    b = np.asarray(ops.three_interp_rows(jnp.asarray(feats), jnp.asarray(idx),
                                         jnp.asarray(w), method="dense"))
    np.testing.assert_allclose(a, b, atol=1e-5)
    # duplicate indices within a row must accumulate in the dense operator
    idx2 = np.zeros((B, N, 3), np.int64)
    a = np.asarray(ops.three_interp_rows(jnp.asarray(feats),
                                         jnp.asarray(idx2), jnp.asarray(w),
                                         method="gather"))
    b = np.asarray(ops.three_interp_rows(jnp.asarray(feats),
                                         jnp.asarray(idx2), jnp.asarray(w),
                                         method="dense"))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_grouped_fps_degenerate_npoint_falls_back_to_exact(rng):
    """npoint < 2*groups would make every stratum contribute only its
    deterministic start (global points 0..7 regardless of geometry) — the
    grouped paths must fall back to exact FPS instead (ADVICE r2)."""
    import jax.numpy as jnp

    from captra_tpu.ops.pointops import (
        farthest_point_sample, farthest_point_sample_grouped_t,
    )
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    exact = np.asarray(farthest_point_sample(jnp.asarray(xyz), 8,
                                             use_pallas=False))
    grouped = np.asarray(farthest_point_sample(jnp.asarray(xyz), 8,
                                               use_pallas=False,
                                               mode="grouped"))
    np.testing.assert_array_equal(exact, grouped)
    grouped_t = np.asarray(farthest_point_sample_grouped_t(
        jnp.asarray(np.swapaxes(xyz, -1, -2)), 8, use_pallas=False))
    np.testing.assert_array_equal(exact, grouped_t)
    # and NOT simply points 0..7
    assert not np.array_equal(grouped[0], np.arange(8))
