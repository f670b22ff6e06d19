import jax
import jax.numpy as jnp
import numpy as np

from captra_tpu.pose import procrustes as pr
from captra_tpu.pose import pose_fit
from captra_tpu.pose.part_dof import Pose, apply_pose


def random_rotation(rng, *batch):
    from captra_tpu.pose import rotations as rot
    q = rng.randn(*batch, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(rot.quat_to_matrix(jnp.asarray(q)))


def test_kabsch_recovers_rotation(rng):
    R = random_rotation(rng, 8)
    src = rng.randn(8, 100, 3).astype(np.float32)
    src -= src.mean(-2, keepdims=True)
    tgt = src @ np.swapaxes(R, -1, -2)
    R_est = pr.kabsch_rotation(jnp.asarray(src), jnp.asarray(tgt))
    np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-4)


def test_kabsch_reflection_fix(rng):
    # Nearly-planar cloud + reflected target: result must still be det +1.
    src = rng.randn(4, 50, 3).astype(np.float32)
    src[..., 2] *= 1e-4
    tgt = src.copy()
    tgt[..., 2] *= -1.0
    R_est = np.asarray(pr.kabsch_rotation(jnp.asarray(src), jnp.asarray(tgt)))
    np.testing.assert_allclose(np.linalg.det(R_est), 1.0, atol=1e-4)


def test_kabsch_nonfinite_fallback():
    src = jnp.full((2, 10, 3), jnp.nan)
    tgt = jnp.ones((2, 10, 3))
    R = np.asarray(pr.kabsch_rotation(src, tgt))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), R.shape))


def test_rot2d_fit(rng):
    theta = rng.uniform(-np.pi, np.pi, 16)
    c, s = np.cos(theta), np.sin(theta)
    R = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2)
    src = rng.randn(16, 40, 2).astype(np.float32)
    src -= src.mean(-2, keepdims=True)
    tgt = src @ np.swapaxes(R, -1, -2)
    R_est = pr.rot2d_fit(jnp.asarray(src), jnp.asarray(tgt))
    np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-4)


def test_rot2d_degenerate_identity():
    src = jnp.zeros((3, 10, 2))
    tgt = jnp.zeros((3, 10, 2))
    R = np.asarray(pr.rot2d_fit(src, tgt))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(2), R.shape))


def test_similarity_fit_full(rng):
    B, P, N = 2, 3, 200
    R = random_rotation(rng, B, P)
    s = rng.uniform(0.5, 2.0, (B, P)).astype(np.float32)
    t = rng.randn(B, P, 3, 1).astype(np.float32)
    src = rng.randn(B, P, N, 3).astype(np.float32)
    tgt = s[..., None, None] * (src @ np.swapaxes(R, -1, -2)) + np.swapaxes(t, -1, -2)
    mask = (rng.rand(B, P, N) > 0.3).astype(np.float32)

    R_est, s_est, t_est = pr.similarity_fit(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s_est), s, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-3)


def test_similarity_fit_given_rotation(rng):
    B, P, N = 2, 2, 120
    R = random_rotation(rng, B, P)
    s = rng.uniform(0.5, 2.0, (B, P)).astype(np.float32)
    t = rng.randn(B, P, 3, 1).astype(np.float32)
    src = rng.randn(B, P, N, 3).astype(np.float32)
    tgt = s[..., None, None] * (src @ np.swapaxes(R, -1, -2)) + np.swapaxes(t, -1, -2)
    mask = np.ones((B, P, N), np.float32)
    _, s_est, t_est = pr.similarity_fit(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask),
        rotation=jnp.asarray(R))
    np.testing.assert_allclose(np.asarray(s_est), s, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-3)


def test_similarity_fit_sym_yaxis(rng):
    """Rotation given only up to a y-axis spin; sym path should still recover
    exact scale/translation."""
    B, P, N = 2, 1, 150
    from captra_tpu.pose.procrustes import rot_around_yaxis_to_3d
    theta = rng.uniform(-np.pi, np.pi, (B, P))
    c, s2 = np.cos(theta), np.sin(theta)
    rot2d = np.stack([np.stack([c, -s2], -1), np.stack([s2, c], -1)], -2)
    y_spin = np.asarray(rot_around_yaxis_to_3d(jnp.asarray(rot2d)))

    R_base = random_rotation(rng, B, P)
    R_true = R_base @ y_spin  # actual pose includes the y spin
    s = rng.uniform(0.8, 1.2, (B, P)).astype(np.float32)
    t = rng.randn(B, P, 3, 1).astype(np.float32)
    src = rng.randn(B, P, N, 3).astype(np.float32)
    tgt = s[..., None, None] * (src @ np.swapaxes(R_true, -1, -2)) + np.swapaxes(t, -1, -2)
    mask = np.ones((B, P, N), np.float32)

    # give only R_base; sym=True must find the residual y rotation for s/t
    _, s_est, t_est = pr.similarity_fit(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask),
        rotation=jnp.asarray(R_base), sym=True)
    np.testing.assert_allclose(np.asarray(s_est), s, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-3)


def test_part_fit_st(rng):
    B, P, N = 2, 2, 400
    R = random_rotation(rng, B, P)
    s = rng.uniform(0.5, 2.0, (B, P)).astype(np.float32)
    t = rng.randn(B, P, 3, 1).astype(np.float32)
    labels = rng.randint(0, P + 1, (B, N))  # includes background label P
    npcs = rng.randn(B, N, 3).astype(np.float32) * 0.3
    # camera points posed per their part
    cam = np.zeros((B, N, 3), np.float32)
    for b in range(B):
        for p in range(P):
            m = labels[b] == p
            cam[b, m] = s[b, p] * (npcs[b, m] @ R[b, p].T) + t[b, p, :, 0]
    src = np.broadcast_to(npcs[:, None], (B, P, N, 3))
    tgt = np.broadcast_to(cam[:, None], (B, P, N, 3))

    pose, valid = pose_fit.part_fit_st(
        jnp.asarray(labels), jnp.asarray(src), jnp.asarray(tgt),
        jnp.asarray(R), num_parts=P, sym=False)
    assert bool(np.all(np.asarray(valid)))
    np.testing.assert_allclose(np.asarray(pose.scale), s, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(pose.translation), t, atol=1e-3)


def test_part_fit_st_invalid_part(rng):
    B, P, N = 1, 2, 50
    labels = np.zeros((B, N), np.int32)  # all points on part 0
    src = rng.randn(B, P, N, 3).astype(np.float32)
    tgt = rng.randn(B, P, N, 3).astype(np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, P, 3, 3))
    pose, valid = pose_fit.part_fit_st(
        jnp.asarray(labels), jnp.asarray(src), jnp.asarray(tgt),
        jnp.asarray(R), num_parts=P, sym=False)
    v = np.asarray(valid)
    assert v[0, 0] and not v[0, 1]
    assert np.isfinite(np.asarray(pose.translation)).all()


def test_similarity_fit_jit_grad(rng):
    src = jnp.asarray(rng.randn(2, 1, 60, 3).astype(np.float32))
    tgt = jnp.asarray(rng.randn(2, 1, 60, 3).astype(np.float32))
    mask = jnp.ones((2, 1, 60))

    def loss(src):
        R, s, t = pr.similarity_fit(src, tgt, mask)
        return jnp.sum(s) + jnp.sum(t) + jnp.sum(R)

    g = jax.jit(jax.grad(loss))(src)
    assert np.isfinite(np.asarray(g)).all()


def test_similarity_fit_ransac_rejects_outliers(rng):
    """20% gross outliers: the LS fit's scale/translation are corrupted
    but the RANSAC fit recovers the exact transform from the inliers
    (reference runs this scheme offline only, align_pose.py:49-93)."""
    B, P, N = 2, 2, 256
    R = random_rotation(rng, B, P)
    s = rng.uniform(0.8, 1.8, (B, P)).astype(np.float32)
    t = rng.randn(B, P, 3, 1).astype(np.float32)
    src = rng.uniform(-0.5, 0.5, (B, P, N, 3)).astype(np.float32)
    tgt = (s[..., None, None] * (src @ np.swapaxes(R, -1, -2))
           + np.swapaxes(t, -1, -2)).astype(np.float32)
    # structured outliers: one far blob (e.g. background leak) on 20%
    n_out = N // 5
    tgt_bad = tgt.copy()
    tgt_bad[..., :n_out, :] += np.asarray([0.5, 0.8, -0.4], np.float32)
    mask = np.ones((B, P, N), np.float32)

    _, s_ls, t_ls = pr.similarity_fit(
        jnp.asarray(src), jnp.asarray(tgt_bad), jnp.asarray(mask))
    R_ra, s_ra, t_ra, inl = pr.similarity_fit_ransac(
        jnp.asarray(src), jnp.asarray(tgt_bad), jnp.asarray(mask),
        jax.random.PRNGKey(0), num_hyps=64, inlier_th=0.01)

    # LS is visibly corrupted; RANSAC recovers exactly (inliers are exact)
    assert np.max(np.abs(np.asarray(t_ls) - t)) > 0.05
    np.testing.assert_allclose(np.asarray(R_ra), R, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s_ra), s, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(t_ra), t, atol=1e-3)
    # the inlier mask found exactly the clean points
    np.testing.assert_array_equal(np.asarray(inl[..., :n_out]), 0.0)
    np.testing.assert_array_equal(np.asarray(inl[..., n_out:]), 1.0)


def test_similarity_fit_ransac_clean_matches_ls(rng):
    """No outliers: every point is an inlier, so the refit equals the plain
    LS fit on the full mask."""
    B, P, N = 1, 2, 128
    R = random_rotation(rng, B, P)
    s = rng.uniform(0.8, 1.8, (B, P)).astype(np.float32)
    t = rng.randn(B, P, 3, 1).astype(np.float32)
    src = rng.uniform(-0.5, 0.5, (B, P, N, 3)).astype(np.float32)
    tgt = (s[..., None, None] * (src @ np.swapaxes(R, -1, -2))
           + np.swapaxes(t, -1, -2)).astype(np.float32)
    mask = np.ones((B, P, N), np.float32)
    R_ls, s_ls, t_ls = pr.similarity_fit(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask))
    R_ra, s_ra, t_ra, inl = pr.similarity_fit_ransac(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask),
        jax.random.PRNGKey(3), num_hyps=16, inlier_th=0.01)
    np.testing.assert_allclose(np.asarray(R_ra), np.asarray(R_ls), atol=1e-5)
    np.testing.assert_allclose(np.asarray(inl), mask)


def test_similarity_fit_ransac_degenerate_falls_back(rng):
    """Fewer than min_inliers maskable points: the fit must return the
    full-mask LS result, not garbage from a 3-point hypothesis."""
    B, P, N = 1, 1, 64
    src = rng.uniform(-0.5, 0.5, (B, P, N, 3)).astype(np.float32)
    # pure noise target: no hypothesis can gather >= 4 inliers at th=1e-4
    tgt = rng.uniform(-0.5, 0.5, (B, P, N, 3)).astype(np.float32)
    mask = np.ones((B, P, N), np.float32)
    R_ls, s_ls, t_ls = pr.similarity_fit(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask))
    R_ra, s_ra, t_ra, inl = pr.similarity_fit_ransac(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask),
        jax.random.PRNGKey(1), num_hyps=8, inlier_th=1e-4)
    np.testing.assert_allclose(np.asarray(R_ra), np.asarray(R_ls), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_ra), np.asarray(s_ls), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(inl), mask)


def test_part_fit_st_ransac_given_rotation(rng):
    """part_fit_st with ransac_hyps > 0 recovers exact s/t under outliers
    with the rotation given (the tracking path's fit)."""
    B, P, N = 1, 2, 200
    R = random_rotation(rng, B, P)
    s = rng.uniform(0.8, 1.8, (B, P)).astype(np.float32)
    t = rng.randn(B, P, 3, 1).astype(np.float32)
    src = rng.uniform(-0.5, 0.5, (B, P, N, 3)).astype(np.float32)
    tgt = (s[..., None, None] * (src @ np.swapaxes(R, -1, -2))
           + np.swapaxes(t, -1, -2)).astype(np.float32)
    tgt_bad = tgt.copy()
    tgt_bad[..., :N // 5, :] += np.asarray([0.6, -0.3, 0.5], np.float32)
    # labels: point n belongs to part n % P (both parts populated)
    labels = np.arange(N) % P
    labels = np.broadcast_to(labels, (B, N)).astype(np.int32)
    # per-part source/target views (the tracking layout)
    pose_ls, _ = pose_fit.part_fit_st(
        jnp.asarray(labels), jnp.asarray(src), jnp.asarray(tgt_bad),
        jnp.asarray(R), num_parts=P, sym=False)
    pose_ra, valid = pose_fit.part_fit_st(
        jnp.asarray(labels), jnp.asarray(src), jnp.asarray(tgt_bad),
        jnp.asarray(R), num_parts=P, sym=False,
        ransac_hyps=64, ransac_th=0.01, key=jax.random.PRNGKey(2))
    assert np.max(np.abs(np.asarray(pose_ls.translation) - t)) > 0.02
    np.testing.assert_allclose(np.asarray(pose_ra.scale), s, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(pose_ra.translation), t, atol=1e-3)
    assert bool(np.all(np.asarray(valid)))


def test_part_fit_st_ransac_sym_wrong_azimuth(rng):
    """Sym + given rotation whose y-spin is off by 40 deg: the RANSAC path
    must azimuth-refine before scoring (else every point is an outlier and
    it silently falls back to the corrupted LS fit)."""
    from captra_tpu.pose import rotations as rot

    B, P, N = 1, 1, 200
    R = random_rotation(rng, B, P)
    s = rng.uniform(0.8, 1.8, (B, P)).astype(np.float32)
    t = rng.randn(B, P, 3, 1).astype(np.float32)
    src = rng.uniform(-0.5, 0.5, (B, P, N, 3)).astype(np.float32)
    tgt = (s[..., None, None] * (src @ np.swapaxes(R, -1, -2))
           + np.swapaxes(t, -1, -2)).astype(np.float32)
    tgt_bad = tgt.copy()
    tgt_bad[..., :N // 5, :] += np.asarray([0.6, -0.3, 0.5], np.float32)
    spin = np.asarray(rot.axis_theta_to_matrix(
        jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray(np.radians(40.0))))
    R_given = R @ spin  # wrong azimuth, correct y-axis
    labels = np.zeros((B, N), np.int32)

    pose_ra, valid = pose_fit.part_fit_st(
        jnp.asarray(labels), jnp.asarray(src), jnp.asarray(tgt_bad),
        jnp.asarray(R_given), num_parts=P, sym=True,
        ransac_hyps=64, ransac_th=0.01, key=jax.random.PRNGKey(4))
    np.testing.assert_allclose(np.asarray(pose_ra.scale), s, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(pose_ra.translation), t,
                               atol=2e-3)
    assert bool(np.all(np.asarray(valid)))
