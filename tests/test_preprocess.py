import jax
import jax.numpy as jnp
import numpy as np

from captra_tpu.data import preprocess as pp
from captra_tpu.pose.part_dof import Pose


def np_backproject(depth, intrinsics, mask=None, scale=0.001):
    """numpy oracle — port of reference nocs_utils.backproject:5-33."""
    intrinsics_inv = np.linalg.inv(intrinsics)
    height, width = depth.shape
    valid = depth > 0
    if mask is not None:
        valid = np.logical_and(mask, valid)
    idxs = np.where(valid)
    grid = np.array([idxs[1], height - idxs[0]])
    ones = np.ones([1, grid.shape[1]])
    uv_grid = np.concatenate((grid, ones), axis=0)
    xyz = (intrinsics_inv @ uv_grid).T
    z = depth[idxs[0], idxs[1]].astype(np.float32)
    pts = xyz * z[:, None] / xyz[:, -1:]
    pts[:, 2] = -pts[:, 2]
    return pts * scale, idxs


def _fake_depth(rng, H=48, W=64):
    depth = rng.randint(500, 2000, (H, W)).astype(np.int32)
    depth[rng.rand(H, W) < 0.1] = 0  # holes
    return depth


def test_backproject_matches_oracle(rng):
    depth = _fake_depth(rng)
    K = np.asarray(pp.NOCS_REAL_INTRINSICS)
    pts, valid = pp.backproject_depth(jnp.asarray(depth), jnp.asarray(K))
    pts, valid = np.asarray(pts), np.asarray(valid)
    oracle_pts, idxs = np_backproject(depth, K)
    H, W = depth.shape
    flat_idx = idxs[0] * W + idxs[1]
    assert valid.sum() == len(oracle_pts)
    np.testing.assert_allclose(pts[flat_idx], oracle_pts, atol=1e-5)
    assert not valid[np.where(depth.reshape(-1) == 0)[0]].any()


def test_crop_ball_basic(key, rng):
    M, num_points = 2000, 128
    pts = rng.randn(M, 3).astype(np.float32)
    center = np.zeros(3, np.float32)
    out_pts, idx = pp.crop_ball(key, jnp.asarray(pts),
                                jnp.ones(M, bool), jnp.asarray(center),
                                jnp.float32(0.8), num_points)
    d = np.linalg.norm(np.asarray(out_pts), axis=-1)
    assert out_pts.shape == (num_points, 3)
    assert (d <= 0.8 * 1.0001).all()  # no growth needed: plenty inside


def test_crop_ball_radius_growth(key, rng):
    """Only 3 points within the base radius -> radius must grow until >= 10."""
    M, num_points = 500, 16
    pts = rng.randn(M, 3).astype(np.float32) + 5.0  # far cluster
    pts[:3] = rng.randn(3, 3) * 0.01               # 3 near origin
    pts[3:12] = rng.randn(9, 3) * 0.01 + 0.15      # 9 slightly outside 0.05
    out_pts, idx = pp.crop_ball(key, jnp.asarray(pts), jnp.ones(M, bool),
                                jnp.zeros(3), jnp.float32(0.05), num_points)
    # all sampled points must come from the near clusters, not the far one
    assert (np.linalg.norm(np.asarray(out_pts), axis=-1) < 1.0).all()
    # duplicates allowed (12 distinct points -> 16 samples)
    assert len(np.unique(np.asarray(idx))) <= 12


def test_crop_ball_empty_fallback(key, rng):
    M, num_points = 100, 8
    pts = (rng.randn(M, 3) + 100.0).astype(np.float32)
    out_pts, idx = pp.crop_ball(key, jnp.asarray(pts), jnp.ones(M, bool),
                                jnp.zeros(3), jnp.float32(0.05), num_points)
    assert np.isfinite(np.asarray(out_pts)).all()


def test_otf_frame(key, rng):
    """Synthetic depth scene: object pixels at a known pose; OTF frame must
    recover NPCS for object points."""
    H, W = 48, 64
    K = np.asarray(pp.NOCS_CAMERA_INTRINSICS)
    # build a flat background at 1.5m with an object "blob" at 1.0m
    depth = np.full((H, W), 1500, np.int32)
    obj_mask = np.zeros((H, W), bool)
    obj_mask[20:30, 28:40] = True
    depth[obj_mask] = 1000

    pose = Pose(rotation=jnp.eye(3), translation=jnp.zeros((3, 1)),
                scale=jnp.ones(()))
    pts, valid = pp.backproject_depth(jnp.asarray(depth), jnp.asarray(K))
    obj_pts = np.asarray(pts).reshape(H, W, 3)[obj_mask]
    center = obj_pts.mean(0)

    out = pp.otf_frame_from_depth(
        key, jnp.asarray(depth), jnp.asarray(obj_mask), jnp.asarray(K),
        jnp.asarray(center), jnp.float32(0.12), pose, num_points=64)
    labels = np.asarray(out["labels"])
    points = np.asarray(out["points"])
    nocs = np.asarray(out["nocs"])
    assert points.shape == (64, 3)
    # with identity pose, nocs == points for object points
    m = labels == 0
    assert m.sum() > 0
    np.testing.assert_allclose(nocs[m], points[m], atol=1e-5)
    np.testing.assert_allclose(nocs[~m], 0.0)


def test_crop_ball_jits_in_scan(key, rng):
    """The crop must be usable inside lax.scan (the OTF tracking path)."""
    M, num_points = 1000, 64
    pts = jnp.asarray(rng.randn(5, M, 3).astype(np.float32))

    def step(carry, x):
        out, idx = pp.crop_ball(key, x, jnp.ones(M, bool), jnp.zeros(3),
                                jnp.float32(1.0), num_points)
        return carry, out

    _, outs = jax.lax.scan(step, 0, pts)
    assert outs.shape == (5, num_points, 3)


def test_crop_ball_bucket_matches_semantics(key, rng):
    """Bucket method: all outputs in-ball, spread across the cloud."""
    M, num_points = 3000, 64
    pts = rng.randn(M, 3).astype(np.float32)
    out_pts, idx = pp.crop_ball(key, jnp.asarray(pts), jnp.ones(M, bool),
                                jnp.zeros(3), jnp.float32(1.2), num_points,
                                method="bucket")
    d = np.linalg.norm(np.asarray(out_pts), axis=-1)
    assert (d <= 1.2 + 1e-5).all()
    assert out_pts.shape == (num_points, 3)
    # compare coverage vs the sort method: FPS spread should be similar
    out2, _ = pp.crop_ball(key, jnp.asarray(pts), jnp.ones(M, bool),
                           jnp.zeros(3), jnp.float32(1.2), num_points,
                           method="sort")
    def spread(p):
        return np.linalg.norm(np.asarray(p) - np.asarray(p).mean(0),
                              axis=-1).mean()
    assert abs(spread(out_pts) - spread(out2)) < 0.25


def test_crop_ball_bucket_sparse(key, rng):
    """Fewer in-ball points than buckets -> duplicates, never out-of-ball."""
    M, num_points = 2000, 32
    pts = (rng.randn(M, 3) + 10).astype(np.float32)
    pts[:5] = rng.randn(5, 3) * 0.01
    out_pts, idx = pp.crop_ball(key, jnp.asarray(pts), jnp.ones(M, bool),
                                jnp.zeros(3), jnp.float32(0.1), num_points,
                                method="bucket")
    assert (np.linalg.norm(np.asarray(out_pts), axis=-1) < 1.0).all()
    assert len(np.unique(np.asarray(idx))) <= 5
