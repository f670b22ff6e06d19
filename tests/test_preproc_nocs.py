"""Offline preprocessing tests: RANSAC Umeyama pose recovery and the
instance-frame crop."""
import numpy as np

from captra_tpu.data import preproc_nocs as pp


def _rot(rng):
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2*y*y - 2*z*z, 2*x*y - 2*z*w, 2*x*z + 2*y*w],
        [2*x*y + 2*z*w, 1 - 2*x*x - 2*z*z, 2*y*z - 2*x*w],
        [2*x*z - 2*y*w, 2*y*z + 2*x*w, 1 - 2*x*x - 2*y*y]])


def test_umeyama_exact(rng):
    R = _rot(rng)
    s, t = 0.27, rng.randn(3, 1)
    src = rng.randn(50, 3)
    tgt = s * (src @ R.T) + t.T
    R2, s2, t2 = pp.umeyama(src, tgt)
    np.testing.assert_allclose(R2, R, atol=1e-6)
    np.testing.assert_allclose(s2, s, rtol=1e-6)
    np.testing.assert_allclose(t2, t, atol=1e-6)


def test_umeyama_ransac_with_outliers(rng):
    R = _rot(rng)
    s, t = 0.25, rng.randn(3, 1) * 0.1
    src = (rng.rand(200, 3) - 0.5) * 0.8
    tgt = s * (src @ R.T) + t.T
    # 25% gross outliers
    out_idx = rng.choice(200, 50, replace=False)
    tgt[out_idx] += rng.randn(50, 3) * 0.5
    pose = pp.umeyama_ransac(src, tgt, num_hyps=64, inlier_th=1e-3, rng=rng)
    assert pose is not None
    np.testing.assert_allclose(pose["rotation"], R, atol=1e-3)
    np.testing.assert_allclose(pose["scale"], s, rtol=1e-3)
    np.testing.assert_allclose(pose["translation"], t, atol=1e-3)


def test_umeyama_ransac_degenerate():
    assert pp.umeyama_ransac(np.zeros((2, 3)), np.zeros((2, 3))) is None


def test_frame_poses(rng):
    """Synthetic frame: one instance whose depth/coord follow a known pose."""
    K = pp.SYNTHETIC_INTRINSICS
    H, W = 480, 640  # full NOCS image size — the intrinsics assume it
    depth = np.zeros((H, W), np.uint16)
    mask = np.zeros((H, W), np.uint8)
    coord = np.zeros((H, W, 3), np.float64)

    R = _rot(rng)
    s, t = 0.3, np.array([0.02, -0.03, -1.0])
    npcs = (rng.rand(600, 3) - 0.5) * 0.8
    cam = s * (npcs @ R.T) + t  # camera points, z ~ -1
    # invert the backprojection: pixel (r, c) must yield cam point
    # depth (raw units): z_cam = -depth*scale => depth = -z/0.001
    depth_vals = (-cam[:, 2] / 0.001).astype(np.uint16)
    # compute pixel coords from cam: u = fx * x / (-z) + cx ...
    x, y, z = cam[:, 0], cam[:, 1], cam[:, 2]
    u = K[0, 0] * x / (-z) + K[0, 2]
    v = K[1, 1] * y / (-z) + K[1, 2]
    r_pix = (H - v).astype(np.int64)
    c_pix = u.astype(np.int64)
    ok = (r_pix >= 0) & (r_pix < H) & (c_pix >= 0) & (c_pix < W)
    depth[r_pix[ok], c_pix[ok]] = depth_vals[ok]
    mask[r_pix[ok], c_pix[ok]] = 1
    coord[r_pix[ok], c_pix[ok]] = npcs[ok]

    # 1mm depth quantization + integer pixel centers: relax the inlier
    # threshold accordingly
    poses = pp.frame_poses(depth, coord, mask, 1, K, rng=rng, inlier_th=0.01)
    assert 1 in poses
    got = poses[1]
    np.testing.assert_allclose(got["scale"], s, rtol=0.05)
    np.testing.assert_allclose(got["translation"].reshape(3), t, atol=0.02)
    from captra_tpu.pose import metrics
    import jax.numpy as jnp
    rd = float(metrics.rot_diff_degree(jnp.asarray(got["rotation"]),
                                       jnp.asarray(R)))
    assert rd < 5.0, rd


def test_crop_instance_frame(rng):
    K = pp.SYNTHETIC_INTRINSICS
    H, W = 480, 640
    depth = np.full((H, W), 1000, np.uint16)
    mask = np.zeros((H, W), np.uint8)
    mask[235:245, 325:335] = 3  # near the projection of the posed center
    pose = {"rotation": np.eye(3), "scale": 0.2,
            "translation": np.array([[0.02], [0.0], [-1.0]])}
    corners = np.array([[-0.4, -0.4, -0.4], [0.4, 0.4, 0.4]])
    out = pp.crop_instance_frame(depth, mask, 3, pose, corners, K)
    assert out is not None
    assert out["points"].shape[1] == 3
    assert set(np.unique(out["labels"])) <= {0, 1}
    # all points within the crop ball
    posed_center = pose["translation"].reshape(3)
    d = np.linalg.norm(out["points"] - posed_center, axis=-1)
    assert d.max() < 0.4 * 1.4 * np.sqrt(3) + 0.11
