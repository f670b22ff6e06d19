import jax
import jax.numpy as jnp
import numpy as np

from captra_tpu.pose import rotations as rot


def random_rotations(rng, n):
    q = rng.randn(n, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(rot.quat_to_matrix(jnp.asarray(q)))


def assert_rotation(R, atol=1e-5):
    eye = np.eye(3)
    np.testing.assert_allclose(
        np.asarray(R @ np.swapaxes(R, -1, -2)),
        np.broadcast_to(eye, R.shape), atol=atol)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=atol)


def test_quat_matrix_roundtrip(rng):
    R = random_rotations(rng, 32)
    q = rot.matrix_to_quat(jnp.asarray(R))
    R2 = rot.quat_to_matrix(q)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = rng.randn(16, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    v = rng.randn(16, 3)
    R = rot.quat_to_matrix(jnp.asarray(q))
    out_q = rot.quat_rotate(jnp.asarray(q), jnp.asarray(v))
    out_m = jnp.einsum("bij,bj->bi", R, jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_m), atol=1e-5)


def test_axis_theta_roundtrip(rng):
    axis = rng.randn(8, 3)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    theta = rng.uniform(0.1, np.pi - 0.1, 8)
    R = rot.axis_theta_to_matrix(jnp.asarray(axis), jnp.asarray(theta))
    assert_rotation(np.asarray(R))
    axis2, theta2 = rot.matrix_to_axis_theta(R)
    # axis sign may flip with theta -> -theta wrap; compare rotation matrices
    R2 = rot.axis_theta_to_matrix(axis2, theta2)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


def test_rotvec_roundtrip(rng):
    rv = rng.randn(8, 3) * 0.7
    R = rot.rotvec_to_matrix(jnp.asarray(rv))
    assert_rotation(np.asarray(R))


def test_ortho6d(rng):
    poses = rng.randn(64, 6)
    R = rot.ortho6d_to_matrix(jnp.asarray(poses))
    assert_rotation(np.asarray(R))
    # first column is the normalized x_raw
    x = poses[:, :3] / np.linalg.norm(poses[:, :3], axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(R[..., :, 0]), x, atol=1e-5)


def test_ortho6d_identity_on_rotation(rng):
    R = random_rotations(rng, 16)
    six = np.concatenate([R[..., :, 0], R[..., :, 1]], axis=-1)
    R2 = rot.ortho6d_to_matrix(jnp.asarray(six))
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)


def test_gram_schmidt_recovers_rotation(rng):
    R = random_rotations(rng, 16)
    noisy = R + rng.randn(*R.shape) * 1e-3
    R2 = rot.gram_schmidt_3x3(jnp.asarray(noisy))
    assert_rotation(np.asarray(R2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-2)


def test_yvec_to_matrix(rng):
    v = rng.randn(32, 3)
    R = rot.yvec_to_matrix(jnp.asarray(v))
    assert_rotation(np.asarray(R))
    vn = v / np.linalg.norm(v, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(R[..., :, 1]), vn, atol=1e-5)


def test_normalize_vector_zero_fallback():
    v = jnp.zeros((4, 3))
    out = rot.normalize_vector(v)
    np.testing.assert_allclose(np.asarray(out),
                               np.tile([1.0, 0, 0], (4, 1)))


def test_noisy_rot_matrix_angle(key, rng):
    R = jnp.asarray(random_rotations(rng, 256))
    rad = 0.1
    R_noisy = rot.noisy_rot_matrix(key, R, rad, kind="normal")
    assert_rotation(np.asarray(R_noisy), atol=1e-4)
    from captra_tpu.pose import metrics
    ang = np.asarray(metrics.rot_diff_rad(R, R_noisy))
    # |N(0,1)| * 0.1 radians: mean ~ 0.08, nearly all < 0.4
    assert 0.02 < ang.mean() < 0.2
    assert np.quantile(ang, 0.99) < 0.5


def test_jit_compatible(key, rng):
    R = jnp.asarray(random_rotations(rng, 4))
    f = jax.jit(lambda k, m: rot.noisy_rot_matrix(k, m, 0.05))
    out = f(key, R)
    assert np.isfinite(np.asarray(out)).all()


def test_so3_interpolate_endpoints_and_midpoint(rng):
    Ra = jnp.asarray(random_rotations(rng, 8))
    Rb = jnp.asarray(random_rotations(rng, 8))
    np.testing.assert_allclose(np.asarray(rot.so3_interpolate(Ra, Rb, 0.0)),
                               np.asarray(Ra), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rot.so3_interpolate(Ra, Rb, 1.0)),
                               np.asarray(Rb), atol=1e-4)
    # midpoint: equidistant from both endpoints along the geodesic
    Rm = rot.so3_interpolate(Ra, Rb, 0.5)
    assert_rotation(np.asarray(Rm), atol=1e-4)

    def angle(x, y):
        c = (jnp.einsum("...ii->...", jnp.swapaxes(x, -1, -2) @ y) - 1) / 2
        return jnp.degrees(jnp.arccos(jnp.clip(c, -1, 1)))

    a_am = np.asarray(angle(Ra, Rm))
    a_mb = np.asarray(angle(Rm, Rb))
    a_ab = np.asarray(angle(Ra, Rb))
    np.testing.assert_allclose(a_am, a_mb, atol=1e-2)
    np.testing.assert_allclose(a_am + a_mb, a_ab, atol=1e-2)


def test_so3_interpolate_short_arc():
    """A 170-deg relative rotation must scale through the SHORT arc: the
    quarter point of a 170 deg arc is 42.5 deg from ra, never 47.5 (what
    the long-way 190 deg arc would give)."""
    Ra = jnp.eye(3)
    Rb = rot.axis_theta_to_matrix(jnp.asarray([0.0, 1.0, 0.0]),
                                  jnp.asarray(np.deg2rad(170.0)))
    Rq = rot.so3_interpolate(Ra, Rb, 0.25)
    c = (jnp.trace(Rq) - 1) / 2
    ang = np.degrees(np.arccos(np.clip(np.asarray(c), -1, 1)))
    np.testing.assert_allclose(ang, 42.5, atol=0.01)
