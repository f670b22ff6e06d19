import jax
import jax.numpy as jnp
import numpy as np

from captra_tpu.pose import part_dof as pd
from captra_tpu.pose.part_dof import Pose


def random_pose(rng, *batch):
    from captra_tpu.pose import rotations as rot
    q = rng.randn(*batch, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return Pose(
        rotation=jnp.asarray(rot.quat_to_matrix(jnp.asarray(q))),
        translation=jnp.asarray(rng.randn(*batch, 3, 1).astype(np.float32)),
        scale=jnp.asarray(rng.uniform(0.5, 2.0, batch).astype(np.float32)),
    )


def test_pose_is_pytree(rng):
    p = random_pose(rng, 2, 3)
    leaves = jax.tree.leaves(p)
    assert len(leaves) == 3
    p2 = jax.tree.map(lambda x: x * 1.0, p)
    assert isinstance(p2, Pose)


def test_apply_inverse_roundtrip(rng):
    pose = random_pose(rng, 2, 3)
    pts = jnp.asarray(rng.randn(2, 3, 50, 3).astype(np.float32))
    posed = pd.apply_pose(pose, pts)
    back = pd.inverse_apply_pose(pose, posed)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_canonicalize_columns_matches_inverse(rng):
    pose = random_pose(rng, 4)
    pts = jnp.asarray(rng.randn(4, 60, 3).astype(np.float32))
    a = pd.inverse_apply_pose(pose, pts)
    b = pd.canonicalize_columns(pose, jnp.swapaxes(pts, -1, -2))
    np.testing.assert_allclose(np.asarray(a), np.asarray(jnp.swapaxes(b, -1, -2)),
                               atol=1e-5)


def test_merge_delta_identity(rng):
    base = random_pose(rng, 2, 2)
    merged = pd.merge_delta_pose(
        base,
        delta_rotation=jnp.broadcast_to(jnp.eye(3), base.rotation.shape),
        delta_scale=jnp.ones_like(base.scale),
        delta_trans=jnp.zeros_like(base.translation))
    np.testing.assert_allclose(np.asarray(merged.rotation),
                               np.asarray(base.rotation), atol=1e-6)
    np.testing.assert_allclose(np.asarray(merged.translation),
                               np.asarray(base.translation), atol=1e-6)


def test_delta_pose_roundtrip(rng):
    """compute_parts_delta_pose followed by merge must recover `final`."""
    init = random_pose(rng, 2, 3)
    final = random_pose(rng, 2, 3)
    canon = random_pose(rng, 2, 3)

    delta = pd.compute_parts_delta_pose(init, final, canon)

    # Verify the defining identities of the delta:
    RcT = jnp.swapaxes(canon.rotation, -1, -2)
    R0T = jnp.swapaxes(init.rotation, -1, -2)
    Rf_rec = canon.rotation @ delta.rotation @ RcT @ init.rotation
    np.testing.assert_allclose(np.asarray(Rf_rec), np.asarray(final.rotation),
                               atol=1e-4)
    sf_rec = delta.scale * init.scale
    np.testing.assert_allclose(np.asarray(sf_rec), np.asarray(final.scale),
                               rtol=1e-5)
    # translation identity: t = t_f - t_c - s_d (R_f R_0^T)(t_0 - t_c)
    # and t_delta = R_c^T t / s_c
    t_rec = (canon.rotation @ delta.translation) * canon.scale[..., None, None]
    lhs = final.translation - canon.translation - delta.scale[..., None, None] * (
        (final.rotation @ R0T) @ (init.translation - canon.translation))
    np.testing.assert_allclose(np.asarray(t_rec), np.asarray(lhs), atol=1e-4)


def test_delta_pose_canon_frame_merge(rng):
    """In the tracking setup canon == init (per-part canonicalization):
    merge_delta_pose(init, delta) must reproduce final exactly."""
    init = random_pose(rng, 2, 3)
    final = random_pose(rng, 2, 3)
    delta = pd.compute_parts_delta_pose(init, final, init)
    merged = pd.merge_delta_pose(init, delta_rotation=delta.rotation,
                                 delta_scale=delta.scale,
                                 delta_trans=delta.translation)
    np.testing.assert_allclose(np.asarray(merged.rotation),
                               np.asarray(final.rotation), atol=1e-4)
    np.testing.assert_allclose(np.asarray(merged.scale),
                               np.asarray(final.scale), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(merged.translation),
                               np.asarray(final.translation), atol=1e-4)


def test_eval_part_full_self_zero(rng):
    pose = random_pose(rng, 4, 2)
    d = pd.eval_part_full(pose, pose)
    # arccos near 1 is ill-conditioned: float32 round-off gives ~0.1 deg
    assert np.allclose(np.asarray(d["rdiff"]), 0.0, atol=0.5)
    assert np.allclose(np.asarray(d["tdiff"]), 0.0, atol=1e-5)
    assert np.all(np.asarray(d["5deg5cm"]) == 1.0)


def test_add_noise_to_pose(key, rng):
    pose = random_pose(rng, 16, 1)
    noisy = pd.add_noise_to_pose(key, pose, rot_rad=np.deg2rad(5.0),
                                 trans_sigma=0.03, scale_sigma=0.02)
    d = pd.eval_part_full(pose, noisy)
    rd = np.asarray(d["rdiff"])
    td = np.asarray(d["tdiff"])
    assert rd.mean() < 20.0 and rd.mean() > 0.5
    assert td.mean() < 0.15
    # determinism: same key -> same noise
    noisy2 = pd.add_noise_to_pose(key, pose, rot_rad=np.deg2rad(5.0),
                                  trans_sigma=0.03, scale_sigma=0.02)
    np.testing.assert_allclose(np.asarray(noisy.rotation),
                               np.asarray(noisy2.rotation))


def test_tree_helpers():
    assert pd.tree_root([-1]) == 0
    assert pd.tree_root([2, 2, -1]) == 2
    assert pd.tree_children([2, 2, -1]) == [[], [], [0, 1]]
    assert pd.tree_root([3, 3, 3, -1]) == 3
