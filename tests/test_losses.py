"""Loss-function unit tests vs the reference semantics (loss.py), including
NaN-gradient regressions at degenerate inputs."""
import jax
import jax.numpy as jnp
import numpy as np

from captra_tpu.models import losses as L
from captra_tpu.pose.part_dof import Pose

from tests.test_models import _make_pose


def test_miou_perfect_and_uniform(rng):
    labels = jnp.asarray(rng.randint(0, 3, (2, 50)))
    perfect = jax.nn.one_hot(labels, 3)
    assert float(L.miou_loss(perfect, labels)) < 1e-5
    uniform = jnp.full((2, 50, 3), 1 / 3)
    assert float(L.miou_loss(uniform, labels)) > 0.3


def test_choose_coord_by_label(rng):
    B, N, P = 2, 20, 3
    nocs = rng.randn(B, N, 3 * P).astype(np.float32)
    labels = rng.randint(0, P + 2, (B, N))  # includes extra labels
    out = np.asarray(L.choose_coord_by_label(jnp.asarray(nocs),
                                             jnp.asarray(labels), P))
    for b in range(B):
        for n in range(N):
            l = labels[b, n]
            want = nocs[b, n, 3 * l:3 * l + 3] if l < P else np.zeros(3)
            np.testing.assert_allclose(out[b, n], want, atol=1e-6)


def test_nocs_loss_zero_at_gt(rng):
    B, N, P = 2, 30, 2
    gt = rng.randn(B, N, 3).astype(np.float32) * 0.2
    labels = rng.randint(0, P, (B, N))
    pred = np.zeros((B, N, 3 * P), np.float32)
    for p in range(P):
        pred[..., 3 * p:3 * p + 3] = gt
    assert float(L.nocs_loss(jnp.asarray(pred), jnp.asarray(gt),
                             jnp.asarray(labels), P)) < 1e-5


def test_nocs_loss_grad_finite_at_zero_diff(rng):
    """Regression: torch.norm subgradient-0 convention at pred == gt."""
    B, N, P = 1, 10, 1
    gt = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    labels = jnp.zeros((B, N), jnp.int32)

    g = jax.grad(lambda p: L.nocs_loss(p, gt, labels, P))(gt)
    assert np.isfinite(np.asarray(g)).all()


def test_sym_nocs_loss_rotation_invariance(key, rng):
    """The sym distance term must be invariant to y-axis rotations of the
    prediction (that's its purpose: bottles can spin)."""
    B, N = 1, 64
    gt = (rng.rand(B, N, 3).astype(np.float32) - 0.5) * 0.6
    labels = jnp.zeros((B, N), jnp.int32)
    theta = 1.1
    c, s = np.cos(theta), np.sin(theta)
    Ry = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    pred_rot = gt @ Ry.T

    d0, p0 = L.sym_nocs_loss(key, jnp.asarray(gt), jnp.asarray(gt), labels, 1)
    d1, p1 = L.sym_nocs_loss(key, jnp.asarray(pred_rot), jnp.asarray(gt),
                             labels, 1)
    assert float(d0) < 1e-3
    assert float(d1) < 1e-3  # y + radial distance: rotation-invariant
    assert float(p1) < 1e-3  # pairwise distances: rotation-invariant


def test_sym_nocs_loss_grad_finite(key, rng):
    gt = jnp.asarray((rng.rand(1, 32, 3).astype(np.float32) - 0.5) * 0.6)
    labels = jnp.zeros((1, 32), jnp.int32)

    def f(p):
        d, pw = L.sym_nocs_loss(key, p, gt, labels, 1)
        return d + pw

    g = jax.grad(f)(gt)  # pred == gt: zero diagonal + zero diffs everywhere
    assert np.isfinite(np.asarray(g)).all()


def test_rot_trace_loss_zero_at_identity(rng):
    R = _make_pose(rng, 4, 1).rotation
    for metric in ("frob", "l1", "l2"):
        v = np.asarray(L.rot_trace_loss(R, R, metric=metric))
        assert np.allclose(v, 0.0, atol=1e-4), metric


def test_point_pose_loss(rng):
    pose = _make_pose(rng, 2, 2)
    pts = jnp.asarray(rng.randn(2, 2, 8, 3).astype(np.float32))
    mean, _ = L.point_pose_loss(pose, pose, pts)
    assert float(mean) < 1e-4
    shifted = Pose(rotation=pose.rotation,
                   translation=pose.translation + 0.1, scale=pose.scale)
    mean2, _ = L.point_pose_loss(pose, shifted, pts)
    np.testing.assert_allclose(float(mean2), 0.1 * np.sqrt(3), rtol=1e-3)


def test_weighted_total():
    total = L.weighted_total({"a": jnp.asarray(2.0), "b": jnp.asarray(3.0)},
                             {"a": 0.5, "b": 2.0, "missing": 9.0})
    assert float(total) == 2.0 * 0.5 + 3.0 * 2.0


def test_rotnet_grad_finite_with_degenerate_head_output(rng):
    """normalize_vector / ortho6d at near-zero raw outputs must not produce
    NaN grads (safe-norm regression)."""
    from captra_tpu.pose import rotations as rot

    def f(x):
        return jnp.sum(rot.normalize_vector(x))

    g = jax.grad(f)(jnp.zeros((4, 3)))
    assert np.isfinite(np.asarray(g)).all()

    def f6(x):
        return jnp.sum(rot.ortho6d_to_matrix(x))

    g6 = jax.grad(f6)(jnp.zeros((4, 6)))
    assert np.isfinite(np.asarray(g6)).all()
