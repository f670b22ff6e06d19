"""Per-part 9-DoF pose algebra over a `Pose` pytree.

Functional spec: /root/reference/pose_utils/part_dof_utils.py.  A pose is
(R in SO(3), t in R^3, s > 0) per part; articulated objects carry one pose per
part plus a kinematic `tree` (parent indices, -1 = root).

`Pose` is a registered pytree (flax.struct), so it flows through `jit`,
`lax.scan` carries, `vmap`, and optax states untouched.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from captra_tpu.utils.precision import f32_precision
from flax import struct

from captra_tpu.pose import rotations as rot


@struct.dataclass
class Pose:
    """Batch of per-part similarity poses.

    rotation:    [..., 3, 3]
    translation: [..., 3, 1]
    scale:       [...]
    Leading dims are typically [B, P] (batch, parts).
    """
    rotation: jnp.ndarray
    translation: jnp.ndarray
    scale: jnp.ndarray

    @classmethod
    def identity(cls, shape: Sequence[int] = (), dtype=jnp.float32) -> "Pose":
        shape = tuple(shape)
        return cls(
            rotation=jnp.broadcast_to(jnp.eye(3, dtype=dtype), shape + (3, 3)),
            translation=jnp.zeros(shape + (3, 1), dtype),
            scale=jnp.ones(shape, dtype),
        )

    def __getitem__(self, idx) -> "Pose":
        return Pose(self.rotation[idx], self.translation[idx], self.scale[idx])

    def map(self, fn) -> "Pose":
        return jax.tree.map(fn, self)

    def expand_part(self, num_parts: int) -> "Pose":
        """Broadcast a per-object pose [...,] to per-part [..., P]."""
        return Pose(
            rotation=jnp.broadcast_to(
                self.rotation[..., None, :, :],
                self.rotation.shape[:-2] + (num_parts, 3, 3)),
            translation=jnp.broadcast_to(
                self.translation[..., None, :, :],
                self.translation.shape[:-2] + (num_parts, 3, 1)),
            scale=jnp.broadcast_to(
                self.scale[..., None], self.scale.shape + (num_parts,)),
        )


# ---------------------------------------------------------------------------
# kinematic tree helpers
# ---------------------------------------------------------------------------

def tree_root(tree: Sequence[int]) -> int:
    """Root part index of a parent list (reference list_to_tree,
    part_dof_utils.py:14-24)."""
    roots = [p for p, parent in enumerate(tree) if parent == -1]
    assert len(roots) == 1, f"tree {tree} must have exactly one root"
    return roots[0]


def tree_children(tree: Sequence[int]):
    children = [[] for _ in tree]
    for p, parent in enumerate(tree):
        if parent != -1:
            children[parent].append(p)
    return children


# ---------------------------------------------------------------------------
# applying poses
# ---------------------------------------------------------------------------

@f32_precision
def apply_pose(pose: Pose, pts: jnp.ndarray) -> jnp.ndarray:
    """Pose canonical points into camera space: s * (pts @ R.T) + t.

    pose leading dims [..., P]; pts [..., P, N, 3] (rows).  Reference
    pose_with_part (part_dof_utils.py:101-117).
    """
    est = pts @ jnp.swapaxes(pose.rotation, -1, -2)
    est = est * pose.scale[..., None, None]
    return est + jnp.swapaxes(pose.translation, -1, -2)


@f32_precision
def inverse_apply_pose(pose: Pose, pts: jnp.ndarray) -> jnp.ndarray:
    """Camera -> canonical: R.T (pts - t) / s, row layout."""
    est = pts - jnp.swapaxes(pose.translation, -1, -2)
    est = est @ pose.rotation  # rows (R^T x)^T
    return est / pose.scale[..., None, None]


@f32_precision
def canonicalize_columns(pose: Pose, pts_c3n: jnp.ndarray) -> jnp.ndarray:
    """Camera -> canonical for column layout [..., 3, N] (the network input
    path; reference networks.py:38-41,184-187)."""
    cam = pts_c3n - pose.translation
    cam = jnp.swapaxes(pose.rotation, -1, -2) @ cam
    return cam / pose.scale[..., None, None]


# ---------------------------------------------------------------------------
# pose composition
# ---------------------------------------------------------------------------

@f32_precision
def merge_delta_pose(base: Pose, delta_rotation: jnp.ndarray | None = None,
                     delta_scale: jnp.ndarray | None = None,
                     delta_trans: jnp.ndarray | None = None) -> Pose:
    """Compose a canonical-frame delta onto a base pose (reference
    merge_reenact_canon_part_pose, part_dof_utils.py:124-134):

        R <- R_base @ R_delta
        s <- s_delta * s_base
        t <- t_base + s_base * R_base @ t_delta
    """
    rotation, translation, scale = base.rotation, base.translation, base.scale
    if delta_rotation is not None:
        rotation = base.rotation @ delta_rotation
    if delta_scale is not None:
        scale = delta_scale * base.scale
    if delta_trans is not None:
        translation = base.translation + base.scale[..., None, None] * (
            base.rotation @ delta_trans)
    return Pose(rotation=rotation, translation=translation, scale=scale)


@f32_precision
def compute_parts_delta_pose(init: Pose, final: Pose, canon: Pose) -> Pose:
    """Supervision target: the canonical-frame delta taking `init` to `final`
    given the canonicalization pose `canon` (reference
    compute_parts_delta_pose, part_dof_utils.py:144-158).

    All three are per-part [..., P].  Unlike the reference we always include
    the (t_0 - t_c) term — it vanishes identically when t_0 == t_c, so the
    data-dependent branch at part_dof_utils.py:155 is unnecessary under jit.
    """
    s0, sf, sc = init.scale, final.scale, canon.scale
    t0, tf, tc = init.translation, final.translation, canon.translation
    R0, Rf, Rc = init.rotation, final.rotation, canon.rotation

    s_delta = sf / s0
    RcT = jnp.swapaxes(Rc, -1, -2)
    R0T = jnp.swapaxes(R0, -1, -2)
    R_delta = (RcT @ Rf) @ (R0T @ Rc)

    t = tf - tc - s_delta[..., None, None] * ((Rf @ R0T) @ (t0 - tc))
    t_delta = (RcT @ t) / sc[..., None, None]
    return Pose(rotation=R_delta, translation=t_delta, scale=s_delta)


def convert_pred_rtvec_to_matrix(pred: jnp.ndarray, sym: bool) -> jnp.ndarray:
    """Decode a regressed rotation: 9D averaged matrix -> Gram-Schmidt, or 3D
    y-vector -> frame (reference convert_pred_rtvec_to_matrix,
    part_dof_utils.py:137-141).  pred: [..., 9] or [..., 3]."""
    if sym:
        return rot.yvec_to_matrix(pred)
    return rot.gram_schmidt_3x3(pred.reshape(pred.shape[:-1] + (3, 3)))


# ---------------------------------------------------------------------------
# evaluation & perturbation
# ---------------------------------------------------------------------------

def eval_part_full(gt: Pose, pred: Pose, yaxis_only: bool = False):
    """Per-part pose errors + 5deg5cm / 10deg10cm indicators
    (reference eval_part_full, part_dof_utils.py:54-67).

    Returns a dict of arrays shaped like `gt.scale` ([..., P]); callers
    aggregate/flatten as needed.
    """
    from captra_tpu.pose import metrics
    rdiff = metrics.rot_diff_degree(gt.rotation, pred.rotation,
                                    yaxis_only=yaxis_only)
    tdiff = metrics.trans_diff(gt.translation, pred.translation)
    sdiff = metrics.scale_diff(gt.scale, pred.scale)
    return {
        "rdiff": rdiff,
        "tdiff": tdiff,
        "sdiff": sdiff,
        "5deg5cm": ((rdiff <= 5.0) & (tdiff <= 0.05)).astype(jnp.float32),
        "10deg10cm": ((rdiff <= 10.0) & (tdiff <= 0.10)).astype(jnp.float32),
    }


def add_noise_to_pose(key: jax.Array, pose: Pose, rot_rad: float,
                      trans_sigma: float, scale_sigma: float,
                      kind: str = "normal") -> Pose:
    """Perturb a pose for init-frame simulation / training augmentation
    (reference add_noise_to_part_dof, part_dof_utils.py:78-98): rotation
    jittered by |N|*rad about a random axis, scale by N*sigma, translation by
    a random direction scaled by N*sigma."""
    k_rot, k_s, k_tn, k_td = jax.random.split(key, 4)

    def rand(k, shape):
        if kind == "uniform":
            return jax.random.uniform(k, shape) * 2.0 - 1.0
        return jax.random.normal(k, shape)

    rotation = rot.noisy_rot_matrix(k_rot, pose.rotation, rot_rad, kind=kind)
    scale = pose.scale + rand(k_s, pose.scale.shape) * scale_sigma
    norm = rand(k_tn, pose.scale.shape) * trans_sigma  # [..., P]
    direction = rand(k_td, pose.scale.shape + (3,))
    direction = direction / jnp.clip(
        jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-9, None)
    translation = pose.translation + (direction * norm[..., None])[..., None]
    return Pose(rotation=rotation, translation=translation, scale=scale)
