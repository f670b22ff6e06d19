"""Synthetic trajectory generator for tests, benchmarks and smoke training.

Produces CAPTRA-shaped data without the NOCS/SAPIEN corpora: per-part NPCS
point clouds on box-ish shells, smooth per-frame 9-DoF pose trajectories
(articulated parts get joint motion consistent with the kinematic tree and
joint type), and observed camera clouds = posed NPCS + sensor noise.

This mirrors what the offline preprocessing pipeline emits per frame
(reference datasets/nocs_data/nocs_data_process.py:43-50: {points, labels,
nocs, pose}), so every downstream component sees the real shapes.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from captra_tpu.config.schema import ObjCfg
from captra_tpu.pose.part_dof import Pose, tree_root


@dataclass
class Trajectory:
    """T frames of a tracked object (all numpy, host-side).

    points: [T, N, 3] camera-space cloud (NOT centered)
    labels: [T, N] int in [0, P) (+P for background if with_background)
    nocs:   [T, N, 3] GT NPCS of each point (own part)
    pose:   Pose with leading dims [T, P]
    corners:[P, 2, 3] NPCS part bounds
    """
    points: np.ndarray
    labels: np.ndarray
    nocs: np.ndarray
    pose: Pose
    corners: np.ndarray


def _part_shell(rng: np.random.RandomState, n: int, size: np.ndarray):
    """Points on the surface of a box of half-extent `size` (so rotation is
    observable, unlike a solid Gaussian blob).

    Vectorized but BIT-IDENTICAL to the original per-point loop (same RNG
    draws, same uv-to-axis assignment) — the loop dominated host batch
    generation for multi-part categories (~90 ms/step amortized)."""
    face = rng.randint(0, 6, n)
    uv = rng.uniform(-1, 1, (n, 2))
    pts = np.zeros((n, 3), np.float32)
    axis, sign = face % 3, (face // 3) * 2 - 1
    rows = np.arange(n)
    # the loop's `others` for a: 0->(1,2), 1->(0,2), 2->(0,1)
    first = np.where(axis == 0, 1, 0)
    second = np.where(axis == 2, 1, 2)
    pts[rows, axis] = sign
    pts[rows, first] = uv[:, 0]
    pts[rows, second] = uv[:, 1]
    return pts * size


def _revolution_shell(rng: np.random.RandomState, n: int, size: np.ndarray):
    """Bottle-like surface of revolution about y: rotationally symmetric, as
    the sym-category losses assume (radius varies with height so the y axis
    is still observable)."""
    y = rng.uniform(-1, 1, n)
    theta = rng.uniform(0, 2 * np.pi, n)
    r = (0.6 + 0.4 * np.cos(1.5 * y))  # neck profile
    pts = np.stack([r * np.cos(theta) * size[0], y * size[1],
                    r * np.sin(theta) * size[2]], axis=-1)
    return pts.astype(np.float32)


def make_trajectory(seed: int, obj: ObjCfg, num_frames: int = 30,
                    num_points: int = 1024, noise: float = 0.002,
                    scale_range=(0.15, 0.3), with_background: bool = False,
                    motion_rad: float = 0.03, motion_trans: float = 0.01,
                    ) -> Trajectory:
    """Deterministic synthetic trajectory for a category config."""
    rng = np.random.RandomState(seed)
    P = obj.num_parts
    root = tree_root(obj.tree)

    # per-part NPCS geometry: disjoint boxes stacked along x
    sizes = rng.uniform(0.08, 0.18, (P, 3)).astype(np.float32)
    offsets = np.zeros((P, 3), np.float32)
    for p in range(P):
        offsets[p, 0] = (p - (P - 1) / 2) * 0.25
    shell = _revolution_shell if obj.sym else _part_shell
    n_per = num_points // P
    npcs_parts, labels_parts = [], []
    for p in range(P):
        pts = shell(rng, n_per, sizes[p]) + offsets[p]
        npcs_parts.append(pts)
        labels_parts.append(np.full(n_per, p, np.int64))
    rest = num_points - n_per * P
    if rest:
        npcs_parts.append(shell(rng, rest, sizes[0]) + offsets[0])
        labels_parts.append(np.full(rest, 0, np.int64))
    npcs = np.concatenate(npcs_parts).astype(np.float32)  # [N, 3]
    labels = np.concatenate(labels_parts)

    corners = np.stack([offsets - sizes, offsets + sizes], axis=1)  # [P,2,3]

    # global trajectory: root pose drifts smoothly; child parts follow the
    # root with extra joint motion (revolute about main_axis through the
    # joint anchor, or prismatic along it)
    scale = rng.uniform(*scale_range)
    base_R = _random_rotation(rng)
    base_t = rng.uniform(-0.1, 0.1, 3).astype(np.float32) + np.array(
        [0, 0, 0.8], np.float32)

    key_T = num_frames
    Rs = np.zeros((key_T, P, 3, 3), np.float32)
    ts = np.zeros((key_T, P, 3, 1), np.float32)
    ss = np.full((key_T, P), scale, np.float32)

    # random but smooth increments
    axis = rng.randn(3).astype(np.float32)
    axis /= np.linalg.norm(axis)
    dtrans = rng.randn(3).astype(np.float32)
    dtrans = dtrans / np.linalg.norm(dtrans) * motion_trans

    joint_state = np.zeros(P, np.float32)
    djoint = rng.uniform(0.2, 1.0, P).astype(np.float32) * 0.03

    R_cur, t_cur = base_R.copy(), base_t.copy()
    for f in range(key_T):
        R_cur = _axis_angle(axis, motion_rad) @ R_cur
        t_cur = t_cur + dtrans
        for p in range(P):
            if p == root or obj.num_joints == 0:
                Rs[f, p], ts[f, p, :, 0] = R_cur, t_cur
            else:
                # joint motion in NPCS frame, then global pose
                jidx = min(p, len(obj.main_axis) - 1) if obj.main_axis else 0
                ax = np.zeros(3, np.float32)
                ax[obj.main_axis[jidx] if obj.main_axis else 1] = 1.0
                theta = joint_state[p] + f * djoint[p]
                if obj.joint_type == "prismatic":
                    R_local = np.eye(3, dtype=np.float32)
                    t_local = ax * theta * 0.3
                else:
                    R_local = _axis_angle(ax, theta)
                    t_local = (np.eye(3) - R_local) @ offsets[p]
                Rs[f, p] = R_cur @ R_local
                ts[f, p, :, 0] = (scale * (R_cur @ t_local) + t_cur)

    pose = Pose(rotation=jnp.asarray(Rs), translation=jnp.asarray(ts),
                scale=jnp.asarray(ss))

    # observed clouds: pose own part's NPCS + noise (pure numpy — keeps data
    # generation off-device and compile-free)
    posed = np.einsum("tpij,nj->tpni", Rs, npcs) * ss[..., None, None]
    posed = posed + np.swapaxes(ts, -1, -2)  # [T, P, 1, 3] broadcasts over N
    sel = posed[np.arange(key_T)[:, None], labels[None, :],
                np.arange(npcs.shape[0])[None, :]]  # [T, N, 3]
    points = sel + rng.randn(*sel.shape).astype(np.float32) * noise

    labels_t = np.broadcast_to(labels, (key_T, labels.shape[0])).copy()
    nocs_t = np.broadcast_to(npcs, (key_T,) + npcs.shape).copy()
    return Trajectory(points=points.astype(np.float32), labels=labels_t,
                      nocs=nocs_t, pose=pose, corners=corners)


def _random_rotation(rng) -> np.ndarray:
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2*y*y - 2*z*z, 2*x*y - 2*z*w, 2*x*z + 2*y*w],
        [2*x*y + 2*z*w, 1 - 2*x*x - 2*z*z, 2*y*z - 2*x*w],
        [2*x*z - 2*y*w, 2*y*z + 2*x*w, 1 - 2*x*x - 2*y*y],
    ], dtype=np.float32)


def _axis_angle(axis, theta) -> np.ndarray:
    """Rodrigues' formula, pure numpy."""
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    R = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)
    return R.astype(np.float32)


def make_frame_batch(seed: int, obj: ObjCfg, batch: int = 8,
                     num_points: int = 512, num_frames: int = 4):
    """Single-frame training batch: dict of points/labels/nocs/pose/corners
    with leading dim `batch` (the shape SingleFrameData yields, reference
    network/data/dataset.py:120-132)."""
    trajs = [make_trajectory(seed * 131 + b, obj, num_frames=num_frames,
                             num_points=num_points) for b in range(batch)]
    f = seed % num_frames
    return {
        "points": jnp.stack([jnp.asarray(t.points[f]) for t in trajs]),
        "labels": jnp.stack([jnp.asarray(t.labels[f]) for t in trajs]),
        "nocs": jnp.stack([jnp.asarray(t.nocs[f]) for t in trajs]),
        "pose": jax.tree.map(lambda *x: jnp.stack(x),
                             *[t.pose[f] for t in trajs]),
        "corners": jnp.stack([jnp.asarray(t.corners) for t in trajs]),
    }


def geometry_pool(seed: int, obj: ObjCfg, count: int, num_points: int):
    """Host-side NPCS geometry pool for device-side pose resampling:
    {npcs [G, N, 3], labels [G, N], corners [G, P, 2, 3]} (the pose- and
    noise-free part of `make_trajectory`)."""
    rng = np.random.RandomState(seed)
    P = obj.num_parts
    shell = _revolution_shell if obj.sym else _part_shell
    all_npcs, all_labels, all_corners = [], [], []
    for _ in range(count):
        sizes = rng.uniform(0.08, 0.18, (P, 3)).astype(np.float32)
        offsets = np.zeros((P, 3), np.float32)
        for p in range(P):
            offsets[p, 0] = (p - (P - 1) / 2) * 0.25
        n_per = num_points // P
        npcs_parts, labels_parts = [], []
        for p in range(P):
            npcs_parts.append(shell(rng, n_per, sizes[p]) + offsets[p])
            labels_parts.append(np.full(n_per, p, np.int64))
        rest = num_points - n_per * P
        if rest:
            npcs_parts.append(shell(rng, rest, sizes[0]) + offsets[0])
            labels_parts.append(np.full(rest, 0, np.int64))
        all_npcs.append(np.concatenate(npcs_parts).astype(np.float32))
        all_labels.append(np.concatenate(labels_parts))
        all_corners.append(np.stack([offsets - sizes, offsets + sizes],
                                    axis=1))
    return {"npcs": jnp.asarray(np.stack(all_npcs)),
            "labels": jnp.asarray(np.stack(all_labels)),
            "corners": jnp.asarray(np.stack(all_corners))}


def device_pose_batch(key: jax.Array, npcs: jnp.ndarray,
                      labels: jnp.ndarray, corners: jnp.ndarray,
                      obj: ObjCfg, scale_range=(0.15, 0.3),
                      noise: float = 0.002) -> dict:
    """Jittable data augmentation: re-render cached NPCS geometry under a
    fresh random pose, ON DEVICE.  The TPU-native answer to pose-diversity-
    limited training: the geometry pool is resident in HBM and every step
    sees a brand-new pose draw at zero host cost (no host generation, no
    H2D traffic per step — both expensive through a remote-dispatch tunnel).

    npcs [B, N, 3], labels [B, N], corners [B, P, 2, 3] -> a training batch
    {points, labels, nocs, pose, corners}.  Kinematics match
    `make_trajectory`: root pose uniform-random; child parts get revolute
    motion about `main_axis` anchored at the part's NPCS center, or
    prismatic translation along it.
    """
    from captra_tpu.pose.rotations import axis_theta_to_matrix, quat_to_matrix
    B, N, _ = npcs.shape
    P = obj.num_parts
    root = tree_root(obj.tree)
    k_q, k_t, k_s, k_j, k_n = jax.random.split(key, 5)

    q = jax.random.normal(k_q, (B, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    R_root = quat_to_matrix(q)                                   # [B, 3, 3]
    t_root = jax.random.uniform(k_t, (B, 3), minval=-0.1,
                                maxval=0.1) + jnp.array([0, 0, 0.8])
    s = jax.random.uniform(k_s, (B,), minval=scale_range[0],
                           maxval=scale_range[1])
    theta = jax.random.uniform(k_j, (B, P), minval=0.0, maxval=0.6)

    offsets = jnp.mean(corners, axis=2)                          # [B, P, 3]
    R, t = _compose_parts(R_root, t_root, s, theta, offsets, obj)

    posed = jnp.einsum("bpij,bnj->bpni", R, npcs) * s[:, None, None, None] \
        + t[:, :, None]                                          # [B, P, N, 3]
    own = jnp.take_along_axis(
        posed, labels[:, None, :, None].repeat(3, -1), axis=1)[:, 0]
    points = own + noise * jax.random.normal(k_n, own.shape)
    pose = Pose(rotation=R, translation=t[..., None],
                scale=jnp.broadcast_to(s[:, None], (B, P)))
    return {"points": points, "labels": labels, "nocs": npcs,
            "pose": pose, "corners": corners}


def _compose_parts(R_root, t_root, s, theta, offsets, obj: ObjCfg):
    """Per-part global poses from a root pose + per-part joint states, over
    a flat batch: R_root [M, 3, 3], t_root [M, 3], s [M], theta [M, P],
    offsets [M, P, 3] -> (R [M, P, 3, 3], t [M, P, 3]).  Kinematics match
    `make_trajectory` (revolute about `main_axis` anchored at the part's
    NPCS center, or prismatic along it)."""
    from captra_tpu.pose.rotations import axis_theta_to_matrix
    M = R_root.shape[0]
    P = obj.num_parts
    root = tree_root(obj.tree)
    Rs, ts = [], []
    for p in range(P):
        if p == root or obj.num_joints == 0:
            Rs.append(R_root)
            ts.append(t_root)
            continue
        jidx = min(p, len(obj.main_axis) - 1) if obj.main_axis else 0
        ax = np.zeros(3, np.float32)
        ax[obj.main_axis[jidx] if obj.main_axis else 1] = 1.0
        ax = jnp.asarray(ax)
        if obj.joint_type == "prismatic":
            R_local = jnp.broadcast_to(jnp.eye(3), (M, 3, 3))
            t_local = ax * theta[:, p:p + 1] * 0.3               # [M, 3]
        else:
            R_local = axis_theta_to_matrix(
                jnp.broadcast_to(ax, (M, 3)), theta[:, p])
            t_local = jnp.einsum(
                "bij,bj->bi", jnp.eye(3) - R_local, offsets[:, p])
        Rs.append(jnp.einsum("bij,bjk->bik", R_root, R_local))
        ts.append(s[:, None] * jnp.einsum("bij,bj->bi", R_root, t_local)
                  + t_root)
    return jnp.stack(Rs, axis=1), jnp.stack(ts, axis=1)


def device_trajectory_batch(key: jax.Array, npcs: jnp.ndarray,
                            labels: jnp.ndarray, corners: jnp.ndarray,
                            obj: ObjCfg, num_frames: int,
                            scale_range=(0.15, 0.3), noise: float = 0.002,
                            motion_rad: float = 0.03,
                            motion_trans: float = 0.01) -> dict:
    """Jittable [T, B] trajectory render over pooled geometry — the
    trajectory analogue of `device_pose_batch`, built for on-policy rollout
    fine-tuning (training/rollout.py): fresh smooth trajectories every round
    at zero host cost.  Motion model matches `make_trajectory`: the root
    pose drifts at a constant angular/linear rate along a random axis and
    each child joint advances at a constant random rate.

    npcs [B, N, 3], labels [B, N], corners [B, P, 2, 3] ->
    {points [T, B, N, 3], labels [T, B, N], nocs [T, B, N, 3],
     pose Pose[T, B, P], corners [B, P, 2, 3]}.
    """
    from captra_tpu.pose.rotations import axis_theta_to_matrix, quat_to_matrix
    B, N, _ = npcs.shape
    P = obj.num_parts
    T = num_frames
    k_q, k_t, k_s, k_j, k_dj, k_ax, k_dt, k_n = jax.random.split(key, 8)

    # base pose (same distribution as device_pose_batch)
    q = jax.random.normal(k_q, (B, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    R0 = quat_to_matrix(q)                                       # [B, 3, 3]
    t0 = jax.random.uniform(k_t, (B, 3), minval=-0.1,
                            maxval=0.1) + jnp.array([0, 0, 0.8])
    s = jax.random.uniform(k_s, (B,), minval=scale_range[0],
                           maxval=scale_range[1])
    theta0 = jax.random.uniform(k_j, (B, P), minval=0.0, maxval=0.6)
    djoint = jax.random.uniform(k_dj, (B, P), minval=0.2,
                                maxval=1.0) * 0.03

    axis = jax.random.normal(k_ax, (B, 3))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    dtrans = jax.random.normal(k_dt, (B, 3))
    dtrans = dtrans / jnp.linalg.norm(dtrans, axis=-1,
                                      keepdims=True) * motion_trans

    f = jnp.arange(1, T + 1, dtype=jnp.float32)                  # [T]
    # drift rotation for every (frame, traj): Rodrigues(axis_b, rad * f)
    drift = axis_theta_to_matrix(
        jnp.broadcast_to(axis[None], (T, B, 3)).reshape(T * B, 3),
        (motion_rad * f)[:, None].repeat(B, 1).reshape(T * B))
    R_root = jnp.einsum("mij,mjk->mik", drift,
                        jnp.broadcast_to(R0[None], (T, B, 3, 3))
                        .reshape(T * B, 3, 3))                   # [TB, 3, 3]
    t_root = (t0[None] + f[:, None, None] * dtrans[None]) \
        .reshape(T * B, 3)
    theta = (theta0[None] + (f - 1.0)[:, None, None] * djoint[None]) \
        .reshape(T * B, P)
    s_flat = jnp.broadcast_to(s[None], (T, B)).reshape(T * B)

    offsets = jnp.mean(corners, axis=2)                          # [B, P, 3]
    off_flat = jnp.broadcast_to(offsets[None], (T, B, P, 3)) \
        .reshape(T * B, P, 3)
    R, t = _compose_parts(R_root, t_root, s_flat, theta, off_flat, obj)

    npcs_flat = jnp.broadcast_to(npcs[None], (T, B, N, 3)) \
        .reshape(T * B, N, 3)
    labels_flat = jnp.broadcast_to(labels[None], (T, B, N)) \
        .reshape(T * B, N)
    posed = jnp.einsum("bpij,bnj->bpni", R, npcs_flat) \
        * s_flat[:, None, None, None] + t[:, :, None]            # [TB,P,N,3]
    own = jnp.take_along_axis(
        posed, labels_flat[:, None, :, None].repeat(3, -1), axis=1)[:, 0]
    points = own + noise * jax.random.normal(k_n, own.shape)

    pose = Pose(rotation=R.reshape(T, B, P, 3, 3),
                translation=t.reshape(T, B, P, 3)[..., None],
                scale=jnp.broadcast_to(s[None, :, None], (T, B, P)))
    return {"points": points.reshape(T, B, N, 3),
            "labels": jnp.broadcast_to(labels[None], (T, B, N)),
            "nocs": jnp.broadcast_to(npcs[None], (T, B, N, 3)),
            "pose": pose, "corners": corners}


def batch_trajectories(trajs: list[Trajectory]):
    """Stack B same-shape trajectories into batched arrays [T, B, ...]."""
    points = jnp.stack([t.points for t in trajs], axis=1)
    labels = jnp.stack([jnp.asarray(t.labels) for t in trajs], axis=1)
    nocs = jnp.stack([jnp.asarray(t.nocs) for t in trajs], axis=1)
    pose = jax.tree.map(lambda *x: jnp.stack(x, axis=1),
                        *[t.pose for t in trajs])
    corners = jnp.stack([jnp.asarray(t.corners) for t in trajs])
    return {"points": points, "labels": labels, "nocs": nocs, "pose": pose,
            "corners": corners}
