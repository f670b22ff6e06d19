"""OTF (on-device crop) tracking: depth frames -> crop -> nets -> pose,
fully inside the scan (reference model.py:409-478 nocs_otf path)."""
import jax
import jax.numpy as jnp
import numpy as np

from captra_tpu.config.schema import ObjCfg, TrackCfg
from captra_tpu.data.preprocess import NOCS_CAMERA_INTRINSICS
from captra_tpu.pose.part_dof import Pose
from captra_tpu.tracking.tracker import make_track_step, track_trajectory

from tests.test_models import tiny_config


def _depth_scene(ox, oy, H=64, W=80):
    """Flat background at 1.5m + object blob at 1.0m at (ox, oy)."""
    depth = np.full((H, W), 1500, np.int32)
    mask = np.zeros((H, W), bool)
    mask[oy:oy + 12, ox:ox + 12] = True
    depth[mask] = 1000
    return depth, mask


def test_otf_track_step_runs(key):
    obj = ObjCfg(num_parts=1, num_joints=0, tree=(-1,), extra_dims=1,
                 nocs_data=True)
    cfg = tiny_config().replace(
        obj=obj, num_points=128,
        track=TrackCfg(init_frame_gt=True, nocs_otf=True))

    T, B = 3, 1
    K = np.asarray(NOCS_CAMERA_INTRINSICS)
    depths, masks = [], []
    for t in range(T):
        d, m = _depth_scene(30 + t, 24)
        depths.append(d)
        masks.append(m)
    depths = jnp.asarray(np.stack(depths))[:, None]  # [T, B, H, W]
    masks = jnp.asarray(np.stack(masks))[:, None]

    # object center in camera space (from the depth geometry)
    from captra_tpu.data.preprocess import backproject_depth
    pts0, _ = backproject_depth(depths[0, 0], jnp.asarray(K))
    center0 = np.asarray(pts0).reshape(64, 80, 3)[np.asarray(masks[0, 0])]\
        .mean(0)

    init_pose = Pose(
        rotation=jnp.broadcast_to(jnp.eye(3), (B, 1, 3, 3)),
        translation=jnp.asarray(center0).reshape(1, 1, 3, 1),
        scale=jnp.full((B, 1), 0.2))

    # oracle predictors: "NPCS" = canonical points (true when pose == GT),
    # seg = one-hot from the OTF labels isn't visible to coord_fn, so use
    # uniform object seg; rot delta = identity
    def coord_fn(canon_pts):
        Bc, N, _ = canon_pts.shape
        seg = jnp.zeros((Bc, N, 2)).at[..., 0].set(1.0)
        return {"seg": seg, "nocs": canon_pts}

    def rot_fn(parts, labels):
        Bc, P, N, _ = parts.shape
        eye9 = jnp.broadcast_to(jnp.eye(3).reshape(9), (Bc, P, 9))
        return {"rtvec": eye9,
                "point_rtvec": jnp.broadcast_to(eye9[:, :, None],
                                                (Bc, P, N, 9))}

    step = make_track_step(cfg, coord_fn, rot_fn,
                           intrinsics=jnp.asarray(K))
    frames = {"depth": depths, "mask": masks,
              "key": jnp.arange(T, dtype=jnp.int32)}
    final, aux = jax.jit(
        lambda ip, fr: track_trajectory(step, ip, fr))(init_pose, frames)

    assert aux.pose.translation.shape == (T - 1, B, 1, 3, 1)
    assert np.isfinite(np.asarray(aux.pose.scale)).all()
    # tracked translation should stay near the object (which moves slowly in
    # x); NOCS backprojection negates z, so the object sits at z ~ -1.0m
    tz = np.asarray(aux.pose.translation)[..., 2, 0]
    assert (np.abs(tz + 1.0) < 0.2).all(), tz


def test_otf_track_survives_empty_depth_frame(key):
    """A mid-scan frame with no valid depth (sensor dropout) must not
    derail the recurrence: the crop falls back to whatever is valid
    (preprocess.crop_ball_batch_planes in_ball->valid fallback) and the
    pose stays finite through the remaining frames."""
    obj = ObjCfg(num_parts=1, num_joints=0, tree=(-1,), extra_dims=1,
                 nocs_data=True)
    cfg = tiny_config().replace(
        obj=obj, num_points=128,
        track=TrackCfg(init_frame_gt=True, nocs_otf=True))

    T, B = 4, 1
    K = np.asarray(NOCS_CAMERA_INTRINSICS)
    depths, masks = [], []
    for t in range(T):
        d, m = _depth_scene(30 + t, 24)
        if t == 2:  # total sensor dropout on frame 2
            d = np.zeros_like(d)
            m = np.zeros_like(m)
        depths.append(d)
        masks.append(m)
    depths = jnp.asarray(np.stack(depths))[:, None]
    masks = jnp.asarray(np.stack(masks))[:, None]

    from captra_tpu.data.preprocess import backproject_depth
    pts0, _ = backproject_depth(depths[0, 0], jnp.asarray(K))
    center0 = np.asarray(pts0).reshape(64, 80, 3)[np.asarray(masks[0, 0])]\
        .mean(0)
    init_pose = Pose(
        rotation=jnp.broadcast_to(jnp.eye(3), (B, 1, 3, 3)),
        translation=jnp.asarray(center0).reshape(1, 1, 3, 1),
        scale=jnp.full((B, 1), 0.2))

    def coord_fn(canon_pts):
        Bc, N, _ = canon_pts.shape
        seg = jnp.zeros((Bc, N, 2)).at[..., 0].set(1.0)
        return {"seg": seg, "nocs": canon_pts}

    def rot_fn(parts, labels):
        Bc, P, N, _ = parts.shape
        eye9 = jnp.broadcast_to(jnp.eye(3).reshape(9), (Bc, P, 9))
        return {"rtvec": eye9,
                "point_rtvec": jnp.broadcast_to(eye9[:, :, None],
                                                (Bc, P, N, 9))}

    step = make_track_step(cfg, coord_fn, rot_fn, intrinsics=jnp.asarray(K))
    frames = {"depth": depths, "mask": masks,
              "key": jnp.arange(T, dtype=jnp.int32)}
    final, aux = jax.jit(
        lambda ip, fr: track_trajectory(step, ip, fr))(init_pose, frames)
    assert np.isfinite(np.asarray(aux.pose.translation)).all()
    assert np.isfinite(np.asarray(aux.pose.scale)).all()
    # after the dropout frame the tracker re-acquires the object
    tz = np.asarray(aux.pose.translation)[-1, ..., 2, 0]
    assert np.abs(tz + 1.0).max() < 0.3, tz
