"""OTF (on-device crop) tracking: depth frames -> crop -> nets -> pose,
fully inside the scan (reference model.py:409-478 nocs_otf path)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def _dropout_scene(T, dropout_at, stray_pixels=0):
    """Depth video with a dropout frame: all-invalid, or `stray_pixels`
    lone returns (near-total dropout)."""
    depths, masks = [], []
    for t in range(T):
        d, m = _depth_scene(30 + t, 24)
        if t == dropout_at:
            d = np.zeros_like(d)
            m = np.zeros_like(m)
            for p in range(stray_pixels):
                d[5 + p, 5] = 900  # stray sensor return
        depths.append(d)
        masks.append(m)
    return (jnp.asarray(np.stack(depths))[:, None],
            jnp.asarray(np.stack(masks))[:, None])


def _oracle_fns():
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

    return coord_fn, rot_fn


@pytest.mark.parametrize("stray_pixels", [0, 1])
def test_otf_track_survives_dropout_frame(key, stray_pixels):
    """A mid-scan frame with no (or almost no) valid depth must not derail
    the recurrence.  Total dropout is caught by the tracker's frame_ok pose
    freeze; near-total dropout (a few stray returns) collapses the per-part
    fit to ~zero scale, which the scale floor in pose_fit.filter_valid
    rejects so the per-part fallback keeps the previous s/t.  The crop's
    own in_ball->valid fallback selects nothing on an all-invalid frame —
    it does NOT provide this protection by itself."""
    obj = ObjCfg(num_parts=1, num_joints=0, tree=(-1,), extra_dims=1,
                 nocs_data=True)
    cfg = tiny_config().replace(
        obj=obj, num_points=128,
        track=TrackCfg(init_frame_gt=True, nocs_otf=True))

    T, B = 4, 1
    K = np.asarray(NOCS_CAMERA_INTRINSICS)
    depths, masks = _dropout_scene(T, dropout_at=2,
                                   stray_pixels=stray_pixels)

    from captra_tpu.data.preprocess import backproject_depth
    pts0, _ = backproject_depth(depths[0, 0], jnp.asarray(K))
    center0 = np.asarray(pts0).reshape(64, 80, 3)[np.asarray(masks[0, 0])]\
        .mean(0)
    init_pose = Pose(
        rotation=jnp.broadcast_to(jnp.eye(3), (B, 1, 3, 3)),
        translation=jnp.asarray(center0).reshape(1, 1, 3, 1),
        scale=jnp.full((B, 1), 0.2))

    coord_fn, rot_fn = _oracle_fns()
    step = make_track_step(cfg, coord_fn, rot_fn, intrinsics=jnp.asarray(K))
    frames = {"depth": depths, "mask": masks,
              "key": jnp.arange(T, dtype=jnp.int32)}
    final, aux = jax.jit(
        lambda ip, fr: track_trajectory(step, ip, fr))(init_pose, frames)
    assert np.isfinite(np.asarray(aux.pose.translation)).all()
    scale = np.asarray(aux.pose.scale)
    assert np.isfinite(scale).all() and (scale > 1e-3).all(), scale
    # after the dropout frame the tracker re-acquires the object
    tz = np.asarray(aux.pose.translation)[-1, ..., 2, 0]
    assert np.abs(tz + 1.0).max() < 0.3, tz
