import jax
import jax.numpy as jnp
import numpy as np
import pytest

from captra_tpu.config.schema import (
    Config, NetworkCfg, ObjCfg, PointNetCfg, SAMsgCfg,
)
from captra_tpu.models.backbone import PointNet2Msg
from captra_tpu.models.coordnet import CoordNet, canonicalize, solve_st
from captra_tpu.models.rotnet import (
    RotNet, canonicalize_per_part, compose_track_pose, decode_rotation,
)
from captra_tpu.pose.part_dof import Pose, apply_pose


def tiny_pointnet():
    return PointNetCfg(
        sa1=SAMsgCfg(npoint=32, radius_list=(0.1, 0.2), nsample_list=(8, 16),
                     mlp_list=((8, 16), (8, 16))),
        sa2=SAMsgCfg(npoint=8, radius_list=(0.4,), nsample_list=(8,),
                     mlp_list=((16, 32),)),
        sa3_mlp=(32, 64), fp3_mlp=(32,), fp2_mlp=(32,), fp1_mlp=(32,),
    )


def tiny_config(num_parts=2, sym=False, extra_dims=0):
    tree = tuple([-1] + [0] * (num_parts - 1))
    return Config(
        obj=ObjCfg(num_parts=num_parts, num_joints=num_parts - 1, tree=tree,
                   sym=sym, extra_dims=extra_dims),
        network=NetworkCfg(backbone_out_dim=32, nocs_head_dims=(16,)),
        pointnet=tiny_pointnet(),
        num_points=128,
    )


N = 128


def test_backbone_shapes(key, rng):
    cfg = tiny_pointnet()
    net = PointNet2Msg(cfg, out_dim=32, use_xyz_feat=True)
    xyz = jnp.asarray(rng.randn(2, N, 3).astype(np.float32)) * 0.3
    variables = net.init(key, xyz, train=False)
    out = net.apply(variables, xyz, train=False)
    assert out.shape == (2, N, 32)
    assert np.isfinite(np.asarray(out)).all()
    # batch stats exist (BN) and update in train mode
    assert "batch_stats" in variables
    out2, updates = net.apply(variables, xyz, train=True,
                              mutable=["batch_stats"])
    assert "batch_stats" in updates


def test_backbone_no_xyz_feat(key, rng):
    net = PointNet2Msg(tiny_pointnet(), out_dim=32, use_xyz_feat=False)
    xyz = jnp.asarray(rng.randn(2, N, 3).astype(np.float32)) * 0.3
    variables = net.init(key, xyz, train=False)
    out = net.apply(variables, xyz, train=False)
    assert out.shape == (2, N, 32)


def test_coordnet_shapes(key, rng):
    cfg = tiny_config(num_parts=2, extra_dims=1)
    net = CoordNet(cfg)
    pts = jnp.asarray(rng.randn(2, N, 3).astype(np.float32)) * 0.3
    variables = net.init(key, pts, train=False)
    out = net.apply(variables, pts, train=False)
    assert out["seg"].shape == (2, N, 3)  # P + extra
    assert out["nocs"].shape == (2, N, 6)  # 3P
    np.testing.assert_allclose(np.asarray(out["seg"].sum(-1)), 1.0, atol=1e-5)
    assert (np.asarray(out["nocs"]) >= -0.5).all()
    assert (np.asarray(out["nocs"]) <= 0.5).all()


def _make_pose(rng, B, P):
    from captra_tpu.pose import rotations as rot
    q = rng.randn(B, P, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return Pose(
        rotation=jnp.asarray(rot.quat_to_matrix(jnp.asarray(q))),
        translation=jnp.asarray(rng.randn(B, P, 3, 1).astype(np.float32) * 0.2),
        scale=jnp.asarray(rng.uniform(0.8, 1.2, (B, P)).astype(np.float32)),
    )


def test_solve_st_recovers_pose(rng):
    """Perfect NPCS + GT rotation => solve_st returns the GT s/t."""
    B, P = 2, 2
    pose = _make_pose(rng, B, P)
    labels = rng.randint(0, P, (B, N))
    npcs = (rng.rand(B, N, 3).astype(np.float32) - 0.5) * 0.6
    # camera points: each point posed by its part's pose
    cam = np.zeros((B, N, 3), np.float32)
    for b in range(B):
        for p in range(P):
            m = labels[b] == p
            s = np.asarray(pose.scale)[b, p]
            R = np.asarray(pose.rotation)[b, p]
            t = np.asarray(pose.translation)[b, p, :, 0]
            cam[b, m] = s * (npcs[b, m] @ R.T) + t
    mean = cam.mean(1)
    pts = cam - mean[:, None]
    # nocs layout: [B, N, 3P] with each part's block holding the coords
    nocs_flat = np.zeros((B, N, 3 * P), np.float32)
    for p in range(P):
        nocs_flat[..., 3 * p:3 * p + 3] = npcs
    seg = np.eye(P, dtype=np.float32)[labels]

    init = Pose.identity((B, P))
    out = solve_st(jnp.asarray(seg), jnp.asarray(nocs_flat), jnp.asarray(pts),
                   jnp.asarray(mean), jnp.asarray(labels), pose.rotation,
                   init, num_parts=P, sym=False)
    np.testing.assert_allclose(np.asarray(out.scale), np.asarray(pose.scale),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.translation),
                               np.asarray(pose.translation), atol=1e-3)


def test_solve_st_empty_part_fallback(rng):
    B, P = 1, 2
    labels = np.zeros((B, N), np.int64)  # part 1 empty
    pts = rng.randn(B, N, 3).astype(np.float32) * 0.2
    mean = np.zeros((B, 3), np.float32)
    nocs_flat = rng.rand(B, N, 3 * P).astype(np.float32) - 0.5
    seg = np.eye(P, dtype=np.float32)[labels]
    init = _make_pose(rng, B, P)
    out = solve_st(jnp.asarray(seg), jnp.asarray(nocs_flat), jnp.asarray(pts),
                   jnp.asarray(mean), jnp.asarray(labels),
                   init.rotation, init, num_parts=P, sym=False)
    # empty part 1 falls back to init
    np.testing.assert_allclose(np.asarray(out.scale)[0, 1],
                               np.asarray(init.scale)[0, 1])
    np.testing.assert_allclose(np.asarray(out.translation)[0, 1],
                               np.asarray(init.translation)[0, 1])


def test_rotnet_shapes_and_decode(key, rng):
    cfg = tiny_config(num_parts=2)
    net = RotNet(cfg)
    B, P = 2, 2
    canon = jnp.asarray(rng.randn(B, P, N, 3).astype(np.float32)) * 0.3
    labels = jnp.asarray(rng.randint(0, P, (B, N)))
    variables = net.init(key, canon, labels, train=False)
    out = net.apply(variables, canon, labels, train=False)
    assert out["rtvec"].shape == (B, P, 9)
    assert out["point_rtvec"].shape == (B, P, N, 9)
    delta, point = decode_rotation(out, sym=False)
    assert delta.shape == (B, P, 3, 3)
    assert point.shape == (B, P, N, 3, 3)
    eye = np.broadcast_to(np.eye(3), (B, P, 3, 3))
    np.testing.assert_allclose(
        np.asarray(delta @ jnp.swapaxes(delta, -1, -2)), eye, atol=1e-4)
    # per-part params: heads must have a leading part axis
    head_params = variables["params"]["regressor"]["heads"]
    leaf = jax.tree.leaves(head_params)[0]
    assert leaf.shape[0] == P


def test_rotnet_sym(key, rng):
    cfg = tiny_config(num_parts=1, sym=True)
    net = RotNet(cfg)
    canon = jnp.asarray(rng.randn(1, 1, N, 3).astype(np.float32)) * 0.3
    labels = jnp.asarray(rng.randint(0, 1, (1, N)))
    variables = net.init(key, canon, labels, train=False)
    out = net.apply(variables, canon, labels, train=False)
    assert out["rtvec"].shape == (1, 1, 3)
    delta, _ = decode_rotation(out, sym=True)
    assert delta.shape == (1, 1, 3, 3)


def test_compose_track_pose_perfect_inputs(rng):
    """With perfect NPCS + identity delta, the composed pose == GT pose."""
    B, P = 1, 2
    gt = _make_pose(rng, B, P)
    labels = rng.randint(0, P, (B, N))
    npcs = (rng.rand(B, P, N, 3).astype(np.float32) - 0.5) * 0.6
    cam = np.zeros((B, N, 3), np.float32)
    for b in range(B):
        for p in range(P):
            m = labels[b] == p
            s = np.asarray(gt.scale)[b, p]
            R = np.asarray(gt.rotation)[b, p]
            t = np.asarray(gt.translation)[b, p, :, 0]
            cam[b, m] = s * (npcs[b, p, m] @ R.T) + t
    mean = cam.mean(1)
    pts = cam - mean[:, None]

    # state: GT rotation (delta=I) but wrong s/t
    state = Pose(rotation=gt.rotation,
                 translation=gt.translation + 0.3,
                 scale=gt.scale * 1.5)
    eye = jnp.broadcast_to(jnp.eye(3), (B, P, 3, 3))
    out = compose_track_pose(state, eye, jnp.asarray(labels),
                             jnp.asarray(npcs), jnp.asarray(pts),
                             jnp.asarray(mean), num_parts=P, sym=False)
    np.testing.assert_allclose(np.asarray(out.scale), np.asarray(gt.scale),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.translation),
                               np.asarray(gt.translation), atol=1e-3)


def test_canonicalize_consistency(rng):
    B, P = 2, 3
    pose = _make_pose(rng, B, P)
    cam = rng.randn(B, N, 3).astype(np.float32)
    mean = cam.mean(1)
    pts = jnp.asarray(cam - mean[:, None])
    out = canonicalize_per_part(pts, jnp.asarray(mean), pose)
    assert out.shape == (B, P, N, 3)
    # posing back must recover the camera points for every part
    back = apply_pose(pose, out)
    np.testing.assert_allclose(
        np.asarray(back), np.broadcast_to(cam[:, None], (B, P, N, 3)),
        atol=1e-4)
    # root-part canonicalization matches the CoordNet path
    root = Pose(rotation=pose.rotation[:, 0], translation=pose.translation[:, 0],
                scale=pose.scale[:, 0])
    a = canonicalize(pts, jnp.asarray(mean), root)
    np.testing.assert_allclose(np.asarray(a), np.asarray(out[:, 0]), atol=1e-5)
