"""Cross-implementation parity vs the PyTorch reference (/root/reference).

The reference modules run verbatim on CPU (torch is installed CPU-only, and
the reference supports CPU via the fallbacks in pointnet_utils.py:8-168);
weights are transferred with captra_tpu.training.convert — so these tests
simultaneously validate (a) the converter's key layout against *real*
reference state_dicts and (b) numerical forward/loss/pose-fit/track parity.

The single controlled deviation: the reference CPU-fallback FPS starts at a
random index (pointnet_utils.py:129); `deterministic_fps()` pins it to 0,
the CUDA kernel's convention (sampling_gpu.cu) that our implementation
follows.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from captra_tpu.config.schema import (
    Config, NetworkCfg, ObjCfg, PointNetCfg, TrackCfg,
)
from captra_tpu.training import convert
from tests.ref_compat import (
    deterministic_fps, load_ref, make_ref_cfg, prefixed_state_dict,
    rand_pose_np, randomize_torch_module, ref_track, to_jax_pose,
    to_torch_pose,
)

torch = pytest.importorskip("torch")

B, N = 2, 512


def jax_cfg(num_parts, sym, extra_dims, tree, net_type="rot_coord_track"):
    return Config(
        obj=ObjCfg(num_parts=num_parts, num_joints=max(0, num_parts - 1),
                   tree=tuple(tree), sym=sym, extra_dims=extra_dims),
        network=NetworkCfg(type=net_type),
        pointnet=PointNetCfg(),  # defaults == pointnet2_camera.yml
        num_points=N,
    )


def rand_points(rng, b=B, n=N):
    return (rng.randn(b, n, 3) * 0.12).astype(np.float32)


def rand_labels(rng, num_seg, b=B, n=N):
    return rng.randint(0, num_seg, size=(b, n)).astype(np.int64)


# ---------------------------------------------------------------------------
# pose math / losses / metrics (no networks)
# ---------------------------------------------------------------------------

def test_procrustes_parity(rng):
    ref = load_ref()
    from captra_tpu.pose import procrustes as jp

    P = 3
    src = rng.randn(B, P, N, 3).astype(np.float32) * 0.2
    tgt = rng.randn(B, P, N, 3).astype(np.float32) * 0.2
    mask = (rng.rand(B, P, N) > 0.4).astype(np.float32)
    rot = rand_pose_np(rng, (B, P))["rotation"]

    ts, tt = torch.from_numpy(src), torch.from_numpy(tgt)
    tm = torch.from_numpy(mask).unsqueeze(-1)

    # full solve, rotation free (3D SVD path)
    for sym in (False, True):
        r_ref, s_ref, t_ref = ref.procrustes.transform_pts_mask(
            ts, tt, tm, tm, sym=sym)
        r_j, s_j, t_j = jp.similarity_fit(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask), sym=sym)
        np.testing.assert_allclose(np.asarray(r_j), r_ref.numpy(),
                                   atol=2e-4, err_msg=f"rotation sym={sym}")
        np.testing.assert_allclose(np.asarray(s_j), s_ref.numpy(),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(t_j), t_ref.numpy(), atol=2e-4)

    # rotation given (the tracking path), with/without given_scale
    tr = torch.from_numpy(rot)
    for sym in (False, True):
        r_ref, s_ref, t_ref = ref.procrustes.transform_pts_mask(
            ts, tt, tm, tm, rotation=tr, sym=sym)
        r_j, s_j, t_j = jp.similarity_fit(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask),
            rotation=jnp.asarray(rot), sym=sym)
        np.testing.assert_allclose(np.asarray(s_j), s_ref.numpy(),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(t_j), t_ref.numpy(), atol=2e-4)

    gs = (0.5 + rng.rand(B, P)).astype(np.float32)
    _, s_ref, t_ref = ref.procrustes.transform_pts_mask(
        ts, tt, tm, tm, given_scale=torch.from_numpy(gs), rotation=tr)
    _, s_j, t_j = jp.similarity_fit(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask),
        given_scale=jnp.asarray(gs), rotation=jnp.asarray(rot))
    np.testing.assert_allclose(np.asarray(t_j), t_ref.numpy(), atol=2e-4)


def test_pose_fit_parity(rng):
    ref = load_ref()
    from captra_tpu.pose.pose_fit import part_fit_st

    P = 2
    labels = rand_labels(rng, P + 2)  # incl. out-of-part labels
    src = rng.randn(B, P, N, 3).astype(np.float32) * 0.2
    tgt = rng.randn(B, P, N, 3).astype(np.float32) * 0.2
    rot = rand_pose_np(rng, (B, P))["rotation"]

    for sym in (False, True):
        model, valid = ref.pose_fit.part_fit_st_no_ransac(
            torch.from_numpy(labels), torch.from_numpy(src),
            torch.from_numpy(tgt), torch.from_numpy(rot),
            {"num_parts": P, "sym": sym})
        pose_j, valid_j = part_fit_st(
            jnp.asarray(labels), jnp.asarray(src), jnp.asarray(tgt),
            jnp.asarray(rot), num_parts=P, sym=sym)
        np.testing.assert_allclose(np.asarray(pose_j.scale),
                                   model["scale"].numpy(), rtol=2e-4,
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(pose_j.translation),
                                   model["translation"].numpy(), atol=2e-4)
        np.testing.assert_array_equal(np.asarray(valid_j), valid.numpy())


def test_part_dof_parity(rng):
    ref = load_ref()
    from captra_tpu.pose import part_dof as jpd

    P = 3
    base_np = rand_pose_np(rng, (B, P))
    delta_np = rand_pose_np(rng, (B, P))
    canon_np = rand_pose_np(rng, (B, P))
    base_t, delta_t = to_torch_pose(base_np), to_torch_pose(delta_np)
    base_j, delta_j = to_jax_pose(base_np), to_jax_pose(delta_np)

    # merge_reenact_canon_part_pose (rotation delta only — the track path)
    merged_t = ref.part_dof_utils.merge_reenact_canon_part_pose(
        base_t, {"rotation": delta_t["rotation"]})
    merged_j = jpd.merge_delta_pose(base_j, delta_rotation=delta_j.rotation)
    np.testing.assert_allclose(np.asarray(merged_j.rotation),
                               merged_t["rotation"].numpy(), atol=1e-5)

    # full delta composition incl. trans/scale
    merged_t = ref.part_dof_utils.merge_reenact_canon_part_pose(
        base_t, {"rotation": delta_t["rotation"],
                 "scale": delta_t["scale"].unsqueeze(-1),
                 "trans": delta_t["translation"].squeeze(-1)})
    merged_j = jpd.merge_delta_pose(
        base_j, delta_rotation=delta_j.rotation, delta_scale=delta_j.scale,
        delta_trans=delta_j.translation)
    for k in ("rotation", "translation"):
        np.testing.assert_allclose(np.asarray(getattr(merged_j, k)),
                                   merged_t[k].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(merged_j.scale),
                               merged_t["scale"].numpy(), atol=1e-5)

    # compute_parts_delta_pose (the RotationModel supervision target)
    canon_t, canon_j = to_torch_pose(canon_np), to_jax_pose(canon_np)
    d_t = ref.part_dof_utils.compute_parts_delta_pose(base_t, delta_t, canon_t)
    d_j = jpd.compute_parts_delta_pose(base_j, delta_j, canon_j)
    np.testing.assert_allclose(np.asarray(d_j.rotation),
                               d_t["rotation"].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_j.translation),
                               d_t["translation"].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_j.scale),
                               d_t["scale"].numpy(), atol=1e-5)

    # pose_with_part vs apply_pose
    pts = rng.randn(B, P, 64, 3).astype(np.float32)
    posed_t = ref.part_dof_utils.pose_with_part(base_t, torch.from_numpy(pts))
    posed_j = jpd.apply_pose(base_j, jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(posed_j), posed_t.numpy(), atol=1e-5)

    # eval_part_full metrics
    for yaxis in (False, True):
        diff_t, _ = ref.part_dof_utils.eval_part_full(
            base_t, delta_t, yaxis_only=yaxis)
        diff_j = jpd.eval_part_full(base_j, delta_j, yaxis_only=yaxis)
        for key in ("rdiff", "tdiff", "sdiff", "5deg5cm", "10deg10cm"):
            ours = np.asarray(diff_j[key]).mean(axis=0)  # ref averages over B
            theirs = np.stack([diff_t[f"{key}_{p}"].numpy()
                               for p in range(P)], axis=-1)
            np.testing.assert_allclose(ours, theirs, atol=1e-4,
                                       err_msg=f"{key} yaxis={yaxis}")


def test_rotation_decode_parity(rng):
    ref = load_ref()
    from captra_tpu.pose import rotations as jr

    raw6 = rng.randn(64, 6).astype(np.float32)
    r_ref = ref.rotations.compute_rotation_matrix_from_ortho6d(
        torch.from_numpy(raw6))
    r_j = jr.ortho6d_to_matrix(jnp.asarray(raw6))
    np.testing.assert_allclose(np.asarray(r_j), r_ref.numpy(), atol=1e-5)

    m = rng.randn(64, 3, 3).astype(np.float32)
    g_ref = ref.rotations.compute_rotation_matrix_from_matrix(
        torch.from_numpy(m))
    g_j = jr.gram_schmidt_3x3(jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(g_j), g_ref.numpy(), atol=1e-5)

    v = rng.randn(64, 3).astype(np.float32)
    y_ref = ref.rotations.compute_rotation_matrix_from_3d(torch.from_numpy(v))
    y_j = jr.yvec_to_matrix(jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(y_j), y_ref.numpy(), atol=1e-5)


def test_loss_parity(rng):
    ref = load_ref()
    from captra_tpu.models import losses as jl

    P, S = 2, 3
    seg = rng.rand(B, N, S).astype(np.float32)
    seg /= seg.sum(-1, keepdims=True)
    labels = rand_labels(rng, S)
    miou_ref = ref.loss.compute_miou_loss(
        torch.from_numpy(seg).transpose(-1, -2), torch.from_numpy(labels))
    miou_j = jl.miou_loss(jnp.asarray(seg), jnp.asarray(labels))
    np.testing.assert_allclose(float(miou_j), float(miou_ref), rtol=1e-5)

    nocs_pred = (rng.rand(B, N, 3 * P).astype(np.float32) - 0.5)
    nocs_gt = (rng.rand(B, N, 3).astype(np.float32) - 0.5)
    l_ref = ref.loss.compute_nocs_loss(
        torch.from_numpy(nocs_pred).transpose(-1, -2),
        torch.from_numpy(nocs_gt).transpose(-1, -2),
        labels=torch.from_numpy(labels), confidence=None, loss="l2",
        self_supervise=False)
    l_j = jl.nocs_loss(jnp.asarray(nocs_pred), jnp.asarray(nocs_gt),
                       jnp.asarray(labels), P)
    np.testing.assert_allclose(float(l_j), float(l_ref), rtol=1e-4)

    # symmetric: the deterministic distance term must match exactly; the
    # pairwise term uses a random subsample on both sides (different RNGs) —
    # compare as estimators of the same expectation
    labels1 = rand_labels(rng, 2)
    d_ref, pwm_ref = ref.loss.compute_nocs_loss(
        torch.from_numpy(nocs_pred[..., :3]).transpose(-1, -2),
        torch.from_numpy(nocs_gt).transpose(-1, -2),
        labels=torch.from_numpy(labels1), confidence=None, loss="l2",
        self_supervise=False, sym=True, pwm_num=512)
    d_j, pwm_j = jl.sym_nocs_loss(jax.random.PRNGKey(3),
                                  jnp.asarray(nocs_pred[..., :3]),
                                  jnp.asarray(nocs_gt),
                                  jnp.asarray(labels1), 1, pwm_num=512)
    np.testing.assert_allclose(float(d_j), float(d_ref), rtol=1e-4)
    np.testing.assert_allclose(float(pwm_j), float(pwm_ref), rtol=0.15)

    # rotation / translation / scale / corner losses
    pose_a, pose_b = rand_pose_np(rng, (B, P)), rand_pose_np(rng, (B, P))
    ta, tb = to_torch_pose(pose_a), to_torch_pose(pose_b)
    ja, jb = to_jax_pose(pose_a), to_jax_pose(pose_b)
    for metric in ("l1", "l2", "frob"):
        r_ref = ref.loss.rot_trace_loss(ta["rotation"], tb["rotation"],
                                        metric=metric)
        r_j = jl.rot_trace_loss(ja.rotation, jb.rotation, metric=metric)
        np.testing.assert_allclose(np.asarray(r_j), r_ref.numpy(), rtol=1e-4,
                                   atol=1e-5, err_msg=metric)
    for metric in ("l1", "l2"):
        y_ref = ref.loss.rot_yaxis_loss(ta["rotation"], tb["rotation"],
                                        metric=metric)
        y_j = jl.rot_yaxis_loss(ja.rotation, jb.rotation, metric=metric)
        np.testing.assert_allclose(np.asarray(y_j), y_ref.numpy(), atol=1e-5)
        t_ref = ref.loss.trans_loss(ta["translation"], tb["translation"],
                                    metric=metric)
        t_j = jl.trans_loss(ja.translation, jb.translation, metric=metric)
        np.testing.assert_allclose(np.asarray(t_j), t_ref.numpy(), atol=1e-5)
        s_ref = ref.loss.scale_loss(ta["scale"], tb["scale"], metric=metric)
        s_j = jl.scale_loss(ja.scale, jb.scale, metric=metric)
        np.testing.assert_allclose(np.asarray(s_j), s_ref.numpy(), atol=1e-5)

    pts = rng.randn(B, P, 8, 3).astype(np.float32)
    c_ref, _ = ref.loss.compute_point_pose_loss(ta, tb, torch.from_numpy(pts),
                                                metric="l1")
    c_j, _ = jl.point_pose_loss(ja, jb, jnp.asarray(pts), metric="l1")
    np.testing.assert_allclose(float(c_j), float(c_ref), rtol=1e-4)


# ---------------------------------------------------------------------------
# networks with converted weights (validates training/convert.py key layout
# against real reference state_dicts)
# ---------------------------------------------------------------------------

def _ref_backbone(rng_seed, ref_cfg, use_xyz_feat):
    ref = load_ref()
    net = ref.networks.PointNet2Msg(ref_cfg, ref_cfg["network"]["backbone_out_dim"],
                                    net_type="camera", use_xyz_feat=use_xyz_feat)
    randomize_torch_module(net, seed=rng_seed)
    net.eval()
    return net


def test_backbone_forward_parity(rng):
    from captra_tpu.models.backbone import PointNet2Msg

    ref_cfg = make_ref_cfg(num_parts=1, sym=False, extra_dims=1, tree=[-1])
    net = _ref_backbone(0, ref_cfg, use_xyz_feat=True)

    sd = {f"bb.{k}": v.detach().numpy() for k, v in net.state_dict().items()}
    params, stats = convert.convert_backbone(sd, "bb", PointNetCfg())

    pts = rand_points(rng)
    with torch.no_grad(), deterministic_fps():
        out_ref = net(torch.from_numpy(pts).transpose(-1, -2))  # [B, C, N]

    mod = PointNet2Msg(PointNetCfg(), 128, use_xyz_feat=True)
    out_j = mod.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(pts), train=False)  # [B, N, C]
    np.testing.assert_allclose(np.asarray(out_j),
                               out_ref.transpose(-1, -2).numpy(),
                               atol=2e-3, rtol=1e-3)


def _make_coord_pair(rng_seed, num_parts, sym, extra_dims, tree):
    """(reference CoordNet eval-mode, my CoordNet apply fn, jax cfg)."""
    from captra_tpu.models.coordnet import CoordNet

    ref = load_ref()
    ref_cfg = make_ref_cfg(num_parts, sym, extra_dims, tree)
    net = ref.networks.CoordNet(ref_cfg)
    randomize_torch_module(net, seed=rng_seed)
    # spread the random-init nocs predictions across points: near-constant
    # NOCS makes the scale fit's centered sum-of-squares denominator tiny and
    # amplifies float noise by ~1e4 (a conditioning artifact of random
    # weights — trained NPCS spans the part)
    with torch.no_grad():
        net.nocs_head[3].weight *= 8.0
    net.eval()

    cfg = jax_cfg(num_parts, sym, extra_dims, tree)
    variables = convert.convert_coordnet(prefixed_state_dict(net, "net"), cfg,
                                         prefix="net")
    coord = CoordNet(cfg)
    return net, lambda p: coord.apply(variables, p, train=False), cfg


def test_coordnet_forward_parity(rng):
    net, coord_fn, cfg = _make_coord_pair(1, num_parts=2, sym=False,
                                          extra_dims=1, tree=[-1, 0])
    pts = rand_points(rng)
    mean = pts.mean(axis=1)
    centered = pts - mean[:, None]
    pose = rand_pose_np(rng, (B,))

    with torch.no_grad(), deterministic_fps():
        out_ref = net({
            "points": torch.from_numpy(centered).transpose(-1, -2),
            "points_mean": torch.from_numpy(mean).unsqueeze(-1),
            "canon_pose": to_torch_pose(pose),
        })

    from captra_tpu.models.coordnet import canonicalize
    canon = canonicalize(jnp.asarray(centered), jnp.asarray(mean),
                         to_jax_pose(pose))
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(canon, -1, -2)),
        out_ref["points"].numpy(), atol=1e-4)

    out_j = coord_fn(canon)
    np.testing.assert_allclose(np.asarray(out_j["seg"]),
                               out_ref["seg"].transpose(-1, -2).numpy(),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_j["nocs"]),
                               out_ref["nocs"].transpose(-1, -2).numpy(),
                               atol=2e-3)


@pytest.mark.parametrize("sym", [False, True])
def test_coordnet_st_solve_parity(rng, sym):
    """The in-graph s/t solve branch (reference networks.py:54-108)."""
    num_parts = 1 if sym else 2
    tree = [-1] if sym else [-1, 0]
    net, coord_fn, cfg = _make_coord_pair(2, num_parts=num_parts, sym=sym,
                                          extra_dims=1, tree=tree)
    pts = rand_points(rng)
    mean = pts.mean(axis=1)
    centered = pts - mean[:, None]
    pose = rand_pose_np(rng, (B,))
    gt_part = rand_pose_np(rng, (B, num_parts))
    init_part = rand_pose_np(rng, (B, num_parts))
    labels = rand_labels(rng, num_parts + 1)

    with torch.no_grad(), deterministic_fps():
        out_ref = net({
            "points": torch.from_numpy(centered).transpose(-1, -2),
            "points_mean": torch.from_numpy(mean).unsqueeze(-1),
            "canon_pose": to_torch_pose(pose),
            "gt_part": to_torch_pose(gt_part),
            "init_part": to_torch_pose(init_part),
            "labels": torch.from_numpy(labels),
        }, test=False)

    from captra_tpu.models.coordnet import solve_st
    # Feed the REFERENCE's own seg/nocs into our solver so both solvers see
    # bit-identical inputs — the fitted scale is a quotient of masked sums and
    # amplifies the (separately-asserted) ~1e-3 forward noise of random nets.
    # test=False: GT labels select the mask; GT scale scales the NPCS for the
    # translation fit (networks.py:56,97).
    seg_ref = jnp.asarray(out_ref["seg"].transpose(-1, -2).numpy())
    nocs_ref = jnp.asarray(out_ref["nocs"].transpose(-1, -2).numpy())
    fitted = solve_st(seg_ref, nocs_ref, jnp.asarray(centered),
                      jnp.asarray(mean), jnp.asarray(labels),
                      jnp.asarray(gt_part["rotation"]),
                      to_jax_pose(init_part), num_parts, sym,
                      given_scale=jnp.asarray(gt_part["scale"]))
    part_ref = out_ref["part"]
    # rtol 1e-3: the fitted scale is a quotient of masked float32 sums (the
    # sym path adds a 2D-rotation with its own ~1e-6 noise); semantic
    # divergences during development showed up as 1e-2..1e-1 relative
    np.testing.assert_allclose(np.asarray(fitted.scale),
                               part_ref["scale"].numpy(), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fitted.translation),
                               part_ref["translation"].numpy(), atol=1e-3)


@pytest.mark.parametrize("sym", [False, True])
def test_rotnet_track_parity(rng, sym):
    """PartCanonNet rot_coord_track forward (networks.py:156-240) vs our
    RotNet + decode + compose_track_pose, with converted weights."""
    from captra_tpu.models.rotnet import (
        RotNet, canonicalize_per_part, compose_track_pose, decode_rotation,
    )

    ref = load_ref()
    num_parts = 1 if sym else 2
    tree = [-1] if sym else [-1, 0]
    ref_cfg = make_ref_cfg(num_parts, sym, 1, tree)
    net = ref.networks.PartCanonNet(ref_cfg)
    randomize_torch_module(net, seed=3)
    net.eval()

    cfg = jax_cfg(num_parts, sym, 1, tree)
    variables = convert.convert_rotnet(prefixed_state_dict(net, "net"), cfg,
                                       prefix="net")
    rotn = RotNet(cfg)

    pts = rand_points(rng)
    mean = pts.mean(axis=1)
    centered = pts - mean[:, None]
    state = rand_pose_np(rng, (B, num_parts))
    pred_labels = rand_labels(rng, num_parts + 1)
    pred_nocs = (rng.rand(B, num_parts, N, 3).astype(np.float32) - 0.5)

    with torch.no_grad(), deterministic_fps():
        out_ref = net({
            "points": torch.from_numpy(centered).transpose(-1, -2),
            "points_mean": torch.from_numpy(mean).unsqueeze(-1),
            "state": {"part": to_torch_pose(state)},
            "pred_labels": torch.from_numpy(pred_labels),
            "pred_nocs": torch.from_numpy(
                np.swapaxes(pred_nocs, -1, -2).copy()),
        }, test_mode=True)

    canon_parts = canonicalize_per_part(jnp.asarray(centered),
                                        jnp.asarray(mean),
                                        to_jax_pose(state))
    out_j = rotn.apply(variables, canon_parts, jnp.asarray(pred_labels),
                       train=False)
    delta, _ = decode_rotation(out_j, sym)
    new_pose = compose_track_pose(
        to_jax_pose(state), delta, jnp.asarray(pred_labels),
        jnp.asarray(pred_nocs), jnp.asarray(centered), jnp.asarray(mean),
        num_parts=num_parts, sym=sym)

    part_ref = out_ref["part"]
    np.testing.assert_allclose(np.asarray(new_pose.rotation),
                               part_ref["rotation"].numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(new_pose.scale),
                               part_ref["scale"].numpy(), rtol=5e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_pose.translation),
                               part_ref["translation"].numpy(), atol=2e-3)


def test_track_checkpoint_splice_roundtrip(tmp_path, rng):
    """convert_track_checkpoint on a real composed checkpoint file (the
    trainer's npcs_net./net. splice, reference trainer.py:159-170)."""
    ref = load_ref()
    ref_cfg = make_ref_cfg(2, False, 1, [-1, 0])
    coord = ref.networks.CoordNet(ref_cfg)
    rot = ref.networks.PartCanonNet(ref_cfg)
    randomize_torch_module(coord, seed=5)
    randomize_torch_module(rot, seed=6)

    sd = {f"npcs_net.{k}": v for k, v in coord.state_dict().items()}
    sd.update({f"net.{k}": v for k, v in rot.state_dict().items()})
    path = tmp_path / "model_0000.pt"
    torch.save({"epoch": 0, "iteration": 0, "model": sd}, str(path))

    cfg = jax_cfg(2, False, 1, [-1, 0])
    coord_vars, rot_vars = convert.convert_track_checkpoint(str(path), cfg)
    # spot-check one leaf from each net against the torch source
    w = coord.state_dict()["seg_head.0.weight"].numpy()
    got = coord_vars["params"]["seg_head"]["dense_0"]["kernel"]
    np.testing.assert_allclose(np.asarray(got),
                               w.reshape(w.shape[0], w.shape[1]).T)
    k0 = rot.state_dict()["regress_net.pose_pred.rtvec_head.0.model.0.weight"]
    got = rot_vars["params"]["regressor"]["heads"]["dense_0"]["kernel"][0]
    np.testing.assert_allclose(np.asarray(got),
                               k0.numpy().reshape(k0.shape[0], k0.shape[1]).T)


# ---------------------------------------------------------------------------
# end-to-end: a tracked trajectory through both stacks, same weights
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sym", [False, True])
def test_tracked_trajectory_parity(rng, sym):
    """20 frames tracked by both stacks with identical converted weights:
    per-frame poses must agree (reference model.py:386-480 vs our scan)."""
    from captra_tpu.models.rotnet import RotNet
    from captra_tpu.tracking.tracker import make_track_step, track_trajectory

    ref = load_ref()
    num_parts = 1 if sym else 2
    tree = [-1] if sym else [-1, 0]
    T, b = 20, 1

    ref_cfg = make_ref_cfg(num_parts, sym, 1, tree)
    coord_t = ref.networks.CoordNet(ref_cfg)
    rot_t = ref.networks.PartCanonNet(ref_cfg)
    randomize_torch_module(coord_t, seed=7)
    randomize_torch_module(rot_t, seed=8)
    # sharpen the seg head so argmax labels have comfortable margins —
    # random-init softmax is near-uniform and float-order differences between
    # the stacks would flip near-tied labels (a test artifact, not a parity
    # property; trained checkpoints are confident)
    with torch.no_grad():
        coord_t.seg_head[0].weight *= 10.0
        coord_t.seg_head[0].bias *= 10.0
        coord_t.nocs_head[3].weight *= 8.0  # see _make_coord_pair
    coord_t.eval()
    rot_t.eval()

    cfg = jax_cfg(num_parts, sym, 1, tree).replace(
        track=TrackCfg(init_frame_gt=True))
    coord_vars = convert.convert_coordnet(
        prefixed_state_dict(coord_t, "npcs_net"), cfg, prefix="npcs_net")
    rot_vars = convert.convert_rotnet(
        prefixed_state_dict(rot_t, "net"), cfg, prefix="net")

    from captra_tpu.models.coordnet import CoordNet
    coord_m, rot_m = CoordNet(cfg), RotNet(cfg)
    step = make_track_step(
        cfg,
        lambda p: coord_m.apply(coord_vars, p, train=False),
        lambda p, l: rot_m.apply(rot_vars, p, l, train=False))

    # a drifting synthetic scene: points translate/rotate slowly so the
    # carried pose matters
    base = rand_points(rng, b)
    frames_np = np.stack(
        [base + 0.01 * t + rng.randn(b, N, 3).astype(np.float32) * 0.005
         for t in range(T)])
    init_np = rand_pose_np(rng, (b, num_parts))

    ref_poses, ref_labels = ref_track(ref, coord_t, rot_t,
                                       to_torch_pose(init_np), frames_np,
                                       num_parts, root=0)

    _, aux = track_trajectory(step, to_jax_pose(init_np),
                              {"points": jnp.asarray(frames_np)})

    labels_j = np.asarray(aux.pred_labels)
    from captra_tpu.pose import metrics
    for t in range(1, T):
        flips = int((labels_j[t - 1] != ref_labels[t - 1]).sum())
        assert flips == 0, f"frame {t}: {flips} label flips"
        pose_j = jax.tree.map(lambda x, i=t: x[i - 1], aux.pose)
        r_ref = ref_poses[t]["rotation"].numpy()
        rdiff = np.asarray(metrics.rot_diff_degree(
            pose_j.rotation, jnp.asarray(r_ref), yaxis_only=sym))
        assert rdiff.max() < 0.5, f"frame {t}: rdiff {rdiff.max()}"
        np.testing.assert_allclose(
            np.asarray(pose_j.translation),
            ref_poses[t]["translation"].numpy(), atol=5e-3,
            err_msg=f"frame {t}")
        np.testing.assert_allclose(
            np.asarray(pose_j.scale), ref_poses[t]["scale"].numpy(),
            rtol=5e-3, atol=1e-3, err_msg=f"frame {t}")


def test_nocs2d_selection_parity(rng):
    """Detection-mask selection vs the reference's own numpy code
    (nocs_data_process.py:166-229 compute_2d_bbox_iou + get_proj_corners +
    the grow-radius selection loop), run verbatim on random scenes."""
    import importlib
    import os
    import sys
    import types

    base = "/root/reference/datasets/nocs_data"
    for p in (base, os.path.join(base, ".."), "/root/reference"):
        if p not in sys.path:
            sys.path.insert(0, p)
    # data_utils (transitively imported) needs trimesh, absent here — the
    # 2D-selection code under test never touches it
    sys.modules.setdefault("trimesh", types.ModuleType("trimesh"))
    ndp = importlib.import_module("nocs_data_process")

    from captra_tpu.data.nocs2d import (
        compute_2d_bbox_iou, projected_track_bbox, select_nocs2d_mask,
    )
    from captra_tpu.data.preproc_nocs import REAL_INTRINSICS

    H, W = 480, 640
    depth = np.zeros((H, W), np.uint16)
    for trial in range(20):
        center = np.array([rng.uniform(-0.3, 0.3), rng.uniform(-0.3, 0.3),
                           -rng.uniform(0.8, 1.6)])
        radius = rng.uniform(0.05, 0.4)

        ref_box = ndp.get_proj_corners(depth, center, radius).reshape(-1)
        box = projected_track_bbox((H, W), center, radius)
        np.testing.assert_array_equal(box, ref_box)

        K = 5
        boxes = np.stack([np.sort(rng.randint(0, H - 1, 2)).tolist() +
                          np.sort(rng.randint(0, W - 1, 2)).tolist()
                          for _ in range(K)]).astype(np.float64)
        boxes = boxes[:, [0, 2, 1, 3]]  # (y1, x1, y2, x2)
        ref_iou = ndp.compute_2d_bbox_iou(ref_box, boxes)
        iou = compute_2d_bbox_iou(box.astype(np.float64), boxes)
        np.testing.assert_allclose(iou, ref_iou, rtol=1e-12)

        # full selection loop parity (same-class filter + x1.2 growth)
        cls = rng.randint(1, 4, K)
        masks = rng.rand(H // 8, W // 8, K) > 0.5  # content irrelevant
        result = {"pred_class_ids": cls, "pred_bboxes": boxes,
                  "pred_masks": masks}
        category = 1
        same = cls == category
        if same.sum() == 0:
            assert select_nocs2d_mask(result, category, (H, W), center,
                                      radius) is None
            continue
        # reference loop, verbatim semantics (nocs_data_process.py:218-229)
        r = float(radius)
        while True:
            track_box = ndp.get_proj_corners(depth, center, r).reshape(-1)
            ious = ndp.compute_2d_bbox_iou(track_box, boxes) * same
            if np.max(ious) > 0.05 or r > 0.5:
                break
            r *= 1.2
        ref_best = int(np.argmax(ious))
        got = select_nocs2d_mask(result, category, (H, W), center, radius)
        np.testing.assert_array_equal(got, masks[..., ref_best])
