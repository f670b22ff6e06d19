"""End-to-end tracking-loop tests on synthetic trajectories (SURVEY.md §4c).

Oracle predictors (perfect seg/NPCS + perfect rotation delta) must track a
moving object to near-zero error through the full scan — this validates the
recurrence, canonicalization, composition and s/t fitting machinery
independently of network quality."""
import jax
import jax.numpy as jnp
import numpy as np

from captra_tpu.config.schema import Config, NetworkCfg, ObjCfg, TrackCfg
from captra_tpu.data.synthetic import Trajectory, batch_trajectories, make_trajectory
from captra_tpu.pose.part_dof import Pose, compute_parts_delta_pose
from captra_tpu.tracking.tracker import (
    evaluate_track, init_pose_from_gt, make_track_step, track_trajectory,
)

from tests.test_models import tiny_config


def rigid_obj(sym=False):
    return ObjCfg(num_parts=1, num_joints=0, tree=(-1,), sym=sym)


def arti_obj():
    return ObjCfg(num_parts=2, num_joints=1, tree=(-1, 0), main_axis=(1,),
                  joint_type="revolute")


def _oracle_fns(cfg, frames):
    """Oracle predictors closed over per-frame GT carried in the frame dict:
    `frame['nocs']` [B, N, 3], `frame['labels']` [B, N], and the GT delta is
    derived from gt pose of consecutive frames carried via frame['gt_pose']
    and the carry pose inside the step — here we cheat by supplying the GT
    rotation delta directly via frame['gt_delta_rt9'] [B, P, 9]."""
    P = cfg.obj.num_parts

    def coord_fn_from(frame):
        def coord_fn(canon_pts):
            B, N, _ = canon_pts.shape
            seg = jax.nn.one_hot(frame["labels"], cfg.obj.num_seg)
            nocs = jnp.tile(frame["nocs"], (1, 1, P))
            return {"seg": seg, "nocs": nocs}
        return coord_fn

    def rot_fn_from(frame):
        def rot_fn(canon_parts, labels):
            B = canon_parts.shape[0]
            N = canon_parts.shape[2]
            rt = frame["gt_delta_rt9"]  # [B, P, 9|3]
            return {"rtvec": rt,
                    "point_rtvec": jnp.broadcast_to(
                        rt[:, :, None], (B, P, N, rt.shape[-1]))}
        return rot_fn

    return coord_fn_from, rot_fn_from


def _run_oracle_track(obj, T=12, B=2, N=512, key_seed=0):
    cfg = tiny_config().replace(obj=obj, track=TrackCfg(init_frame_gt=True))
    trajs = [make_trajectory(seed=s, obj=obj, num_frames=T, num_points=N)
             for s in range(B)]
    batch = batch_trajectories(trajs)  # [T, B, ...]
    gt = batch["pose"]

    # GT rotation delta between consecutive frames, in the previous frame's
    # canonical frame: R_delta = R_{t-1}^T R_t (per part)
    prev_R = gt.rotation[:-1]
    next_R = gt.rotation[1:]
    delta = jnp.swapaxes(prev_R, -1, -2) @ next_R  # [T-1, B, P, 3, 3]
    if obj.sym:
        # sym head regresses only the y axis of the delta frame
        delta9 = delta[..., :, 1]
    else:
        delta9 = delta.reshape(delta.shape[:-2] + (9,))

    frames = {
        "points": batch["points"],
        "labels": batch["labels"],
        "nocs": batch["nocs"],
        # align: frame t carries delta from t-1 -> t; frame 0 never used
        "gt_delta_rt9": jnp.concatenate([delta9[:1], delta9], axis=0),
    }

    coord_from, rot_from = _oracle_fns(cfg, frames)

    def step_wrapper(pose, frame):
        inner = make_track_step(cfg, coord_from(frame), rot_from(frame))
        return inner(pose, frame)

    init_pose = Pose(rotation=gt.rotation[0], translation=gt.translation[0],
                     scale=gt.scale[0])
    final, aux = jax.jit(
        lambda ip, fr: track_trajectory(step_wrapper, ip, fr))(init_pose,
                                                               frames)
    gt_rest = Pose(rotation=gt.rotation[1:], translation=gt.translation[1:],
                   scale=gt.scale[1:])
    return evaluate_track(aux.pose, gt_rest, sym=obj.sym), aux


def test_oracle_tracking_rigid():
    errs, aux = _run_oracle_track(rigid_obj())
    rdiff = np.asarray(errs["rdiff"])
    tdiff = np.asarray(errs["tdiff"])
    assert rdiff.mean() < 1.0, rdiff.mean()
    assert tdiff.mean() < 0.01, tdiff.mean()
    assert np.asarray(errs["5deg5cm"]).mean() == 1.0


def test_oracle_tracking_articulated():
    errs, aux = _run_oracle_track(arti_obj())
    assert np.asarray(errs["rdiff"]).mean() < 1.5
    assert np.asarray(errs["tdiff"]).mean() < 0.02
    assert np.asarray(errs["5deg5cm"]).mean() == 1.0


def test_oracle_tracking_sym():
    errs, aux = _run_oracle_track(rigid_obj(sym=True))
    assert np.asarray(errs["rdiff"]).mean() < 1.0  # yaxis-only metric
    assert np.asarray(errs["tdiff"]).mean() < 0.01


def test_tracking_with_real_nets_runs(key):
    """Untrained nets won't track well; this validates shapes/jit of the full
    net-in-scan path."""
    from captra_tpu.models.coordnet import CoordNet
    from captra_tpu.models.rotnet import RotNet

    obj = rigid_obj()
    cfg = tiny_config().replace(obj=obj, track=TrackCfg(init_frame_gt=True))
    T, B, N = 4, 1, 128
    trajs = [make_trajectory(seed=7, obj=obj, num_frames=T, num_points=N)]
    batch = batch_trajectories(trajs)
    gt = batch["pose"]

    coord = CoordNet(cfg)
    rotn = RotNet(cfg)
    k1, k2 = jax.random.split(key)
    cv = coord.init(k1, batch["points"][0], train=False)
    rv = rotn.init(k2, jnp.zeros((B, obj.num_parts, N, 3)),
                   batch["labels"][0], train=False)

    step = make_track_step(
        cfg,
        lambda pts: coord.apply(cv, pts, train=False),
        lambda parts, labels: rotn.apply(rv, parts, labels, train=False))
    init_pose = Pose(rotation=gt.rotation[0], translation=gt.translation[0],
                     scale=gt.scale[0])
    final, aux = jax.jit(
        lambda ip, fr: track_trajectory(step, ip, fr))(
            init_pose, {"points": batch["points"]})
    assert aux.pose.rotation.shape == (T - 1, B, obj.num_parts, 3, 3)
    assert np.isfinite(np.asarray(aux.pose.translation)).all()
    assert np.isfinite(np.asarray(aux.pose.scale)).all()


def test_init_pose_noise(key, rng):
    from tests.test_models import _make_pose
    cfg = tiny_config()
    gt = _make_pose(rng, 2, 2)
    noisy = init_pose_from_gt(key, gt, cfg)
    assert not np.allclose(np.asarray(noisy.rotation), np.asarray(gt.rotation))
    cfg_gt = cfg.replace(track=TrackCfg(init_frame_gt=True))
    same = init_pose_from_gt(key, gt, cfg_gt)
    np.testing.assert_allclose(np.asarray(same.rotation),
                               np.asarray(gt.rotation))


def test_conf_weighted_delta_downweights_uncertain_points(key):
    """track_cfg/conf_weighted_delta: per-point rotation predictions are
    re-aggregated with seg-confidence weights — a low-confidence point's
    (wrong) prediction must pull the delta less than under the reference's
    uniform masked mean.

    The crafted 0.01-confidence point models the MASK-label regimes
    (gt_label / nocs2d_label), where the assigned label can carry an
    arbitrarily low seg probability; under argmax pred-labels the
    per-point confidence is bounded below by 1/num_seg, so the suppression
    ratio there is at most ~num_seg."""
    import numpy as np

    from captra_tpu.config.schema import TrackCfg
    from captra_tpu.pose.rotations import axis_theta_to_matrix

    obj = rigid_obj()
    N = 64
    base = tiny_config().replace(obj=obj, num_points=N)
    wrong_R = np.asarray(axis_theta_to_matrix(
        jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(0.5)))  # 28.6 deg off

    tr = make_trajectory(seed=0, obj=obj, num_frames=3, num_points=N)
    batch = batch_trajectories([tr])
    init = batch["pose"].map(lambda x: x[0])
    frames = {"points": batch["points"]}
    # correct per-point prediction = the true frame-0 -> frame-1 delta in
    # the canonical frame (R_0^T R_1); only point 0 predicts wrong_R
    R0 = np.asarray(batch["pose"].rotation[0, 0, 0])
    R1 = np.asarray(batch["pose"].rotation[1, 0, 0])
    gt_R = (R0.T @ R1).astype(np.float32)

    def coord_fn(canon_pts):
        B = canon_pts.shape[0]
        # point 0: confident prediction is WRONG rotation; give it low
        # seg confidence; all other points confident + correct
        seg = jnp.full((B, N, 1), 0.99).at[:, 0, 0].set(0.01)
        return {"seg": seg, "nocs": canon_pts}

    def rot_fn(parts, labels):
        B, P = parts.shape[0], parts.shape[1]
        pr = jnp.broadcast_to(jnp.asarray(gt_R).reshape(9), (B, P, N, 9))
        pr = pr.at[:, :, 0].set(jnp.asarray(wrong_R).reshape(9))
        mean = jnp.mean(pr, axis=-2)
        return {"rtvec": mean, "point_rtvec": pr}

    def run(conf):
        cfg = base.replace(track=TrackCfg(init_frame_gt=True,
                                          conf_weighted_delta=conf))
        step = make_track_step(cfg, coord_fn, rot_fn)
        _, aux = jax.jit(
            lambda ip, fr: track_trajectory(step, ip, fr))(init, frames)
        return np.asarray(aux.pose.rotation)[0, 0, 0]

    gt_next = np.asarray(batch["pose"].rotation[1, 0, 0])

    def angle_to_gt(R):
        c = (np.trace(gt_next.T @ R) - 1) / 2
        return np.degrees(np.arccos(np.clip(c, -1, 1)))

    err_uniform = angle_to_gt(run(False))
    err_conf = angle_to_gt(run(True))
    # uniform mean absorbs the wrong point fully; confidence weighting
    # suppresses it ~99x
    assert err_conf < err_uniform * 0.2, (err_uniform, err_conf)


def test_refine_debias_cancels_constant_bias(key):
    """track_cfg/refine_iters + refine_mode: under the constant-local-bias
    model (the measured full-scan drift is a ~0.6 deg/frame correlated
    bias, not a random walk), a second pass from the fitted pose sees the
    bias again — "debias" composes its inverse and cancels it, while
    "forward" refinement composes it forward and doubles it.

    Static scene + an oracle that always predicts a fixed 5.7 deg delta
    (the idealized bias): iters=1 errs by ~5.7 deg, forward ~11.5, debias
    ~0."""
    import numpy as np

    from captra_tpu.config.schema import TrackCfg
    from captra_tpu.pose.rotations import axis_theta_to_matrix

    obj = rigid_obj()
    N = 64
    base = tiny_config().replace(obj=obj, num_points=N)
    bias = np.asarray(axis_theta_to_matrix(
        jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray(0.1)))  # 5.73 deg

    tr = make_trajectory(seed=3, obj=obj, num_frames=2, num_points=N)
    batch = batch_trajectories([tr])
    # make the scene static: frame 1 = frame 0 (true delta = identity)
    pts0 = batch["points"][0]
    frames = {"points": jnp.stack([pts0, pts0])}
    init = batch["pose"].map(lambda x: x[0])
    nocs0 = batch["nocs"][0]                       # exact NPCS, static

    def coord_fn(canon_pts):
        B = canon_pts.shape[0]
        return {"seg": jnp.ones((B, N, 1)), "nocs": nocs0}

    def rot_fn(parts, labels):
        B, P = parts.shape[0], parts.shape[1]
        rt = jnp.broadcast_to(jnp.asarray(bias).reshape(9), (B, P, 9))
        return {"rtvec": rt,
                "point_rtvec": jnp.broadcast_to(rt[:, :, None],
                                                (B, P, N, 9))}

    def run(iters, mode):
        cfg = base.replace(track=TrackCfg(init_frame_gt=True,
                                          refine_iters=iters,
                                          refine_mode=mode))
        step = make_track_step(cfg, coord_fn, rot_fn)
        _, aux = jax.jit(
            lambda ip, fr: track_trajectory(step, ip, fr))(init, frames)
        return np.asarray(aux.pose.rotation)[0, 0, 0]

    R_gt = np.asarray(init.rotation)[0, 0]

    def err_deg(R):
        c = (np.trace(R_gt.T @ R) - 1) / 2
        return np.degrees(np.arccos(np.clip(c, -1, 1)))

    e_base = err_deg(run(1, "debias"))
    e_fwd = err_deg(run(2, "forward"))
    e_deb = err_deg(run(2, "debias"))
    assert 5.0 < e_base < 6.5, e_base
    assert e_fwd > 1.8 * e_base, (e_base, e_fwd)
    assert e_deb < 0.5, e_deb


def test_rot_fit_npcs_bounds_delta_bias(key):
    """track_cfg/rot_fit: with a biased delta regressor but exact NPCS
    predictions, the absolute Procrustes rotation solve ("npcs") recovers
    the GT rotation, the complementary filter ("fused", alpha=0.5) halves
    the bias, and the reference-default "delta" absorbs it fully.

    Static scene + an oracle that always predicts a fixed 5.7 deg delta
    and exact NPCS — same constant-local-bias model as the debias test."""
    import numpy as np

    from captra_tpu.config.schema import TrackCfg
    from captra_tpu.pose.rotations import axis_theta_to_matrix

    obj = rigid_obj()
    N = 64
    base = tiny_config().replace(obj=obj, num_points=N)
    bias = np.asarray(axis_theta_to_matrix(
        jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray(0.1)))  # 5.73 deg

    tr = make_trajectory(seed=5, obj=obj, num_frames=2, num_points=N,
                         noise=0.0)  # exact correspondences for the oracle
    batch = batch_trajectories([tr])
    pts0 = batch["points"][0]
    frames = {"points": jnp.stack([pts0, pts0])}  # static scene
    init = batch["pose"].map(lambda x: x[0])
    nocs0 = batch["nocs"][0]

    def coord_fn(canon_pts):
        B = canon_pts.shape[0]
        return {"seg": jnp.ones((B, N, 1)), "nocs": nocs0}

    def rot_fn(parts, labels):
        B, P = parts.shape[0], parts.shape[1]
        rt = jnp.broadcast_to(jnp.asarray(bias).reshape(9), (B, P, 9))
        return {"rtvec": rt,
                "point_rtvec": jnp.broadcast_to(rt[:, :, None],
                                                (B, P, N, 9))}

    def run(mode, alpha=0.5):
        cfg = base.replace(track=TrackCfg(init_frame_gt=True,
                                          rot_fit=mode,
                                          rot_fit_alpha=alpha))
        step = make_track_step(cfg, coord_fn, rot_fn)
        _, aux = jax.jit(
            lambda ip, fr: track_trajectory(step, ip, fr))(init, frames)
        return np.asarray(aux.pose.rotation)[0, 0, 0]

    R_gt = np.asarray(init.rotation)[0, 0]

    def err_deg(R):
        c = (np.trace(R_gt.T @ R) - 1) / 2
        return np.degrees(np.arccos(np.clip(c, -1, 1)))

    e_delta = err_deg(run("delta"))
    e_npcs = err_deg(run("npcs"))
    e_fused = err_deg(run("fused"))
    assert 5.0 < e_delta < 6.5, e_delta
    assert e_npcs < 0.2, e_npcs
    assert abs(e_fused - e_delta / 2) < 0.5, (e_delta, e_fused)
    # alpha sweeps the blend continuously toward the absolute solve
    e_a25 = err_deg(run("fused", alpha=0.25))
    e_a75 = err_deg(run("fused", alpha=0.75))
    assert e_a75 < e_fused < e_a25 < e_delta, (e_delta, e_a25, e_fused, e_a75)


def test_rot_fit_npcs_degenerate_part_keeps_delta(key):
    """A part whose NPCS solve is degenerate (<4 in-part points) must keep
    the delta-composed rotation, not a garbage absolute solve."""
    import numpy as np

    from captra_tpu.config.schema import TrackCfg

    obj = arti_obj()
    N = 64
    base = tiny_config().replace(obj=obj, num_points=N)

    tr = make_trajectory(seed=6, obj=obj, num_frames=2, num_points=N)
    batch = batch_trajectories([tr])
    pts0 = batch["points"][0]
    frames = {"points": jnp.stack([pts0, pts0])}
    init = batch["pose"].map(lambda x: x[0])
    nocs0 = batch["nocs"][0]

    # all points labeled part 0 -> part 1 has ZERO in-part points
    labels0 = jnp.zeros((1, N), dtype=jnp.int32)

    def coord_fn(canon_pts):
        B = canon_pts.shape[0]
        seg = jax.nn.one_hot(labels0, obj.num_seg)
        return {"seg": seg, "nocs": jnp.tile(nocs0[..., :3],
                                             (1, 1, obj.num_parts))}

    ident = jnp.eye(3).reshape(9)

    def rot_fn(parts, labels):
        B, P = parts.shape[0], parts.shape[1]
        rt = jnp.broadcast_to(ident, (B, P, 9))
        return {"rtvec": rt,
                "point_rtvec": jnp.broadcast_to(rt[:, :, None],
                                                (B, P, N, 9))}

    cfg = base.replace(track=TrackCfg(init_frame_gt=True, rot_fit="npcs"))
    step = make_track_step(cfg, coord_fn, rot_fn)
    _, aux = jax.jit(
        lambda ip, fr: track_trajectory(step, ip, fr))(init, frames)
    R = np.asarray(aux.pose.rotation)[0, 0]  # [P, 3, 3]
    assert np.isfinite(R).all()
    # part 1 (empty): identity delta composed onto init -> exactly init
    np.testing.assert_allclose(R[1], np.asarray(init.rotation)[0, 1],
                               atol=1e-5)


def test_rot_fit_sym_corrects_axis_keeps_spin(key):
    """Sym parts: with exact NPCS and a tilt-biased sym delta head, "npcs"
    (full solve, azimuth-locked spin) recovers the GT y-axis (sym rdiff
    ~0) where "delta" absorbs the tilt; "fused" blends only the y-axis
    direction and keeps the carried (delta-composed) spin."""
    import numpy as np

    from captra_tpu.config.schema import TrackCfg
    from captra_tpu.pose.rotations import axis_theta_to_matrix

    obj = rigid_obj(sym=True)
    N = 64
    base = tiny_config().replace(obj=obj, num_points=N)
    # biased sym delta: a 5.73 deg tilt about x, delivered as the y-column
    tilt = np.asarray(axis_theta_to_matrix(
        jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray(0.1)))
    y_bias = tilt[:, 1].astype(np.float32)

    tr = make_trajectory(seed=9, obj=obj, num_frames=2, num_points=N,
                         noise=0.0)
    batch = batch_trajectories([tr])
    pts0 = batch["points"][0]
    frames = {"points": jnp.stack([pts0, pts0])}  # static scene
    init = batch["pose"].map(lambda x: x[0])
    nocs0 = batch["nocs"][0]

    def coord_fn(canon_pts):
        B = canon_pts.shape[0]
        return {"seg": jnp.ones((B, N, 1)), "nocs": nocs0}

    def rot_fn(parts, labels):
        B, P = parts.shape[0], parts.shape[1]
        rt = jnp.broadcast_to(jnp.asarray(y_bias), (B, P, 3))
        return {"rtvec": rt,
                "point_rtvec": jnp.broadcast_to(rt[:, :, None],
                                                (B, P, N, 3))}

    def run(mode):
        cfg = base.replace(track=TrackCfg(init_frame_gt=True, rot_fit=mode))
        step = make_track_step(cfg, coord_fn, rot_fn)
        _, aux = jax.jit(
            lambda ip, fr: track_trajectory(step, ip, fr))(init, frames)
        return np.asarray(aux.pose.rotation)[0, 0, 0]

    y_gt = np.asarray(init.rotation)[0, 0][:, 1]

    def axis_err_deg(R):
        c = np.clip(np.dot(y_gt, R[:, 1]), -1, 1)
        return np.degrees(np.arccos(c))

    R_delta = run("delta")
    R_npcs = run("npcs")
    R_fused = run("fused")
    e_delta = axis_err_deg(R_delta)
    e_npcs = axis_err_deg(R_npcs)
    e_fused = axis_err_deg(R_fused)
    assert 5.0 < e_delta < 6.5, e_delta
    assert e_npcs < 0.2, e_npcs
    assert abs(e_fused - e_delta / 2) < 0.6, (e_delta, e_fused)
    # fused-sym preserves the carried spin: the axis-only half-correction
    # composed onto the delta rotation — R_fused must equal the minimal
    # y_c -> y_gt rotation at HALF angle applied to R_delta (never the
    # solve's spin).
    y_c = R_delta[:, 1]
    ax = np.cross(y_c, y_gt)
    th = np.arctan2(np.linalg.norm(ax), np.dot(y_c, y_gt))
    ax = ax / np.linalg.norm(ax)
    R_half = np.asarray(axis_theta_to_matrix(jnp.asarray(ax),
                                             jnp.asarray(0.5 * th)))
    np.testing.assert_allclose(R_fused, R_half @ R_delta, atol=1e-4)


def test_rot_fit_fused_sym_antiparallel_keeps_carried(key):
    """Antiparallel y-solve (the flip mode): cross(y_c, y_a) ~ 0 with
    theta ~ pi, where normalize_vector's fallback axis would otherwise
    commit an arbitrary alpha*180deg tilt.  fused must keep the carried
    rotation exactly."""
    import numpy as np

    from captra_tpu.config.schema import TrackCfg

    obj = rigid_obj(sym=True)
    N = 64
    base = tiny_config().replace(obj=obj, num_points=N)

    tr = make_trajectory(seed=11, obj=obj, num_frames=2, num_points=N,
                         noise=0.0)
    batch = batch_trajectories([tr])
    pts0 = batch["points"][0]
    frames = {"points": jnp.stack([pts0, pts0])}  # static scene
    init = batch["pose"].map(lambda x: x[0])
    nocs0 = batch["nocs"][0]

    # pred NPCS = GT NPCS rotated 180deg about canonical x: the masked
    # Procrustes solve returns exactly R_gt @ Rx(pi) (and the sym 2D
    # refinement is identity on this construction), so the solved y-axis
    # is exactly -y_carried
    rxpi = jnp.asarray(np.diag([1.0, -1.0, -1.0]).astype(np.float32))

    def coord_fn(canon_pts):
        B = canon_pts.shape[0]
        return {"seg": jnp.ones((B, N, 1)), "nocs": nocs0 @ rxpi}

    y_ident = jnp.asarray([0.0, 1.0, 0.0])

    def rot_fn(parts, labels):  # identity delta (sym head: y-vec)
        B, P = parts.shape[0], parts.shape[1]
        rt = jnp.broadcast_to(y_ident, (B, P, 3))
        return {"rtvec": rt,
                "point_rtvec": jnp.broadcast_to(rt[:, :, None],
                                                (B, P, N, 3))}

    def run(mode):
        cfg = base.replace(track=TrackCfg(init_frame_gt=True, rot_fit=mode))
        step = make_track_step(cfg, coord_fn, rot_fn)
        _, aux = jax.jit(
            lambda ip, fr: track_trajectory(step, ip, fr))(init, frames)
        return np.asarray(aux.pose.rotation)[0, 0, 0]

    R_delta = run("delta")
    R_fused = run("fused")
    # sanity: the solve really is antiparallel (npcs takes it verbatim)
    R_npcs = run("npcs")
    assert np.dot(R_delta[:, 1], R_npcs[:, 1]) < -0.99
    # fused: ambiguous-axis update skipped -> carried rotation, exactly
    np.testing.assert_allclose(R_fused, R_delta, atol=1e-6)


def test_delta_gain_amplifies_correction(key):
    """track_cfg/delta_gain: an under-correcting oracle (predicts only half
    the needed delta) converges to GT with gain=2 but stalls at the
    under-correction equilibrium with the reference default gain=1; gain=1
    is bit-identical to the default code path (no-op branch)."""
    from captra_tpu.config.schema import TrackCfg
    from captra_tpu.pose.rotations import axis_theta_to_matrix

    obj = rigid_obj()
    N = 64
    base = tiny_config().replace(obj=obj, num_points=N)

    tr = make_trajectory(seed=7, obj=obj, num_frames=2, num_points=N,
                         noise=0.0)
    batch = batch_trajectories([tr])
    pts0 = batch["points"][0]
    T = 9
    frames = {"points": jnp.stack([pts0] * T)}  # static scene
    gt0 = batch["pose"].map(lambda x: x[0])
    nocs0 = batch["nocs"][0]

    # init pose tilted 16 deg about x from GT: the tracker must correct it
    theta0 = np.radians(16.0)
    tilt = axis_theta_to_matrix(jnp.asarray([1.0, 0.0, 0.0]),
                                jnp.asarray(theta0))
    init = Pose(rotation=gt0.rotation @ tilt, translation=gt0.translation,
                scale=gt0.scale)

    def coord_fn(canon_pts):
        B = canon_pts.shape[0]
        return {"seg": jnp.ones((B, N, 1)), "nocs": nocs0}

    def rot_fn(parts, labels):
        # oracle that corrects HALF the canonicalization error: the ideal
        # delta R_d satisfies R_carried @ R_d = R_gt; recover R_carried
        # from the canonicalized cloud via Procrustes against nocs0, then
        # halve the correction angle (constant-fraction under-correction,
        # the measured regime of the trained regressor)
        from captra_tpu.pose.procrustes import similarity_fit
        from captra_tpu.pose.rotations import (
            axis_theta_to_matrix as a2m, matrix_to_axis_theta)
        B, P = parts.shape[0], parts.shape[1]
        mask = jnp.ones((B, P, N))
        # parts: [B, P, N, 3] = carried-canonical points; nocs0 [B, N, 3]
        r_err, _, _ = similarity_fit(
            jnp.broadcast_to(nocs0[:, None], parts.shape), parts, mask,
            sym=False)  # rotation taking NPCS -> carried-canon = R_c^T R_gt
        axis, theta = matrix_to_axis_theta(r_err)
        half = a2m(axis, 0.5 * theta)
        rt = half.reshape(B, P, 9)
        return {"rtvec": rt,
                "point_rtvec": jnp.broadcast_to(rt[:, :, None],
                                                (B, P, N, 9))}

    def run(gain):
        cfg = base.replace(track=TrackCfg(init_frame_gt=True,
                                          delta_gain=gain))
        step = make_track_step(cfg, coord_fn, rot_fn)
        _, aux = jax.jit(
            lambda ip, fr: track_trajectory(step, ip, fr))(init, frames)
        return np.asarray(aux.pose.rotation)[:, 0, 0]  # [T, 3, 3]

    R_gt = np.asarray(gt0.rotation)[0, 0]

    def err_deg(R):
        c = (np.trace(R_gt.T @ R) - 1) / 2
        return np.degrees(np.arccos(np.clip(c, -1, 1)))

    rs_g1 = run(1.0)
    rs_g2 = run(2.0)
    # gain=1 halves the error each frame: after T frames ~ theta0 / 2^T,
    # but NEVER reaches zero faster than that; gain=2 cancels it in one
    assert err_deg(rs_g2[0]) < 0.1, err_deg(rs_g2[0])
    assert 7.0 < err_deg(rs_g1[0]) < 9.0, err_deg(rs_g1[0])
    # gain=1.0 takes the untouched default path, bit-identical
    np.testing.assert_array_equal(rs_g1, run(1.0))


def test_fit_ransac_survives_segmentation_leak(key):
    """track_cfg/fit_ransac: 20% of the cloud is displaced off the object
    (a segmentation leak: background points labeled as the part).  The
    reference-default LS fit absorbs the leak into s/t; the RANSAC fit
    rejects it and stays at the oracle optimum."""
    from captra_tpu.config.schema import TrackCfg

    obj = rigid_obj()
    N = 128
    base = tiny_config().replace(obj=obj, num_points=N)

    tr = make_trajectory(seed=11, obj=obj, num_frames=2, num_points=N,
                         noise=0.0)
    batch = batch_trajectories([tr])
    pts0 = np.asarray(batch["points"][0])       # [1, N, 3] true camera pts
    leak = pts0.copy()
    leak[:, : N // 5] += np.asarray([0.4, 0.5, -0.3], np.float32)  # blob
    T = 4
    frames = {"points": jnp.stack([jnp.asarray(leak)] * T)}
    gt0 = batch["pose"].map(lambda x: x[0])
    nocs0 = batch["nocs"][0]

    def coord_fn(canon_pts):
        B = canon_pts.shape[0]
        return {"seg": jnp.ones((B, N, 1)), "nocs": nocs0}

    def rot_fn(parts, labels):  # identity delta: rotation stays at GT
        B, P = parts.shape[0], parts.shape[1]
        rt = jnp.broadcast_to(jnp.eye(3).reshape(9), (B, P, 9))
        return {"rtvec": rt,
                "point_rtvec": jnp.broadcast_to(rt[:, :, None],
                                                (B, P, N, 9))}

    def run(hyps):
        cfg = base.replace(track=TrackCfg(init_frame_gt=True,
                                          fit_ransac=hyps,
                                          fit_ransac_th=0.01))
        step = make_track_step(cfg, coord_fn, rot_fn)
        _, aux = jax.jit(
            lambda ip, fr: track_trajectory(step, ip, fr))(gt0, frames)
        p = aux.pose
        terr = np.linalg.norm(
            np.asarray(p.translation - gt0.translation)[..., 0], axis=-1)
        serr = np.abs(np.asarray(p.scale - gt0.scale))
        return float(terr.max()), float(serr.max())

    t_ls, s_ls = run(0)
    t_ra, s_ra = run(32)
    # LS absorbs ~20% of the blob offset into translation
    assert t_ls > 0.02, t_ls
    assert t_ra < 1e-3, t_ra
    assert s_ra < 1e-3, (s_ra, s_ls)


def test_extrapolate_pose_constant_motion():
    """extrapolate_pose reproduces the next pose exactly under constant
    world-frame motion; gain=0 degrades to the reference behavior (carry
    the last pose verbatim)."""
    from captra_tpu.pose.rotations import axis_theta_to_matrix
    from captra_tpu.tracking.tracker import extrapolate_pose

    rng = np.random.RandomState(0)
    B, P = 2, 3
    q = rng.randn(B, P, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R0 = np.asarray(jax.vmap(jax.vmap(
        lambda v: axis_theta_to_matrix(v[:3] / jnp.linalg.norm(v[:3]),
                                       v[3])))(jnp.asarray(q)))
    dR = np.asarray(axis_theta_to_matrix(
        jnp.asarray([0.6, 0.8, 0.0]), jnp.asarray(0.05)))
    v = rng.randn(B, P, 3, 1).astype(np.float32) * 0.01
    t0 = rng.randn(B, P, 3, 1).astype(np.float32)
    s = rng.uniform(0.5, 1.5, (B, P)).astype(np.float32)

    def pose_at(k):
        Rk = R0.copy()
        for _ in range(k):
            Rk = dR @ Rk
        return Pose(rotation=jnp.asarray(Rk),
                    translation=jnp.asarray(t0 + k * v),
                    scale=jnp.asarray(s))

    pred = extrapolate_pose(pose_at(0), pose_at(1))
    gt2 = pose_at(2)
    np.testing.assert_allclose(np.asarray(pred.rotation),
                               np.asarray(gt2.rotation), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pred.translation),
                               np.asarray(gt2.translation), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pred.scale),
                               np.asarray(gt2.scale), atol=0)

    hold = extrapolate_pose(pose_at(0), pose_at(1), gain=0.0)
    np.testing.assert_allclose(np.asarray(hold.rotation),
                               np.asarray(pose_at(1).rotation), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hold.translation),
                               np.asarray(pose_at(1).translation), atol=0)


def test_const_vel_removes_tracking_lag(key):
    """track_cfg/motion_model=const_vel: with a regressor that corrects only
    half the observed canonicalization error (the measured under-correction
    equilibrium, EVIDENCE.md round-3) and a constant-rate moving scene, the
    reference seeding (motion_model=none) settles at a steady-state lag
    == the per-frame motion, while velocity-filtered constant-velocity
    seeding leaves the net only residuals and the lag drops to
    ~(1 - motion_gain) x motion.  T=40 also guards against the closed-loop
    divergence the raw double-difference predictor exhibits (~1.55x/frame
    growth; see extrapolate_pose docstring)."""
    from captra_tpu.pose import procrustes
    from captra_tpu.pose.rotations import axis_theta_to_matrix, matrix_to_axis_theta
    from captra_tpu.tracking.tracker import make_track_step as mts

    obj = rigid_obj()
    N, T = 256, 40
    base = tiny_config().replace(obj=obj, num_points=N)
    tr = make_trajectory(seed=11, obj=obj, num_frames=T, num_points=N,
                         noise=0.0, motion_rad=0.05, motion_trans=0.0)
    batch = batch_trajectories([tr])
    frames = {"points": batch["points"], "nocs_gt": batch["nocs"]}
    gt = batch["pose"]
    init = gt.map(lambda x: x[0])
    gt_rest = gt.map(lambda x: x[1:])

    def coord_from(frame):
        def coord_fn(canon_pts):
            B = canon_pts.shape[0]
            return {"seg": jnp.ones((B, N, 1)), "nocs": frame["nocs_gt"]}
        return coord_fn

    def rot_from(frame):
        def rot_fn(canon_parts, labels):
            # full correction = Procrustes(npcs -> canon_parts); emit half
            # of its angle (fractional correction oracle)
            B, P = canon_parts.shape[:2]
            npcs = jnp.broadcast_to(frame["nocs_gt"][:, None],
                                    canon_parts.shape)
            mask = jnp.ones(canon_parts.shape[:-1])
            R, _, _ = procrustes.similarity_fit(npcs, canon_parts, mask)
            axis, theta = matrix_to_axis_theta(R)
            half = axis_theta_to_matrix(axis, 0.5 * theta)
            rt = half.reshape(B, P, 9)
            return {"rtvec": rt,
                    "point_rtvec": jnp.broadcast_to(rt[:, :, None],
                                                    (B, P, N, 9))}
        return rot_fn

    def run(model, gain=0.8):
        cfg = base.replace(track=TrackCfg(init_frame_gt=True,
                                          motion_model=model,
                                          motion_gain=gain))

        def step_wrapper(carry, frame):
            inner = mts(cfg, coord_from(frame), rot_from(frame))
            return inner(carry, frame)

        probe = mts(cfg, None, None)
        if hasattr(probe, "init_carry"):
            step_wrapper.init_carry = probe.init_carry
        _, aux = jax.jit(lambda ip, fr: track_trajectory(
            step_wrapper, ip, fr))(init, frames)
        errs = evaluate_track(aux.pose, gt_rest, sym=obj.sym)
        r = np.asarray(errs["rdiff"]).ravel()
        # (steady-state mean over the second half, late-frame mean)
        return float(r[T // 2:].mean()), float(r[-5:].mean())

    lag_none, _ = run("none")
    lag_cv, late_cv = run("const_vel")        # default gain 0.8
    lag_cv1, late_cv1 = run("const_vel", gain=1.0)
    # per-frame motion is ~2.9 deg; half-correction settles at that lag
    assert lag_none > 1.5, lag_none
    # gain=0.8: steady-state lag ~(1-0.8)*motion ~0.57 deg
    assert lag_cv < 0.3 * lag_none, (lag_none, lag_cv)
    # gain=1: lag removed entirely (within decode-noise floor)
    assert lag_cv1 < 0.1 * lag_none, (lag_none, lag_cv1)
    # stability: no late-scan regrowth (the raw predictor diverges here)
    assert late_cv < 1.5 * lag_cv + 0.1, (lag_cv, late_cv)
    assert late_cv1 < 0.3, late_cv1


def _make_posed_cloud(rng, theta_deg=120.0, N=256, s_true=1.7):
    """A single-part scene whose GT rotation is exactly theta from identity
    and whose cloud-derived init (init_pose_from_cloud) recovers t and s
    exactly: canonical points are centered with max-norm = data_radius, so
    centroid/covering-radius init leaves ONLY the orientation wrong."""
    from captra_tpu.pose import rotations as rot

    npcs = rng.randn(N, 3).astype(np.float32)
    npcs -= npcs.mean(0)
    npcs *= 0.6 / np.linalg.norm(npcs, axis=-1).max()
    axis = rng.randn(3).astype(np.float32)
    R = np.asarray(rot.axis_theta_to_matrix(
        jnp.asarray(axis / np.linalg.norm(axis)),
        jnp.deg2rad(theta_deg)), np.float32)
    t = rng.randn(3).astype(np.float32) * 0.4
    cam = s_true * npcs @ R.T + t
    gt = Pose(rotation=jnp.asarray(R)[None, None],
              translation=jnp.asarray(t)[None, None, :, None],
              scale=jnp.full((1, 1), s_true))
    return jnp.asarray(npcs)[None], jnp.asarray(cam)[None], gt


def _rot_angle_deg(ra, rb):
    c = (np.trace(np.asarray(ra).reshape(3, 3).T
                  @ np.asarray(rb).reshape(3, 3)) - 1) / 2
    return float(np.degrees(np.arccos(np.clip(c, -1, 1))))


def test_init_orientation_search_recovers_rotation():
    """search_init_orientation (track_cfg/init_search) must recover a
    frame-0 orientation 120 deg from the identity guess — far beyond the
    measured ~30 deg identity-init envelope (EVIDENCE.md round 5).  The
    oracle CoordNet is BASIN-LIMITED: it predicts true NPCS only when the
    candidate pose canonicalizes the cloud to within tau of the canonical
    coords and a non-similarity distortion otherwise, so only the residual
    score (not oracle omniscience) can pick the right candidate."""
    from captra_tpu.tracking.tracker import (
        init_pose_from_cloud, search_init_orientation,
    )

    rng = np.random.RandomState(3)
    npcs, cam, gt = _make_posed_cloud(rng)
    cfg = tiny_config(num_parts=1).replace(
        track=TrackCfg(init_search=40, init_search_steps=2))

    def coord_fn(canon_pts):
        d = jnp.mean(jnp.linalg.norm(canon_pts - npcs, axis=-1), axis=-1)
        good = (d < 0.25)[:, None, None]
        pred = jnp.where(good, jnp.broadcast_to(npcs, canon_pts.shape),
                         jnp.sin(7.0 * canon_pts) * 0.5)
        seg = jax.nn.one_hot(
            jnp.zeros(canon_pts.shape[:2], jnp.int32), cfg.obj.num_seg)
        return {"seg": seg, "nocs": pred}

    ip = init_pose_from_cloud(cam, 1, cfg.data_radius)
    # premise: the raw guess is exact in t/s and 120 deg off in rotation
    assert _rot_angle_deg(ip.rotation[0, 0], gt.rotation[0, 0]) > 100
    np.testing.assert_allclose(np.asarray(ip.scale), np.asarray(gt.scale),
                               rtol=1e-4)

    got = jax.jit(lambda p, i: search_init_orientation(
        coord_fn, p, i, cfg))(cam, ip)
    assert _rot_angle_deg(got.rotation[0, 0], gt.rotation[0, 0]) < 5.0
    np.testing.assert_allclose(np.asarray(got.translation),
                               np.asarray(gt.translation), atol=0.02)
    np.testing.assert_allclose(np.asarray(got.scale), np.asarray(gt.scale),
                               rtol=0.05)


def test_init_orientation_search_sym_yaxis_candidates():
    """For SYM categories the search covers the 2-sphere of y-axis
    directions (azimuth is unobservable — v2 geometry, EVIDENCE.md round
    5): a y-axis ~90 deg off the identity guess must be recovered with a
    K=64 covering.  The oracle is basin-limited in an AZIMUTH-INVARIANT
    way (gates on per-point (y, radius) profiles, which any rotation about
    y preserves), so a full-SO(3) candidate set of this size could not
    reliably land in basin but the y-axis covering can."""
    from captra_tpu.tracking.tracker import (
        init_pose_from_cloud, search_init_orientation,
    )

    rng = np.random.RandomState(6)
    npcs, cam, gt = _make_posed_cloud(rng, theta_deg=92.0)
    cfg = tiny_config(num_parts=1, sym=True).replace(
        track=TrackCfg(init_search=64, init_search_steps=2))

    y_n = npcs[0, :, 1]
    r_n = jnp.linalg.norm(npcs[0, :, (0, 2)], axis=0)

    def coord_fn(canon_pts):
        y_c = canon_pts[..., 1]
        r_c = jnp.sqrt(canon_pts[..., 0] ** 2 + canon_pts[..., 2] ** 2)
        d = jnp.mean(jnp.abs(y_c - y_n) + jnp.abs(r_c - r_n), axis=-1)
        good = (d < 0.12)[:, None, None]
        pred = jnp.where(good, jnp.broadcast_to(npcs, canon_pts.shape),
                         jnp.sin(7.0 * canon_pts) * 0.5)
        seg = jax.nn.one_hot(
            jnp.zeros(canon_pts.shape[:2], jnp.int32), cfg.obj.num_seg)
        return {"seg": seg, "nocs": pred}

    ip = init_pose_from_cloud(cam, 1, cfg.data_radius)
    gt_y = np.asarray(gt.rotation[0, 0])[:, 1]
    ip_y = np.asarray(ip.rotation[0, 0])[:, 1]
    assert np.degrees(np.arccos(np.clip(ip_y @ gt_y, -1, 1))) > 80

    got = jax.jit(lambda p, i: search_init_orientation(
        coord_fn, p, i, cfg))(cam, ip)
    got_y = np.asarray(got.rotation[0, 0])[:, 1]
    assert np.degrees(np.arccos(np.clip(got_y @ gt_y, -1, 1))) < 5.0
    np.testing.assert_allclose(np.asarray(got.scale), np.asarray(gt.scale),
                               rtol=0.05)


def test_init_orientation_search_mode_clustering_beats_residual():
    """The measured v1/v2 failure mode (EVIDENCE.md round 5, scorer
    diagnosis): out-of-basin candidates make the CoordNet COPY the
    canonicalized input, which fits back to the candidate pose with
    residual ~0 — BELOW the in-basin candidates' honest noise floor — so
    pure-residual selection picks a copy.  This oracle reproduces that
    exactly (copies have residual 0, in-basin predictions carry 0.01
    noise): selection with init_search_tau<=0 (v1/v2) must fail, and the
    v3 mode clustering — in-basin candidates all descend onto GT while
    copies stay pinned ~covering-spacing apart — must recover the pose."""
    from captra_tpu.tracking.tracker import (
        init_pose_from_cloud, search_init_orientation,
    )

    rng = np.random.RandomState(9)
    npcs, cam, gt = _make_posed_cloud(rng, theta_deg=95.0)
    noise = jnp.asarray(rng.randn(*np.asarray(npcs).shape) * 0.01,
                        jnp.float32)

    y_n = npcs[0, :, 1]
    r_n = jnp.linalg.norm(npcs[0, :, (0, 2)], axis=0)

    def coord_fn(canon_pts):
        y_c = canon_pts[..., 1]
        r_c = jnp.sqrt(canon_pts[..., 0] ** 2 + canon_pts[..., 2] ** 2)
        d = jnp.mean(jnp.abs(y_c - y_n) + jnp.abs(r_c - r_n), axis=-1)
        good = (d < 0.2)[:, None, None]
        pred = jnp.where(good, jnp.broadcast_to(npcs + noise,
                                                canon_pts.shape),
                         canon_pts)  # out-of-basin: perfect input copy
        seg = jax.nn.one_hot(
            jnp.zeros(canon_pts.shape[:2], jnp.int32),
            cfg_sym.obj.num_seg)
        return {"seg": seg, "nocs": pred}

    cfg_sym = tiny_config(num_parts=1, sym=True)
    gt_y = np.asarray(gt.rotation[0, 0])[:, 1]

    def run(tau):
        cfg = cfg_sym.replace(track=TrackCfg(
            init_search=64, init_search_steps=2, init_search_tau=tau))
        ip = init_pose_from_cloud(cam, 1, cfg.data_radius)
        got = jax.jit(lambda p, i: search_init_orientation(
            coord_fn, p, i, cfg))(cam, ip)
        got_y = np.asarray(got.rotation[0, 0])[:, 1]
        return np.degrees(np.arccos(np.clip(got_y @ gt_y, -1, 1)))

    assert run(0.0) > 20.0      # v1/v2 pure residual: fooled by a copy
    assert run(10.0) < 5.0      # v3 mode clustering: recovers


def test_init_orientation_search_degenerate_falls_back():
    """All-background segmentation (every candidate degenerate) must return
    the raw cloud guess unchanged, not NaNs."""
    from captra_tpu.tracking.tracker import (
        init_pose_from_cloud, search_init_orientation,
    )

    rng = np.random.RandomState(4)
    _, cam, _ = _make_posed_cloud(rng)
    cfg = tiny_config(num_parts=1).replace(
        track=TrackCfg(init_search=8, init_search_steps=1))

    def coord_fn(canon_pts):
        labels = jnp.full(canon_pts.shape[:2], cfg.obj.num_parts, jnp.int32)
        return {"seg": jax.nn.one_hot(labels, cfg.obj.num_seg),
                "nocs": canon_pts}

    ip = init_pose_from_cloud(cam, 1, cfg.data_radius)
    got = search_init_orientation(coord_fn, cam, ip, cfg)
    np.testing.assert_allclose(np.asarray(got.rotation),
                               np.asarray(ip.rotation), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.scale), np.asarray(ip.scale),
                               rtol=1e-5)
