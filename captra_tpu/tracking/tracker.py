"""Frame-recurrent tracking loop as a single jitted `lax.scan`.

Functional spec: /root/reference/network/models/model.py:309-601
(EvalTrackModel.forward).  The reference iterates frames in Python with
GPU<->CPU round-trips per frame (OTF crop at model.py:426-447, sym-SVD on
CPU); here one scan step = CoordNet + RotationNet + analytic s/t fit, all on
device, and a whole trajectory compiles to one XLA while-loop.  Batch `B`
trajectories track in parallel; the scan carry is the per-part `Pose`.

The step is parameterized by two apply functions so tests can substitute
oracle predictors:
    coord_fn(canon_points [B,N,3]) -> {"seg": [B,N,S], "nocs": [B,N,3P]}
    rot_fn(canon_parts [B,P,N,3], labels [B,N]) -> {"rtvec", "point_rtvec"}
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from captra_tpu.config.schema import Config
from captra_tpu.models.coordnet import canonicalize
from captra_tpu.models.rotnet import (
    canonicalize_per_part, compose_track_pose, decode_rotation,
)
from captra_tpu.pose.part_dof import (
    Pose, add_noise_to_pose, eval_part_full, tree_root,
)


@struct.dataclass
class TrackAux:
    """Per-frame outputs stacked by the scan."""
    pose: Pose                 # [B, P] fitted pose
    pred_labels: jnp.ndarray   # [B, N]
    seg: jnp.ndarray           # [B, N, S]
    nocs: jnp.ndarray          # [B, N, 3P]


def init_pose_from_gt(key: jax.Array, gt_pose: Pose, cfg: Config,
                      crop_translation: jnp.ndarray | None = None,
                      crop_scale: jnp.ndarray | None = None) -> Pose:
    """Frame-0 pose: GT, or GT perturbed by the configured noise; when the
    data pipeline supplies a perturbed crop pose its t/s replace the noisy
    ones (reference model.py:390-400)."""
    if cfg.track.init_frame_gt:
        return gt_pose
    pose = add_noise_to_pose(key, gt_pose,
                             rot_rad=jnp.deg2rad(cfg.perturb.r),
                             trans_sigma=cfg.perturb.t,
                             scale_sigma=cfg.perturb.s,
                             kind=cfg.perturb.kind)
    if crop_translation is not None:
        pose = Pose(
            rotation=pose.rotation,
            translation=jnp.broadcast_to(crop_translation,
                                         pose.translation.shape),
            scale=jnp.broadcast_to(crop_scale, pose.scale.shape))
    return pose


def init_pose_from_cloud(points: jnp.ndarray, num_parts: int,
                         data_radius: float = 0.6) -> Pose:
    """Frame-0 init for GT-less real captures (a capability the reference
    lacks: EvalTrackModel requires gt_part at frame 0, model.py:390-400 —
    its real-capture path always has the annotation JSONs).  Identity
    rotation, center = cloud mean, scale chosen so the crop ball
    (data_radius * scale) covers the observed cloud; all parts share it.

    points: [B, N, 3] camera cloud of the first frame."""
    B = points.shape[0]
    center = jnp.mean(points, axis=1)                       # [B, 3]
    r = jnp.max(jnp.linalg.norm(points - center[:, None], axis=-1), axis=1)
    scale = r / jnp.asarray(data_radius)
    return Pose(
        rotation=jnp.broadcast_to(jnp.eye(3), (B, num_parts, 3, 3)),
        translation=jnp.broadcast_to(center[:, None, :, None],
                                     (B, num_parts, 3, 1)),
        scale=jnp.broadcast_to(scale[:, None], (B, num_parts)))


def _super_fibonacci_quats(n: int) -> jnp.ndarray:
    """n unit quaternions low-discrepancy-covering SO(3) (the
    super-Fibonacci spiral construction — deterministic, near-uniform;
    public construction, Alexa CVPR 2022).  Used as the candidate set for
    the frame-0 orientation search."""
    import numpy as np
    s = np.arange(n, dtype=np.float64) + 0.5
    t = s / n
    d = 2.0 * np.pi * s
    r, big_r = np.sqrt(t), np.sqrt(1.0 - t)
    alpha = d / np.sqrt(2.0)
    beta = d / 1.533751168755204288118041  # psi: x^4 = x + 4
    q = np.stack([r * np.sin(alpha), r * np.cos(alpha),
                  big_r * np.sin(beta), big_r * np.cos(beta)], axis=-1)
    return jnp.asarray(q, dtype=jnp.float32)


def _fibonacci_sphere(n: int):
    """n unit vectors low-discrepancy-covering S^2 (golden-angle spiral)."""
    import numpy as np
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.pi * (3.0 - np.sqrt(5.0)) * i
    y = 1.0 - 2.0 * i / n
    r = np.sqrt(np.maximum(1.0 - y * y, 0.0))
    return np.stack([r * np.cos(phi), y, r * np.sin(phi)], -1)


def _rots_y_to(dirs) -> "jnp.ndarray":
    """Minimal rotations taking the canonical +y axis to each unit vector
    (Rodrigues; the azimuth about the target direction is left at the
    minimal-rotation value — irrelevant for symmetric categories)."""
    import numpy as np
    ey = np.array([0.0, 1.0, 0.0])
    c = dirs @ ey
    axis = np.cross(np.broadcast_to(ey, dirs.shape), dirs)
    s = np.linalg.norm(axis, axis=-1)
    # near ±y the axis is ill-defined; any orthogonal axis works
    axis = np.where(s[:, None] > 1e-8, axis / np.maximum(s, 1e-8)[:, None],
                    np.array([1.0, 0.0, 0.0]))
    K = np.zeros(dirs.shape[:-1] + (3, 3))
    K[:, 0, 1], K[:, 0, 2] = -axis[:, 2], axis[:, 1]
    K[:, 1, 0], K[:, 1, 2] = axis[:, 2], -axis[:, 0]
    K[:, 2, 0], K[:, 2, 1] = -axis[:, 1], axis[:, 0]
    eye = np.broadcast_to(np.eye(3), K.shape)
    R = eye + s[:, None, None] * K + \
        ((1.0 - c))[:, None, None] * (K @ K)
    return jnp.asarray(R, dtype=jnp.float32)


def search_init_orientation(coord_fn: Callable, points: jnp.ndarray,
                            init_pose: Pose, cfg: Config) -> Pose:
    """Frame-0 coarse orientation search for GT-less init (DEVIATION — no
    reference counterpart: EvalTrackModel always receives gt_part at frame
    0, model.py:390-400, so the reference never faces an unknown frame-0
    orientation).

    Mitigates the measured identity-init cliff (EVIDENCE.md round 5:
    tracking never re-converges beyond ~30 deg initial orientation error):
    K = cfg.track.init_search candidate orientations, each run through
    cfg.track.init_search_steps descent passes of
    {canonicalize -> CoordNet -> absolute NPCS similarity fit}, candidates
    batched into the CoordNet forward in chunks (MXU-friendly, lax.map over
    chunks — compiles once).  Selection (v3): densest MODE of the descended
    rotations within init_search_tau degrees, residual tie-break inside the
    mode (see the schema comment for why per-candidate residual alone —
    v1/v2, init_search_tau <= 0 — carries no orientation signal); the best
    DESCENDED pose per trajectory (rotation + refitted t/s) seeds the scan.

    Candidate-set geometry (the round-5 v1 failure was HERE, not only in
    the scorer — EVIDENCE.md "v1 scorer: REJECTED"): a K-point covering of
    full SO(3) has covering radius ~60 deg at K=32, far outside the
    ~15-30 deg convergence basin, so no candidate could ever seed a
    recoverable track.  v2 therefore covers
      * sym categories: the 2-sphere of y-axis directions (the azimuth is
        unobservable), via a Fibonacci spiral — K=64 spaces ~15 deg;
      * non-sym: full SO(3) via super-Fibonacci — needs K >= ~256 for a
        ~20 deg covering radius (scorer diagnosis:
        scripts/init_search_scorer_diag.py, which also showed the fit
        residual ranks candidates correctly once one is in-basin).

    Cost: init_search_steps CoordNet forwards at batch B*K (chunked), on
    frame 0 only.  points: [B, N, 3] camera cloud of frame 0; init_pose:
    [B, P] guess (typically init_pose_from_cloud's identity rotation)."""
    from captra_tpu.pose import rotations as rot
    from captra_tpu.pose.pose_fit import filter_valid, labels_to_part_mask
    from captra_tpu.pose.procrustes import similarity_fit

    obj = cfg.obj
    K = int(cfg.track.init_search)
    use_basin = str(cfg.track.init_search_scorer) == "basin"
    root = tree_root(obj.tree)
    B, N, _ = points.shape
    P = obj.num_parts

    cand = jnp.eye(3, dtype=jnp.float32)[None]            # the guess itself
    if K > 1:
        if obj.sym:
            cand = jnp.concatenate(
                [cand, _rots_y_to(_fibonacci_sphere(K - 1))], 0)
        else:
            cand = jnp.concatenate(
                [cand, rot.quat_to_matrix(_super_fibonacci_quats(K - 1))],
                0)

    # chunk the candidate axis so each CoordNet forward stays a moderate
    # batch (B * KC <= 128 — the SA-MSG grouping buffers scale as
    # batch * centers * neighbors * channels and OOM HBM well before the
    # cloud tensor itself does); lax.map compiles the chunk body once
    KC = max(1, min(K, -(-128 // B)))
    G = -(-K // KC)
    Kp = G * KC
    if Kp != K:  # pad with repeats of candidate 0 (never better than it)
        cand = jnp.concatenate(
            [cand, jnp.broadcast_to(cand[:1], (Kp - K, 3, 3))], 0)

    rot_all = jnp.einsum("kij,bpjl->kbpil", cand, init_pose.rotation)
    t_all = jnp.broadcast_to(init_pose.translation[None],
                             (Kp, B, P, 3, 1))
    s_all = jnp.broadcast_to(init_pose.scale[None], (Kp, B, P))
    points_mean = jnp.mean(points, axis=1)                # [B, 3]
    centered = points - points_mean[:, None]              # [B, N, 3]
    steps = max(int(cfg.track.init_search_steps), 1)

    def chunk_body(args):
        r0, t0, s0 = args                                 # [KC, B, ...]
        M = KC * B
        pose = Pose(rotation=r0.reshape(M, P, 3, 3),
                    translation=t0.reshape(M, P, 3, 1),
                    scale=s0.reshape(M, P))
        ctr = jnp.broadcast_to(centered[None], (KC, B, N, 3)).reshape(
            M, N, 3)
        mean = jnp.broadcast_to(points_mean[None], (KC, B, 3)).reshape(M, 3)
        cam = ctr[:, None] + mean[:, None, None]          # [M, 1, N, 3]

        score = None
        basin0 = None
        for si in range(steps):
            root_pose = Pose(rotation=pose.rotation[:, root],
                             translation=pose.translation[:, root],
                             scale=pose.scale[:, root])
            out = coord_fn(canonicalize(ctr, mean, root_pose))
            if si == 0 and use_basin:
                if "basin" not in out:
                    raise ValueError(
                        "track_cfg/init_search_scorer=basin needs a "
                        "CoordNet with network/basin_head=True (fine-tune "
                        "one with scripts/train_basin_head.py)")
                # score candidates on their PRE-descent canonicalization —
                # the distribution the head was trained on
                basin0 = out["basin"].astype(jnp.float32)
            labels = jnp.argmax(out["seg"], axis=-1)      # [M, N]
            pred_npcs = jnp.moveaxis(
                out["nocs"].reshape(M, N, P, 3), 2, 1)    # [M, P, N, 3]
            mask = labels_to_part_mask(labels, P)         # [M, P, N]
            r_fit, s_fit, t_fit = similarity_fit(pred_npcs, cam, mask,
                                                 sym=obj.sym)
            fitted = Pose(rotation=r_fit, translation=t_fit, scale=s_fit)
            valid = filter_valid(fitted, jnp.sum(mask, -1) > 3,
                                 min_scale=1e-4)          # [M, P]

            def sel(n, o):
                v = valid.reshape(valid.shape + (1,) * (n.ndim - 2))
                return jnp.where(v, n, o)

            pose = jax.tree.map(sel, fitted, pose)
            # score = camera-space residual of THIS pass's fit; degenerate
            # parts are excluded, all-degenerate candidates sink
            posed = s_fit[..., None, None] * (
                pred_npcs @ jnp.swapaxes(r_fit, -1, -2)) \
                + jnp.swapaxes(t_fit, -1, -2)
            resid = jnp.sum((posed - cam) ** 2, axis=-1)  # [M, P, N]
            w = mask * valid[..., None].astype(mask.dtype)
            tot = jnp.sum(w, axis=(-1, -2))
            score = jnp.sum(resid * w, axis=(-1, -2)) / jnp.maximum(tot, 1.)
            score = jnp.where(tot > 3, score, jnp.inf)

        if use_basin:
            # supervised scorer: higher logit = more in-basin; keep the
            # lower-is-better convention of the selection code below
            score = -basin0

        return (jax.tree.map(lambda x: x.reshape((KC, B) + x.shape[1:]),
                             pose), score.reshape(KC, B))

    chunked = (rot_all.reshape(G, KC, B, P, 3, 3),
               t_all.reshape(G, KC, B, P, 3, 1),
               s_all.reshape(G, KC, B, P))
    poses, scores = jax.lax.map(chunk_body, chunked)      # [G, KC, B, ...]
    scores = scores.reshape(Kp, B).T                      # [B, Kp]
    tau = float(cfg.track.init_search_tau)
    if use_basin:
        best = jnp.argmin(scores, axis=1)                 # [B] max logit
    elif tau > 0.0:
        # v3 mode-clustering selection (the scorer that actually carries
        # orientation signal — see the schema comment / EVIDENCE round 5):
        # in-basin candidates descend onto GT and agree pairwise; copies
        # stay ~candidate-spacing apart.  Densest mode wins; residual
        # breaks ties inside it.
        rroot = poses.rotation.reshape(Kp, B, P, 3, 3)[:, :, root]
        if obj.sym:
            # only the y-axis direction is observable for sym categories
            ax = rroot[..., :, 1]                         # [Kp, B, 3]
            cosang = jnp.einsum("kbi,lbi->bkl", ax, ax)
        else:
            tr = jnp.einsum("kbij,lbij->bkl", rroot, rroot)
            cosang = (tr - 1.0) * 0.5
        cos_tau = jnp.cos(jnp.deg2rad(tau))
        finite = jnp.isfinite(scores)                     # [B, Kp]
        near = (cosang >= cos_tau) & finite[:, None, :] & finite[:, :, None]
        count = jnp.sum(near, axis=-1)                    # [B, Kp]
        count = jnp.where(finite, count, -1)
        in_mode = count == jnp.max(count, axis=1, keepdims=True)
        best = jnp.argmin(jnp.where(in_mode, scores, jnp.inf), axis=1)
    else:
        best = jnp.argmin(scores, axis=1)                 # [B]

    def pick(x):
        return x.reshape((Kp, B) + x.shape[3:])[best, jnp.arange(B)]

    chosen = jax.tree.map(pick, poses)
    # every candidate degenerate (e.g. an empty cloud): keep the raw guess
    ok = jnp.isfinite(jnp.min(scores, axis=1))

    def fb(c, g):
        return jnp.where(ok.reshape((B,) + (1,) * (c.ndim - 1)), c, g)

    return jax.tree.map(fb, chosen, init_pose)


# HIGHEST precision for pose-algebra matmuls: on TPU plain f32 matmul runs
# at bf16 precision and repeated composition would inject ~0.3% rotation
# noise per frame into the velocity estimate; these are [P,3,3] — cost nil
def _mm(a, b):
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _scale_rot(m: jnp.ndarray, factor) -> jnp.ndarray:
    """exp(factor * log(m)) for rotation matrices (angle scaling)."""
    from captra_tpu.pose import rotations as rot
    axis, theta = rot.matrix_to_axis_theta(m)
    return rot.axis_theta_to_matrix(axis, factor * theta)


def extrapolate_pose(prev: Pose, cur: Pose, gain: float = 1.0) -> Pose:
    """Constant-velocity pose prediction from two consecutive poses
    (DEVIATION — the reference has no motion model, model.py:409-420).

    Advances `cur` by the world-frame delta observed from `prev` to `cur`:
    R_pred = exp(gain * log(R_cur R_prev^T)) R_cur, t_pred = t_cur +
    gain * (t_cur - t_prev); scale is held (object scale is constant).
    At gain=0 this is the identity (reference behavior).

    Note: the tracking loop does NOT use this raw double-difference form —
    it is marginally unstable in closed loop (prediction error = 2 e_{t-1}
    - e_{t-2} triples the fitted-pose noise; measured divergence
    ~1.55x/frame in f32).  `make_track_step` carries a low-passed velocity
    instead (see `motion_beta`); this helper is the building block and the
    one-shot (open-loop) predictor."""
    d_rot = _mm(cur.rotation, jnp.swapaxes(prev.rotation, -1, -2))
    if gain != 1.0:
        d_rot = _scale_rot(d_rot, gain)
    return Pose(
        rotation=_mm(d_rot, cur.rotation),
        translation=cur.translation
        + gain * (cur.translation - prev.translation),
        scale=cur.scale)


def make_track_step(cfg: Config, coord_fn: Callable, rot_fn: Callable,
                    intrinsics=None):
    """Build the scan step: carry = Pose [B, P], frame = dict with
    points [B, N, 3] (raw camera) and optional labels [B, N].

    With cfg.track.nocs_otf, frames instead carry raw sensor data —
    depth [B, H, W] (int units), mask [B, H, W] and a per-frame PRNG
    key [2] — and the crop happens **inside the scan** from the carried
    pose (the reference round-trips to CPU per frame for this,
    model.py:426-447; here it is one fused on-device step).
    """
    obj = cfg.obj
    root = tree_root(obj.tree)

    def otf_points(pose: Pose, frame: dict):
        from captra_tpu.data.preprocess import (
            NOCS_REAL_INTRINSICS, backproject_depth_planes,
            crop_ball_batch_planes, select_detection_mask,
            unpack_detection_masks,
        )
        K = intrinsics if intrinsics is not None else NOCS_REAL_INTRINSICS
        center = pose.translation[:, root, :, 0]          # [B, 3]
        radius = cfg.data_radius * pose.scale[:, root]    # [B]
        B = frame["depth"].shape[0]
        image_hw = tuple(frame["depth"].shape[-2:])
        # frame["key"]: scalar int32 per frame (e.g. the frame index)
        keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(0), frame["key"]), B)

        if cfg.track.nocs2d_label and "det_masks" in frame:
            # mask-free tracking: select the detector mask in-graph
            # (reference does this on CPU, nocs_data_process.py:206-229).
            # On a detection-miss frame (no same-class detection) the
            # reference keeps the pre-fetched instance mask (:217-218
            # prints 'no same class pred!' and falls through with `mask`
            # unchanged) — mirrored here when a mask is available; on a
            # truly mask-free capture the best-IoU mask is used regardless
            # (an all-background label set would degenerate the s/t fit)
            det_masks = unpack_detection_masks(frame["det_masks"], image_hw)

            if "mask" in frame:
                def pick(masks, boxes, valid, c, r, prior):
                    m, found = select_detection_mask(
                        masks, boxes, valid, c, r, K, image_hw)
                    return jnp.where(found, m, prior)

                masks = jax.vmap(pick)(det_masks, frame["det_boxes"],
                                       frame["det_valid"], center, radius,
                                       frame["mask"])
            else:
                # detection-miss frame with no instance mask at all: an
                # all-ones mask keeps every cropped point labeled object
                # (an all-zero selection would label everything background
                # and degenerate the s/t fit for the rest of the scan)
                def pick_best(masks, boxes, valid, c, r):
                    m, found = select_detection_mask(
                        masks, boxes, valid, c, r, K, image_hw)
                    return jnp.where(found, m, jnp.ones_like(m))

                masks = jax.vmap(pick_best)(det_masks, frame["det_boxes"],
                                            frame["det_valid"], center,
                                            radius)
        else:
            masks = frame["mask"]

        pts3, valid = jax.vmap(lambda d: backproject_depth_planes(d, K))(
            frame["depth"])
        points3, idx = crop_ball_batch_planes(
            keys, pts3, valid, center, radius, cfg.num_points,
            work_factor=cfg.track.otf_work_factor,
            fps_mode=cfg.track.otf_fps_mode)
        labels = 1 - jnp.take_along_axis(
            masks.reshape(masks.shape[0], -1), idx, axis=1).astype(jnp.int32)
        # total sensor dropout (no valid depth anywhere): the "crop" is
        # garbage and an unguarded s/t fit collapses scale to 0 -> NaN for
        # the rest of the scan; the step freezes the carried pose instead
        frame_ok = jnp.any(valid, axis=-1)                # [B]
        return jnp.swapaxes(points3, -1, -2), labels, frame_ok

    def predict_compose(pose: Pose, points, points_mean, frame: dict,
                        invert_delta: bool = False):
        """One {canonicalize -> CoordNet -> RotationNet -> compose+fit}
        pass from `pose` (the body of the reference's per-frame inference,
        model.py:454-476).  With invert_delta the TRANSPOSE of the decoded
        rotation delta is composed instead — used by the debias refinement
        mode (see step)."""
        # per-frame RNG for the opt-in RANSAC fits: fold in the frame index
        # when the pipeline carries one (the OTF path always does); a
        # key-less frame stream reuses one hypothesis pattern per frame,
        # which still varies with the points/mask — documented fallback
        fit_key = None
        if cfg.track.fit_ransac > 0:
            fit_key = jax.random.PRNGKey(13)
            if "key" in frame:
                fit_key = jax.random.fold_in(fit_key, frame["key"])

        # CoordNet in the root part's previous frame (model.py:457-463)
        root_pose = Pose(rotation=pose.rotation[:, root],
                         translation=pose.translation[:, root],
                         scale=pose.scale[:, root])
        canon_pts = canonicalize(points, points_mean, root_pose)
        coord_out = coord_fn(canon_pts)
        seg, nocs = coord_out["seg"], coord_out["nocs"]
        pred_labels = jnp.argmax(seg, axis=-1)           # [B, N]

        # label source for the s/t fit: mask-derived labels when gt_label
        # OR nocs2d_label (reference model.py:474-475 replaces pred_labels
        # with the OTF labels in both cases), else the seg prediction
        if (cfg.track.gt_label or cfg.track.nocs2d_label) \
                and "labels" in frame:
            labels = frame["labels"]
        else:
            labels = pred_labels

        # RotationNet in each part's previous frame (model.py:454-476)
        canon_parts = canonicalize_per_part(points, points_mean, pose)
        rot_out = rot_fn(canon_parts, labels)
        if cfg.track.conf_weighted_delta:
            # DEVIATION (opt-in): re-aggregate the per-point rotation reps
            # weighted by each point's seg confidence for its assigned
            # label, instead of the net's uniform masked mean
            # (reference networks.py:127-138 weights uniformly)
            from captra_tpu.pose.pose_fit import labels_to_part_mask
            prob = jnp.take_along_axis(seg, labels[..., None],
                                       axis=-1)[..., 0]        # [B, N]
            pmask = labels_to_part_mask(labels, obj.num_parts)  # [B, P, N]
            w = pmask * prob[:, None]
            w_sum = jnp.sum(w, axis=-1, keepdims=True)
            rt = jnp.sum(rot_out["point_rtvec"] * w[..., None],
                         axis=-2) / jnp.clip(w_sum, 1e-6, None)
            # zero total weight (empty part OR all-zero confidence): keep
            # the net's own rtvec, which already carries the empty-part
            # default (rotnet.py:84-91) — no duplicated default here, and
            # a 0/eps degenerate rep can never enter the composition
            rot_out = dict(rot_out)
            rot_out["rtvec"] = jnp.where(w_sum > 0, rt, rot_out["rtvec"])
        delta, _ = decode_rotation(rot_out, obj.sym)
        if invert_delta:
            delta = jnp.swapaxes(delta, -1, -2)

        B, N = labels.shape
        pred_npcs = jnp.moveaxis(
            nocs.reshape(B, N, obj.num_parts, 3), 2, 1)  # [B, P, N, 3]
        new_pose = compose_track_pose(pose, delta, labels, pred_npcs,
                                      points, points_mean,
                                      num_parts=obj.num_parts, sym=obj.sym,
                                      scale_clamp=cfg.track.scale_clamp,
                                      rot_fit=cfg.track.rot_fit,
                                      rot_fit_alpha=cfg.track.rot_fit_alpha,
                                      delta_gain=cfg.track.delta_gain,
                                      fit_ransac=cfg.track.fit_ransac,
                                      fit_ransac_th=cfg.track.fit_ransac_th,
                                      key=fit_key)
        return new_pose, TrackAux(pose=new_pose, pred_labels=pred_labels,
                                  seg=seg, nocs=nocs)

    def step(pose: Pose, frame: dict):
        frame_ok = None
        if cfg.track.nocs_otf:
            points_raw, otf_labels, frame_ok = otf_points(pose, frame)
            frame = dict(frame)
            frame["points"] = points_raw
            frame["labels"] = otf_labels
        else:
            points_raw = frame["points"]
        points_mean = jnp.mean(points_raw, axis=1)       # [B, 3]
        points = points_raw - points_mean[:, None]

        new_pose, aux = predict_compose(pose, points, points_mean, frame)
        # DEVIATION (opt-in, reference runs exactly one pass per frame):
        # extra refinement passes re-canonicalize by the just-fitted pose
        # and re-run both nets.  mode "forward" composes the new delta as
        # usual (classic iterative refinement); mode "debias" composes its
        # INVERSE: at a correct pose a perfect predictor outputs identity,
        # so the residual delta measured *at the fitted pose* estimates the
        # net's local bias — the dominant term in the measured full-scan
        # drift (~0.6 deg/frame correlated bias, EVIDENCE.md round-3) —
        # and subtracting it cancels bias that forward refinement would
        # double.  s/t are refit from the fresh NPCS either way.
        for _ in range(max(cfg.track.refine_iters, 1) - 1):
            new_pose, aux = predict_compose(
                new_pose, points, points_mean, frame,
                invert_delta=(cfg.track.refine_mode == "debias"))
        if frame_ok is not None:
            # dead frame: carry the previous pose through unchanged (the
            # per-part fit-validity fallback covers degenerate fits, this
            # covers the frame having no data at all)
            def sel(n, o):
                shape = (frame_ok.shape[0],) + (1,) * (n.ndim - 1)
                return jnp.where(frame_ok.reshape(shape), n, o)

            new_pose = jax.tree.map(sel, new_pose, pose)
            aux = TrackAux(pose=new_pose, pred_labels=aux.pred_labels,
                           seg=aux.seg, nocs=aux.nocs)
        return new_pose, aux

    if cfg.track.motion_model == "const_vel":
        # carry = (pose, vel_rot [B,P,3,3], vel_t [B,P,3,1]): the nets see
        # the pose advanced by `gain` x the low-passed world-frame velocity,
        # the fitted pose is what's carried/evaluated, and the velocity is
        # updated toward the observed fitted-pose delta by `beta` (alpha-
        # beta filter).  The raw double-difference predictor (velocity =
        # last frame's delta, beta=1 equivalent without smoothing state) is
        # marginally unstable in closed loop — see extrapolate_pose.
        # Frame 0 starts with zero velocity (== reference seeding).
        gain, beta = cfg.track.motion_gain, cfg.track.motion_beta

        def step_cv(carry, frame: dict):
            pose, vel_rot, vel_t = carry
            pose_pred = Pose(
                rotation=_mm(_scale_rot(vel_rot, gain), pose.rotation),
                translation=pose.translation + gain * vel_t,
                scale=pose.scale)
            new_pose, aux = step(pose_pred, frame)
            obs_rot = _mm(new_pose.rotation,
                          jnp.swapaxes(pose.rotation, -1, -2))
            # geodesic low-pass: v' = exp(beta * log(obs v^-1)) v
            new_vel_rot = _mm(_scale_rot(
                _mm(obs_rot, jnp.swapaxes(vel_rot, -1, -2)), beta), vel_rot)
            new_vel_t = vel_t + beta * (
                (new_pose.translation - pose.translation) - vel_t)
            return (new_pose, new_vel_rot, new_vel_t), aux

        def init_carry(init_pose: Pose):
            return (init_pose,
                    jnp.broadcast_to(jnp.eye(3, dtype=init_pose.rotation.dtype),
                                     init_pose.rotation.shape),
                    jnp.zeros_like(init_pose.translation))

        step_cv.init_carry = init_carry
        return step_cv

    return step


def track_trajectory(step: Callable, init_pose: Pose, frames: dict):
    """Scan the step over frames with leading time axis [T, B, ...].

    Frame 0's pose is the given init (the reference also skips inference on
    frame 0, model.py:411-413); frames[1:] are tracked.  Returns
    (final_pose, TrackAux stacked over T-1 tracked frames).
    """
    rest = jax.tree.map(lambda x: x[1:], frames)
    make_carry = getattr(step, "init_carry", None)
    if make_carry is not None:  # motion-model steps carry extra state
        carry, aux = jax.lax.scan(step, make_carry(init_pose), rest)
        return carry[0], aux
    return jax.lax.scan(step, init_pose, rest)


def evaluate_track(pred_poses: Pose, gt_poses: Pose, sym: bool):
    """Per-frame errors for stacked poses [T, B, P] (reference
    EvalTrackModel.compute_loss, model.py:511-593 pose-diff part)."""
    return eval_part_full(gt_poses, pred_poses, yaxis_only=sym)
