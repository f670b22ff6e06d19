"""Training agent: optimizer, schedules, train/eval steps.

Functional spec: /root/reference/network/trainer.py and the task-model
update semantics in /root/reference/network/models/model.py:107-306
(CanonCoordModel / RotationModel).  TPU-first design:

  * torch `loss.backward(); optimizer.step()` becomes one jitted
    `value_and_grad` step; data parallelism is a sharded batch under the same
    jit (GSPMD inserts the gradient all-reduce — no DDP analogue needed).
  * torch Adam-with-weight-decay (L2-into-grad) is
    `optax.add_decayed_weights` *before* `scale_by_adam`.
  * StepLR + lr_clip (trainer.py:40-70,129-133) is a per-step schedule;
    the BN-momentum decay schedule (trainer.py:135-145) maps to the flax
    momentum convention via `bn_momentum_for_epoch`.
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from captra_tpu.config.schema import Config
from captra_tpu.models import losses as L
from captra_tpu.models.coordnet import CoordNet, canonicalize, solve_st
from captra_tpu.models.rotnet import (
    RotNet, canonicalize_per_part, decode_rotation,
)
from captra_tpu.pose import bbox as bbox_utils
from captra_tpu.pose.part_dof import (
    Pose, add_noise_to_pose, compute_parts_delta_pose, eval_part_full,
    merge_delta_pose, tree_root,
)
from captra_tpu.pose.pose_fit import labels_to_part_mask


# ---------------------------------------------------------------------------
# schedules & optimizer
# ---------------------------------------------------------------------------

def make_lr_schedule(cfg: Config, steps_per_epoch: int) -> Callable:
    """StepLR x gamma every lr_step_size epochs, clipped at lr_clip
    (reference trainer.py:54-70,129-133)."""
    o = cfg.optim

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        lr = o.learning_rate * (o.lr_gamma ** (epoch // o.lr_step_size))
        return jnp.maximum(lr, o.lr_clip)

    return schedule


def bn_momentum_for_epoch(cfg: Config, epoch: int) -> float:
    """Flax-convention BN momentum for an epoch (reference decay schedule,
    trainer.py:135-145; flax momentum = 1 - torch momentum)."""
    o = cfg.optim
    m_torch = max(
        o.bn_momentum_original * (
            o.bn_momentum_decay ** (epoch // o.bn_momentum_step_size)),
        o.bn_momentum_min)
    return 1.0 - m_torch


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    o = cfg.optim
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    # grad_clip must be robust to inf/NaN spikes: clip_by_global_norm alone
    # turns an inf gradient into NaN params (global_norm = inf -> scale 0 ->
    # inf * 0), which then sticks forever through Adam — observed as a
    # deterministic RotationNet collapse at step ~2384 (bf16, sym bottle).
    # zero_nans drops true NaNs, the elementwise clip bounds inf/huge
    # entries without computing an overflowable norm, then the global-norm
    # clip applies the configured bound.
    clip = [optax.zero_nans(), optax.clip(1e4),
            optax.clip_by_global_norm(o.grad_clip)] if o.grad_clip > 0 \
        else []
    if o.optimizer == "adam":
        return optax.chain(
            *clip,
            optax.add_decayed_weights(o.weight_decay),  # torch L2-into-grad
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(schedule),
        )
    if o.optimizer == "sgd":
        return optax.chain(
            *clip,
            optax.add_decayed_weights(o.weight_decay),
            optax.trace(decay=0.9),
            optax.scale_by_learning_rate(schedule),
        )
    raise ValueError(f"unsupported optimizer {o.optimizer}")


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


# ---------------------------------------------------------------------------
# loss functions (pure; used by both train and eval paths)
# ---------------------------------------------------------------------------


def _apply_crop_pose(init_part: Pose, batch: dict) -> Pose:
    """Replace the init pose's t/s with the perturbed crop pose when the
    data pipeline provides one (reference prepare_poses, model.py:49-58)."""
    if "crop_translation" not in batch:
        return init_part
    t = jnp.broadcast_to(batch["crop_translation"],
                         init_part.translation.shape)
    s = jnp.broadcast_to(batch["crop_scale"], init_part.scale.shape)
    return Pose(rotation=init_part.rotation, translation=t, scale=s)

def _gt_bbox(corners: jnp.ndarray, sym: bool) -> jnp.ndarray:
    """corner-loss points from NPCS corners (reference model.py:164-168)."""
    if sym:
        return bbox_utils.yaxis_from_corners(corners)[..., :]
    return bbox_utils.bbox_from_corners(corners)


def coordnet_loss(cfg: Config, module: CoordNet, params, batch_stats,
                  batch: dict, key: jax.Array, train: bool,
                  use_pred_labels: bool = False):
    """CanonCoordModel loss stack (reference model.py:117-201).

    batch: points [B, N, 3] raw camera cloud; labels [B, N]; nocs [B, N, 3];
    pose: GT Pose [B, P]; corners [B, P, 2, 3].
    """
    obj = cfg.obj
    root = tree_root(obj.tree)
    k_noise, k_pwm = jax.random.split(key)

    gt: Pose = batch["pose"]
    if "init_pose" in batch:
        # on-policy fine-tuning (training/rollout.py): the init pose is a
        # tracker rollout's carried pose, not GT + sampled noise — the
        # network trains on the error distribution tracking actually sees
        init_part = batch["init_pose"]
    else:
        init_part = add_noise_to_pose(
            k_noise, gt, rot_rad=jnp.deg2rad(cfg.perturb.r),
            trans_sigma=cfg.perturb.t, scale_sigma=cfg.perturb.s,
            kind=cfg.perturb.kind)
        init_part = _apply_crop_pose(init_part, batch)
    canon_pose = init_part[:, root]

    points_raw = batch["points"]
    points_mean = jnp.mean(points_raw, axis=1)
    points = points_raw - points_mean[:, None]
    canon_pts = canonicalize(points, points_mean, canon_pose)

    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, mutated = module.apply(variables, canon_pts, train=True,
                                    mutable=["batch_stats"])
        new_stats = mutated["batch_stats"]
    else:
        out = module.apply(variables, canon_pts, train=False)
        new_stats = batch_stats

    seg, nocs = out["seg"], out["nocs"]
    gt_labels = batch["labels"]
    pred_labels = jnp.argmax(seg, axis=-1)
    labels = pred_labels if use_pred_labels else gt_labels

    loss_dict = {"seg_loss": L.miou_loss(seg, gt_labels)}
    if obj.sym:
        dist_l, pwm_l = L.sym_nocs_loss(k_pwm, nocs, batch["nocs"], labels,
                                        obj.num_parts,
                                        pwm_num=cfg.network.pwm_num)
        loss_dict["nocs_dist_loss"] = dist_l
        loss_dict["nocs_pwm_loss"] = pwm_l
    else:
        loss_dict["nocs_loss"] = L.nocs_loss(nocs, batch["nocs"], labels,
                                             obj.num_parts)

    # in-graph s/t solve with GT rotation (networks.py:54-108); GT scale
    # feeds the translation fit at train time (networks.py:97)
    pred_part = solve_st(
        seg, nocs, points, points_mean, labels, gt.rotation, init_part,
        num_parts=obj.num_parts, sym=obj.sym,
        given_scale=None if use_pred_labels else gt.scale)

    loss_dict.update(L.part_dof_loss(gt, pred_part, cfg.pose_loss_type))
    gt_box = _gt_bbox(batch["corners"], obj.sym)
    corner_loss, _ = L.point_pose_loss(gt, pred_part, gt_box,
                                       metric=cfg.pose_loss_type["point"])
    loss_dict["corner_loss"] = corner_loss

    total = L.weighted_total(loss_dict, cfg.loss_weight)
    metrics = {k: jnp.mean(v) for k, v in
               eval_part_full(gt, pred_part, yaxis_only=obj.sym).items()}
    return total, (loss_dict, metrics, new_stats)


def rotnet_loss(cfg: Config, module: RotNet, params, batch_stats,
                batch: dict, key: jax.Array, train: bool):
    """RotationModel loss stack (reference model.py:205-306)."""
    obj = cfg.obj

    gt: Pose = batch["pose"]
    if "init_pose" in batch:
        # on-policy fine-tuning: see coordnet_loss
        init_part = batch["init_pose"]
    else:
        init_part = add_noise_to_pose(
            key, gt, rot_rad=jnp.deg2rad(cfg.perturb.r),
            trans_sigma=cfg.perturb.t, scale_sigma=cfg.perturb.s,
            kind=cfg.perturb.kind)
        init_part = _apply_crop_pose(init_part, batch)
    # canonicalization pose per part == the init pose itself
    # (model.py:229-240): supervision is the canonical-frame delta
    root_delta = compute_parts_delta_pose(init_part, gt, init_part)

    points_raw = batch["points"]
    points_mean = jnp.mean(points_raw, axis=1)
    points = points_raw - points_mean[:, None]
    labels = batch["labels"]

    canon_parts = canonicalize_per_part(points, points_mean, init_part)
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, mutated = module.apply(variables, canon_parts, labels,
                                    train=True, mutable=["batch_stats"])
        new_stats = mutated["batch_stats"]
    else:
        out = module.apply(variables, canon_parts, labels, train=False)
        new_stats = batch_stats

    delta, point_rot = decode_rotation(out, obj.sym)
    # mode 'rot': composed rotation + GT s/t (networks.py:205-208)
    merged = merge_delta_pose(init_part, delta_rotation=delta)
    pred_part = Pose(rotation=merged.rotation, translation=gt.translation,
                     scale=gt.scale)

    loss_dict = L.part_dof_loss(gt, pred_part, cfg.pose_loss_type)

    # per-point rotation loss vs the delta target, masked to in-part points
    # (model.py:283-292)
    gt_rot = root_delta.rotation[:, :, None]  # [B, P, 1, 3, 3]
    if obj.sym:
        rl = L.rot_yaxis_loss(gt_rot, point_rot)
    else:
        rl = L.rot_trace_loss(gt_rot, point_rot,
                              metric=cfg.pose_loss_type["r"])
    mask = labels_to_part_mask(labels, obj.num_parts)
    loss_dict["rloss"] = (jnp.sum(rl * mask) /
                          jnp.maximum(jnp.sum(mask), 1.0))

    gt_box = _gt_bbox(batch["corners"], obj.sym)
    corner_loss, _ = L.point_pose_loss(gt, pred_part, gt_box,
                                       metric=cfg.pose_loss_type["point"])
    loss_dict["corner_loss"] = corner_loss

    total = L.weighted_total(loss_dict, cfg.loss_weight)
    metrics = {k: jnp.mean(v) for k, v in
               eval_part_full(gt, pred_part, yaxis_only=obj.sym).items()}
    return total, (loss_dict, metrics, new_stats)


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------

class Trainer:
    """Owns module / optimizer / state; builds jitted train and eval steps.

    `network.type` selects the task (reference trainer.py:93-98):
      canon_coord -> CoordNet, rot -> RotNet.
    """

    def __init__(self, cfg: Config, steps_per_epoch: int = 100, epoch: int = 0):
        self.cfg = cfg
        self.steps_per_epoch = steps_per_epoch
        self.epoch = epoch
        self.tx = make_optimizer(cfg, steps_per_epoch)
        self._bn_momentum = self._effective_bn_momentum(epoch)
        self._build_module(self._bn_momentum)

    def _effective_bn_momentum(self, epoch: int) -> float:
        """The momentum value that actually parameterizes the module.  With
        GroupNorm there are no running stats, so the schedule can never
        change the module — pin it so `set_epoch` never retraces."""
        if self.cfg.network.norm != "bn":
            return bn_momentum_for_epoch(self.cfg, 0)
        return bn_momentum_for_epoch(self.cfg, epoch)

    def _build_module(self, bn_m: float):
        net_type = self.cfg.network.type
        if net_type == "canon_coord":
            self.module = CoordNet(self.cfg, bn_momentum=bn_m)
            self.loss_fn = coordnet_loss
        elif net_type == "rot":
            self.module = RotNet(self.cfg, bn_momentum=bn_m)
            self.loss_fn = rotnet_loss
        else:
            raise ValueError(f"Trainer does not train type {net_type!r}; "
                             "tracking uses captra_tpu.tracking")

    def init_state(self, key: jax.Array, example_batch: dict) -> TrainState:
        if self.cfg.network.type == "canon_coord":
            pts = example_batch["points"]
            variables = self.module.init(
                key, pts - pts.mean(axis=1, keepdims=True), train=False)
        else:
            B, N = example_batch["labels"].shape
            canon = jnp.zeros((B, self.cfg.obj.num_parts, N, 3))
            variables = self.module.init(key, canon, example_batch["labels"],
                                         train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=self.tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    def set_epoch(self, epoch: int):
        """Apply the BN-momentum schedule.  The module (and hence the jit
        trace) is rebuilt only when the *effective momentum value* changes —
        every `bn_momentum_step_size` epochs, not every epoch: through a
        remote-compile tunnel a full-size retrace is minutes, so a 250-epoch
        run must compile O(schedule steps), not O(epochs)."""
        self.epoch = epoch
        bn_m = self._effective_bn_momentum(epoch)
        if bn_m != self._bn_momentum:
            self._bn_momentum = bn_m
            self._build_module(bn_m)

    @functools.partial(jax.jit, static_argnames=("self",))
    def train_step(self, state: TrainState, batch: dict, key: jax.Array):
        def lf(params):
            return self.loss_fn(self.cfg, self.module, params,
                                state.batch_stats, batch, key, train=True)

        (total, (loss_dict, metrics, new_stats)), grads = (
            jax.value_and_grad(lf, has_aux=True)(state.params))
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        # a single non-finite forward poisons BN running stats FOREVER
        # (running = (1-m)*running + m*NaN); keep the previous value for any
        # non-finite entry — the numeric twin of the zero_nans gradient
        # guard in make_optimizer (observed: one bf16 spike step left
        # eval-mode RotationNet outputting the normalize_vector fallback
        # while train-mode metrics looked healthy)
        new_stats = jax.tree.map(
            lambda new, old: jnp.where(jnp.isfinite(new), new, old),
            new_stats, state.batch_stats)
        new_state = TrainState(params=params, batch_stats=new_stats,
                               opt_state=opt_state, step=state.step + 1)
        loss_dict = dict(loss_dict)
        loss_dict["total_loss"] = total
        return new_state, loss_dict, metrics

    @functools.partial(jax.jit, static_argnames=("self",))
    def eval_step(self, state: TrainState, batch: dict, key: jax.Array):
        # test semantics: CoordNet eval selects coordinates and solves s/t
        # with *predicted* labels (reference networks.py:55,
        # model.py:151-153 `labels = pred_labels if test else gt_labels`)
        kw = ({"use_pred_labels": True}
              if self.cfg.network.type == "canon_coord" else {})
        total, (loss_dict, metrics, _) = self.loss_fn(
            self.cfg, self.module, state.params, state.batch_stats, batch,
            key, train=False, **kw)
        loss_dict = dict(loss_dict)
        loss_dict["total_loss"] = total
        return loss_dict, metrics

    # hashing for jit static self: keyed on the effective BN momentum (the
    # only epoch-dependent module input), NOT the epoch — see set_epoch
    def __hash__(self):
        return hash((id(self.module), self.cfg, self._bn_momentum))

    def __eq__(self, other):
        return self is other
