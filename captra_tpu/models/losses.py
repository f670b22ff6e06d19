"""Training losses.

Functional spec: /root/reference/network/models/loss.py.  All losses are
pure functions of fixed-shape arrays; the symmetric NOCS pairwise term draws
its random point sample through an explicit PRNG key (the reference uses
torch global RNG, loss.py:100).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from captra_tpu.pose.part_dof import Pose, apply_pose
from captra_tpu.pose.rotations import matrix_to_rotvec
from captra_tpu.utils.precision import f32_precision

EPS = 1e-6


def safe_norm(x: jnp.ndarray, axis=-1) -> jnp.ndarray:
    """L2 norm with a zero subgradient at 0 (torch.norm's backward
    convention, which the reference losses rely on — jnp.linalg.norm's
    gradient at 0 is NaN and poisons training, e.g. on the zero diagonal of
    the sym pairwise-distance matrix, loss.py:111-116)."""
    sq = jnp.sum(x * x, axis=axis)
    return jnp.sqrt(sq + 1e-24)


# ---------------------------------------------------------------------------
# segmentation
# ---------------------------------------------------------------------------

def miou_loss(pred: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Soft mIoU: pred [B, N, C] (softmax probs), labels [B, N]
    (reference compute_miou_loss, loss.py:122-134)."""
    C = pred.shape[-1]
    gt = jax.nn.one_hot(labels, C)
    inter = jnp.sum(pred * gt, axis=-2)           # [B, C]
    union = jnp.sum(pred + gt, axis=-2) - inter
    miou = inter / (union + EPS)
    return 1.0 - jnp.mean(miou)


# ---------------------------------------------------------------------------
# NOCS regression
# ---------------------------------------------------------------------------

def choose_coord_by_label(nocs: jnp.ndarray, labels: jnp.ndarray,
                          num_parts: int) -> jnp.ndarray:
    """Select each point's own-part coordinates: nocs [B, N, 3P],
    labels [B, N] -> [B, N, 3]; labels >= P give zeros (reference
    choose_coord_by_label, loss.py:22-39)."""
    B, N, _ = nocs.shape
    per_part = nocs.reshape(B, N, num_parts, 3)
    lab = jnp.clip(labels, 0, num_parts - 1)
    picked = jnp.take_along_axis(per_part, lab[..., None, None].repeat(3, -1),
                                 axis=-2)[..., 0, :]
    return jnp.where((labels < num_parts)[..., None], picked, 0.0)


def nocs_loss(nocs_pred: jnp.ndarray, nocs_gt: jnp.ndarray,
              labels: jnp.ndarray, num_parts: int) -> jnp.ndarray:
    """Per-point L2 over in-part points (reference compute_nocs_loss,
    loss.py:42-81, confidence-free path).  nocs_pred [B, N, 3P],
    nocs_gt [B, N, 3]."""
    pred = choose_coord_by_label(nocs_pred, labels, num_parts)
    raw = safe_norm(pred - nocs_gt, axis=-1)  # [B, N]
    mask = (labels < num_parts).astype(jnp.float32)
    return jnp.sum(raw * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def sym_nocs_loss(key: jax.Array, nocs_pred: jnp.ndarray,
                  nocs_gt: jnp.ndarray, labels: jnp.ndarray,
                  num_parts: int, pwm_num: int = 128):
    """Symmetric-category NOCS loss: y + radial distance term and a
    pairwise-distance-matrix term over `pwm_num` sampled part-0 points
    (reference compute_sym_nocs_loss, loss.py:84-119).

    Returns (dist_loss, pwm_loss).  Sampling deviation: the reference draws
    from the variable-size set {labels==0} via np-style indexing; under jit we
    draw fixed-count samples weighted to in-part points via Gumbel top-k with
    replacement-equivalent uniform draws over a masked index distribution.
    """
    pred = choose_coord_by_label(nocs_pred, labels, num_parts)
    x_gt, y_gt, z_gt = nocs_gt[..., 0], nocs_gt[..., 1], nocs_gt[..., 2]
    x_p, y_p, z_p = pred[..., 0], pred[..., 1], pred[..., 2]
    dist = jnp.sqrt((y_gt - y_p) ** 2 +
                    jnp.abs(x_gt**2 + z_gt**2 - x_p**2 - z_p**2) + 1e-8)
    mask = (labels == 0)
    fmask = mask.astype(jnp.float32)
    valid = (jnp.sum(fmask, axis=-1) > 0).astype(jnp.float32)  # [B]
    dist_loss = jnp.sum(dist * fmask) / jnp.maximum(jnp.sum(fmask), 1.0)

    # sample pwm_num indices per batch row, uniform over {labels == 0}
    # (falls back to all points if the part is empty, matching loss.py:97-99's
    # labels==1 fallback in spirit)
    B, N = labels.shape
    logits = jnp.where(mask, 0.0, -1e9)
    keys = jax.random.split(key, B)
    idx = jax.vmap(lambda k, lg: jax.random.categorical(
        k, lg, shape=(pwm_num,)))(keys, logits)  # [B, M]

    def gather(pts):
        return jnp.take_along_axis(pts, idx[..., None], axis=1)

    s_gt, s_pred = gather(nocs_gt), gather(pred)

    def dist_mat(p):
        return safe_norm(p[:, :, None] - p[:, None], axis=-1)

    pwm = jnp.mean(jnp.abs(dist_mat(s_gt) - dist_mat(s_pred)), axis=(-1, -2))
    pwm_loss = jnp.sum(pwm * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return dist_loss, pwm_loss


# ---------------------------------------------------------------------------
# pose losses
# ---------------------------------------------------------------------------

@f32_precision
def rot_trace_loss(rot1: jnp.ndarray, rot2: jnp.ndarray,
                   metric: str = "frob") -> jnp.ndarray:
    """Rotation losses on [B, ..., 3, 3] (reference rot_trace_loss,
    loss.py:151-177)."""
    if metric.startswith("exp"):
        diff = matrix_to_rotvec(rot1) - matrix_to_rotvec(rot2)
        return diff**2 if metric == "exp_l2" else jnp.abs(diff)
    if metric == "frob":
        d = rot1 - rot2
        m = d @ jnp.swapaxes(d, -1, -2)
        return m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    m = rot1 @ jnp.swapaxes(rot2, -1, -2)
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    if metric == "l2":
        return (tr - 3.0) ** 2
    if metric == "l1":
        return jnp.abs(tr - 3.0)
    raise ValueError(f"unsupported metric {metric}")


def rot_yaxis_loss(rot1, rot2, metric: str = "l2") -> jnp.ndarray:
    """y-column loss for symmetric categories (reference rot_yaxis_loss,
    loss.py:180-188)."""
    diff = rot1[..., 1] - rot2[..., 1]
    if metric == "l2":
        return jnp.sum(diff**2, axis=-1)
    return safe_norm(diff, axis=-1)


def trans_loss(t1, t2, metric: str = "l1") -> jnp.ndarray:
    if metric == "l2":
        return jnp.sum((t1 - t2) ** 2, axis=(-1, -2))
    return safe_norm((t1 - t2)[..., 0], axis=-1)


def scale_loss(s1, s2, metric: str = "l1") -> jnp.ndarray:
    return (s1 - s2) ** 2 if metric == "l2" else jnp.abs(s1 - s2)


@f32_precision
def point_pose_loss(gt_pose: Pose, pred_pose: Pose, pts: jnp.ndarray,
                    metric: str = "l1"):
    """Corner loss: distance between box points posed by GT vs pred
    (reference compute_point_pose_loss, loss.py:210-221).  pts [B, P, K, 3]."""
    gt_pts = apply_pose(gt_pose, pts)
    pred_pts = apply_pose(pred_pose, pts)
    diff = gt_pts - pred_pts
    if metric == "l2":
        dist = jnp.sum(diff**2, axis=-1)
    else:
        dist = safe_norm(diff, axis=-1)
    return jnp.mean(dist), dist


def part_dof_loss(gt: Pose, pred: Pose, loss_type) -> dict:
    """s/t/r losses, means (reference compute_part_dof_loss,
    loss.py:224-236)."""
    return {
        "sloss": jnp.mean(scale_loss(gt.scale, pred.scale, loss_type["s"])),
        "tloss": jnp.mean(trans_loss(gt.translation, pred.translation,
                                     loss_type["t"])),
        "rloss": jnp.mean(rot_trace_loss(gt.rotation, pred.rotation,
                                         loss_type["r"])),
    }


def weighted_total(loss_dict: dict, weights) -> jnp.ndarray:
    """Sum of weighted losses present in the dict (reference
    BaseModel.summarize_losses, model.py:60-66)."""
    total = 0.0
    for k, w in weights.items():
        if k in loss_dict:
            total = total + loss_dict[k] * w
    return total
