"""On-device, fixed-shape frame preprocessing: depth backprojection, ball
crop with radius growth, random-subsample + FPS downsampling, NPCS labels.

TPU-native redesign of the reference's per-frame CPU pipeline
(/root/reference/datasets/nocs_data/nocs_data_process.py:92-236 and
nocs_utils.py:5-33): the reference crops a 2D window, backprojects the
variable-size pixel set in numpy, retries the ball crop in a Python loop and
ships points to the GPU just for FPS — per tracked frame.  Here every step is
fixed-shape and jittable, so the whole OTF crop lives inside the tracking
scan and the depth image is the only host->device transfer.

Fixed-shape strategy (SURVEY.md §7 "hard parts"):
  * all H*W pixels are backprojected; validity is a mask, not a gather;
  * the radius-growth loop (x1.1, up to 10 tries, nocs_data_process.py:95-99)
    becomes a vectorized first-k-with-enough-points select over 10
    precomputed radii;
  * "duplicate until >= num_points then FPS" (nocs_data_process.py:100-108)
    becomes: random-permute in-ball points to the front (matching the
    reference's 5x-npoint random subsample, data_utils.py:147-153), wrap
    indices modulo the in-ball count, FPS the fixed-size working set.
    Duplicated points have zero min-distance so FPS picks them last — the
    sampling distribution is unchanged.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from captra_tpu.ops import farthest_point_sample
from captra_tpu.pose.part_dof import Pose

# NOCS real-camera intrinsics (reference nocs_data_process.py:20)
NOCS_REAL_INTRINSICS = jnp.array([[591.0125, 0.0, 322.525],
                                  [0.0, 590.16775, 244.11084],
                                  [0.0, 0.0, 1.0]])
# NOCS synthetic (CAMERA) intrinsics (reference nocs_utils.py:5)
NOCS_CAMERA_INTRINSICS = jnp.array([[577.5, 0.0, 319.5],
                                    [0.0, 577.5, 239.5],
                                    [0.0, 0.0, 1.0]])


@jax.jit
def backproject_depth(depth: jnp.ndarray, intrinsics: jnp.ndarray,
                      mask: jnp.ndarray | None = None, scale: float = 0.001):
    """depth [H, W] (raw integer units) -> (pts [H*W, 3] metric, valid
    [H*W]).  Matches reference `backproject` (nocs_utils.py:5-33) incl. the
    y-flip (v = H - row) and the z-negation convention."""
    H, W = depth.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    valid = depth > 0
    if mask is not None:
        valid = valid & mask.astype(bool)

    K_inv = jnp.linalg.inv(intrinsics)
    uv1 = jnp.stack([cols.astype(jnp.float32),
                     (H - rows).astype(jnp.float32),
                     jnp.ones((H, W), jnp.float32)], axis=-1)  # [H, W, 3]
    xyz = uv1 @ K_inv.T
    z = depth.astype(jnp.float32)
    pts = xyz * (z[..., None] / xyz[..., 2:3])
    pts = pts.at[..., 2].multiply(-1.0)
    return (pts.reshape(H * W, 3) * scale), valid.reshape(H * W)


@functools.partial(jax.jit, static_argnames=("num_points", "work_factor",
                                             "max_grow", "method"))
def crop_ball(key: jax.Array, pts: jnp.ndarray, valid: jnp.ndarray,
              center: jnp.ndarray, radius: jnp.ndarray, num_points: int,
              work_factor: int = 5, max_grow: int = 10,
              method: str | None = None):
    """Fixed-shape ball crop + FPS downsample.

    pts [M, 3], valid [M] bool, center [3], radius scalar ->
    (points [num_points, 3], idx [num_points] into pts).

    method "sort" draws the 5x-npoint working set as a random permutation of
    the in-ball points (the reference's subsample, data_utils.py:147-153)
    via a full argsort — O(M log M), ~10 ms for a 480x640 image on v5e.
    method "bucket" (TPU default) instead takes the first in-ball point of
    each of `work_factor*num_points` contiguous buckets after a random
    cyclic shift — a stratified random subsample at O(M) VPU cost.  Both
    wrap-fill to the working size, so FPS sees the reference's
    duplicate-then-sample distribution.
    """
    if method is None:
        method = "bucket" if jax.default_backend() == "tpu" else "sort"
    M = pts.shape[0]
    dist = jnp.where(valid, jnp.linalg.norm(pts - center, axis=-1), jnp.inf)

    # radius growth: first of radius * 1.1^k with >= 10 points (else largest)
    radius = jnp.maximum(radius, 0.05)
    radii = radius * (1.1 ** jnp.arange(max_grow))
    counts = jnp.sum(dist[None, :] <= radii[:, None], axis=-1)  # [max_grow]
    k = jnp.argmax(counts >= 10)  # first satisfying (0 if none)
    k = jnp.where(counts[k] >= 10, k, max_grow - 1)
    r = radii[k]

    in_ball = dist <= r
    # degenerate: nothing in ball -> take any valid point (reference falls
    # back to distance <= 1e9, nocs_data_process.py:101-102)
    any_ball = jnp.any(in_ball)
    in_ball = jnp.where(any_ball, in_ball, valid)

    W = min(work_factor * num_points, M)
    if method == "sort":
        count = jnp.maximum(jnp.sum(in_ball), 1)
        scores = jnp.where(in_ball, jax.random.uniform(key, (M,)), jnp.inf)
        order = jnp.argsort(scores)
        take = order[jnp.arange(W) % count]       # wrap -> duplicates
    else:
        G = -(-M // W)  # bucket size
        shift = jax.random.randint(key, (), 0, M)
        rolled = jnp.roll(in_ball, -shift)
        pad = W * G - M
        mb = jnp.pad(rolled, (0, pad)).reshape(W, G)
        found = jnp.any(mb, axis=-1)
        first = jnp.argmax(mb, axis=-1)
        cand = (jnp.arange(W) * G + first + shift) % M
        # fallback for empty buckets: the first in-ball point overall
        fb = (jnp.argmax(rolled) + shift) % M
        take = jnp.where(found, cand, fb)
    sub = pts[take]                               # [W, 3]

    fps_idx = farthest_point_sample(sub[None], num_points)[0]
    final = take[fps_idx]
    return pts[final], final


@jax.jit
def backproject_depth_planes(depth: jnp.ndarray, intrinsics: jnp.ndarray,
                             scale: float = 0.001):
    """`backproject_depth` in planes layout: depth [H, W] -> (pts3
    [3, H*W], valid [H*W]).

    Numerically identical to `backproject_depth` for zero-skew intrinsics
    (all NOCS cameras: nocs_data_process.py:20, nocs_utils.py:5) but pure
    2D-plane elementwise work — no [.., 3]-minor arrays, which TPU tiles
    catastrophically (a [H*W, 3] relayout costs ~1 ms/frame at 480x640)."""
    H, W = depth.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    valid = depth > 0
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    z = depth.astype(jnp.float32)
    x = (cols.astype(jnp.float32) - cx) / fx * z
    y = ((H - rows).astype(jnp.float32) - cy) / fy * z
    pts3 = jnp.stack([x.reshape(-1), y.reshape(-1), -z.reshape(-1)])
    return pts3 * scale, valid.reshape(-1)


@functools.partial(jax.jit, static_argnames=("num_points", "work_factor",
                                             "max_grow", "fps_mode"))
def crop_ball_batch_planes(keys: jax.Array, pts3: jnp.ndarray,
                           valid: jnp.ndarray, center: jnp.ndarray,
                           radius: jnp.ndarray, num_points: int,
                           work_factor: int = 5, max_grow: int = 10,
                           fps_mode: str = "exact"):
    """Batched ball crop on planes-layout clouds: pts3 [B, 3, M], valid
    [B, M], center [B, 3], radius [B] -> (points3 [B, 3, num_points], idx
    [B, num_points]).  Same bucket-select semantics and identical FPS picks
    — but every stage is lane-parallel plane arithmetic and the FPS kernel
    consumes [B, 3, W] directly, so the [M, 3]-minor relayouts of the
    row-layout path never happen.

    fps_mode "exact" runs the global max-min sweep; "grouped" runs the
    stratified 8-way approximation (num_points/8 sequential picks instead
    of num_points — the single-stream kernel is latency-bound, see
    ops.farthest_point_sample_grouped_t for the deviation contract)."""
    from captra_tpu.ops.fps_pallas import fps_pallas_t
    from captra_tpu.ops.pointops import farthest_point_sample_grouped_t

    def prep(key, p3, v, c, r):
        M = p3.shape[-1]
        d2 = ((p3[0] - c[0]) ** 2 + (p3[1] - c[1]) ** 2 +
              (p3[2] - c[2]) ** 2)
        dist = jnp.where(v, jnp.sqrt(d2), jnp.inf)
        rr = jnp.maximum(r, 0.05)
        radii = rr * (1.1 ** jnp.arange(max_grow))
        counts = jnp.sum(dist[None, :] <= radii[:, None], axis=-1)
        k = jnp.argmax(counts >= 10)
        k = jnp.where(counts[k] >= 10, k, max_grow - 1)
        in_ball = dist <= radii[k]
        in_ball = jnp.where(jnp.any(in_ball), in_ball, v)
        W = min(work_factor * num_points, M)
        G = -(-M // W)
        shift = jax.random.randint(key, (), 0, M)
        rolled = jnp.roll(in_ball, -shift)
        mb = jnp.pad(rolled, (0, W * G - M)).reshape(W, G)
        found = jnp.any(mb, axis=-1)
        first = jnp.argmax(mb, axis=-1)
        cand = (jnp.arange(W) * G + first + shift) % M
        fb = (jnp.argmax(rolled) + shift) % M
        take = jnp.where(found, cand, fb)
        sub3 = jnp.take_along_axis(p3, take[None], axis=-1)   # [3, W]
        return take, sub3

    take, sub3 = jax.vmap(prep)(keys, pts3, valid, center, radius)
    if fps_mode == "grouped":
        fps_idx = farthest_point_sample_grouped_t(sub3, num_points)
    elif jax.default_backend() == "tpu":
        fps_idx = fps_pallas_t(sub3, num_points)
    else:
        fps_idx = farthest_point_sample(jnp.swapaxes(sub3, -1, -2),
                                        num_points)
    final = jnp.take_along_axis(take, fps_idx, axis=1)
    points3 = jnp.take_along_axis(pts3, final[:, None], axis=-1)
    return points3, final


def projected_bbox_2d(center: jnp.ndarray, radius: jnp.ndarray,
                      intrinsics: jnp.ndarray, image_hw) -> jnp.ndarray:
    """Project the tracked ball's cube to a 2D (y1, x1, y2, x2) window,
    jittable (reference get_proj_corners, nocs_data_process.py:133-145)."""
    h, w = image_hw
    radius = jnp.maximum(radius, 0.05)
    signs = jnp.asarray([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                         for sz in (-1, 1)], dtype=jnp.float32)
    corners = center[None, :] + signs * radius
    pts = corners * 1000.0
    pts = -pts / pts[:, 2:3]
    pts = pts.at[:, 2].multiply(-1.0)
    uv = (intrinsics @ pts.T).T[:, :2]
    rows = h - uv[:, 1]
    cols = uv[:, 0]
    lo_r = jnp.clip(jnp.min(rows), 0, h - 1)
    lo_c = jnp.clip(jnp.min(cols), 0, w - 1)
    hi_r = jnp.clip(jnp.max(rows), 0, h - 1)
    hi_c = jnp.clip(jnp.max(cols), 0, w - 1)
    return jnp.stack([lo_r, lo_c, hi_r, hi_c])


def _bbox_iou_1vK(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    y1 = jnp.maximum(box[0], boxes[:, 0])
    y2 = jnp.minimum(box[2], boxes[:, 2])
    x1 = jnp.maximum(box[1], boxes[:, 1])
    x2 = jnp.minimum(box[3], boxes[:, 3])

    def area(x1, x2, y1, y2):
        return jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)

    inter = area(x1, x2, y1, y2)
    union = (area(box[1], box[3], box[0], box[2]) +
             area(boxes[:, 1], boxes[:, 3], boxes[:, 0], boxes[:, 2]) -
             inter)
    return inter / jnp.maximum(union, 1e-9)


def unpack_detection_masks(packed: jnp.ndarray, image_hw) -> jnp.ndarray:
    """Bit-packed detection masks -> bool masks, in-graph.

    packed [..., H, ceil(W/8)] uint8, little bit-order along W (host side
    packs with np.packbits(..., bitorder='little') — see
    data/nocs.py:_pre_fetch_dets).  Packing is a memory measure: a full
    NOCS real scene's [T, K, H, W] bool detection stack is ~GBs; 1 bit per
    pixel cuts it 8x before the per-frame unpack inside the scan."""
    W = image_hw[1]
    bits = (packed[..., None] >> jnp.arange(8, dtype=packed.dtype)) & 1
    full = bits.reshape(packed.shape[:-1] + (packed.shape[-1] * 8,))
    return full[..., :W].astype(bool)


@functools.partial(jax.jit, static_argnames=("image_hw", "max_grow"))
def select_detection_mask(det_masks: jnp.ndarray, det_boxes: jnp.ndarray,
                          det_valid: jnp.ndarray, center: jnp.ndarray,
                          radius: jnp.ndarray, intrinsics: jnp.ndarray,
                          image_hw, min_iou: float = 0.05,
                          max_grow: int = 6):
    """On-device NOCS-2D detection selection inside the tracking scan:
    among valid same-class detections, pick the mask whose 2D box best
    overlaps the projected tracked ball, growing the projection x1.2 until
    a hit (reference CPU loop, nocs_data_process.py:206-229).

    det_masks [K, H, W] bool; det_boxes [K, 4] (y1,x1,y2,x2);
    det_valid [K] bool.  Returns (mask [H, W], found scalar bool).
    """
    radii = radius * (1.2 ** jnp.arange(max_grow))

    def iou_at(r):
        box = projected_bbox_2d(center, r, intrinsics, image_hw)
        return jnp.where(det_valid, _bbox_iou_1vK(box, det_boxes), -1.0)

    ious = jax.vmap(iou_at)(radii)                 # [G, K]
    hit = jnp.max(ious, axis=-1) > min_iou         # [G]
    g = jnp.argmax(hit)                            # first radius with a hit
    g = jnp.where(hit[g], g, max_grow - 1)
    best = jnp.argmax(ious[g])
    found = jnp.any(det_valid)
    return det_masks[best], found


@functools.partial(jax.jit, static_argnames=("num_points",))
def otf_frame_from_depth(key: jax.Array, depth: jnp.ndarray,
                         obj_mask: jnp.ndarray, intrinsics: jnp.ndarray,
                         center: jnp.ndarray, radius: jnp.ndarray,
                         gt_pose: Pose, num_points: int):
    """Full OTF frame: depth + instance mask + tracked center/radius ->
    {points [num_points, 3], labels, nocs} (reference
    full_data_from_depth_image, nocs_data_process.py:182-236 +
    base_generate_data :43-50).

    labels follow the NOCS convention: 0 = object, 1 = background
    (base_generate_data's `1 - seg`).  gt_pose: single-part Pose ([] dims).
    """
    pts, valid = backproject_depth(depth, intrinsics)
    points, idx = crop_ball(key, pts, valid, center, radius, num_points)
    is_obj = obj_mask.reshape(-1)[idx].astype(jnp.int32)
    labels = 1 - is_obj

    canon = ((points - gt_pose.translation[..., 0]) /
             gt_pose.scale) @ gt_pose.rotation
    nocs = jnp.where((labels == 0)[:, None], canon, 0.0)
    return {"points": points, "labels": labels, "nocs": nocs}
