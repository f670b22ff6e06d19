"""Batching / loading utilities: frame collation, sequence chunking, mixture
sampling.

Functional spec: /root/reference/network/data/dataset.py (SingleFrameData
:120-132, SequenceData :135-194, get_dataloader :197-205),
data_transforms.py (shuffle + subtract_mean :3-18) and the CAMERA+Real
mixture loop in train_nocs_finetune.py:52-107.

No torch DataLoader: batches are assembled in numpy and shipped to device as
one pytree per step (optionally double-buffered by the caller).  Point
shuffling/mean-subtraction from the reference's transforms are not needed
host-side — the tracker/trainer subtract the mean on device, and point order
is irrelevant to every consumer.
"""
from __future__ import annotations

from typing import Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from captra_tpu.pose.part_dof import Pose


def _pose_from_meta(pose_meta) -> dict:
    """meta['pose'] may be a single part dict or a list of per-part dicts
    (reference part_model_batch_to_part, part_dof_utils.py:70-75)."""
    if isinstance(pose_meta, dict):
        pose_meta = [pose_meta]
    rot = np.stack([np.asarray(p["rotation"], np.float32) for p in pose_meta])
    trans = np.stack([np.asarray(p["translation"],
                                 np.float32).reshape(3, 1) for p in pose_meta])
    scale = np.asarray([np.float32(p["scale"]) for p in pose_meta])
    return {"rotation": rot, "translation": trans, "scale": scale}


def collate_frames(items: Sequence[dict], shuffle_points: bool = False,
                   rng=None) -> dict:
    """List of dataset items -> batched device arrays
    {points[, labels, nocs], pose: Pose [B, P], corners [B, P, 2, 3]}.

    labels/nocs/pose/corners are emitted only when every item carries them:
    GT-less real captures (reference real_arti_dataset.py:33-120 without
    annotation JSONs) serve bare {points} frames and still collate.

    shuffle_points permutes each frame's point order (reference `shuffle`
    transform, data_transforms.py:3-10) — also what makes the bucketed ball
    grouping's one-per-bucket pick a uniform subsample."""
    points = np.stack([it["data"]["points"] for it in items])
    has = {k: all(k in it["data"] for it in items)
           for k in ("labels", "nocs")}
    labels = np.stack([it["data"]["labels"] for it in items]) \
        if has["labels"] else None
    nocs = np.stack([it["data"]["nocs"] for it in items]) \
        if has["nocs"] else None
    if shuffle_points:
        rng = rng or np.random
        for b in range(points.shape[0]):
            perm = rng.permutation(points.shape[1])
            points[b] = points[b, perm]
            if labels is not None:
                labels[b] = labels[b, perm]
            if nocs is not None:
                nocs[b] = nocs[b, perm]
    out = {"points": jnp.asarray(points)}
    if labels is not None:
        out["labels"] = jnp.asarray(labels)
    if nocs is not None:
        out["nocs"] = jnp.asarray(nocs)
    if all("pose" in it["meta"] for it in items):
        poses = [_pose_from_meta(it["meta"]["pose"]) for it in items]
        out["pose"] = Pose(
            rotation=jnp.asarray(np.stack([p["rotation"] for p in poses])),
            translation=jnp.asarray(
                np.stack([p["translation"] for p in poses])),
            scale=jnp.asarray(np.stack([p["scale"] for p in poses])),
        )
    if all("nocs_corners" in it["meta"] for it in items):
        corners = np.stack(
            [np.asarray(it["meta"]["nocs_corners"], np.float32)
             .reshape(-1, 2, 3) for it in items])
        out["corners"] = jnp.asarray(corners)
    if all("pre_fetched" in it["meta"] for it in items):
        out["depth"] = jnp.asarray(np.stack(
            [it["meta"]["pre_fetched"]["depth"] for it in items]))
        out["mask"] = jnp.asarray(np.stack(
            [it["meta"]["pre_fetched"]["mask"] for it in items]))
        # NOCS-2D detection results for mask-free tracking (reference
        # nocs_data_process.py:206-229): fixed-K arrays selected in-graph
        if all("det_masks" in it["meta"]["pre_fetched"] for it in items):
            for k in ("det_masks", "det_boxes", "det_valid"):
                out[k] = jnp.asarray(np.stack(
                    [it["meta"]["pre_fetched"][k] for it in items]))
    if all("crop_pose" in it["meta"] for it in items):
        # perturbed crop center/scale that replaces the init pose's t/s for
        # NOCS training (reference prepare_poses, model.py:49-58)
        out["crop_translation"] = jnp.asarray(np.stack(
            [np.asarray(it["meta"]["crop_pose"]["translation"],
                        np.float32).reshape(1, 3, 1) for it in items]))
        out["crop_scale"] = jnp.asarray(np.stack(
            [np.float32(it["meta"]["crop_pose"]["scale"]).reshape(1)
             for it in items]))
    return out


def single_frame_batches(dataset, batch_size: int, shuffle: bool = True,
                         seed: int = 0, drop_last: bool = True,
                         shuffle_points: bool = True,
                         start_batch: int = 0) -> Iterator[dict]:
    """Epoch iterator of collated batches (reference SingleFrameData +
    DataLoader, dataset.py:197-205; point shuffling per
    data_transforms.py:3-10).

    start_batch skips the first N batches WITHOUT touching the dataset
    (same shuffled index order; used to fast-forward a resumed persistent
    stream, cli/finetune.py).  The skipped batches' point-shuffle RNG draws
    are not replayed — point order is irrelevant to every consumer."""
    rng = np.random.RandomState(seed)
    order = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(order)
    for bi, start in enumerate(
            range(0, len(order) - (batch_size - 1 if drop_last else 0),
                  batch_size)):
        idxs = order[start:start + batch_size]
        if len(idxs) < batch_size and drop_last:
            break
        if bi < start_batch:
            continue
        yield collate_frames([dataset[int(i)] for i in idxs],
                             shuffle_points=shuffle_points, rng=rng)


def sequence_batches(dataset, num_frames: int | None = None,
                     batch_size: int = 1
                     ) -> Iterator[tuple[str | tuple[str, ...], dict]]:
    """Trajectory batches with leading time axis [T, B, ...] (reference
    SequenceData + DataLoader batching, dataset.py:135-205;
    scripts/track/sapien/laptop.sh tracks --batch_size=6).

    SAPIEN tracks are fixed `num_frames` chunks (equal T, so any batch size
    groups); NOCS real scenes are whole variable-length tracks — only
    equal-length scenes share a batch, the rest fall through at smaller B.
    Yields (name, batch) with a plain-string name when B == 1 (compat), a
    tuple of per-trajectory names otherwise.
    """
    tracks = dataset.track_index()
    chunks: list[tuple[str, list[int]]] = []
    for name, idxs in tracks.items():
        cs = ([idxs] if num_frames is None else
              [idxs[i:i + num_frames]
               for i in range(0, len(idxs) - num_frames + 1, num_frames)])
        chunks += [(f"{name}/{ci}", c) for ci, c in enumerate(cs)]

    # group same-length chunks (in order) into batches of up to batch_size;
    # a chunk whose collated key set differs (e.g. one track lost its
    # pre_fetched depth) flushes the pending batch instead of crashing the
    # tree.map stack with a structure mismatch
    by_len: dict[int, list[tuple[str, list[int]]]] = {}
    for item in chunks:
        by_len.setdefault(len(item[1]), []).append(item)

    def flush(pending):
        names = tuple(n for n, _ in pending)
        batch = jax.tree.map(lambda *xs: jnp.stack(xs, axis=1),
                             *[c for _, c in pending])
        return (names[0] if len(names) == 1 else names), batch

    bs = max(batch_size, 1)
    for T, group in by_len.items():
        pending: list[tuple[str, dict]] = []
        for name, chunk in group:
            col = collate_frames([dataset[int(i)] for i in chunk])
            if pending and (jax.tree.structure(col)
                            != jax.tree.structure(pending[0][1])):
                yield flush(pending)
                pending = []
            pending.append((name, col))
            if len(pending) == bs:
                yield flush(pending)
                pending = []
        if pending:
            yield flush(pending)


def prefetch(iterator: Iterator, size: int = 2) -> Iterator:
    """Background-thread double buffering: overlaps host-side work (dataset
    __getitem__ disk reads, numpy collation, host->device transfer enqueue)
    with device compute.  The TPU-native stand-in for the reference's
    DataLoader worker processes (network/data/dataset.py:205).

    `size` bounds the queue so at most that many batches are resident
    host-side ahead of the consumer.  If the consumer abandons the generator
    (exception in the training step, GeneratorExit), the worker is signalled
    to stop and unblocked — it does not stay parked in `q.put` pinning
    buffered batches for the life of the process."""
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=size)
    end = object()
    err: list[BaseException] = []
    stop = threading.Event()

    def worker():
        try:
            for item in iterator:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            err.append(e)
        finally:
            # end marker must not be dropped on a full queue (the consumer
            # would drain the items then block forever); same stop-aware put
            while not stop.is_set():
                try:
                    q.put(end, timeout=0.1)
                    break
                except queue.Full:
                    continue

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is end:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()


class Mixture:
    """Sample from several datasets with given ratios (reference Mixture,
    utils.py:188-197; used for CAMERA-synthetic + Real finetuning)."""

    def __init__(self, iterators: dict, ratios: dict, seed: int = 0):
        self.iterators = iterators
        keys = sorted(iterators)
        probs = np.asarray([ratios[k] for k in keys], np.float64)
        self.keys = keys
        self.probs = probs / probs.sum()
        self.rng = np.random.RandomState(seed)

    def __next__(self):
        key = self.rng.choice(self.keys, p=self.probs)
        return key, next(self.iterators[key])
