"""Device mesh + sharding helpers.

The reference is single-GPU (configs/config.py:68; no torch.distributed
anywhere — SURVEY.md §2.3).  Scale-out is therefore a *new* first-class
component, done the TPU way: a `jax.sharding.Mesh` over ICI, batch axis
sharded with NamedSharding, params replicated (the nets are ~1-5M params —
no TP/PP warranted).  Under `jit`, XLA GSPMD inserts the gradient all-reduce
for training and keeps streaming inference embarrassingly parallel over
trajectories.

The video-frame axis is the tracking recurrence (`lax.scan`) and is *not*
sharded — parallelism comes from batching trajectories across chips
(SURVEY.md §5 long-context note).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_parallel_mesh(n_devices: int | None = None,
                       axis: str = DATA_AXIS,
                       devices=None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


DCN_AXIS = "dcn"
ICI_AXIS = "ici"


def hybrid_data_parallel_mesh(dcn: int | None = None, ici: int | None = None,
                              devices=None) -> Mesh:
    """2D (dcn, ici) data-parallel mesh for multi-host topologies.

    On a real multi-host TPU slice, `dcn` is the number of hosts/slices
    (jax.process_count()) and `ici` the chips per host — gradient
    all-reduces then decompose into fast ICI rings with one DCN hop
    (scaling-book recipe).  Params stay replicated; the batch axis is
    sharded over BOTH axes (pass axis=(DCN_AXIS, ICI_AXIS) to shard_batch).
    On CPU test meshes any (dcn, ici) factorization of the device count
    works."""
    devs = list(devices) if devices is not None else jax.devices()
    if dcn is None:
        dcn = max(getattr(jax, "process_count", lambda: 1)(), 1)
    if dcn > len(devs) or len(devs) % dcn:
        raise ValueError(
            f"dcn={dcn} must divide the device count ({len(devs)}); "
            "a (dcn, ici) mesh cannot silently drop devices")
    if ici is None:
        ici = len(devs) // dcn
    if dcn * ici != len(devs):
        raise ValueError(
            f"dcn*ici = {dcn}*{ici} != device count {len(devs)}")
    return Mesh(np.asarray(devs).reshape(dcn, ici), (DCN_AXIS, ICI_AXIS))


def shard_batch(batch, mesh: Mesh, axis=None, batch_dim: int = 0):
    """Place a pytree of arrays with the batch dim sharded over the mesh.

    `axis` defaults to ALL mesh axes (1D data mesh -> "data"; hybrid
    (dcn, ici) mesh -> batch sharded over both)."""
    if axis is None:
        axis = mesh.axis_names if len(mesh.axis_names) > 1 \
            else mesh.axis_names[0]

    def put(x):
        if x.ndim <= batch_dim:
            # leaves without the batch dim (e.g. per-frame scalar keys
            # [T] when sharding frames at batch_dim=1) are replicated
            return jax.device_put(x, NamedSharding(mesh, P()))
        spec = [None] * x.ndim
        spec[batch_dim] = axis
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
