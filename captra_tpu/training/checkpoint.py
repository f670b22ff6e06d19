"""Checkpoint save / resume / composition.

Functional spec: /root/reference/network/trainer.py:147-210 — `model_%04d`
naming, latest-epoch resume with optional pin, and the tracking-time
composition where a CoordNet experiment's weights are spliced into the track
model (trainer.py:159-170 remaps `net.*` -> `npcs_net.*`; here the two nets
live in separate variable trees, so composition is just loading both).

Format: a single pickle file per epoch holding the numpy-materialized
pytree {params, batch_stats, opt_state, step, epoch}, written atomically
(tmp + rename).  Single-file pickle (rather than orbax's sharded
directories) is deliberate: these nets are ~1-5M params and checkpoints are
host-written by one process even under the data-parallel mesh (params are
fully replicated), so sharded/async checkpointing buys nothing here.
"""
from __future__ import annotations

import os
import pickle
import re
from os.path import join as pjoin

import jax
import numpy as np

_CKPT_RE = re.compile(r"model_(\d{4,})$")


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(ckpt_dir: str, epoch: int, state, extra: dict | None = None):
    """Write {params, batch_stats, opt_state, step, epoch} under
    ckpt_dir/model_%04d (reference naming trainer.py:196-210)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        "params": _to_numpy(state.params),
        "batch_stats": _to_numpy(state.batch_stats),
        "opt_state": _to_numpy(state.opt_state),
        "step": int(state.step),
        "epoch": int(epoch),
    }
    if extra:
        payload["extra"] = extra
    path = pjoin(ckpt_dir, f"model_{epoch:04d}")
    with open(path + ".tmp", "wb") as f:
        pickle.dump(payload, f)
    os.replace(path + ".tmp", path)
    return path


def latest_checkpoint(ckpt_dir: str, epoch: int | None = None) -> str | None:
    """Find the newest (or pinned-epoch) checkpoint (reference
    get_last_model, trainer.py:73-83)."""
    if not os.path.isdir(ckpt_dir):
        return None
    cands = []
    for name in os.listdir(ckpt_dir):
        m = _CKPT_RE.match(name)
        if m:
            cands.append((int(m.group(1)), pjoin(ckpt_dir, name)))
    if not cands:
        return None
    if epoch is not None and epoch >= 0:
        for e, p in cands:
            if e == epoch:
                return p
        return None
    return max(cands)[1]


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_state(ckpt: dict, state):
    """Rebuild a TrainState from a payload, tolerating optimizer-state shape
    drift by falling back to the fresh opt_state (reference trainer.py:181-185
    loads the optimizer tolerantly)."""
    import jax.numpy as jnp
    params = jax.tree.map(jnp.asarray, ckpt["params"])
    batch_stats = jax.tree.map(jnp.asarray, ckpt["batch_stats"])
    try:
        opt_state = jax.tree.map(jnp.asarray, ckpt["opt_state"])
        ref_struct = jax.tree.structure(state.opt_state)
        if jax.tree.structure(opt_state) != ref_struct:
            opt_state = state.opt_state
    except Exception:
        opt_state = state.opt_state
    return state.replace(params=params, batch_stats=batch_stats,
                         opt_state=opt_state,
                         step=jnp.asarray(ckpt.get("step", 0), jnp.int32))


def load_track_variables(coord_ckpt_path: str, rot_ckpt_path: str):
    """Compose tracking-time variables from two training experiments
    (reference trainer.py:159-170): returns (coord_vars, rot_vars) ready for
    CoordNet.apply / RotNet.apply."""
    def vars_of(path):
        ckpt = load_checkpoint(path)
        import jax.numpy as jnp
        return {"params": jax.tree.map(jnp.asarray, ckpt["params"]),
                "batch_stats": jax.tree.map(jnp.asarray, ckpt["batch_stats"])}

    return vars_of(coord_ckpt_path), vars_of(rot_ckpt_path)
