"""Checkpoint save / resume / composition.

Functional spec: /root/reference/network/trainer.py:147-210 — `model_%04d`
naming, latest-epoch resume with optional pin, and the tracking-time
composition where a CoordNet experiment's weights are spliced into the track
model (trainer.py:159-170 remaps `net.*` -> `npcs_net.*`; here the two nets
live in separate variable trees, so composition is just loading both).

Two interchangeable on-disk formats behind the same `model_%04d` naming:

- "pickle" (default): a single file holding the numpy-materialized pytree
  {params, batch_stats, opt_state, step, epoch}, written atomically
  (tmp + rename).  The right default here: these nets are ~1-5M params and
  checkpoints are host-written by one process even under the data-parallel
  mesh (params are fully replicated), so sharded writes buy nothing.
- "orbax": an orbax PyTreeCheckpointer directory — the multi-host-ready
  path (per-host sharded writes on a real multi-host mesh).  The optax
  opt_state is stored as its flat leaves ("opt_state_leaves") because
  orbax round-trips nested containers as plain dicts/lists; `restore_state`
  rebuilds the optimizer NamedTuple structure from the live state's
  treedef (and falls back to the fresh opt_state on any mismatch, matching
  the reference's tolerant optimizer restore, trainer.py:181-185).

`load_checkpoint` auto-detects the format (orbax checkpoints are
directories), so resume and tracking-time composition work across formats.
"""
from __future__ import annotations

import json
import os
import pickle
import re
from os.path import join as pjoin

import jax
import numpy as np

_CKPT_RE = re.compile(r"model_(\d{4,})$")
_EXTRA_JSON = "captra_extra.json"


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(ckpt_dir: str, epoch: int, state, extra: dict | None = None,
                    format: str = "pickle"):
    """Write {params, batch_stats, opt_state, step, epoch} under
    ckpt_dir/model_%04d (reference naming trainer.py:196-210)."""
    if format not in ("pickle", "orbax"):
        raise ValueError(f"unknown checkpoint format {format!r}")
    os.makedirs(ckpt_dir, exist_ok=True)
    path = pjoin(ckpt_dir, f"model_{epoch:04d}")
    if format == "orbax":
        import orbax.checkpoint as ocp
        payload = {
            "params": _to_numpy(state.params),
            "batch_stats": _to_numpy(state.batch_stats),
            # flat leaves: orbax round-trips containers as plain dicts, so
            # the NamedTuple structure is re-applied at restore time
            "opt_state_leaves": {
                f"{i:04d}": np.asarray(leaf)
                for i, leaf in enumerate(jax.tree.leaves(state.opt_state))},
            "step": np.asarray(int(state.step), np.int64),
            "epoch": np.asarray(int(epoch), np.int64),
        }
        ocp.PyTreeCheckpointer().save(os.path.abspath(path), payload,
                                      force=True)
        if extra:
            with open(pjoin(path, _EXTRA_JSON), "w") as f:
                json.dump(extra, f)
        return path
    payload = {
        "params": _to_numpy(state.params),
        "batch_stats": _to_numpy(state.batch_stats),
        "opt_state": _to_numpy(state.opt_state),
        "step": int(state.step),
        "epoch": int(epoch),
    }
    if extra:
        payload["extra"] = extra
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
    """Load either format (orbax checkpoints are directories)."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp
        payload = dict(ocp.PyTreeCheckpointer().restore(os.path.abspath(path)))
        extra_path = pjoin(path, _EXTRA_JSON)
        if os.path.exists(extra_path):
            with open(extra_path) as f:
                payload["extra"] = json.load(f)
        payload["step"] = int(payload.get("step", 0))
        payload["epoch"] = int(payload.get("epoch", 0))
        return payload
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
        if "opt_state_leaves" in ckpt:
            # orbax format: rebuild the optax NamedTuple structure from the
            # live state's treedef (keys are zero-padded flatten indices)
            saved = ckpt["opt_state_leaves"]
            # numeric sort: zero-padding covers 4 digits, but >=10000
            # leaves would sort lexicographically ("10000" < "9999") and
            # silently permute moments while the count check still passes
            leaves = [jnp.asarray(saved[k]) for k in sorted(saved, key=int)]
            treedef = jax.tree.structure(state.opt_state)
            if treedef.num_leaves != len(leaves):
                raise ValueError("optimizer leaf-count drift")
            opt_state = jax.tree.unflatten(treedef, leaves)
        else:
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
