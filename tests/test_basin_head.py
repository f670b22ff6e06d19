"""Basin-confidence head (network/basin_head) + the "basin" init-search
scorer.

The head exists because every unsupervised per-candidate scorer for the
frame-0 orientation search measured flat in the canonicalization offset
(EVIDENCE.md round-5 scorer diagnosis); it is a supervised read-only probe
on stop_gradient(backbone features).  No reference counterpart — the
reference never operates GT-less (real_arti_dataset.py:33-81).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from captra_tpu.config.schema import NetworkCfg, TrackCfg
from captra_tpu.models.coordnet import CoordNet
from tests.test_models import tiny_config
from tests.test_tracker import _make_posed_cloud


def _cfg_with_head(**kw):
    import dataclasses
    cfg = tiny_config(**kw)
    return cfg.replace(
        network=dataclasses.replace(cfg.network, basin_head=True))


def test_basin_head_output_shape_and_param_superset():
    """Head on: extra 'basin' output [B] + exactly the two head param
    blocks added; everything else identical to the head-less net."""
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32)) * 0.3
    base = tiny_config()
    v0 = CoordNet(base).init(jax.random.PRNGKey(1), pts, train=False)
    v1 = CoordNet(_cfg_with_head()).init(jax.random.PRNGKey(1), pts,
                                         train=False)
    assert set(v1["params"]) - set(v0["params"]) == {"basin_fc1",
                                                     "basin_fc2"}
    out = CoordNet(_cfg_with_head()).apply(v1, pts, train=False)
    assert out["basin"].shape == (2,)
    assert np.isfinite(np.asarray(out["basin"])).all()


def test_basin_head_is_inert_for_seg_and_nocs():
    """Grafting a head onto trained head-less params must leave seg/nocs
    bit-identical (the stop_gradient head is read-only), and the main-task
    gradient w.r.t. backbone params must not see the head's loss."""
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32)) * 0.3
    base = tiny_config()
    net0, net1 = CoordNet(base), CoordNet(_cfg_with_head())
    v0 = net0.init(jax.random.PRNGKey(2), pts, train=False)
    vh = net1.init(jax.random.PRNGKey(3), pts, train=False)
    merged = {"params": {**vh["params"], **v0["params"]},
              "batch_stats": v0["batch_stats"]}
    o0 = net0.apply(v0, pts, train=False)
    o1 = net1.apply(merged, pts, train=False)
    np.testing.assert_array_equal(np.asarray(o0["seg"]),
                                  np.asarray(o1["seg"]))
    np.testing.assert_array_equal(np.asarray(o0["nocs"]),
                                  np.asarray(o1["nocs"]))

    def head_loss(params):
        out = net1.apply({"params": params,
                          "batch_stats": merged["batch_stats"]}, pts,
                         train=False)
        return jnp.sum(out["basin"] ** 2)

    g = jax.grad(head_loss)(merged["params"])
    bb = jax.tree.leaves(g["backbone"])
    assert all(float(jnp.max(jnp.abs(x))) == 0.0 for x in bb)
    assert any(float(jnp.max(jnp.abs(x))) > 0.0
               for x in jax.tree.leaves(g["basin_fc1"]))


def test_init_search_basin_scorer_defeats_copy_mode():
    """The copy failure mode that defeated residual selection (v1/v2,
    tests/test_tracker.py::test_init_orientation_search_mode_clustering_*):
    a supervised basin logit — high only when the canonicalized cloud
    matches canonical geometry — must recover the pose through plain
    argmax selection, no clustering."""
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
        # a trained basin head: logit monotone-decreasing in the
        # canonicalization mismatch (what train_basin_head.py supervises)
        return {"seg": seg, "nocs": pred, "basin": -d}

    cfg_sym = tiny_config(num_parts=1, sym=True)
    gt_y = np.asarray(gt.rotation[0, 0])[:, 1]

    def run(scorer, tau=0.0):
        cfg = cfg_sym.replace(track=TrackCfg(
            init_search=64, init_search_steps=2, init_search_tau=tau,
            init_search_scorer=scorer))
        ip = init_pose_from_cloud(cam, 1, cfg.data_radius)
        got = jax.jit(lambda p, i: search_init_orientation(
            coord_fn, p, i, cfg))(cam, ip)
        got_y = np.asarray(got.rotation[0, 0])[:, 1]
        return np.degrees(np.arccos(np.clip(got_y @ gt_y, -1, 1)))

    assert run("mode", tau=0.0) > 20.0   # pure residual: fooled by a copy
    assert run("basin") < 5.0            # supervised logit: recovers


def test_init_search_basin_scorer_requires_head():
    """scorer=basin with a head-less CoordNet must fail loudly at trace
    time, not silently fall back."""
    from captra_tpu.tracking.tracker import (
        init_pose_from_cloud, search_init_orientation,
    )

    rng = np.random.RandomState(4)
    _, cam, _ = _make_posed_cloud(rng)
    cfg = tiny_config(num_parts=1).replace(
        track=TrackCfg(init_search=8, init_search_steps=1,
                       init_search_scorer="basin"))

    def coord_fn(canon_pts):
        labels = jnp.zeros(canon_pts.shape[:2], jnp.int32)
        return {"seg": jax.nn.one_hot(labels, cfg.obj.num_seg),
                "nocs": canon_pts}

    ip = init_pose_from_cloud(cam, 1, cfg.data_radius)
    with pytest.raises(ValueError, match="basin_head"):
        search_init_orientation(coord_fn, cam, ip, cfg)
