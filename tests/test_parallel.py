"""Multi-device sharding tests on the 8-virtual-CPU-device mesh
(SURVEY.md §4: fake-mesh tests for the multi-chip batching)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from captra_tpu.config.schema import NetworkCfg, ObjCfg
from captra_tpu.data.synthetic import make_frame_batch
from captra_tpu.parallel.mesh import data_parallel_mesh, replicate, shard_batch
from captra_tpu.training.trainer import Trainer

from tests.test_models import tiny_config


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_data_parallel_train_step(key):
    """Sharded batch + replicated params: one jitted step must produce
    identical params on every device and match the single-device result."""
    obj = ObjCfg(num_parts=1, num_joints=0, tree=(-1,), extra_dims=1)
    cfg = tiny_config().replace(
        obj=obj, network=NetworkCfg(type="canon_coord", backbone_out_dim=32,
                                    nocs_head_dims=(16,)))
    trainer = Trainer(cfg, steps_per_epoch=10)
    batch = make_frame_batch(0, obj, batch=8, num_points=128)
    state = trainer.init_state(key, batch)

    mesh = data_parallel_mesh()
    sharded = shard_batch(batch, mesh)
    state_rep = replicate(state, mesh)

    new_state, loss_dict, _ = trainer.train_step(state_rep, sharded, key)
    total_sharded = float(loss_dict["total_loss"])

    new_state_1dev, loss_1dev, _ = trainer.train_step(state, batch, key)
    # same global loss (BN + grad all-reduce both span the global batch)
    np.testing.assert_allclose(total_sharded,
                               float(loss_1dev["total_loss"]), rtol=1e-4)
    # NOTE: exact param equality is not meaningful — Adam's first update is
    # ~sign(grad)*lr, so fp-reorder sign flips of near-zero grads are
    # expected.  Check the *second* step's loss instead: training
    # trajectories must stay equivalent.
    _, loss2_sharded, _ = trainer.train_step(
        new_state, shard_batch(batch, mesh), key)
    _, loss2_1dev, _ = trainer.train_step(new_state_1dev, batch, key)
    np.testing.assert_allclose(float(loss2_sharded["total_loss"]),
                               float(loss2_1dev["total_loss"]), rtol=5e-2)
    assert np.isfinite(np.asarray(jax.tree.leaves(new_state.params)[0])).all()


def test_tracking_shards_over_trajectories(key):
    """Batched tracking scan with trajectories sharded across the mesh."""
    from captra_tpu.data.synthetic import batch_trajectories, make_trajectory
    from captra_tpu.pose.part_dof import Pose
    from captra_tpu.tracking.tracker import make_track_step, track_trajectory
    from captra_tpu.models.coordnet import CoordNet
    from captra_tpu.models.rotnet import RotNet
    from captra_tpu.config.schema import TrackCfg

    obj = ObjCfg(num_parts=1, num_joints=0, tree=(-1,))
    cfg = tiny_config().replace(obj=obj, track=TrackCfg(init_frame_gt=True))
    T, B, N = 3, 8, 128
    trajs = [make_trajectory(seed=s, obj=obj, num_frames=T, num_points=N)
             for s in range(B)]
    batch = batch_trajectories(trajs)
    gt = batch["pose"]

    coord, rotn = CoordNet(cfg), RotNet(cfg)
    k1, k2 = jax.random.split(key)
    cv = coord.init(k1, batch["points"][0], train=False)
    rv = rotn.init(k2, jnp.zeros((B, 1, N, 3)), batch["labels"][0],
                   train=False)

    step = make_track_step(
        cfg, lambda p: coord.apply(cv, p, train=False),
        lambda p, l: rotn.apply(rv, p, l, train=False))

    mesh = data_parallel_mesh()
    frames = shard_batch({"points": batch["points"]}, mesh, batch_dim=1)
    init_pose = Pose(rotation=gt.rotation[0], translation=gt.translation[0],
                     scale=gt.scale[0])
    init_pose = shard_batch(init_pose, mesh, batch_dim=0)
    cv_r, rv_r = replicate((cv, rv), mesh)

    final, aux = jax.jit(lambda ip, fr: track_trajectory(step, ip, fr))(
        init_pose, frames)
    assert aux.pose.rotation.shape == (T - 1, B, 1, 3, 3)
    assert np.isfinite(np.asarray(aux.pose.scale)).all()


def test_hybrid_2d_mesh_train_step(key):
    """(dcn, ici) 2D mesh: batch sharded over BOTH axes must match the 1D
    data-parallel loss (GSPMD decomposes the all-reduce per axis)."""
    from captra_tpu.parallel.mesh import hybrid_data_parallel_mesh

    obj = ObjCfg(num_parts=1, num_joints=0, tree=(-1,), extra_dims=1)
    cfg = tiny_config().replace(
        obj=obj, network=NetworkCfg(type="canon_coord", backbone_out_dim=32,
                                    nocs_head_dims=(16,)))
    trainer = Trainer(cfg, steps_per_epoch=10)
    batch = make_frame_batch(0, obj, batch=8, num_points=128)
    state = trainer.init_state(key, batch)

    mesh2d = hybrid_data_parallel_mesh(dcn=2, ici=4)
    assert mesh2d.devices.shape == (2, 4)
    sharded = shard_batch(batch, mesh2d)          # over both axes
    state_rep = replicate(state, mesh2d)
    _, loss_2d, _ = trainer.train_step(state_rep, sharded, key)

    _, loss_1dev, _ = trainer.train_step(state, batch, key)
    np.testing.assert_allclose(float(loss_2d["total_loss"]),
                               float(loss_1dev["total_loss"]), rtol=1e-4)


_MP_SCRIPT = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, os.getcwd())
from captra_tpu.parallel.mesh import hybrid_data_parallel_mesh, shard_batch
mesh = hybrid_data_parallel_mesh()          # dcn=2 processes, ici=4 local
assert mesh.devices.shape == (2, 4), mesh.devices.shape
x = np.arange(16, dtype=np.float32).reshape(16, 1) + 100 * pid

from jax.sharding import NamedSharding, PartitionSpec as P
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(("dcn", "ici"))), x, (32, 1))
total = jax.jit(lambda a: jnp.sum(a),
                out_shardings=NamedSharding(mesh, P()))(garr)
want = float(np.arange(16).sum() * 2 + 100 * 16)
assert abs(float(total) - want) < 1e-3, (float(total), want)
print(f"proc {pid}: ok total={float(total)}")
"""


def _run_two_processes(tmp_path, script_text, timeout=240):
    """Spawn 2 jax.distributed CPU worker processes running script_text
    (args: pid, coordinator port, scratch dir); returns their outputs."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    script = tmp_path / "mp_worker.py"
    script.write_text(script_text)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, str(script), str(i), port,
                               str(tmp_path)],
                              env=env, cwd=os.getcwd(),
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert all(p.returncode == 0 for p in procs), "\n".join(outs)
    return outs


def test_multiprocess_dcn_mesh(tmp_path):
    """Two jax.distributed CPU processes x 4 local devices -> a global
    (2, 4) (dcn, ici) mesh with a cross-process reduction (SURVEY.md §5
    distributed-backend note).  Runs anywhere: spawns its own processes."""
    outs = _run_two_processes(tmp_path, _MP_SCRIPT)
    assert all("ok total=" in o for o in outs), "\n".join(outs)


_MP_CKPT_SCRIPT = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; scratch = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, os.getcwd())
from captra_tpu.config.schema import NetworkCfg, ObjCfg
from captra_tpu.data.synthetic import make_frame_batch
from captra_tpu.parallel.mesh import hybrid_data_parallel_mesh, replicate, \
    shard_batch
from captra_tpu.training import checkpoint as ckpt
from captra_tpu.training.trainer import Trainer
from tests.test_models import tiny_config

obj = ObjCfg(num_parts=1, num_joints=0, tree=(-1,), extra_dims=1)
cfg = tiny_config().replace(
    obj=obj, network=NetworkCfg(type="canon_coord", backbone_out_dim=32,
                                nocs_head_dims=(16,)))
trainer = Trainer(cfg, steps_per_epoch=10)
batch = make_frame_batch(0, obj, batch=8, num_points=128)
key = jax.random.PRNGKey(0)
state = trainer.init_state(key, batch)

mesh = hybrid_data_parallel_mesh()          # global (2, 4) over 2 processes
state = replicate(state, mesh)              # params live on the GLOBAL mesh
state, _, _ = trainer.train_step(state, shard_batch(batch, mesh), key)

want = jax.tree.leaves(jax.tree.map(np.asarray, state.params))
ckpt_dir = os.path.join(scratch, "mh_ckpt")
path = ckpt.save_checkpoint(ckpt_dir, 0, state, format="orbax")

# barrier: both processes finished the coordinated orbax write above
# (save_checkpoint is itself collective); now restore and bit-compare
payload = ckpt.load_checkpoint(path)
fresh = trainer.init_state(jax.random.PRNGKey(1), batch)
restored = ckpt.restore_state(payload, fresh)
got = jax.tree.leaves(jax.tree.map(np.asarray, restored.params))
assert len(got) == len(want)
for g, w in zip(got, want):
    np.testing.assert_array_equal(g, w)
ro = jax.tree.leaves(jax.tree.map(np.asarray, restored.opt_state))
so = jax.tree.leaves(jax.tree.map(np.asarray, state.opt_state))
for g, w in zip(ro, so):
    np.testing.assert_array_equal(g, w)
assert int(restored.step) == int(state.step)
print(f"proc {pid}: ckpt ok leaves={len(got)}")
"""


def test_multiprocess_orbax_checkpoint(tmp_path):
    """Multi-host checkpointing proof (round-3 verdict item 6): save a
    2-process global-mesh train state through the orbax backend, restore,
    and bit-compare params + opt_state on BOTH processes."""
    outs = _run_two_processes(tmp_path, _MP_CKPT_SCRIPT, timeout=300)
    assert all("ckpt ok" in o for o in outs), "\n".join(outs)


def test_hybrid_mesh_rejects_nondividing_dcn():
    import pytest

    from captra_tpu.parallel.mesh import hybrid_data_parallel_mesh
    with pytest.raises(ValueError):
        hybrid_data_parallel_mesh(dcn=3)  # 8 CPU devices, 3 does not divide
    with pytest.raises(ValueError):
        hybrid_data_parallel_mesh(dcn=16)  # more groups than devices
    with pytest.raises(ValueError):
        hybrid_data_parallel_mesh(dcn=2, ici=2)  # 2*2 != 8
