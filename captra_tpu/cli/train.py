"""Training entry point.

Functional spec: /root/reference/network/train.py (epoch loop :82-98,
logging :34-46).  `python -m captra_tpu.cli.train --config=config_coordnet.yml
--obj_config=obj_info_nocs.yml --obj_category=1 ...`

With --synthetic_data it trains on generated trajectories (no corpus
needed); otherwise it reads the NOCS/SAPIEN trees configured in the object
YAML's basepath.
"""
from __future__ import annotations

import argparse
import logging
import os
import time
from os.path import join as pjoin

import jax

from captra_tpu.cli.args import add_args, config_overrides
from captra_tpu.config import get_config
# backend selection lives in the data layer (reference
# network/data/dataset.py:43-63); re-exported here for compatibility
from captra_tpu.data.factory import make_dataset  # noqa: F401
from captra_tpu.data.loader import prefetch, single_frame_batches
from captra_tpu.data.synthetic import make_frame_batch
from captra_tpu.parallel.mesh import data_parallel_mesh, replicate, shard_batch
from captra_tpu.training import checkpoint as ckpt
from captra_tpu.training.trainer import Trainer


def setup_logger(experiment_dir: str, name: str):
    log_dir = pjoin(experiment_dir, "log")
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    fh = logging.FileHandler(pjoin(log_dir, "log.txt"))
    fh.setFormatter(logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s"))
    logger.addHandler(fh)
    sh = logging.StreamHandler()
    logger.addHandler(sh)
    return logger




def synthetic_epoch(cfg, epoch: int, steps: int = 50):
    for i in range(steps):
        yield make_frame_batch(epoch * steps + i, cfg.obj,
                               batch=cfg.batch_size,
                               num_points=cfg.num_points)


def device_aug_epoch(sampler, epoch: int, steps: int):
    """Device-side augmented epoch: every step draws a fresh random pose
    over the HBM-resident geometry pool (data/synthetic.py
    device_pose_batch) — no host generation, no per-step H2D traffic."""
    base = jax.random.PRNGKey(42)
    for i in range(steps):
        yield sampler(jax.random.fold_in(base, epoch * steps + i))


def make_device_aug_sampler(cfg, pool_size: int, pool_seed: int = 0):
    from captra_tpu.data.synthetic import device_pose_batch, geometry_pool
    pool = geometry_pool(seed=pool_seed, obj=cfg.obj, count=pool_size,
                         num_points=cfg.num_points)
    G = pool["npcs"].shape[0]
    obj = cfg.obj
    batch = cfg.batch_size

    @jax.jit
    def sample(key):
        k_i, k_p = jax.random.split(key)
        idx = jax.random.randint(k_i, (batch,), 0, G)
        geo = jax.tree.map(lambda x: x[idx], pool)
        return device_pose_batch(k_p, geo["npcs"], geo["labels"],
                                 geo["corners"], obj)

    return sample


def main(argv=None):
    from captra_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    parser = add_args(argparse.ArgumentParser("captra-tpu train"))
    args = parser.parse_args(argv)
    if args.device_aug and not args.synthetic_data:
        raise SystemExit("--device_aug resamples poses over generated "
                         "geometry and requires --synthetic_data")
    cfg = get_config(args.config, config_overrides(args), args.config_dir)
    logger = setup_logger(cfg.experiment_dir, "train")
    logger.info("config: %s", cfg)
    if args.use_val and args.synthetic_data:
        logger.info("--use_val is ignored with --synthetic_data "
                    "(no disk splits)")

    # mesh size must divide the global batch
    n_dev = args.num_devices or len(jax.devices())
    while cfg.batch_size % n_dev:
        n_dev -= 1
    mesh = data_parallel_mesh(n_dev)
    logger.info("mesh: %s devices", mesh.devices.size)

    steps_per_epoch = 50 if args.synthetic_data else None
    if not args.synthetic_data:
        train_ds = make_dataset(cfg, "train")
        steps_per_epoch = max(1, len(train_ds) // cfg.batch_size)
    trainer = Trainer(cfg, steps_per_epoch=steps_per_epoch)

    key = jax.random.PRNGKey(0)
    example = (make_frame_batch(0, cfg.obj, batch=cfg.batch_size,
                                num_points=cfg.num_points)
               if args.synthetic_data else
               next(single_frame_batches(train_ds, cfg.batch_size)))
    state = trainer.init_state(key, example)

    ckpt_dir = pjoin(cfg.experiment_dir, "ckpt")
    start_epoch = 0
    last = ckpt.latest_checkpoint(ckpt_dir, args.resume_epoch
                                  if args.resume_epoch >= 0 else None)
    if last:
        payload = ckpt.load_checkpoint(last)
        state = ckpt.restore_state(payload, state)
        start_epoch = payload["epoch"] + 1
        logger.info("resumed from %s (epoch %d)", last, start_epoch)

    state = replicate(state, mesh)

    test_ds, val_ds = None, None
    if not args.synthetic_data:
        try:
            test_ds = make_dataset(
                cfg, "real_test" if cfg.obj.nocs_data else "test")
        except Exception as e:  # no test split on disk
            logger.info("no test split (%s); skipping per-epoch eval", e)
        if args.use_val:
            # additional per-epoch split, logged under its own tag
            # (reference train.py:52-80 --use_val)
            try:
                val_ds = make_dataset(cfg, args.use_val)
            except Exception as e:
                logger.info("no %s split (%s)", args.use_val, e)

    def run_epoch(batches, train: bool, tag: str, epoch: int):
        nonlocal state
        sums, count = None, 0
        # per-epoch key stream derived from (epoch, phase), NOT threaded
        # across the run: a resumed run replays the exact key sequence of an
        # uninterrupted one, so resume is bit-deterministic
        # (tests/test_checkpoint.py::test_resume_mid_recipe)
        ekey = jax.random.fold_in(jax.random.fold_in(key, epoch),
                                  0 if train else 1)
        # background-thread double buffering: collation/disk reads overlap
        # device compute (reference DataLoader workers, dataset.py:205)
        for batch in prefetch(batches):
            ekey, sub = jax.random.split(ekey)
            if train:
                state, loss_dict, metrics = trainer.train_step(
                    state, shard_batch(batch, mesh), sub)
            else:
                loss_dict, metrics = trainer.eval_step(
                    state, shard_batch(batch, mesh), sub)
            # accumulate ON DEVICE: float(v) here would block async dispatch
            # with a host round-trip per step (~40 ms through the tunnel)
            cur = {**loss_dict, **metrics}
            sums = cur if sums is None else \
                jax.tree.map(jax.numpy.add, sums, cur)
            count += 1
        # single host sync per epoch
        for k in sorted(sums or ()):
            logger.info("%s epoch %d %s is %.6f", tag, epoch, k,
                        float(sums[k]) / max(count, 1))
        return count

    sampler = (make_device_aug_sampler(cfg, args.geom_pool)
               if args.device_aug else None)

    for epoch in range(start_epoch, cfg.optim.total_epoch):
        trainer.set_epoch(epoch)
        if sampler is not None:
            batches = device_aug_epoch(sampler, epoch, steps_per_epoch)
        elif args.synthetic_data:
            batches = synthetic_epoch(cfg, epoch, steps_per_epoch)
        else:
            batches = single_frame_batches(train_ds, cfg.batch_size,
                                           seed=epoch)
        t0 = time.time()
        count = run_epoch(batches, train=True, tag="Train", epoch=epoch)
        logger.info("epoch %d: %d steps in %.1fs", epoch, count,
                    time.time() - t0)
        # save every `freq/save` epochs (reference train.py:94-95), plus
        # always the final epoch so tracking/resume have a checkpoint
        if ((epoch + 1) % cfg.save_freq == 0
                or epoch == cfg.optim.total_epoch - 1):
            ckpt.save_checkpoint(ckpt_dir, epoch, state,
                                 format=getattr(args, "ckpt_format",
                                                "pickle"))
        # per-epoch test evaluation (reference train.py:91-98 test_all)
        if test_ds is not None:
            run_epoch(single_frame_batches(test_ds, cfg.batch_size,
                                           shuffle=False),
                      train=False, tag="Test", epoch=epoch)
        if val_ds is not None:
            run_epoch(single_frame_batches(val_ds, cfg.batch_size,
                                           shuffle=False),
                      train=False, tag=args.use_val, epoch=epoch)
    return state


if __name__ == "__main__":
    main()
