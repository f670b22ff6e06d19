"""NOCS finetune entry: mix CAMERA-synthetic and Real275 single-frame
batches each epoch.

Functional spec: /root/reference/network/train_nocs_finetune.py:40-107 —
per epoch, `syn_n x len(real)` synthetic batches from a persistent cyclic
iterator over the CAMERA split, then the full real_train split, then eval on
real_test.
"""
from __future__ import annotations

import argparse
from os.path import join as pjoin

import jax

from captra_tpu.cli.args import add_args, config_overrides
from captra_tpu.cli.train import setup_logger
from captra_tpu.config import get_config
from captra_tpu.data.factory import make_dataset
from captra_tpu.data.loader import prefetch, single_frame_batches
from captra_tpu.parallel.mesh import data_parallel_mesh, replicate, shard_batch
from captra_tpu.training import checkpoint as ckpt
from captra_tpu.training.trainer import Trainer


def syn_stream(dataset, batch_size: int, consumed: int):
    """Persistent synthetic stream (reference train_nocs_finetune.py:52-60
    keeps one iterator across epochs), fast-forwardable: `consumed` batches
    are skipped at the index level (no disk reads) so a resumed run
    continues the stream where an uninterrupted one would be."""
    if len(dataset) < batch_size:
        raise ValueError(
            f"synthetic split has {len(dataset)} frames < batch_size "
            f"{batch_size}: every epoch would yield zero batches")
    per = len(dataset) // batch_size
    seed = consumed // per
    start = consumed % per
    while True:
        seed += 1
        yield from single_frame_batches(dataset, batch_size, seed=seed,
                                        start_batch=start)
        start = 0


def main(argv=None):
    from captra_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    parser = add_args(argparse.ArgumentParser("captra-tpu finetune"))
    parser.add_argument("--syn_n", type=int, default=1,
                        help="synthetic batches per real batch per epoch")
    parser.add_argument("--real_only", action="store_true", default=False)
    parser.add_argument("--downsample", type=int, default=None)
    args = parser.parse_args(argv)
    cfg = get_config(args.config, config_overrides(args), args.config_dir)
    logger = setup_logger(cfg.experiment_dir, "finetune")

    real_ds = make_dataset(cfg, "real_train")
    syn_ds = make_dataset(cfg, "train")
    real_len = max(1, len(real_ds) // cfg.batch_size)
    syn_per_epoch = real_len * args.syn_n
    # per-epoch eval on real_test, downsampled for speed (reference
    # train_nocs_finetune.py:96-107 test_all with --downsample)
    test_ds = None
    try:
        test_ds = make_dataset(cfg, "real_test",
                               downsampling=args.downsample)
    except Exception as e:  # no test split on disk
        logger.info("no real_test split (%s); skipping per-epoch eval", e)

    trainer = Trainer(cfg, steps_per_epoch=real_len + syn_per_epoch)
    key = jax.random.PRNGKey(0)
    example = next(single_frame_batches(real_ds, cfg.batch_size))
    state = trainer.init_state(key, example)

    ckpt_dir = pjoin(cfg.experiment_dir, "ckpt")
    start_epoch = 0
    last = ckpt.latest_checkpoint(ckpt_dir, args.resume_epoch
                                  if args.resume_epoch >= 0 else None)
    if last:
        payload = ckpt.load_checkpoint(last)
        state = ckpt.restore_state(payload, state)
        start_epoch = payload["epoch"] + 1
        logger.info("resumed from %s", last)

    n_dev = args.num_devices or len(jax.devices())
    while cfg.batch_size % n_dev:
        n_dev -= 1
    mesh = data_parallel_mesh(n_dev)
    state = replicate(state, mesh)

    syn_cycle = syn_stream(syn_ds, cfg.batch_size,
                           consumed=start_epoch * syn_per_epoch)

    for epoch in range(start_epoch, cfg.optim.total_epoch):
        trainer.set_epoch(epoch)
        for tag, batches in (
                [] if args.real_only else
                [("Syn_Train", (next(syn_cycle)
                                for _ in range(syn_per_epoch)))]) + [
                ("Real_Train", single_frame_batches(real_ds, cfg.batch_size,
                                                    seed=epoch))]:
            sums, count = {}, 0
            # per-(epoch, phase) key stream: the perturbation keys replay
            # identically on resume, and the synthetic stream fast-forwards
            # (syn_stream) — NOT fully bit-deterministic though: the NOCS
            # crop perturbation uses the dataset's own RNG whose position
            # is not checkpointed (cli/train.py's synthetic path IS
            # bit-deterministic, tests/test_cli_e2e.py)
            ekey = jax.random.fold_in(jax.random.fold_in(key, epoch),
                                      0 if tag == "Syn_Train" else 1)
            for batch in prefetch(batches):
                ekey, sub = jax.random.split(ekey)
                state, loss_dict, metrics = trainer.train_step(
                    state, shard_batch(batch, mesh), sub)
                for k, v in {**loss_dict, **metrics}.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
                count += 1
            for k in sorted(sums):
                logger.info("%s epoch %d %s is %.6f", tag, epoch, k,
                            sums[k] / max(count, 1))
        if ((epoch + 1) % cfg.save_freq == 0
                or epoch == cfg.optim.total_epoch - 1):
            ckpt.save_checkpoint(ckpt_dir, epoch, state,
                                 format=getattr(args, "ckpt_format",
                                                "pickle"))
        if test_ds is not None:
            sums, count = {}, 0
            ekey = jax.random.fold_in(jax.random.fold_in(key, epoch), 2)
            for batch in prefetch(single_frame_batches(
                    test_ds, cfg.batch_size, shuffle=False)):
                ekey, sub = jax.random.split(ekey)
                loss_dict, metrics = trainer.eval_step(
                    state, shard_batch(batch, mesh), sub)
                for k, v in {**loss_dict, **metrics}.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
                count += 1
            for k in sorted(sums):
                logger.info("Test epoch %d %s is %.6f", epoch, k,
                            sums[k] / max(count, 1))
    return state


if __name__ == "__main__":
    main()
