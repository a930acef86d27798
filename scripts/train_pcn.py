#!/usr/bin/env python
"""PointCleanNet-baseline training (ResPCPNet on raw patches).

TPU-native equivalent of /root/reference/u_net_arch/train_dist_PCN.py.

Usage:
  python scripts/train_pcn.py --config_file cfgs/PCN_l1.yaml --data_root <shapes>
"""
from __future__ import annotations

import time

from _common import auto_resume_state, base_parser, setup


def main():
    args = base_parser("PCN baseline training").parse_args()
    cfg, logger = setup(args)
    cfg.architecture = "PCN"

    import jax

    from deep3dpointclouddenoising_tpu.data.loader import (
        BatchLoader, chunk_batches, device_prefetch)
    from deep3dpointclouddenoising_tpu.data.offset_dataset import \
        OffsetDataset
    from deep3dpointclouddenoising_tpu.data.transforms import \
        build_train_transforms
    from deep3dpointclouddenoising_tpu.models import \
        build_offset_regression_PCN
    from deep3dpointclouddenoising_tpu.train.pcn import PCNTrainer
    from deep3dpointclouddenoising_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint)
    from deep3dpointclouddenoising_tpu.utils.logger import MetricsWriter
    from deep3dpointclouddenoising_tpu.utils.metrics import AverageMeter

    transforms = build_train_transforms(cfg)
    common = dict(
        in_radius=cfg.in_radius, num_points=cfg.num_points,
        noise_type=cfg.noise_type, noise_level=cfg.noise_level,
        num_points_per_shape=cfg.num_points_per_shape,
        outlier_proportion=cfg.outlier_percentage, architecture="PCN",
        diverse_levels=list(cfg.diverse_levels) or None,
        debug=bool(cfg.DEBUG), seed=cfg.rng_seed)
    train_ds = OffsetDataset(cfg.data_root, "train", num_steps=cfg.num_steps,
                             num_epochs=cfg.epochs, transforms=transforms,
                             **common)
    val_ds = OffsetDataset(cfg.data_root, "val", num_steps=cfg.num_steps,
                           num_epochs=1, **common)
    train_loader = BatchLoader(train_ds, cfg.batch_size, drop_last=True)
    val_loader = BatchLoader(val_ds, cfg.batch_size, drop_last=False)

    model, _ = build_offset_regression_PCN(cfg)
    trainer = PCNTrainer(cfg, model, n_iter_per_epoch=len(train_loader))

    rng = jax.random.PRNGKey(cfg.rng_seed)
    example = next(iter(train_loader.epoch_iter(0)))
    logger.info(f"train patches: {len(train_loader)*cfg.batch_size}; "
                "initializing train state (first device dispatch)...")
    state = trainer.init_state(rng, example)
    logger.info("train state initialized; compiling the train step...")
    writer = MetricsWriter(cfg.log_dir)
    if cfg.load_path:
        state = load_checkpoint(cfg.load_path, state)
        logger.info(f"resumed from {cfg.load_path}")
    elif args.auto_resume:
        state, start = auto_resume_state(cfg.log_dir, state,
                                         len(train_loader), logger)
        if start is not None:
            cfg.start_epoch = start

    import numpy as np

    chunk_size = int(cfg.steps_per_dispatch or 0)
    for epoch in range(int(cfg.start_epoch), int(cfg.epochs) + 1):
        tic = time.time()
        meter = AverageMeter()
        step_base = (epoch - 1) * len(train_loader)
        pending = []  # un-synced device losses (syncing per step serializes
        # host batch prep with device compute)
        if chunk_size > 1:
            # scan-based dispatch: S steps per jit call (see scripts/train.py)
            it = 0
            for chunk in device_prefetch(chunk_batches(
                    train_loader.epoch_iter(epoch - 1), chunk_size)):
                s = int(chunk["points"].shape[0])
                state, losses = trainer.train_chunk(state, chunk, rng)
                it += s
                for lv in np.asarray(losses):
                    meter.update(float(lv), int(cfg.batch_size))
                logger.info(
                    f"PCN [{epoch}/{cfg.epochs}][{it}/{len(train_loader)}] "
                    f"loss {meter.val:.6f} ({meter.avg:.6f})")
        else:
            for it, batch in enumerate(train_loader.epoch_iter(epoch - 1)):
                step_rng = jax.random.fold_in(rng, step_base + it)
                state, loss = trainer.train_step(state, batch, step_rng)
                pending.append((loss, len(batch["points"])))
                if it % cfg.print_freq == 0:
                    for pl, n in pending:
                        meter.update(float(pl), n)
                    pending.clear()
                    logger.info(
                        f"PCN [{epoch}/{cfg.epochs}][{it}/{len(train_loader)}]"
                        f" loss {meter.val:.6f} ({meter.avg:.6f})")
        for pl, n in pending:
            meter.update(float(pl), n)
        pending.clear()
        logger.info(f"epoch {epoch} total {time.time()-tic:.1f}s")
        writer.add_scalar("train/loss", meter.avg, epoch)

        if epoch % cfg.val_freq == 0:
            vmeter = AverageMeter()
            vpending = []  # sync once at the end, not per batch
            for batch in val_loader.epoch_iter(0):
                vpending.append((trainer.eval_step(state, batch),
                                 len(batch["points"])))
            for vl, n in vpending:
                vmeter.update(float(vl), n)
            logger.info(f"val [{epoch}] loss {vmeter.avg:.6f}")
            writer.add_scalar("val/loss", vmeter.avg, epoch)
        save_checkpoint(cfg.log_dir, epoch, state, save_freq=cfg.save_freq,
                        current_freq=5, force=epoch == int(cfg.epochs))
    writer.close()


if __name__ == "__main__":
    main()
