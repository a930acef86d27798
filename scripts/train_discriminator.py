#!/usr/bin/env python
"""Discriminator pre-training: clean vs raw-noisy classification.

TPU-native equivalent of /root/reference/u_net_arch/train_discriminator.py:
the discriminator is trained to separate clean clouds (points + gt offsets)
from the raw noisy points (NOT generator output, :419); validation reports
thresholded accuracy (:433-435).

Usage:
  python scripts/train_discriminator.py --config_file cfgs/discriminator.yaml \
      --data_root <shapes>
"""
from __future__ import annotations

import time

from _common import auto_resume_state, base_parser, setup


def main():
    args = base_parser("Discriminator pre-training").parse_args()
    cfg, logger = setup(args)

    import jax

    from deep3dpointclouddenoising_tpu.data.loader import BatchLoader
    from deep3dpointclouddenoising_tpu.data.offset_dataset import \
        OffsetDataset
    from deep3dpointclouddenoising_tpu.models import (
        build_discriminator, build_offset_regression)
    from deep3dpointclouddenoising_tpu.train.gan import GANTrainer
    from deep3dpointclouddenoising_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint)
    from deep3dpointclouddenoising_tpu.utils.logger import MetricsWriter
    from deep3dpointclouddenoising_tpu.utils.metrics import AverageMeter

    common = dict(
        in_radius=cfg.in_radius, num_points=cfg.num_points,
        noise_type=cfg.noise_type, noise_level=cfg.noise_level,
        num_points_per_shape=cfg.num_points_per_shape,
        outlier_proportion=cfg.outlier_percentage,
        fourier_features=bool(cfg.fourier_features),
        debug=bool(cfg.DEBUG), seed=cfg.rng_seed)
    train_ds = OffsetDataset(cfg.data_root, "train", num_steps=cfg.num_steps,
                             num_epochs=cfg.epochs, **common)
    val_ds = OffsetDataset(cfg.data_root, "val", num_steps=cfg.num_steps,
                           num_epochs=1, **common)
    train_loader = BatchLoader(train_ds, cfg.batch_size, drop_last=True)
    val_loader = BatchLoader(val_ds, cfg.batch_size, drop_last=False)

    generator, gen_loss = build_offset_regression(cfg)
    discriminator, _ = build_discriminator(cfg)
    trainer = GANTrainer(cfg, generator, gen_loss, discriminator,
                         n_iter_per_epoch=len(train_loader))

    rng = jax.random.PRNGKey(cfg.rng_seed)
    example = next(iter(train_loader.epoch_iter(0)))
    logger.info("initializing discriminator state (first device dispatch)...")
    _, disc_state = trainer.init_states(rng, example)
    logger.info("state initialized; compiling the pretrain step...")
    writer = MetricsWriter(cfg.log_dir)
    if cfg.load_path:
        disc_state = load_checkpoint(cfg.load_path, disc_state)
        logger.info(f"resumed from {cfg.load_path}")
    elif args.auto_resume:
        disc_state, start = auto_resume_state(cfg.log_dir, disc_state,
                                              len(train_loader), logger)
        if start is not None:
            cfg.start_epoch = start

    for epoch in range(int(cfg.start_epoch), int(cfg.epochs) + 1):
        tic = time.time()
        meter = AverageMeter()
        step_base = (epoch - 1) * len(train_loader)
        pending = []  # un-synced device losses (syncing per step serializes
        # host batch prep with device compute)
        chunk_size = int(cfg.steps_per_dispatch or 0)
        if chunk_size > 1:
            # scan-based dispatch: S steps per jit call (see scripts/train.py)
            import numpy as np

            from deep3dpointclouddenoising_tpu.data.loader import (
                chunk_batches, device_prefetch)
            it = 0
            for chunk in device_prefetch(chunk_batches(
                    train_loader.epoch_iter(epoch - 1), chunk_size)):
                s = int(chunk["points"].shape[0])
                disc_state, losses = trainer.pretrain_chunk(disc_state,
                                                            chunk, rng)
                it += s
                for lv in np.asarray(losses):
                    meter.update(float(lv), int(cfg.batch_size))
                logger.info(
                    f"D [{epoch}/{cfg.epochs}][{it}/{len(train_loader)}] "
                    f"loss {meter.val:.4f} ({meter.avg:.4f})")
        else:
            for it, batch in enumerate(train_loader.epoch_iter(epoch - 1)):
                step_rng = jax.random.fold_in(rng, step_base + it)
                disc_state, loss = trainer.pretrain_step(disc_state, batch,
                                                         step_rng)
                pending.append((loss, len(batch["points"])))
                if it % cfg.print_freq == 0:
                    for pl, n in pending:
                        meter.update(float(pl), n)
                    pending.clear()
                    logger.info(
                        f"D [{epoch}/{cfg.epochs}][{it}/{len(train_loader)}] "
                        f"loss {meter.val:.4f} ({meter.avg:.4f})")
        for pl, n in pending:
            meter.update(float(pl), n)
        pending.clear()
        logger.info(f"epoch {epoch} total {time.time()-tic:.1f}s")
        writer.add_scalar("train/loss", meter.avg, epoch)

        if epoch % cfg.val_freq == 0:
            acc = AverageMeter()
            for batch in val_loader.epoch_iter(0):
                acc.update(float(trainer.pretrain_accuracy(disc_state,
                                                           batch)),
                           len(batch["points"]))
            logger.info(f"val [{epoch}] accuracy {acc.avg:.4f}")
            writer.add_scalar("val/accuracy", acc.avg, epoch)
        save_checkpoint(cfg.log_dir, epoch, disc_state,
                        save_freq=cfg.save_freq, current_freq=5,
                        force=epoch == int(cfg.epochs))
    writer.close()


if __name__ == "__main__":
    main()
