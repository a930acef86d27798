#!/usr/bin/env python
"""Full-cleaning training: joint offset regression + outlier detection.

TPU-native equivalent of /root/reference/u_net_arch/train_offset_outliers.py:
a 4-dim head (3 offset dims with tanh, 1 outlierness dim with sigmoid), loss
= loss_offset + loss_outliers * in_radius (:325), losses
``L1_classification`` / ``Weighted_L1_classification`` / ``double_weight``.

Usage:
  python scripts/train_full_cleaning.py --config_file cfgs/cleaning_double_w.yaml \
      --data_root <shapes>
"""
from __future__ import annotations

import time

from _common import base_parser, setup, train_epoch


def main():
    args = base_parser("Full cleaning (offsets + outliers)").parse_args()
    cfg, logger = setup(args)

    import jax

    from deep3dpointclouddenoising_tpu.data.loader import BatchLoader
    from deep3dpointclouddenoising_tpu.data.offset_dataset import \
        OffsetDataset
    from deep3dpointclouddenoising_tpu.data.transforms import \
        build_train_transforms
    from deep3dpointclouddenoising_tpu.models import build_complete_denoising
    from deep3dpointclouddenoising_tpu.train import Trainer
    from deep3dpointclouddenoising_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint)
    from deep3dpointclouddenoising_tpu.utils.logger import MetricsWriter
    from deep3dpointclouddenoising_tpu.utils.metrics import AverageMeter

    transforms = build_train_transforms(cfg)
    common = dict(
        in_radius=cfg.in_radius, num_points=cfg.num_points,
        noise_type=cfg.noise_type, noise_level=cfg.noise_level,
        num_points_per_shape=cfg.num_points_per_shape,
        outlier_proportion=cfg.outlier_percentage,
        fourier_features=bool(cfg.fourier_features),
        debug=bool(cfg.DEBUG), seed=cfg.rng_seed)
    train_ds = OffsetDataset(cfg.data_root, "train", num_steps=cfg.num_steps,
                             num_epochs=cfg.epochs, transforms=transforms,
                             **common)
    val_ds = OffsetDataset(cfg.data_root, "val", num_steps=cfg.num_steps,
                           num_epochs=1, **common)
    train_loader = BatchLoader(train_ds, cfg.batch_size, drop_last=True)
    val_loader = BatchLoader(val_ds, cfg.batch_size, drop_last=False)

    model, loss_fn = build_complete_denoising(cfg)
    trainer = Trainer(cfg, model, loss_fn,
                      n_iter_per_epoch=len(train_loader),
                      loss_mode="full_cleaning")

    rng = jax.random.PRNGKey(cfg.rng_seed)
    example = next(iter(train_loader.epoch_iter(0)))
    logger.info("initializing train state (first device dispatch)...")
    state = trainer.init_state(rng, example)
    logger.info("train state initialized; compiling the train step...")
    if cfg.load_path:
        state = load_checkpoint(cfg.load_path, state)
        logger.info(f"resumed from {cfg.load_path} at step {int(state.step)}")

    writer = MetricsWriter(cfg.log_dir)
    for epoch in range(int(cfg.start_epoch), int(cfg.epochs) + 1):
        tic = time.time()
        state, train_loss = train_epoch(trainer, train_loader, state, rng,
                                        epoch, cfg, logger)
        logger.info(f"epoch {epoch} total {time.time()-tic:.1f}s")
        writer.add_scalar("train/loss", train_loss, epoch)

        if epoch % cfg.val_freq == 0:
            vmeter = AverageMeter()
            vpending = []  # sync once at the end, not per batch
            for batch in val_loader.epoch_iter(0):
                vpending.append((trainer.eval_step(state, batch),
                                 len(batch["points"])))
            for vl, n in vpending:
                vmeter.update(float(vl), n)
            logger.info(f"val [{epoch}] loss {vmeter.avg:.4f}")
            writer.add_scalar("val/loss", vmeter.avg, epoch)
        save_checkpoint(cfg.log_dir, epoch, state, save_freq=cfg.save_freq,
                        current_freq=5, force=epoch == int(cfg.epochs))
    writer.close()


if __name__ == "__main__":
    main()
