#!/usr/bin/env python
"""Outlier-segmentation training on full labeled scans (EDF / PCN-outliers).

TPU-native equivalent of training build_scene_segmentation on
OutlierSegmentationDataset (the reference drives this through
train_dist.py-style loops over outlier_segmentation_dataset.py patches).

Usage:
  python scripts/train_outlier_seg.py --config_file cfgs/outlier_seg_edf.yaml \
      --data_root <scans> [--dataset_type EDFS]
"""
from __future__ import annotations

import time

from _common import base_parser, setup, train_epoch


def main():
    p = base_parser("Outlier segmentation training")
    p.add_argument("--dataset_type", type=str, default=None,
                   help="EDFM | EDFS | EDFS{K}f{i} | PCN")
    args = p.parse_args()
    cfg, logger = setup(args)
    cfg.num_classes = 2
    dataset_type = args.dataset_type or str(cfg.datasets)

    import jax

    from deep3dpointclouddenoising_tpu.data.loader import BatchLoader
    from deep3dpointclouddenoising_tpu.data.outlier_dataset import \
        OutlierSegmentationDataset
    from deep3dpointclouddenoising_tpu.data.transforms import \
        build_train_transforms
    from deep3dpointclouddenoising_tpu.models import build_scene_segmentation
    from deep3dpointclouddenoising_tpu.train import Trainer
    from deep3dpointclouddenoising_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint)
    from deep3dpointclouddenoising_tpu.utils.logger import MetricsWriter
    from deep3dpointclouddenoising_tpu.utils.metrics import AverageMeter

    transforms = build_train_transforms(cfg)
    common = dict(
        dataset_type=dataset_type, input_features=list(cfg.features),
        katz_params=list(cfg.katz_params), katz_type=cfg.katz_type,
        subsampling_parameter=float(cfg.sampleDl),
        in_radius=cfg.in_radius, num_points=cfg.num_points,
        debug=bool(cfg.DEBUG), seed=cfg.rng_seed)
    train_ds = OutlierSegmentationDataset(
        cfg.data_root, "train", num_steps=cfg.num_steps,
        num_epochs=cfg.epochs, transforms=transforms, **common)
    val_ds = OutlierSegmentationDataset(
        cfg.data_root, "val", num_steps=cfg.num_steps, num_epochs=1,
        **common)
    cfg.input_features_dim = train_ds.input_features_dim
    train_loader = BatchLoader(train_ds, cfg.batch_size, drop_last=True)
    val_loader = BatchLoader(val_ds, cfg.batch_size, drop_last=False)

    model, loss_fn = build_scene_segmentation(cfg)
    trainer = Trainer(cfg, model, loss_fn,
                      n_iter_per_epoch=len(train_loader),
                      loss_mode="segmentation")

    rng = jax.random.PRNGKey(cfg.rng_seed)
    example = next(iter(train_loader.epoch_iter(0)))
    logger.info("initializing train state (first device dispatch)...")
    state = trainer.init_state(rng, example)
    logger.info("train state initialized; compiling the train step...")
    if cfg.load_path:
        state = load_checkpoint(cfg.load_path, state)
        logger.info(f"resumed from {cfg.load_path}")

    writer = MetricsWriter(cfg.log_dir)
    for epoch in range(int(cfg.start_epoch), int(cfg.epochs) + 1):
        tic = time.time()
        state, train_loss = train_epoch(trainer, train_loader, state, rng,
                                        epoch, cfg, logger, label="Seg")
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
