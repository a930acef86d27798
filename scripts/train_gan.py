#!/usr/bin/env python
"""Adversarial fine-tuning of the offset U-Net.

TPU-native equivalent of /root/reference/u_net_arch/train_dist_GAN.py:
generator = offset-regression U-Net, discriminator = ResNet encoder +
discriminator head; D sees concat(clean, generated-denoised) with
BCE x ALPHA=0.01, G loss = ALPHA*BCE(D(fake), real) + task loss,
5% label-flip noise on the G step.

Usage:
  python scripts/train_gan.py --config_file cfgs/gan.yaml --data_root <shapes>
"""
from __future__ import annotations

import os
import time

from _common import auto_resume_state, base_parser, setup


def main():
    p = base_parser("GAN fine-tuning")
    p.add_argument("--load_path_generator", type=str, default="")
    p.add_argument("--load_path_discriminator", type=str, default="")
    args = p.parse_args()
    cfg, logger = setup(args)

    import jax
    import numpy as np

    from deep3dpointclouddenoising_tpu.data.loader import (
        BatchLoader, chunk_batches, device_prefetch)
    from deep3dpointclouddenoising_tpu.data.offset_dataset import \
        OffsetDataset
    from deep3dpointclouddenoising_tpu.data.transforms import \
        build_train_transforms
    from deep3dpointclouddenoising_tpu.models import (
        build_discriminator, build_offset_regression)
    from deep3dpointclouddenoising_tpu.train.gan import GANTrainer
    from deep3dpointclouddenoising_tpu.utils.checkpoint import (
        load_weights, save_checkpoint)
    from deep3dpointclouddenoising_tpu.utils.logger import MetricsWriter
    from deep3dpointclouddenoising_tpu.utils.metrics import AverageMeter

    transforms = build_train_transforms(cfg)
    train_ds = OffsetDataset(
        cfg.data_root, "train", in_radius=cfg.in_radius,
        num_points=cfg.num_points, num_steps=cfg.num_steps,
        num_epochs=cfg.epochs, noise_type=cfg.noise_type,
        noise_level=cfg.noise_level,
        num_points_per_shape=cfg.num_points_per_shape,
        outlier_proportion=cfg.outlier_percentage, transforms=transforms,
        fourier_features=bool(cfg.fourier_features),
        debug=bool(cfg.DEBUG), seed=cfg.rng_seed)
    train_loader = BatchLoader(train_ds, cfg.batch_size, drop_last=True)

    generator, gen_loss = build_offset_regression(cfg)
    discriminator, _ = build_discriminator(cfg)
    trainer = GANTrainer(cfg, generator, gen_loss, discriminator,
                         n_iter_per_epoch=len(train_loader),
                         freeze_generator=bool(cfg.freeze_gen))

    rng = jax.random.PRNGKey(cfg.rng_seed)
    example = next(iter(train_loader.epoch_iter(0)))
    logger.info("initializing G/D states (first device dispatch)...")
    gen_state, disc_state = trainer.init_states(rng, example)
    logger.info("states initialized; compiling the GAN steps...")
    if args.auto_resume and os.path.isdir(
            os.path.join(cfg.log_dir, "generator")):
        # a prior (possibly killed) run of THIS experiment exists: restore
        # both blocks' full states; --load_path_* below only seeds weights
        gen_state, start = auto_resume_state(
            os.path.join(cfg.log_dir, "generator"), gen_state,
            len(train_loader), logger)
        disc_state, _ = auto_resume_state(
            os.path.join(cfg.log_dir, "discriminator"), disc_state,
            len(train_loader), logger)
        if start is not None:
            cfg.start_epoch = start
    else:
        if args.load_path_generator:
            gen_state = load_weights(args.load_path_generator, gen_state)
            logger.info(
                f"generator resumed from {args.load_path_generator}")
        if args.load_path_discriminator:
            disc_state = load_weights(args.load_path_discriminator,
                                      disc_state)
            logger.info(
                f"discriminator resumed from {args.load_path_discriminator}")

    writer = MetricsWriter(cfg.log_dir)
    for epoch in range(int(cfg.start_epoch), int(cfg.epochs) + 1):
        tic = time.time()
        meters = {k: AverageMeter() for k in
                  ("err_g", "err_g1", "err_g2", "err_d", "disc_accuracy")}
        step_base = (epoch - 1) * len(train_loader)
        pending = []  # un-synced device metrics (per-step float() reads
        # serialize host batch prep with device compute)
        chunk_size = int(cfg.steps_per_dispatch or 0)
        if chunk_size > 1:
            # scan-based dispatch (see scripts/train.py): per-step RNG folds
            # on the disc step counter inside the scan, from an epoch-mixed
            # base key (the per-step path mixes the epoch into the fold
            # index instead — streams differ but stay decorrelated)
            epoch_rng = jax.random.fold_in(rng, 7919 * epoch)
            it = 0
            for chunk in device_prefetch(chunk_batches(
                    train_loader.epoch_iter(epoch - 1), chunk_size)):
                s = int(chunk["points"].shape[0])
                gen_state, disc_state, metrics = trainer.update_chunk(
                    gen_state, disc_state, chunk, epoch_rng)
                it += s
                for k, m in meters.items():
                    for v in np.asarray(metrics[k]):
                        m.update(float(v), int(cfg.batch_size))
                logger.info(
                    f"GAN [{epoch}/{cfg.epochs}][{it}/{len(train_loader)}] "
                    + " ".join(f"{k} {m.avg:.4f}" for k, m in meters.items()))
        else:
            for it, batch in enumerate(train_loader.epoch_iter(epoch - 1)):
                step_rng = jax.random.fold_in(rng, step_base + it
                                              + 7919 * epoch)
                gen_state, disc_state, metrics = trainer.update(
                    gen_state, disc_state, batch, step_rng)
                pending.append((metrics, len(batch["points"])))
                if it % cfg.print_freq == 0:
                    for mt, n in pending:
                        for k, m in meters.items():
                            m.update(float(mt[k]), n)
                    pending.clear()
                    logger.info(
                        f"GAN [{epoch}/{cfg.epochs}][{it}/{len(train_loader)}]"
                        " " + " ".join(f"{k} {m.avg:.4f}"
                                       for k, m in meters.items()))
        for mt, n in pending:
            for k, m in meters.items():
                m.update(float(mt[k]), n)
        pending.clear()
        logger.info(f"epoch {epoch} total {time.time()-tic:.1f}s")
        for k, m in meters.items():
            writer.add_scalar(f"train/{k}", m.avg, epoch)
        # per-block checkpoints (train_dist_GAN.py:291-303)
        save_checkpoint(os.path.join(cfg.log_dir, "generator"), epoch,
                        gen_state, save_freq=cfg.save_freq, current_freq=5,
                        force=epoch == int(cfg.epochs))
        save_checkpoint(os.path.join(cfg.log_dir, "discriminator"), epoch,
                        disc_state, save_freq=cfg.save_freq, current_freq=5,
                        force=epoch == int(cfg.epochs))
    writer.close()


if __name__ == "__main__":
    main()
