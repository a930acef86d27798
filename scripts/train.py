#!/usr/bin/env python
"""Offset-regression training CLI.

TPU-native equivalent of /root/reference/u_net_arch/train_dist.py: same
config surface (YAML + overrides + derived geometry), but the runtime is a
single-controller jitted train step over a device mesh instead of one
process per GPU with DDP.

Usage:
  python scripts/train.py --config_file cfgs/l1.yaml --data_root <shapes>
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from deep3dpointclouddenoising_tpu.config import load_config
from deep3dpointclouddenoising_tpu.data.loader import (
    BatchLoader, chunk_batches, device_prefetch)
from deep3dpointclouddenoising_tpu.data.offset_dataset import OffsetDataset
from deep3dpointclouddenoising_tpu.data.transforms import \
    build_train_transforms
from deep3dpointclouddenoising_tpu.models import build_offset_regression
from deep3dpointclouddenoising_tpu.train import Trainer
from deep3dpointclouddenoising_tpu.utils.checkpoint import (
    latest_epoch_checkpoint, load_checkpoint, save_checkpoint)
from deep3dpointclouddenoising_tpu.utils.compile_cache import \
    enable_persistent_cache
from deep3dpointclouddenoising_tpu.utils.logger import (
    MetricsWriter, setup_logger)
from deep3dpointclouddenoising_tpu.utils.metrics import AverageMeter
from deep3dpointclouddenoising_tpu.utils.profiling import device_trace


def parse_args():
    p = argparse.ArgumentParser("Offset regression training")
    p.add_argument("--config_file", type=str, required=True)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--batch_size", type=int)
    p.add_argument("--num_points", type=int)
    p.add_argument("--width", type=int,
                   help="override the model width (debug/CI runs)")
    p.add_argument("--num_steps", type=int)
    p.add_argument("--base_learning_rate", type=float)
    p.add_argument("--weight_decay", type=float)
    p.add_argument("--epochs", type=int)
    p.add_argument("--start_epoch", type=int)
    p.add_argument("--load_path", type=str, default="")
    p.add_argument("--load_weights_path", type=str, default="",
                   help="warm-start MODEL weights (params + batch stats) "
                   "from a checkpoint while keeping a fresh optimizer/"
                   "lr-schedule state — cross-regime fine-tuning (e.g. "
                   "diverse_stable from the diverse flagship)")
    p.add_argument("--auto_resume", action="store_true",
                   help="if <log_dir>/current exists, restore the full "
                   "train state from it and continue from the epoch after "
                   "the last completed one (derived from the restored "
                   "step counter) — lets a supervisor relaunch a run that "
                   "a backend hang killed without losing progress")
    p.add_argument("--log_dir", type=str, default="log")
    p.add_argument("--rng_seed", type=int, default=0)
    p.add_argument("--DEBUG", type=int, default=0)
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler device trace of the first "
                   "training epoch into this directory")
    p.add_argument("--platform", type=str, default=None,
                   help="force a JAX platform (e.g. 'cpu' for debug runs; "
                   "the env-var JAX_PLATFORMS is overridden by the "
                   "container's TPU bootstrap, so this uses a post-import "
                   "config update)")
    # multi-host (pod / multi-slice) launch: run this script once per host
    # (the reference's torch.distributed.launch equivalent,
    # train_dist.py:499-518); on Cloud TPU pods all three are auto-detected,
    # so `--multihost` alone suffices
    p.add_argument("--multihost", action="store_true",
                   help="join a multi-host JAX job "
                   "(jax.distributed.initialize) before building the mesh")
    p.add_argument("--coordinator_address", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.multihost or args.coordinator_address:
        from deep3dpointclouddenoising_tpu.parallel import \
            initialize_multihost
        initialize_multihost(args.coordinator_address, args.num_processes,
                             args.process_id)
    from deep3dpointclouddenoising_tpu.parallel import is_coordinator
    enable_persistent_cache()
    overrides = {k: v for k, v in vars(args).items()
                 if v is not None and k in
                 ("batch_size", "num_points", "width", "num_steps", "epochs",
                  "start_epoch", "base_learning_rate", "weight_decay",
                  "load_path", "log_dir", "rng_seed", "DEBUG")}
    cfg = load_config(args.config_file, overrides)
    if args.data_root:
        cfg.data_root = args.data_root
    cfg.log_dir = os.path.join(args.log_dir, cfg.experiment_name or "run")
    os.makedirs(cfg.log_dir, exist_ok=True)
    logger = setup_logger(cfg.log_dir)
    logger.info(f"jax backend: {jax.default_backend()} "
                f"devices: {jax.device_count()}")
    logger.info(json.dumps({k: str(v) for k, v in cfg.items()}, indent=1))

    transforms = build_train_transforms(cfg)
    common = dict(
        in_radius=cfg.in_radius, num_points=cfg.num_points,
        noise_type=cfg.noise_type, noise_level=cfg.noise_level,
        num_points_per_shape=cfg.num_points_per_shape,
        outlier_proportion=cfg.outlier_percentage,
        fourier_features=bool(cfg.fourier_features),
        diverse_levels=list(cfg.diverse_levels) or None,
        debug=bool(cfg.DEBUG), seed=cfg.rng_seed)
    train_ds = OffsetDataset(cfg.data_root, "train", num_steps=cfg.num_steps,
                             num_epochs=cfg.epochs, transforms=transforms,
                             **common)
    val_ds = OffsetDataset(cfg.data_root, "val", num_steps=cfg.num_steps,
                           num_epochs=1, **common)
    logger.info(f"train patches: {len(train_ds)}, val: {len(val_ds)}")

    n_proc = jax.process_count()
    if n_proc > 1 and cfg.device_sampler:
        raise NotImplementedError(
            "device_sampler keeps whole clouds resident per chip and is "
            "single-host; multi-host jobs use the host batch pipeline")
    # multi-host: every host builds the identical (seeded) epoch table and
    # keeps only its batch/n_proc rows; a ragged final val batch cannot be
    # split evenly, so multi-host drops it (DistributedSampler semantics)
    train_loader = BatchLoader(train_ds, cfg.batch_size, drop_last=True)
    val_loader = BatchLoader(val_ds, cfg.batch_size,
                             drop_last=(n_proc > 1))

    def _localized(it_):
        if n_proc == 1:
            yield from it_
            return
        from deep3dpointclouddenoising_tpu.parallel import process_slice
        for b in it_:
            sl = process_slice(len(b["points"]))
            yield {k: v[sl] for k, v in b.items()}

    model, loss_fn = build_offset_regression(cfg)
    trainer = Trainer(cfg, model, loss_fn, n_iter_per_epoch=len(train_loader))

    rng = jax.random.PRNGKey(cfg.rng_seed)
    example = next(iter(train_loader.epoch_iter(0)))
    # liveness breadcrumbs: init + the first jitted step can take minutes on
    # a cold remote compile cache, and the supervisor watches this log's
    # mtime — stay audibly alive through the silent startup phase
    logger.info("initializing train state (first device dispatch)...")
    state = trainer.init_state(rng, example)
    logger.info("train state initialized; compiling the train step...")

    if cfg.load_path:
        state = load_checkpoint(cfg.load_path, state)
        logger.info(f"resumed from {cfg.load_path} at step {int(state.step)}")
    elif args.load_weights_path and not (
            args.auto_resume
            and (os.path.isdir(os.path.join(cfg.log_dir, "current"))
                 or latest_epoch_checkpoint(cfg.log_dir))):
        # warm start (weights only, fresh optimizer + schedule); ANY
        # existing auto-resume state — `current` OR a periodic
        # ckpt_epoch_N (a kill can interrupt the `current` save itself) —
        # takes precedence so a supervised relaunch keeps fine-tune
        # progress instead of silently restarting from the donor weights
        from deep3dpointclouddenoising_tpu.utils.checkpoint import \
            load_weights
        state = load_weights(args.load_weights_path, state)
        logger.info(f"warm-started weights from {args.load_weights_path}")
    elif args.auto_resume:
        # prefer `current` (every epoch), fall back to the newest
        # ckpt_epoch_N — a kill can interrupt the `current` save itself
        # (leaving only an .orbax-checkpoint-tmp), and losing the periodic
        # checkpoint too would defeat the supervisor's whole purpose
        current = os.path.join(cfg.log_dir, "current")
        if not os.path.isdir(current):
            current = latest_epoch_checkpoint(cfg.log_dir)
        if current:
            state = load_checkpoint(current, state)
            # checkpoints are written at epoch end, so the restored step
            # count is a whole number of epochs
            cfg.start_epoch = int(state.step) // len(train_loader) + 1
            logger.info(f"auto-resumed from {current} at step "
                        f"{int(state.step)} -> start_epoch "
                        f"{cfg.start_epoch}")

    norm_factor = cfg.in_radius / 100.0
    writer = MetricsWriter(cfg.log_dir)
    chunk_size = int(cfg.steps_per_dispatch or 0)

    sampler = cloud_data = sampled_step = None
    if cfg.device_sampler:
        # on-device patch extraction: clouds upload once, the train scan
        # samples its own batches, host sends (S, B, 2) int32 centers
        from deep3dpointclouddenoising_tpu.data.device_sampler import (
            DeviceSampler, build_sampled_train_chunk)
        sampler = DeviceSampler(train_ds, cfg)
        cloud_data = sampler.cloud_data()
        sampled_step = build_sampled_train_chunk(trainer, sampler)
        logger.info("device sampler: clouds resident on device, "
                    f"chunk={max(chunk_size, 1)} steps/dispatch")

    if n_proc > 1:
        # Fence startup rank skew away from the first device collective:
        # dataset cache builds, checkpoint restores, and the first XLA
        # compile all run at per-rank speed (minutes of skew on a shared
        # host), while the CPU backend's Gloo context init — triggered by
        # the FIRST collective — has a ~30 s deadline.  So: compile the
        # step executable LOCALLY first (AOT lower/compile runs no
        # collectives), then align every rank at a coordination-service
        # barrier, then start stepping.  The reference's DDP constructor
        # is the same fence (train_dist.py:375 blocks until all ranks).
        from deep3dpointclouddenoising_tpu.parallel import host_barrier
        logger.info("multihost: precompiling the train step...")
        ex_local = next(_localized(iter([example])))
        if chunk_size > 1:
            # match the REAL first-chunk shape (short epochs yield ragged
            # chunks smaller than steps_per_dispatch) or the precompiled
            # executable is never the one the loop runs
            s_pre = min(chunk_size, len(train_loader))
            ex_chunk = {k: np.stack([np.asarray(v)] * s_pre)
                        for k, v in ex_local.items()}
            trainer._jit_train_chunk.lower(
                state, trainer.shard_chunk(ex_chunk),
                trainer.put_replicated(rng)).compile()
        else:
            trainer._jit_train.lower(
                state, trainer.shard_batch(ex_local),
                trainer.put_replicated(rng)).compile()
        logger.info("multihost: train step compiled; waiting at the "
                    "startup barrier...")
        host_barrier("startup")
        logger.info("multihost: all ranks aligned")

    for epoch in range(int(cfg.start_epoch), int(cfg.epochs) + 1):
        tic = time.time()
        meter, batch_meter = AverageMeter(), AverageMeter()
        end = time.time()
        trace_dir = args.profile_dir if (args.profile_dir
                                         and epoch == int(cfg.start_epoch)) \
            else None
        def _normed(it_):
            for b in it_:
                if cfg.norm:  # train_dist.py:322-326
                    for k in ("points", "offsets", "features"):
                        b[k] = b[k] / norm_factor
                yield b

        step_base = (epoch - 1) * len(train_loader)
        pending = []  # un-synced device loss scalars
        with device_trace(trace_dir):
            if sampler is not None:
                centers = sampler.centers(epoch - 1, int(cfg.batch_size))
                step = max(chunk_size, 1)
                it = 0
                for lo in range(0, centers.shape[0], step):
                    ch = centers[lo: lo + step]
                    state, losses = sampled_step(
                        state, ch, cloud_data, rng)
                    it += ch.shape[0]
                    for lv in np.asarray(losses):  # syncs this chunk
                        meter.update(float(lv), int(cfg.batch_size))
                    batch_meter.update((time.time() - end) / ch.shape[0])
                    end = time.time()
                    logger.info(
                        f"Train [{epoch}/{cfg.epochs}]"
                        f"[{it}/{len(train_loader)}] "
                        f"T {batch_meter.val:.3f} ({batch_meter.avg:.3f}) "
                        f"loss {meter.val:.4f} ({meter.avg:.4f})")
            elif chunk_size > 1:
                # scan-based dispatch: S steps per jit call, batches stacked
                # host-side and transferred once — per-step RNG folds on the
                # global step counter inside the scan (identical streams to
                # the per-step path below)
                chunks = device_prefetch(
                    chunk_batches(_localized(_normed(
                        train_loader.epoch_iter(epoch - 1))), chunk_size), trainer.chunk_sharding)
                it = 0
                for chunk in chunks:
                    s = int(chunk["points"].shape[0])
                    state, losses = trainer.train_chunk(state, chunk, rng)
                    it += s
                    for lv in np.asarray(losses):  # syncs this chunk
                        meter.update(float(lv), int(cfg.batch_size))
                    batch_meter.update((time.time() - end) / s)
                    end = time.time()
                    logger.info(
                        f"Train [{epoch}/{cfg.epochs}]"
                        f"[{it}/{len(train_loader)}] "
                        f"T {batch_meter.val:.3f} ({batch_meter.avg:.3f}) "
                        f"loss {meter.val:.4f} ({meter.avg:.4f})")
            else:
                batches = device_prefetch(_localized(_normed(
                    train_loader.epoch_iter(epoch - 1))),
                    trainer.batch_sharding)
                for it, batch in enumerate(batches):
                    # step counter tracked on host: reading state.step (and
                    # float(loss)) every iteration forces a device sync per
                    # step, serializing host batch prep with device compute
                    step_rng = jax.random.fold_in(rng, step_base + it)
                    state, loss = trainer.train_step(state, batch, step_rng)
                    pending.append((loss, len(batch["points"])))
                    batch_meter.update(time.time() - end)
                    end = time.time()
                    if it % cfg.print_freq == 0:
                        jax.block_until_ready(loss)  # periodic sync point
                        for pl, n in pending:
                            meter.update(float(pl), n)
                        pending.clear()
                        logger.info(
                            f"Train [{epoch}/{cfg.epochs}]"
                            f"[{it}/{len(train_loader)}] "
                            f"T {batch_meter.val:.3f} ({batch_meter.avg:.3f}) "
                            f"loss {meter.val:.4f} ({meter.avg:.4f})")
            for pl, n in pending:
                meter.update(float(pl), n)
            pending.clear()
        jax.block_until_ready(state.params)
        logger.info(f"epoch {epoch} total {time.time()-tic:.1f}s "
                    f"lr {float(trainer.lr_schedule(int(state.step))):.6f} "
                    f"wall {1e3*batch_meter.avg:.1f}ms/step")
        if is_coordinator():
            writer.add_scalar("train/loss", meter.avg, epoch)
            writer.add_scalar("train/lr",
                              float(trainer.lr_schedule(int(state.step))),
                              epoch)

        if epoch % cfg.val_freq == 0:
            vmeter = AverageMeter()
            vpending = []  # sync once at the end, not per batch
            for batch in _localized(val_loader.epoch_iter(0)):
                if cfg.norm:
                    for k in ("points", "offsets", "features"):
                        batch[k] = batch[k] / norm_factor
                vpending.append((trainer.eval_step(state, batch),
                                 len(batch["points"])))
            for vl, n in vpending:
                vmeter.update(float(vl), n)
            logger.info(f"val [{epoch}] loss {vmeter.avg:.4f}")
            if is_coordinator():
                writer.add_scalar("val/loss", vmeter.avg, epoch)

        # NOT rank-gated: orbax save is a collective in multi-host jobs
        # (cross-process commit barrier); its primary-host logic already
        # writes each replicated array exactly once
        save_checkpoint(cfg.log_dir, epoch, state, save_freq=cfg.save_freq,
                        current_freq=5, force=epoch == int(cfg.epochs))

    if n_proc > 1:
        # align ranks before process teardown: the fast rank exiting tears
        # down its side of the distributed runtime while the slow rank may
        # still be inside a collective ("Shutdown barrier has failed")
        from deep3dpointclouddenoising_tpu.parallel import host_barrier
        jax.block_until_ready(state.params)
        host_barrier("shutdown")


if __name__ == "__main__":
    main()
