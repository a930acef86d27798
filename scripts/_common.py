"""Shared CLI plumbing for the training/eval entry points.

The reference repeats argument parsing + derived-geometry in every script
(train_dist.py:49-199 = evaluate_dist.py:106-118 = ...); here it lives once.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OVERRIDE_KEYS = ("batch_size", "num_points", "width", "num_steps", "epochs",
                 "start_epoch", "base_learning_rate", "weight_decay",
                 "load_path", "log_dir", "rng_seed", "DEBUG")


def base_parser(name: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(name)
    p.add_argument("--config_file", type=str, required=True)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--batch_size", type=int)
    p.add_argument("--num_points", type=int)
    p.add_argument("--width", type=int,
                   help="override the model width (debug/sweep runs)")
    p.add_argument("--num_steps", type=int)
    p.add_argument("--base_learning_rate", type=float)
    p.add_argument("--weight_decay", type=float)
    p.add_argument("--epochs", type=int)
    p.add_argument("--start_epoch", type=int)
    p.add_argument("--load_path", type=str, default="")
    p.add_argument("--log_dir", type=str, default="log")
    p.add_argument("--rng_seed", type=int, default=0)
    p.add_argument("--DEBUG", type=int, default=0)
    p.add_argument("--platform", type=str, default=None,
                   help="force a JAX platform (e.g. 'cpu' for debug runs; "
                   "the env-var JAX_PLATFORMS is overridden by the "
                   "container's TPU bootstrap, so this is applied as a "
                   "post-import config update)")
    p.add_argument("--auto_resume", action="store_true",
                   help="restore the full train state from "
                   "<log_dir>/current (fallback: the newest ckpt_epoch_N) "
                   "and continue from the epoch after the last completed "
                   "one — lets scripts/supervise.py relaunch a run that a "
                   "backend hang killed without losing progress")
    return p


def auto_resume_state(log_dir: str, state, steps_per_epoch: int, logger):
    """Restore ``state`` from ``<log_dir>/current`` (or the newest periodic
    ``ckpt_epoch_N`` if the ``current`` save itself was interrupted) and
    derive the next epoch from the restored step counter.  Returns
    ``(state, start_epoch)``; ``start_epoch`` is None when there is nothing
    to resume from."""
    from deep3dpointclouddenoising_tpu.utils.checkpoint import (
        latest_epoch_checkpoint, load_checkpoint)
    current = os.path.join(log_dir, "current")
    if not os.path.isdir(current):
        current = latest_epoch_checkpoint(log_dir)
    if not current:
        return state, None
    state = load_checkpoint(current, state)
    # checkpoints are written at epoch end → restored step count is a whole
    # number of epochs
    start_epoch = int(state.step) // steps_per_epoch + 1
    logger.info(f"auto-resumed from {current} at step {int(state.step)} "
                f"-> start_epoch {start_epoch}")
    return state, start_epoch


def setup(args):
    """Apply platform override, load config, create log dir + logger."""
    import jax

    from deep3dpointclouddenoising_tpu.config import load_config
    from deep3dpointclouddenoising_tpu.utils.compile_cache import \
        enable_persistent_cache
    from deep3dpointclouddenoising_tpu.utils.logger import setup_logger

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    enable_persistent_cache()
    overrides = {k: v for k, v in vars(args).items()
                 if v is not None and k in OVERRIDE_KEYS}
    cfg = load_config(args.config_file, overrides)
    if args.data_root:
        cfg.data_root = args.data_root
    cfg.log_dir = os.path.join(args.log_dir, cfg.experiment_name or "run")
    os.makedirs(cfg.log_dir, exist_ok=True)
    logger = setup_logger(cfg.log_dir)
    logger.info(f"jax backend: {jax.default_backend()} "
                f"devices: {jax.device_count()}")
    logger.info(json.dumps({k: str(v) for k, v in cfg.items()}, indent=1))
    return cfg, logger


def train_epoch(trainer, train_loader, state, rng, epoch, cfg, logger,
                label="Train"):
    """One training epoch over ``train_loader``; scan-based chunked dispatch
    (S steps per jit call, one H2D transfer each — see Trainer.train_chunk)
    when ``cfg.steps_per_dispatch > 1``, reference-style per-step dispatch
    otherwise.  Returns (state, mean_loss)."""
    import jax
    import numpy as np

    from deep3dpointclouddenoising_tpu.data.loader import (
        chunk_batches, device_prefetch)
    from deep3dpointclouddenoising_tpu.utils.metrics import AverageMeter

    meter = AverageMeter()
    n_iter = len(train_loader)
    chunk_size = int(cfg.steps_per_dispatch or 0)
    if chunk_size > 1 and hasattr(trainer, "train_chunk"):
        it = 0
        for chunk in device_prefetch(
                chunk_batches(train_loader.epoch_iter(epoch - 1), chunk_size),
                getattr(trainer, "chunk_sharding", None)):
            s = int(chunk["points"].shape[0])
            state, losses = trainer.train_chunk(state, chunk, rng)
            it += s
            for lv in np.asarray(losses):  # syncs this chunk
                meter.update(float(lv), int(cfg.batch_size))
            logger.info(f"{label} [{epoch}/{cfg.epochs}][{it}/{n_iter}] "
                        f"loss {meter.val:.4f} ({meter.avg:.4f})")
        return state, meter.avg

    step_base = (epoch - 1) * n_iter
    pending = []  # un-synced device losses (syncing per step serializes
    # host batch prep with device compute)
    for it, batch in enumerate(train_loader.epoch_iter(epoch - 1)):
        step_rng = jax.random.fold_in(rng, step_base + it)
        state, loss = trainer.train_step(state, batch, step_rng)
        pending.append((loss, len(batch["points"])))
        if it % cfg.print_freq == 0:
            for pl, n in pending:
                meter.update(float(pl), n)
            pending.clear()
            logger.info(f"{label} [{epoch}/{cfg.epochs}][{it}/{n_iter}] "
                        f"loss {meter.val:.4f} ({meter.avg:.4f})")
    for pl, n in pending:
        meter.update(float(pl), n)
    return state, meter.avg
