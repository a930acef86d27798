"""Per-iteration learning-rate schedules as optax schedules.

Mirrors /root/reference/u_net_arch/utils/lr_scheduler.py:65-93: multi-step
decay every ``lr_decay_steps`` epochs (stepped per iteration), cosine
annealing to 1e-6, the milestone-free ``step_PCN`` variant, and the linear
gradual-warmup wrapper (:6-39, warmup from base_lr/multiplier over
``warmup_epoch`` epochs).
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np
import optax


def get_lr_schedule(cfg, n_iter_per_epoch: int,
                    base_lr: float | None = None) -> optax.Schedule:
    base = float(base_lr if base_lr is not None else cfg.base_learning_rate)
    warmup_epoch = max(int(cfg.warmup_epoch), 0)
    warmup_steps = warmup_epoch * n_iter_per_epoch

    name = cfg.lr_scheduler
    if "cosine" in name:
        t_max = max((int(cfg.epochs) - warmup_epoch) * n_iter_per_epoch, 1)
        eta_min = 1e-6

        def after(step):
            # CosineAnnealingLR: eta_min + (base-eta_min)*(1+cos(pi t/T))/2
            t = jnp.minimum(step, t_max)
            return eta_min + (base - eta_min) * 0.5 * (
                1.0 + jnp.cos(jnp.pi * t / t_max))
    elif name == "step":
        decay_epochs = int(cfg.lr_decay_steps)
        rate = float(cfg.lr_decay_rate)
        n_milestones = max(int(cfg.epochs) // decay_epochs - 1, 0)
        boundaries = np.array(
            [(decay_epochs * i - warmup_epoch) * n_iter_per_epoch
             for i in range(1, n_milestones + 1)], dtype=np.int64)

        def after(step):
            k = jnp.sum(step >= jnp.asarray(boundaries)) if len(boundaries) \
                else 0
            return base * (rate ** k)
    elif name == "step_PCN":
        def after(step):
            return jnp.asarray(base)
    else:
        raise NotImplementedError(f"scheduler {name} not supported")

    if warmup_steps <= 0:
        return lambda step: jnp.asarray(after(step), jnp.float32)

    mult = float(cfg.warmup_multiplier)

    def schedule(step):
        warm = base / mult * ((mult - 1.0) * step / warmup_steps + 1.0)
        return jnp.where(step <= warmup_steps, warm,
                         after(step - warmup_steps)).astype(jnp.float32)

    return schedule
