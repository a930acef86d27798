"""Orbax checkpointing of the full train state.

Fixes a reference defect on purpose: the reference saves optimizer +
scheduler but never restores them on resume
(/root/reference/u_net_arch/train_dist.py:270-271 are commented out).  Here
resume restores the complete pytree: params, batch stats, optimizer state,
and step.  Layout mirrors the reference's ``current.pth`` + periodic
``ckpt_epoch_N`` files (:279-291).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.PyTreeCheckpointer()


# log_dirs this process has already checkpointed once (see save_checkpoint:
# the FIRST completed epoch of a run always writes `current`)
_first_saved: set = set()


def save_checkpoint(log_dir: str, epoch: int, state: Any,
                    save_freq: int = 10, current_freq: int = 1,
                    force: bool = False) -> None:
    """Save ``current`` + the periodic epoch checkpoint.

    ``current_freq``: write the ``current`` (auto-resume) checkpoint only
    every N epochs.  On the tunneled backend the save's device_get pulls
    the full train state (~120 MB for the flagship) through the relay —
    measured ~7 s/epoch, more than the 5 s train epoch itself — so the
    training entry points save ``current`` every 5 epochs (a stall-kill
    then costs at most 5 epochs of recompute).  ``force`` writes
    unconditionally (final epoch).

    Multi-host: orbax ``save`` is a COLLECTIVE — it runs a cross-process
    commit barrier — so EVERY process must call this (a rank-0 gate
    deadlocks the job at the first epoch end).  The state stays as global
    jax.Arrays in that case: orbax's primary-host logic writes each
    replicated array exactly once, while a device_get'd numpy tree would
    make every host race to write the same files."""
    # the FIRST completed epoch of each run always writes `current`: with
    # current_freq=5 and save_freq=10 a fresh run would otherwise have NO
    # checkpoint until epoch 5, so a stall-kill in that window (exactly
    # what the supervisor exists for) would lose everything, including a
    # --load_weights_path warm start's progress
    first = os.path.abspath(log_dir) not in _first_saved
    periodic = bool(save_freq) and epoch % save_freq == 0
    if not (force or first or periodic
            or epoch % max(int(current_freq), 1) == 0):
        return
    _first_saved.add(os.path.abspath(log_dir))
    ckpt = _checkpointer()
    multihost = jax.process_count() > 1
    if not multihost:
        state = jax.device_get(state)
    log_dir = os.path.abspath(log_dir)
    os.makedirs(log_dir, exist_ok=True)  # e.g. the GAN's per-block subdirs
    # a SIGKILL mid-save (supervisor stall-kill) leaves an
    # *.orbax-checkpoint-tmp dir that a later save may refuse to overwrite —
    # clear stale ones before writing (rank 0 only: racing rmtree against
    # another rank's in-flight save would be the reference's spin-wait bug
    # in reverse)
    if jax.process_index() == 0:
        import shutil
        for name in os.listdir(log_dir):
            if name.endswith(".orbax-checkpoint-tmp"):
                shutil.rmtree(os.path.join(log_dir, name),
                              ignore_errors=True)
    current = os.path.join(log_dir, "current")
    ckpt.save(current, state, force=True)
    if save_freq and epoch % save_freq == 0:
        ckpt.save(os.path.join(os.path.abspath(log_dir),
                               f"ckpt_epoch_{epoch}"), state, force=True)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a state pytree; ``target`` provides structure/dtypes."""
    ckpt = _checkpointer()
    path = os.path.abspath(path)
    if target is not None:
        return ckpt.restore(path, item=jax.device_get(target))
    return ckpt.restore(path)


def load_weights(path: str, state: Any) -> Any:
    """Restore MODEL weights (params + batch stats) into ``state``, keeping
    its optimizer state and step.

    The cross-trainer load: e.g. GAN fine-tuning starts from an
    adam-trained offset checkpoint but optimizes with its own sgd
    (train_dist_GAN.py:404-415 loads per-block model weights only) — a
    full-state restore would fail on the optimizer-tree mismatch.
    """
    raw = load_checkpoint(path)
    return state.replace(params=raw["params"],
                         batch_stats=raw.get("batch_stats", {}))


def latest_epoch_checkpoint(log_dir: str) -> Optional[str]:
    if not os.path.isdir(log_dir):
        return None
    best, best_ep = None, -1
    for name in os.listdir(log_dir):
        if name.startswith("ckpt_epoch_") and \
                not name.endswith(".orbax-checkpoint-tmp"):
            ep = int(name.split("_")[-1])
            if ep > best_ep:
                best, best_ep = os.path.join(log_dir, name), ep
    if best is None and os.path.isdir(os.path.join(log_dir, "current")):
        return os.path.join(log_dir, "current")
    return best
