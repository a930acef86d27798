"""Checkpoint round-trip: the FULL train state (params, batch stats,
optimizer moments, step) must survive save/load — the reference drops
optimizer/scheduler state on resume (train_dist.py:270-271); we must not."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep3dpointclouddenoising_tpu.train import Trainer
from deep3dpointclouddenoising_tpu.models.build import build_offset_regression
from deep3dpointclouddenoising_tpu.utils.checkpoint import (
    latest_epoch_checkpoint,
    load_checkpoint,
    save_checkpoint,
)

from test_model import tiny_batch, tiny_config


@pytest.fixture
def trained_state(rng):
    cfg = tiny_config()
    cfg.batch_size = 8  # conftest forces 8 virtual devices; batch shards
    cfg.optimizer = "adam"
    model, loss_fn = build_offset_regression(cfg)
    trainer = Trainer(cfg, model, loss_fn, n_iter_per_epoch=4)
    xyz, mask, feats = tiny_batch(rng, B=8)
    batch = {"points": np.asarray(xyz), "mask": np.asarray(mask),
             "features": np.asarray(feats),
             "offsets": np.zeros((8, 64, 3), np.float32)}
    key = jax.random.PRNGKey(0)
    state = trainer.init_state(key, batch)
    for _ in range(3):  # a few steps so adam moments are nonzero
        state, _ = trainer.train_step(state, batch, key)
    return trainer, state, batch, key


def _assert_tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_roundtrip_full_state(trained_state, tmp_path):
    trainer, state, batch, key = trained_state
    save_checkpoint(str(tmp_path), epoch=3, state=state, save_freq=0)
    restored = load_checkpoint(str(tmp_path / "current"), state)
    _assert_tree_equal(jax.device_get(state), restored)
    assert int(restored.step) == int(state.step)

    # resumed training continues identically to uninterrupted training
    s1, l1 = trainer.train_step(state, batch, key)
    s2, l2 = trainer.train_step(restored, batch, key)
    assert float(l1) == pytest.approx(float(l2), rel=1e-6)
    _assert_tree_equal(jax.device_get(s1.params), jax.device_get(s2.params))


def test_latest_epoch_checkpoint(trained_state, tmp_path):
    trainer, state, _, _ = trained_state
    assert latest_epoch_checkpoint(str(tmp_path)) is None
    save_checkpoint(str(tmp_path), epoch=10, state=state, save_freq=10)
    save_checkpoint(str(tmp_path), epoch=20, state=state, save_freq=10)
    latest = latest_epoch_checkpoint(str(tmp_path))
    assert latest is not None and latest.endswith("ckpt_epoch_20")
    # epoch not on save_freq -> only "current" updated, latest unchanged
    save_checkpoint(str(tmp_path), epoch=21, state=state, save_freq=10)
    assert latest_epoch_checkpoint(str(tmp_path)).endswith("ckpt_epoch_20")


def test_auto_resume_state_helper(trained_state, tmp_path):
    """scripts/_common.auto_resume_state: prefer `current`, fall back to
    the newest periodic ckpt_epoch_N, derive start_epoch from the restored
    step counter (steps are whole epochs at save time)."""
    import logging
    import shutil
    import sys
    sys.path.insert(0, "scripts")
    from _common import auto_resume_state

    trainer, state, batch, key = trained_state
    log = logging.getLogger("test")

    # nothing on disk -> unchanged state, start None
    _, start = auto_resume_state(str(tmp_path), state, 4, log)
    assert start is None

    # state.step is 3 (fixture runs 3 steps); steps_per_epoch=3 -> epoch 1
    save_checkpoint(str(tmp_path), epoch=1, state=state, save_freq=1)
    restored, start = auto_resume_state(str(tmp_path), state, 3, log)
    assert start == 2 and int(restored.step) == int(state.step)

    # `current` gone (interrupted save) -> periodic checkpoint fallback
    shutil.rmtree(str(tmp_path / "current"))
    restored, start = auto_resume_state(str(tmp_path), state, 3, log)
    assert start == 2 and int(restored.step) == int(state.step)


def test_save_into_nonexistent_dir(trained_state, tmp_path):
    """The GAN saves per-block checkpoints into <log_dir>/{generator,
    discriminator} subdirs that nothing creates beforehand
    (scripts/train_gan.py); save_checkpoint must create them."""
    trainer, state, _, _ = trained_state
    target = tmp_path / "generator"
    save_checkpoint(str(target), epoch=1, state=state, save_freq=10)
    restored = load_checkpoint(str(target / "current"), state)
    assert int(restored.step) == int(state.step)


def test_stale_orbax_tmp_dirs_are_ignored_and_cleared(trained_state,
                                                      tmp_path):
    """A SIGKILL mid-save (the supervisor's stall-kill) leaves an
    *.orbax-checkpoint-tmp dir; resume discovery must skip it and the next
    save must clear it rather than fail."""
    trainer, state, _, _ = trained_state
    save_checkpoint(str(tmp_path), epoch=10, state=state, save_freq=10)
    # simulate interrupted saves of both `current` and a periodic ckpt
    (tmp_path / "current.orbax-checkpoint-tmp").mkdir()
    (tmp_path / "ckpt_epoch_20.orbax-checkpoint-tmp").mkdir()
    latest = latest_epoch_checkpoint(str(tmp_path))
    assert latest is not None and latest.endswith("ckpt_epoch_10")
    save_checkpoint(str(tmp_path), epoch=11, state=state, save_freq=10)
    leftovers = [n for n in tmp_path.iterdir()
                 if n.name.endswith(".orbax-checkpoint-tmp")]
    assert leftovers == []
    restored = load_checkpoint(str(tmp_path / "current"), state)
    assert int(restored.step) == int(state.step)
