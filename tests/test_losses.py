"""Golden-value tests for the loss library against numpy oracles that
re-derive the reference loss definitions."""
import numpy as np
import jax.numpy as jnp
import pytest

from deep3dpointclouddenoising_tpu.losses import (
    chamfer_distance,
    masked_l1_loss,
    masked_offset_loss,
    masked_binary_cross_entropy,
    masked_cross_entropy,
    masked_outlier_loss,
    masked_chamfer_loss,
    masked_chamfer_l1_loss,
    masked_adaptive_l1_chamfer_loss,
    label_smoothing_cross_entropy,
)


def np_masked_l1(pred, target, mask):
    per = np.abs(pred - target).mean(-1)
    return (per * mask).sum() / mask.sum()


def np_chamfer_one(x, y, norm):
    d2 = ((x[:, None] - y[None, :]) ** 2).sum(-1)
    ix = d2.argmin(1)
    iy = d2.argmin(0)
    if norm == "L2":
        cx = d2[np.arange(len(x)), ix]
        cy = d2[iy, np.arange(len(y))]
    else:
        cx = np.abs(x - y[ix]).sum(-1)
        cy = np.abs(y - x[iy]).sum(-1)
    return cx.mean() + cy.mean()


@pytest.fixture
def batch(rng):
    B, N = 3, 40
    pred = rng.normal(size=(B, N, 3)).astype(np.float32) * 0.1
    target = rng.normal(size=(B, N, 3)).astype(np.float32) * 0.1
    points = rng.random((B, N, 3), dtype=np.float32)
    mask = np.ones((B, N), np.float32)
    mask[:, 30:] = 0
    return pred, target, mask, points


def test_masked_l1(batch):
    pred, target, mask, _ = batch
    got = float(masked_l1_loss(jnp.asarray(pred), jnp.asarray(target),
                               jnp.asarray(mask)))
    np.testing.assert_allclose(got, np_masked_l1(pred, target, mask),
                               rtol=1e-5)


def test_masked_offset_loss(batch):
    pred, target, mask, _ = batch
    w = np.clip(1.0 / np.linalg.norm(target, axis=-1, keepdims=True),
                1e-6, 2.0)
    per = (np.abs(pred - target) * w).mean(-1)
    expect = (per * mask).sum() / mask.sum()
    got = float(masked_offset_loss(jnp.asarray(pred), jnp.asarray(target),
                                   jnp.asarray(mask)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


@pytest.mark.parametrize("norm", ["L2", "L1"])
def test_chamfer_distance_masked(rng, norm):
    B = 2
    x = rng.random((B, 30, 3), dtype=np.float32)
    y = rng.random((B, 25, 3), dtype=np.float32)
    xm = np.ones((B, 30), np.float32)
    ym = np.ones((B, 25), np.float32)
    xm[:, 20:] = 0
    ym[:, 18:] = 0
    got = float(chamfer_distance(jnp.asarray(x), jnp.asarray(y),
                                 jnp.asarray(xm), jnp.asarray(ym),
                                 norm_type=norm))
    expect = np.mean([np_chamfer_one(x[b, :20], y[b, :18], norm)
                      for b in range(B)])
    np.testing.assert_allclose(got, expect, rtol=1e-5)


@pytest.mark.parametrize("norm", ["L2", "L1"])
def test_masked_chamfer_loss(batch, norm):
    pred, target, mask, points = batch
    got = float(masked_chamfer_loss(jnp.asarray(pred), jnp.asarray(target),
                                    jnp.asarray(mask), jnp.asarray(points),
                                    norm_type=norm))
    expect = np.mean([
        np_chamfer_one((points + target)[b][mask[b] > 0],
                       (points + pred)[b][mask[b] > 0], norm)
        for b in range(len(mask))])
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_chamfer_l1_and_adaptive(batch):
    pred, target, mask, points = batch
    j = (jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask),
         jnp.asarray(points))
    l1 = np_masked_l1(pred, target, mask)
    cd_l2 = np.mean([np_chamfer_one((points + target)[b][mask[b] > 0],
                                    (points + pred)[b][mask[b] > 0], "L2")
                     for b in range(len(mask))])
    cd_l1 = np.mean([np_chamfer_one((points + target)[b][mask[b] > 0],
                                    (points + pred)[b][mask[b] > 0], "L1")
                     for b in range(len(mask))])
    np.testing.assert_allclose(float(masked_chamfer_l1_loss(*j)),
                               0.5 * (l1 + cd_l2), rtol=1e-5)
    np.testing.assert_allclose(
        float(masked_adaptive_l1_chamfer_loss(*j, converging_to="chamfer")),
        l1 + np.exp(-l1) * cd_l1, rtol=1e-5)
    np.testing.assert_allclose(
        float(masked_adaptive_l1_chamfer_loss(*j, converging_to="L1")),
        cd_l1 + np.exp(-cd_l1) * l1, rtol=1e-5)


def test_masked_bce_and_outlier(rng):
    B, N = 2, 20
    prob = rng.random((B, N), dtype=np.float32) * 0.9 + 0.05
    tgt = (rng.random((B, N)) > 0.5).astype(np.float32)
    mask = np.ones((B, N), np.float32)
    mask[:, 15:] = 0
    per = -(tgt * np.log(prob) + (1 - tgt) * np.log(1 - prob))
    expect = (per * mask).sum() / mask.sum()
    got = float(masked_binary_cross_entropy(jnp.asarray(prob),
                                            jnp.asarray(tgt),
                                            jnp.asarray(mask)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)

    offs = rng.normal(size=(B, N, 3)).astype(np.float32)
    w = np.linalg.norm(offs, axis=-1)
    expect2 = (per * w * mask).sum() / mask.sum()
    got2 = float(masked_outlier_loss(jnp.asarray(prob), jnp.asarray(tgt),
                                     jnp.asarray(offs), jnp.asarray(mask)))
    np.testing.assert_allclose(got2, expect2, rtol=1e-5)


def test_masked_ce_and_label_smoothing(rng):
    B, N, C = 2, 12, 4
    logits = rng.normal(size=(B, N, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(B, N))
    mask = np.ones((B, N), np.float32)
    mask[:, 9:] = 0
    p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    per = -np.log(p[np.arange(B)[:, None], np.arange(N)[None, :], labels])
    expect = (per * mask).sum() / mask.sum()
    got = float(masked_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                     jnp.asarray(mask)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)

    glogits = rng.normal(size=(B, C)).astype(np.float32)
    glabels = np.array([1, 3])
    eps = 0.2
    onehot = np.eye(C)[glabels]
    soft = onehot * (1 - eps) + (1 - onehot) * eps / (C - 1)
    logp = glogits - np.log(np.exp(glogits).sum(-1, keepdims=True))
    expect = (-(soft * logp).sum(-1)).mean()
    got = float(label_smoothing_cross_entropy(jnp.asarray(glogits),
                                              jnp.asarray(glabels)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)
