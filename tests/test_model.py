"""Model-level tests: pyramid shapes, forward shapes, jit, gradients."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep3dpointclouddenoising_tpu.config import default_config
from deep3dpointclouddenoising_tpu.models.build import (
    OffsetRegressionModel,
    CompleteDenoisingModel,
    DiscriminatorModel,
    SceneSegmentationModel,
)
from deep3dpointclouddenoising_tpu.models.pyramid import build_pyramid


def tiny_config(**kw):
    cfg = default_config()
    cfg.num_points = 64
    cfg.width = 16
    cfg.depth = 2
    cfg.bottleneck_ratio = 2
    cfg.radius = 0.2
    cfg.sampleDl = 0.05
    cfg.nsamples = [8, 8, 8, 8, 8]
    cfg.npoints = [16, 8, 4, 2]
    cfg.in_radius = 1.0
    cfg.local_aggregation_type = "pseudo_grid"
    cfg.head = "offset_reg_head"
    cfg.input_features_dim = 3
    cfg.num_classes = 2
    for k, v in kw.items():
        cfg[k] = v
    return cfg


def tiny_batch(rng, B=2, N=64):
    xyz = rng.random((B, N, 3), dtype=np.float32) * 2 - 1
    mask = np.ones((B, N), np.float32)
    mask[:, 56:] = 0
    xyz[:, 56:] = xyz[:, :1]  # padding replicates a real point
    feats = xyz.copy()
    return jnp.asarray(xyz), jnp.asarray(mask), jnp.asarray(feats)


def test_pyramid_shapes(rng):
    cfg = tiny_config()
    xyz, mask, _ = tiny_batch(rng)
    pyr = build_pyramid(xyz, mask, radius=cfg.radius, sample_dl=cfg.sampleDl,
                        nsamples=cfg.nsamples, npoints=cfg.npoints)
    assert len(pyr.levels) == 5 and len(pyr.transitions) == 4
    sizes = [64] + cfg.npoints
    for lvl, n in zip(pyr.levels, sizes):
        assert lvl.xyz.shape == (2, n, 3)
        assert lvl.mask.shape == (2, n)
        assert lvl.self_nbr.idx.shape == (2, n, 8)
    for i, tr in enumerate(pyr.transitions):
        assert tr.pool_nbr.idx.shape == (2, sizes[i + 1], 8)
        assert tr.up_idx.shape == (2, sizes[i])
        # subsampled levels keep at least one valid point
        assert np.asarray(pyr.levels[i + 1].mask).sum() > 0


@pytest.mark.parametrize("agg", ["pseudo_grid", "pospool", "pointwisemlp",
                                 "adaptive_weight"])
def test_offset_model_forward(rng, agg):
    cfg = tiny_config(local_aggregation_type=agg)
    if agg == "pospool":
        cfg.pospool.reduction = "avg"
        # pospool 'xyz' embedding needs channels divisible by 3 at every
        # stage (stem = width/2), like the reference (view(B, C//3, 3, ...),
        # local_aggregation_operators.py:145); width 24 -> stem 12.
        cfg.width = 24
    xyz, mask, feats = tiny_batch(rng)
    model = OffsetRegressionModel(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), xyz, mask, feats,
                           train=False)
    out = model.apply(variables, xyz, mask, feats, train=False)
    assert out.shape == (2, 64, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_offset_model_jit_and_grad(rng):
    cfg = tiny_config()
    xyz, mask, feats = tiny_batch(rng)
    model = OffsetRegressionModel(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), xyz, mask, feats,
                           train=False)

    @jax.jit
    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            xyz, mask, feats, train=True, mutable=["batch_stats"])
        return jnp.mean(jnp.abs(out))

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # at least one conv kernel and the KP weights get nonzero gradient
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0


def test_other_task_models(rng):
    xyz, mask, feats = tiny_batch(rng)
    cfg = tiny_config()
    m = CompleteDenoisingModel(cfg=cfg)
    v = m.init(jax.random.PRNGKey(0), xyz, mask, feats)
    assert m.apply(v, xyz, mask, feats).shape == (2, 64, 4)

    m = SceneSegmentationModel(cfg=cfg)
    v = m.init(jax.random.PRNGKey(0), xyz, mask, feats)
    assert m.apply(v, xyz, mask, feats).shape == (2, 64, 2)

    m = DiscriminatorModel(cfg=cfg)
    v = m.init(jax.random.PRNGKey(1), xyz, mask, feats)
    out = m.apply(v, xyz, mask, feats)
    assert out.shape == (2, 1)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))


def test_bfloat16_compute_parity(rng):
    """bfloat16 compute mode stays numerically close to float32 (params and
    BN statistics are float32 in both; only matmul compute dtype changes)."""
    xyz, mask, feats = tiny_batch(rng)
    cfg32 = tiny_config()
    model32 = OffsetRegressionModel(cfg=cfg32)
    variables = model32.init(jax.random.PRNGKey(0), xyz, mask, feats,
                             train=False)
    out32 = np.asarray(model32.apply(variables, xyz, mask, feats,
                                     train=False))

    cfg16 = tiny_config(compute_dtype="bfloat16")
    model16 = OffsetRegressionModel(cfg=cfg16)
    out16 = np.asarray(model16.apply(variables, xyz, mask, feats,
                                     train=False).astype(jnp.float32))
    assert out16.dtype == np.float32 or out16.dtype == np.dtype("float32")
    scale = np.abs(out32).max() + 1e-9
    assert np.abs(out16 - out32).max() / scale < 0.1
    # correlation stays high: same function up to rounding
    c = np.corrcoef(out32.ravel(), out16.ravel())[0, 1]
    assert c > 0.99


def test_remat_matches_no_remat(rng):
    """cfg.remat wraps encoder bottlenecks in jax.checkpoint — pure
    recompute, so loss AND gradients must match the un-remat'd model to
    float tolerance (same params: remat is a transform, not new modules)."""
    xyz, mask, feats = tiny_batch(rng)
    cfg = tiny_config()
    model = OffsetRegressionModel(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), xyz, mask, feats,
                           train=False)
    model_r = OffsetRegressionModel(cfg=tiny_config(remat=1))

    def make_loss(m):
        def loss_fn(params):
            out, _ = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                xyz, mask, feats, train=True, mutable=["batch_stats"])
            return jnp.mean(jnp.abs(out))
        return jax.jit(jax.value_and_grad(loss_fn))

    l0, g0 = make_loss(model)(variables["params"])
    l1, g1 = make_loss(model_r)(variables["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)
