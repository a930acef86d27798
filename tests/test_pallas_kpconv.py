"""Fused Pallas KPConv aggregation vs the jnp oracle (interpret mode on the
CPU backend)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep3dpointclouddenoising_tpu.ops.pallas_kpconv import (
    kpconv_aggregate,
    kpconv_aggregate_reference,
)


def make_inputs(rng, B=2, M=50, K=7, C=12, P=15, N=60):
    features = rng.normal(size=(B, N, C)).astype(np.float32)
    idx = rng.integers(0, N, size=(B, M, K)).astype(np.int32)
    rel = (rng.random((B, M, K, 3), dtype=np.float32) * 2 - 1) * 0.1
    mask = (rng.random((B, M, K)) > 0.3).astype(np.float32)
    kpoints = (rng.random((P, 3), dtype=np.float32) * 2 - 1) * 0.08
    kw = rng.normal(size=(P, C)).astype(np.float32) * 0.1
    return (jnp.asarray(features), jnp.asarray(idx), jnp.asarray(rel),
            jnp.asarray(mask), jnp.asarray(kpoints), jnp.asarray(kw))


def gather(features, idx):
    B, M, K = idx.shape
    C = features.shape[-1]
    return jnp.take_along_axis(
        features, idx.reshape(B, M * K)[..., None], axis=1
    ).reshape(B, M, K, C)


@pytest.mark.parametrize("influence", ["linear", "gaussian", "constant"])
def test_fused_matches_oracle(rng, influence):
    features, idx, rel, mask, kpoints, kw = make_inputs(rng)
    extent = 0.12
    want = kpconv_aggregate_reference(gather(features, idx), rel, mask,
                                      kpoints, kw, extent=extent,
                                      influence=influence)
    got = kpconv_aggregate(features, idx, rel, mask, kpoints, kw,
                           extent, influence, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_fused_tile_boundary(rng):
    # M not divisible by the tile size exercises grid padding
    features, idx, rel, mask, kpoints, kw = make_inputs(rng, M=131)
    want = kpconv_aggregate_reference(gather(features, idx), rel, mask,
                                      kpoints, kw, extent=0.1,
                                      influence="linear")
    got = kpconv_aggregate(features, idx, rel, mask, kpoints, kw,
                           0.1, "linear", True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_fused_gradients_match_oracle(rng):
    features, idx, rel, mask, kpoints, kw = make_inputs(rng, B=1, M=20, K=5,
                                                        C=8)
    extent = 0.12

    def loss_fused(f, w):
        out = kpconv_aggregate(f, idx, rel, mask, kpoints, w, extent,
                               "linear", True)
        return jnp.sum(out * out)

    def loss_ref(f, w):
        out = kpconv_aggregate_reference(gather(f, idx), rel, mask, kpoints,
                                         w, extent=extent, influence="linear")
        return jnp.sum(out * out)

    gf = jax.grad(loss_fused, argnums=(0, 1))(features, kw)
    gr = jax.grad(loss_ref, argnums=(0, 1))(features, kw)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)


def test_model_pallas_path_matches_jnp(rng):
    """The full PseudoGrid model forward with use_pallas forced on (interpret
    on CPU) matches the jnp path."""
    from deep3dpointclouddenoising_tpu.config import default_config
    from deep3dpointclouddenoising_tpu.models.build import (
        OffsetRegressionModel)

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
    cfg.use_pallas = 0

    xyz = jnp.asarray(rng.random((2, 64, 3), dtype=np.float32) * 2 - 1)
    mask = jnp.ones((2, 64), jnp.float32)
    feats = xyz

    model = OffsetRegressionModel(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), xyz, mask, feats,
                           train=False)
    out_jnp = model.apply(variables, xyz, mask, feats, train=False)

    cfg2 = cfg.copy()
    cfg2.use_pallas = 1
    model2 = OffsetRegressionModel(cfg=cfg2)
    out_pl = model2.apply(variables, xyz, mask, feats, train=False)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_jnp),
                               rtol=5e-4, atol=5e-5)


def test_fused_gradients_tile_boundary(rng):
    """Gradients with M not divisible by the tile size (exercises the
    backward kernel's padded-row masking)."""
    features, idx, rel, mask, kpoints, kw = make_inputs(rng, B=2, M=131,
                                                        K=5, C=8, N=40)
    extent = 0.12

    def loss_fused(f, w):
        out = kpconv_aggregate(f, idx, rel, mask, kpoints, w, extent,
                               "linear", True)
        return jnp.sum(out * out)

    def loss_ref(f, w):
        out = kpconv_aggregate_reference(gather(f, idx), rel, mask, kpoints,
                                         w, extent=extent, influence="linear")
        return jnp.sum(out * out)

    gf = jax.grad(loss_fused, argnums=(0, 1))(features, kw)
    gr = jax.grad(loss_ref, argnums=(0, 1))(features, kw)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_pallas_mode_work_gating():
    """'auto' dispatch: fused kernel only on TPU and only when the layer's
    M*K*C work amortizes the kernel's fixed cost; explicit 0/1 overrides."""
    from deep3dpointclouddenoising_tpu.config import default_config
    from deep3dpointclouddenoising_tpu.models.local_aggregation import (
        _FUSE_MIN_WORK, _pallas_mode)

    cfg = default_config()
    assert getattr(cfg, "use_pallas", "auto") == "auto"
    # on the CPU test backend, auto is always off (work is B*M*K*C)
    assert _pallas_mode(cfg, _FUSE_MIN_WORK * 2)[0] is False
    assert _pallas_mode(cfg, _FUSE_MIN_WORK // 2)[0] is False
    # explicit override forces the fused path (interpret mode on CPU)
    cfg.use_pallas = 1
    use, interpret = _pallas_mode(cfg, 1)
    assert use and interpret
    cfg.use_pallas = 0
    assert _pallas_mode(cfg, 10**9)[0] is False


def test_influence_gradient_finite_at_zero_distance():
    """sqrt'(0)=inf used to poison gradients that flow through the geometry
    (GAN G-step: D(points + G(points)) differentiates the discriminator's
    pyramid w.r.t. the generated points; the query point coincides exactly
    with the fixed center kernel point, sq==0).  The where-guarded sqrt
    must give a finite (zero) subgradient there with the forward value
    unchanged."""
    import jax

    from deep3dpointclouddenoising_tpu.ops.pallas_kpconv import \
        _influence_weights

    def f(rel):
        sq = jnp.sum(rel * rel, axis=-1)
        return jnp.sum(_influence_weights(sq, 1.0, "linear"))

    rel = jnp.zeros((4, 3))
    assert float(f(rel)) == 4.0  # forward: weight 1 at distance 0
    g = jax.grad(f)(rel)
    assert np.all(np.isfinite(np.asarray(g)))

    # mixed zero/nonzero distances: finite everywhere, correct where d>0
    rel2 = jnp.array([[0.0, 0.0, 0.0], [0.3, 0.0, 0.0]])
    g2 = jax.grad(lambda r: jnp.sum(_influence_weights(
        jnp.sum(r * r, -1), 1.0, "linear")))(rel2)
    assert np.all(np.isfinite(np.asarray(g2)))
    np.testing.assert_allclose(np.asarray(g2)[1], [-1.0, 0.0, 0.0],
                               atol=1e-6)
