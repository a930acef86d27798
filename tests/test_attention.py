"""Attention local-aggregation zoo: every variant builds, runs, is finite.

The reference dispatch (local_aggregation_operators.py:17-91) supports 10
attention types plus the Point-transformer vector-attention operator.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep3dpointclouddenoising_tpu.config import default_config
from deep3dpointclouddenoising_tpu.models.local_aggregation import (
    LocalAggregation)
from deep3dpointclouddenoising_tpu.models.pyramid import build_pyramid

ATTENTION_TYPES = ["Non-local", "Criss-cross", "SE", "CBAM",
                   "Dual-attention", "A-SCN", "Point-attention", "CAA",
                   "Offset-attention", "Point-transformer"]


@pytest.fixture(scope="module")
def geometry():
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.random((2, 48, 3), dtype=np.float32) * 2 - 1)
    mask = jnp.ones((2, 48), jnp.float32)
    pyr = build_pyramid(xyz, mask, radius=0.4, sample_dl=0.1,
                        nsamples=[8], npoints=[], build_self=False,
                        build_up=False)
    feats = jnp.asarray(rng.normal(size=(2, 48, 16)).astype(np.float32))
    return pyr.levels[0], feats


@pytest.mark.parametrize("atype", ATTENTION_TYPES)
def test_attention_variant(geometry, atype):
    level, feats = geometry
    cfg = default_config()
    cfg.local_aggregation_type = "attention"
    cfg.attention.type = atype
    op = LocalAggregation(16, 16, 0.4, cfg)
    variables = op.init(jax.random.PRNGKey(0), feats, level.self_nbr,
                        level.mask, False)
    out = op.apply(variables, feats, level.self_nbr, level.mask, False)
    assert out.shape == (2, 48, 16)
    assert np.all(np.isfinite(np.asarray(out)))
