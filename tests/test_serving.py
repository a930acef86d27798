"""Serving-artifact export (serving.py): roundtrip fidelity + metadata.

The artifact must reproduce the in-framework forward exactly (same HLO,
weights baked as constants) after a serialize/deserialize cycle, including
the cfg.norm rescaling and the full-cleaning raw-output contract.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep3dpointclouddenoising_tpu.models.build import (
    build_complete_denoising, build_offset_regression)
from deep3dpointclouddenoising_tpu.serving import (
    artifact_meta, export_denoiser, load_denoiser, make_serving_forward,
    save_artifact)

from test_model import tiny_batch, tiny_config


def _init(model, xyz, mask, feats):
    return model.init(jax.random.PRNGKey(0), xyz, mask, feats, train=False)


@pytest.mark.parametrize("norm", [0, 1])
def test_export_roundtrip_offset(rng, tmp_path, norm):
    cfg = tiny_config(norm=norm)
    model, _ = build_offset_regression(cfg)
    xyz, mask, feats = tiny_batch(rng)
    variables = _init(model, xyz, mask, feats)
    norm_factor = cfg.in_radius / 100.0 if norm else None
    example = {"points": xyz, "mask": mask, "features": feats}

    exported = export_denoiser(model, variables, example,
                               norm_factor=norm_factor)
    path = str(tmp_path / "denoiser.stablehlo")
    save_artifact(exported, path, meta={"test": True})

    predict = load_denoiser(path)
    got = np.asarray(predict(xyz, mask, feats))
    want = np.asarray(jax.jit(make_serving_forward(
        model, variables, norm_factor=norm_factor))(xyz, mask, feats))
    assert got.shape == want.shape == (2, 64, 3)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    meta = artifact_meta(path)
    assert meta["format_version"] == 1
    assert meta["test"] is True
    assert meta["platforms"] == ["cpu"]
    assert len(meta["in_avals"]) == 3


def test_export_full_cleaning_raw_outputs(rng, tmp_path):
    """Full-cleaning artifacts emit RAW 4-channel outputs (tanh/sigmoid are
    applied downstream by clean_clouds; norm scaling must NOT touch them)."""
    cfg = tiny_config(norm=1, num_classes=2)
    model, _ = build_complete_denoising(cfg)
    xyz, mask, feats = tiny_batch(rng)
    variables = _init(model, xyz, mask, feats)
    example = {"points": xyz, "mask": mask, "features": feats}
    norm_factor = cfg.in_radius / 100.0

    exported = export_denoiser(model, variables, example,
                               norm_factor=norm_factor, scale_outputs=False)
    path = str(tmp_path / "cleaner.stablehlo")
    save_artifact(exported, path)
    predict = load_denoiser(path)
    got = np.asarray(predict(xyz, mask, feats))
    assert got.shape == (2, 64, 4)
    # exact (same-HLO) fidelity vs the jitted serving forward
    want_jit = np.asarray(jax.jit(make_serving_forward(
        model, variables, norm_factor=norm_factor,
        scale_outputs=False))(xyz, mask, feats))
    np.testing.assert_allclose(got, want_jit, rtol=1e-6, atol=1e-7)
    # semantics vs the eager forward on pre-scaled inputs; eager-vs-compiled
    # differs by fusion-order float noise (~1e-6 abs on CPU/oneDNN)
    want = np.asarray(model.apply(variables, xyz / norm_factor, mask,
                                  feats / norm_factor, train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_artifact_is_self_contained(rng, tmp_path):
    """Deserialization + execution must not need the model object: the
    weights ride inside the artifact (different-init model gives DIFFERENT
    outputs, proving the weights are baked, not re-bound)."""
    cfg = tiny_config()
    model, _ = build_offset_regression(cfg)
    xyz, mask, feats = tiny_batch(rng)
    v0 = _init(model, xyz, mask, feats)
    v1 = model.init(jax.random.PRNGKey(7), xyz, mask, feats, train=False)
    example = {"points": xyz, "mask": mask, "features": feats}

    p0 = str(tmp_path / "a0.bin")
    p1 = str(tmp_path / "a1.bin")
    save_artifact(export_denoiser(model, v0, example), p0)
    save_artifact(export_denoiser(model, v1, example), p1)
    out0 = np.asarray(load_denoiser(p0)(xyz, mask, feats))
    out1 = np.asarray(load_denoiser(p1)(xyz, mask, feats))
    assert not np.allclose(out0, out1)
    # and each matches its own weights' direct (eager) forward — compiled
    # vs eager carries fusion-order float noise, so tolerance is loose
    np.testing.assert_allclose(
        out1, np.asarray(model.apply(v1, xyz, mask, feats, train=False)),
        rtol=1e-3, atol=1e-5)
