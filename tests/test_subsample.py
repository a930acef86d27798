"""Tests for masked voxel-grid subsampling against a numpy oracle that
re-derives the reference kernel contract (masked_grid_subsampling_gpu.cu)."""
import numpy as np
import jax.numpy as jnp
import pytest

from deep3dpointclouddenoising_tpu.ops import (
    masked_grid_subsampling,
    grid_subsample_numpy,
)


def oracle_subsample(xyz, mask, npoint, dl):
    """Serial re-derivation of the reference kernel: bbox origin, voxel ids,
    stable-sorted barycenters, LCG shuffle, truncate/pad-by-cycling."""
    valid = mask > 0
    pts = xyz[valid]
    mins = pts.min(axis=0)
    origin = np.floor(mins / dl) * dl
    maxs = pts.max(axis=0)
    nx = int(np.floor((maxs[0] - origin[0]) / dl)) + 1
    ny = int(np.floor((maxs[1] - origin[1]) / dl)) + 1
    cell = np.floor((pts - origin) / dl).astype(np.int64)
    vid = cell[:, 0] + nx * cell[:, 1] + nx * ny * cell[:, 2]
    order = np.argsort(vid, kind="stable")
    svid = vid[order]
    spts = pts[order]
    # group consecutive equal vids
    centroids, seen = [], None
    for v, p in zip(svid, spts):
        if v != seen:
            centroids.append([p.astype(np.float64), 1])
            seen = v
        else:
            centroids[-1][0] = centroids[-1][0] + p
            centroids[-1][1] += 1
    cents = np.stack([c / n for c, n in centroids]).astype(np.float32)
    end = len(cents)
    # LCG shuffle
    keys = np.empty(end, dtype=np.int64)
    k = svid[0] % 256
    keys[0] = k
    for i in range(1, end):
        k = (17 * k + 139) % 256
        keys[i] = k
    cents = cents[np.argsort(keys, kind="stable")]
    out = np.zeros((npoint, 3), np.float32)
    msk = np.zeros(npoint, np.float32)
    for i in range(npoint):
        out[i] = cents[i] if i < end else cents[i % end]
        msk[i] = 1.0 if i < end else 0.0
    return out, msk


@pytest.mark.parametrize("npoint", [8, 40])
def test_grid_subsampling_matches_oracle(rng, npoint):
    B, N = 3, 120
    dl = 0.25
    xyz = rng.random((B, N, 3), dtype=np.float32) * 2 - 1
    mask = np.zeros((B, N), np.float32)
    for b in range(B):
        n_valid = rng.integers(30, N + 1)
        mask[b, :n_valid] = 1
        xyz[b, n_valid:] = xyz[b, 0]  # padding replicates a real point

    sub, smsk = masked_grid_subsampling(
        jnp.asarray(xyz), jnp.asarray(mask), npoint=npoint, sample_dl=dl)
    sub, smsk = np.asarray(sub), np.asarray(smsk)

    for b in range(B):
        ref_sub, ref_msk = oracle_subsample(xyz[b], mask[b], npoint, dl)
        np.testing.assert_array_equal(smsk[b], ref_msk)
        np.testing.assert_allclose(sub[b], ref_sub, rtol=1e-5, atol=1e-6)


def test_grid_subsampling_reduces_density(rng):
    xyz = rng.random((1, 500, 3), dtype=np.float32)
    mask = np.ones((1, 500), np.float32)
    sub, smsk = masked_grid_subsampling(
        jnp.asarray(xyz), jnp.asarray(mask), npoint=200, sample_dl=0.2)
    sub, smsk = np.asarray(sub), np.asarray(smsk)
    n = int(smsk[0].sum())
    assert 1 < n <= 200
    # no two surviving voxel centroids closer than ~0 (distinct voxels)
    pts = sub[0][: n]
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    d += np.eye(n) * 1e9
    assert d.min() > 1e-6


def test_numpy_grid_subsample_barycenter():
    pts = np.array([[0.1, 0.1, 0.1], [0.3, 0.1, 0.1], [2.0, 2.0, 2.0]],
                   np.float32)
    sub = grid_subsample_numpy(pts, 1.0)
    assert sub.shape == (2, 3)
    np.testing.assert_allclose(sorted(sub[:, 0]), [0.2, 2.0], atol=1e-6)

    feats = np.array([[1.0], [3.0], [10.0]], np.float32)
    labels = np.array([0, 1, 1])
    sub, sf, sl = grid_subsample_numpy(pts, 1.0, feats, labels)
    assert sf.shape == (2, 1)
    assert set(np.round(sf[:, 0], 5)) == {2.0, 10.0}
    assert sl.shape == (2,)
