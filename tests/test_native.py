"""Native host-ops library vs numpy/scipy oracles."""
import numpy as np
import pytest

from deep3dpointclouddenoising_tpu.ops.subsample import grid_subsample_numpy
from deep3dpointclouddenoising_tpu.utils import native


requires_native = pytest.mark.skipif(not native.native_available(),
                                     reason="native library not built")


@requires_native
def test_grid_subsample_matches_numpy(rng):
    pts = rng.random((500, 3), dtype=np.float32)
    feats = rng.random((500, 4), dtype=np.float32)
    labels = rng.integers(0, 3, 500).astype(np.int32)

    n_pts, n_feats, n_labels = native.grid_subsample(
        pts, 0.15, features=feats, labels=labels)
    o_pts, o_feats, o_labels = grid_subsample_numpy(
        pts, 0.15, features=feats, labels=labels)

    assert n_pts.shape == o_pts.shape
    np.testing.assert_allclose(n_pts, o_pts, atol=1e-5)
    np.testing.assert_allclose(n_feats, o_feats, atol=1e-5)
    np.testing.assert_array_equal(n_labels, o_labels)


@requires_native
def test_grid_subsample_points_only(rng):
    pts = rng.random((200, 3), dtype=np.float32)
    got = native.grid_subsample(pts, 0.3)
    want = grid_subsample_numpy(pts, 0.3)
    np.testing.assert_allclose(got, want, atol=1e-5)


@requires_native
def test_radius_query_matches_bruteforce(rng):
    pts = rng.random((1000, 3), dtype=np.float32)
    idx = native.GridIndex(pts, cell=0.1)
    for _ in range(20):
        center = rng.random(3).astype(np.float32)
        radius = 0.05 + 0.3 * rng.random()
        got, total = idx.query_radius_sorted(center, radius)

        d = np.linalg.norm(pts - center, axis=1)
        want = np.nonzero(d <= radius)[0]
        want = want[np.lexsort((want, d[want]))]
        assert total == len(want)
        np.testing.assert_array_equal(np.sort(got), np.sort(want))
        # ascending distance
        dd = d[got]
        assert np.all(np.diff(dd) >= -1e-7)


@requires_native
def test_radius_query_capacity_truncation(rng):
    pts = rng.random((500, 3), dtype=np.float32)
    idx = native.GridIndex(pts, cell=0.2)
    center = np.float32([0.5, 0.5, 0.5])
    full, total = idx.query_radius_sorted(center, 0.4)
    trunc, total2 = idx.query_radius_sorted(center, 0.4, capacity=10)
    assert total2 == total
    np.testing.assert_array_equal(trunc, full[:10])


@requires_native
def test_nearest_query(rng):
    pts = rng.random((300, 3), dtype=np.float32)
    idx = native.GridIndex(pts, cell=0.25)
    for center in [np.float32([0.5, 0.5, 0.5]), np.float32([5.0, 5.0, 5.0])]:
        got = idx.nearest(center)
        want = int(np.argmin(np.linalg.norm(pts - center, axis=1)))
        assert got == want


def test_fallback_matches_native_contract(rng, monkeypatch):
    """scipy-fallback GridIndex gives the same sorted results."""
    monkeypatch.setattr(native, "_load_lib", lambda: None)
    pts = rng.random((200, 3), dtype=np.float32)
    idx = native.GridIndex(pts, cell=0.1)
    center = np.float32([0.4, 0.6, 0.5])
    got, total = idx.query_radius_sorted(center, 0.3, capacity=50)
    d = np.linalg.norm(pts - center, axis=1)
    want = np.nonzero(d <= 0.3)[0]
    want = want[np.lexsort((want, d[want]))][:50]
    np.testing.assert_array_equal(got, want)
    assert idx.nearest(center) == int(np.argmin(d))
