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


# ---------------------------------------------------------------------------
# Fused patch assembly (d3d_assemble_patch) vs the Python loader semantics.


def _patch_oracle_sets(pts, center, radius, num_points):
    """The distance-sorted in-radius index list (the Python path's query)."""
    d = np.linalg.norm(pts - center, axis=1)
    inds = np.nonzero(d <= radius)[0]
    if len(inds) == 0:
        inds = np.nonzero(d <= 2 * radius)[0]
    return inds[np.lexsort((inds, d[inds]))]


@requires_native
def test_assemble_patch_truncate_invariants(rng):
    pts = rng.random((2000, 3), dtype=np.float32)
    offs = rng.standard_normal((2000, 3)).astype(np.float32)
    labs = rng.integers(0, 2, 2000).astype(np.int32)
    idx = native.GridIndex(pts, cell=0.3)
    center_ind = 7
    center = pts[center_ind]
    num_points = 50

    points, offsets, labels, mask, inds, total = idx.assemble_patch(
        center, center_ind, 0.3, num_points, seed=(3, 11),
        offsets=offs, labels=labs)

    sorted_inds = _patch_oracle_sets(pts, center, 0.3, num_points)
    assert total == len(sorted_inds) and total > num_points
    # the kept set is exactly the num_points closest (ties by index)
    np.testing.assert_array_equal(np.sort(inds),
                                  np.sort(sorted_inds[:num_points]))
    assert inds[0] == center_ind                 # center swapped to slot 0
    assert mask.sum() == num_points              # truncate => all valid
    np.testing.assert_allclose(points, pts[inds] - center, atol=0)
    np.testing.assert_allclose(offsets, offs[inds], atol=0)
    np.testing.assert_array_equal(labels, labs[inds])


@requires_native
def test_assemble_patch_pad_unet_and_pcn(rng):
    pts = rng.random((300, 3), dtype=np.float32)
    idx = native.GridIndex(pts, cell=0.08)
    center_ind = 3
    center = pts[center_ind]
    num_points = 64

    sorted_inds = _patch_oracle_sets(pts, center, 0.08, num_points)
    cur = len(sorted_inds)
    assert 0 < cur < num_points, "test geometry should force padding"

    # U-Net: repetition padding from the in-radius set, shuffled
    points, _, _, mask, inds, total = idx.assemble_patch(
        center, center_ind, 0.08, num_points, seed=(0, 5))
    assert total == cur
    assert mask.sum() == cur and np.all(mask[:cur] == 1.0)
    assert set(inds) == set(sorted_inds)         # pads repeat in-radius pts
    assert inds[0] == center_ind
    np.testing.assert_allclose(points, pts[inds] - center, atol=0)

    # PCN: pads with cloud point 0, unpadded prefix keeps distance order
    _, _, _, mask_p, inds_p, _ = idx.assemble_patch(
        center, center_ind, 0.08, num_points, pcn=True, seed=(0, 5))
    assert np.all(inds_p[cur:] == 0)
    assert np.all(mask_p[cur:] == 0.0)
    # distance order preserved up to the center swap into slot 0
    body = [i for i in inds_p[:cur] if i != center_ind]
    want = [i for i in sorted_inds if i != center_ind]
    np.testing.assert_array_equal(body, want)


@requires_native
def test_assemble_patch_deterministic_stream(rng):
    pts = rng.random((1500, 3), dtype=np.float32)
    idx = native.GridIndex(pts, cell=0.2)
    a = idx.assemble_patch(pts[0], 0, 0.2, 40, seed=(9, 1))
    b = idx.assemble_patch(pts[0], 0, 0.2, 40, seed=(9, 1))
    c = idx.assemble_patch(pts[0], 0, 0.2, 40, seed=(9, 2))
    np.testing.assert_array_equal(a[4], b[4])    # same seed -> same patch
    assert not np.array_equal(a[4], c[4])        # different sample index


@requires_native
def test_assemble_patch_center_outside_cloud(rng):
    """Center-noise can push the pick off any point: slot 0 falls back to
    the closest in-radius point, and an empty query retries at 2r."""
    pts = rng.random((400, 3), dtype=np.float32)
    idx = native.GridIndex(pts, cell=0.15)
    center = np.float32([1.08, 1.08, 1.08])      # just outside the cube
    d = np.linalg.norm(pts - center, axis=1)
    assert (d <= 0.15).sum() == 0                # forces the 2r retry
    points, _, _, _, inds, total = idx.assemble_patch(
        center, -1, 0.15, 16, seed=(0, 0))
    want = _patch_oracle_sets(pts, center, 0.15, 16)
    assert total == len(want)
    assert inds[0] == want[0]                    # closest point in slot 0
    np.testing.assert_allclose(points[0], pts[inds[0]] - center, atol=0)


@requires_native
def test_offset_dataset_native_matches_python_semantics(rng, tmp_path):
    """Dataset-level: the native and Python paths agree on everything that
    is not the (documented, intentionally different) random stream."""
    from deep3dpointclouddenoising_tpu.data.offset_dataset import \
        OffsetDataset
    from deep3dpointclouddenoising_tpu.data.synthetic import make_icosphere

    kw = dict(in_radius=0.3, num_points=64, num_steps=4, num_epochs=1,
              noise_type="gaussian", noise_level=5e-3,
              num_points_per_shape=2000, seed=3,
              shapes={"train/sphere": make_icosphere(2)})
    # separate fresh roots: a shared pickle cache would skip process_off_file
    # for the second dataset and desynchronize its construction rng
    ds_n = OffsetDataset(str(tmp_path / "a"), "train", **kw)
    ds_p = OffsetDataset(str(tmp_path / "b"), "train", native_patches=False,
                         **kw)
    assert ds_n.native_patches
    for i in range(4):
        a, b = ds_n.get(i), ds_p.get(i)
        # same patch-center table => same cloud + same in-radius SET when
        # truncating is off; masks agree; geometry contract agrees
        assert a["cloud_ind"] == b["cloud_ind"]
        assert a["mask"].sum() == b["mask"].sum()
        assert a["input_inds"][0] == b["input_inds"][0]  # same center point
        shape = ds_n.shapes[int(a["cloud_ind"])]
        pick = shape.points[int(b["input_inds"][0])]
        if a["mask"].sum() == len(a["mask"]):  # truncate: identical SET
            np.testing.assert_array_equal(np.sort(a["input_inds"]),
                                          np.sort(b["input_inds"]))
        else:                                  # pad: identical SUPPORT
            assert set(a["input_inds"]) == set(b["input_inds"])


@requires_native
def test_assemble_patch_thread_safe(rng):
    """The fused assembler is called concurrently by BatchLoader's worker
    pool (the C call releases the GIL; scratch is thread_local): concurrent
    results must be identical to serial ones."""
    from concurrent.futures import ThreadPoolExecutor

    pts = rng.random((20000, 3), dtype=np.float32)
    offs = rng.standard_normal((20000, 3)).astype(np.float32)
    labs = rng.integers(0, 2, 20000).astype(np.int32)
    idx = native.GridIndex(pts, cell=0.2)
    centers = rng.integers(0, 20000, 64)

    def one(i):
        return idx.assemble_patch(pts[centers[i]], int(centers[i]), 0.2,
                                  128, seed=(1, i), offsets=offs,
                                  labels=labs)

    serial = [one(i) for i in range(64)]
    with ThreadPoolExecutor(8) as pool:
        threaded = list(pool.map(one, range(64)))
    for s, t in zip(serial, threaded):
        for a, b in zip(s[:5], t[:5]):
            np.testing.assert_array_equal(a, b)
