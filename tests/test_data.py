"""Data-layer tests: mesh IO, sampling, closest-point oracle, dataset
pipeline, transforms."""
import os

import numpy as np
import pytest

from deep3dpointclouddenoising_tpu.data.meshio import (
    TriMesh, load_off, save_off, read_ply, write_ply,
    sample_surface, sample_surface_even, closest_point_on_mesh,
    _closest_point_triangles,
)
from deep3dpointclouddenoising_tpu.data.synthetic import (
    make_icosphere, make_torus)
from deep3dpointclouddenoising_tpu.data.offset_dataset import (
    OffsetDataset, process_off_file)
from deep3dpointclouddenoising_tpu.data.transforms import (
    Compose, PointcloudRandomRotate, PointcloudScaleAndJitter, angle_axis)
from deep3dpointclouddenoising_tpu.data.loader import BatchLoader


def test_off_roundtrip(tmp_path):
    mesh = make_torus(n_major=8, n_minor=6)
    path = str(tmp_path / "torus.off")
    save_off(path, mesh)
    loaded = load_off(path)
    np.testing.assert_allclose(loaded.vertices, mesh.vertices, rtol=1e-6)
    np.testing.assert_array_equal(loaded.faces, mesh.faces)


def test_ply_roundtrip(tmp_path):
    pts = np.random.default_rng(0).random((50, 3)).astype(np.float32)
    scalar = np.arange(50, dtype=np.float32)
    path = str(tmp_path / "t.ply")
    write_ply(path, [pts, scalar], ["vertex", "height"])
    data = read_ply(path)
    np.testing.assert_allclose(data["vertex"], pts, rtol=1e-6)
    np.testing.assert_allclose(data["height"], scalar, rtol=1e-6)


def test_sample_surface_on_sphere(rng):
    mesh = make_icosphere(2)
    pts, fids = sample_surface(mesh, 2000, rng)
    r = np.linalg.norm(pts, axis=1)
    assert np.all(r < 1.001) and np.all(r > 0.9)  # on faceted sphere
    even, _ = sample_surface_even(mesh, 500, rng)
    assert even.shape == (500, 3)


def test_new_synthetic_shapes_are_surfaces(rng):
    from deep3dpointclouddenoising_tpu.data.synthetic import (
        make_box, make_cylinder, make_ellipsoid)
    for mesh in (make_box(4), make_cylinder(16, 6, n_cap=3),
                 make_ellipsoid(2)):
        assert mesh.faces.min() >= 0
        assert mesh.faces.max() < len(mesh.vertices)
        pts, _ = sample_surface_even(mesh, 200, rng)
        _, d = closest_point_on_mesh(mesh, pts)
        assert np.abs(d).max() < 1e-9  # samples lie on the surface


def test_closest_point_matches_bruteforce(rng):
    mesh = make_torus(n_major=16, n_minor=10)
    queries = rng.normal(size=(40, 3)) * 1.5
    closest, d = closest_point_on_mesh(mesh, queries, k_candidates=32)
    # brute force over ALL triangles
    tri = mesh.triangles
    all_cp = _closest_point_triangles(
        queries, np.broadcast_to(tri[None], (len(queries),) + tri.shape))
    d2 = np.sum((all_cp - queries[:, None, :]) ** 2, axis=-1)
    best = d2.min(axis=1) ** 0.5
    np.testing.assert_allclose(d, best, rtol=1e-6, atol=1e-9)


def test_closest_point_on_surface_is_identity(rng):
    mesh = make_icosphere(2)
    pts, _ = sample_surface(mesh, 100, rng)
    closest, d = closest_point_on_mesh(mesh, pts)
    assert np.max(d) < 1e-9


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("shapes"))
    shapes = {"train/sphere": make_icosphere(2),
              "train/torus": make_torus(n_major=16, n_minor=10)}
    return OffsetDataset(
        root, "train", in_radius=0.2, num_points=128, num_steps=4,
        num_epochs=2, noise_type="gaussian", noise_level=5e-3,
        num_points_per_shape=3000, outlier_proportion=0.3, seed=0,
        shapes={k: v for k, v in shapes.items()})


def test_process_off_semantics(rng):
    mesh = make_icosphere(2)
    data = process_off_file(None, 2000, 0.25, "gaussian", 5e-3, rng=rng,
                            mesh=mesh)
    assert data.points.shape == (2000, 3)
    assert data.labels.sum() == 500  # exact outlier count
    assert data.offsets.shape == (2000, 3)
    # inlier offsets are small (noise clipped at 3%), outliers larger
    inl = np.linalg.norm(data.offsets[data.labels == 0], axis=1)
    outl = np.linalg.norm(data.offsets[data.labels == 1], axis=1)
    assert inl.mean() < 0.02
    assert outl.mean() > inl.mean()
    # denoised = noisy + offset lies on the surface
    denoised = data.points + data.offsets
    _, d = closest_point_on_mesh(data.mesh, denoised[:100])
    assert np.max(d) < 1e-6


def test_patch_extraction(tiny_dataset):
    sample = tiny_dataset.get(0, epoch=0)
    assert sample["points"].shape == (128, 3)
    assert sample["mask"].shape == (128,)
    assert sample["features"].shape == (128, 3)
    assert sample["offsets"].shape == (128, 3)
    # mask prefix-contiguous
    m = sample["mask"]
    nz = int(m.sum())
    assert np.all(m[:nz] == 1) and np.all(m[nz:] == 0)
    # balanced interleave: even indices are outlier-centered patches
    # (center in slot 0 carries the sampled class)
    labels0 = tiny_dataset.get(0, epoch=0)["labels"][0]
    labels1 = tiny_dataset.get(1, epoch=0)["labels"][0]
    assert labels0 == 1 and labels1 == 0


def test_patch_center_in_slot0(tiny_dataset):
    s = tiny_dataset.get(2, epoch=1)
    # slot 0 is the pick point => after centering it's ~0 (no center noise)
    np.testing.assert_allclose(s["points"][0], 0.0, atol=1e-5)


def test_batch_loader(tiny_dataset):
    loader = BatchLoader(tiny_dataset, batch_size=2, drop_last=True)
    batches = list(loader.epoch_iter(0))
    assert len(batches) == 2
    assert batches[0]["points"].shape == (2, 128, 3)


def test_transforms_rotate_points_and_offsets(rng):
    pts = rng.random((40, 3)).astype(np.float32)
    offs = rng.random((40, 3)).astype(np.float32) * 0.01
    t = Compose([PointcloudRandomRotate(0, 0, np.pi)])
    stack = np.concatenate([pts, offs], axis=0)
    out = t(stack, np.random.default_rng(3))
    # rotation preserves norms and relative geometry
    np.testing.assert_allclose(np.linalg.norm(out[:40], axis=1),
                               np.linalg.norm(pts, axis=1), rtol=1e-5)
    np.testing.assert_allclose(
        (pts + offs)[:, 2], (out[:40] + out[40:])[:, 2], rtol=1e-4,
        atol=1e-5)  # z preserved under z-rotation for the denoised points


def test_angle_axis_orthonormal():
    R = angle_axis(0.7, np.array([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)


def test_fourier_features_wiring(tmp_path):
    """cleaning_fourier-style configs: dataset emits 64-dim input_mapping
    features, reproducible across dataset instances (same seed -> same
    projection matrix B), and derive_geometry reports dim 64."""
    from deep3dpointclouddenoising_tpu.config import load_config
    from deep3dpointclouddenoising_tpu.data.offset_dataset import (
        OffsetDataset)
    from deep3dpointclouddenoising_tpu.data.synthetic import make_icosphere

    cfg = load_config("cfgs/cleaning_fourier.yaml")
    assert int(cfg.input_features_dim) == 64

    kw = dict(in_radius=0.4, num_points=64, num_steps=2, num_epochs=1,
              noise_type="gaussian", noise_level=5e-3,
              num_points_per_shape=1000, outlier_proportion=0.0,
              fourier_features=True, seed=3,
              shapes={"train/sphere": make_icosphere(2)})
    a = OffsetDataset(str(tmp_path), "train", **kw)
    b = OffsetDataset(str(tmp_path), "train", **kw)
    fa = a.get(0)["features"]
    assert fa.shape[-1] == 64
    # the projection matrix must agree across instances (same seed), so a
    # val/test/inference dataset maps features identically to training
    np.testing.assert_allclose(a.fourier_B, b.fourier_B)


def test_loader_worker_pool_deterministic(tmp_path):
    """Patch assembly uses per-sample rng, so the threaded worker pool
    yields byte-identical batches regardless of num_workers."""
    from deep3dpointclouddenoising_tpu.data.loader import BatchLoader
    from deep3dpointclouddenoising_tpu.data.offset_dataset import (
        OffsetDataset)
    from deep3dpointclouddenoising_tpu.data.synthetic import make_icosphere

    ds = OffsetDataset(
        str(tmp_path), "train", in_radius=0.4, num_points=64, num_steps=8,
        num_epochs=1, noise_type="gaussian", noise_level=5e-3,
        num_points_per_shape=1000, outlier_proportion=0.0, seed=1,
        shapes={"train/sphere": make_icosphere(2)})
    serial = list(BatchLoader(ds, 4, num_workers=1).epoch_iter(0))
    pooled = list(BatchLoader(ds, 4, num_workers=4).epoch_iter(0))
    assert len(serial) == len(pooled) == 2
    for b1, b4 in zip(serial, pooled):
        for k in b1:
            np.testing.assert_array_equal(b1[k], b4[k])


def test_custom_diverse_levels(tmp_path):
    """cfg.diverse_levels overrides the sigma set: diverse_stable
    replicates shapes once per custom level (with matching noise
    magnitudes), diverse mixes only the custom levels per point."""
    from deep3dpointclouddenoising_tpu.data.offset_dataset import (
        OffsetDataset)
    from deep3dpointclouddenoising_tpu.data.synthetic import make_icosphere

    kw = dict(in_radius=0.4, num_points=64, num_steps=2, num_epochs=1,
              num_points_per_shape=1000, outlier_proportion=0.0, seed=5,
              shapes={"train/sphere": make_icosphere(2)})

    ds = OffsetDataset(str(tmp_path), "train", noise_type="diverse_stable",
                       noise_level=5e-3, diverse_levels=[0.05, 0.1, 0.25],
                       **kw)
    assert len(ds.shapes) == 3  # one shape replica per custom level
    rms = sorted(float(np.sqrt((s.offsets ** 2).mean())) for s in ds.shapes)
    # noise magnitude tracks the level (offsets ~ -noise)
    assert rms[0] < rms[1] < rms[2]
    assert rms[2] < 0.5e-2  # max level 0.25% << default max 2.5%

    ds_mix = OffsetDataset(str(tmp_path) + "/mix", "train",
                           noise_type="diverse", noise_level=5e-3,
                           diverse_levels=[0.05, 0.1, 0.25], **kw)
    assert len(ds_mix.shapes) == 1
    off = np.linalg.norm(ds_mix.shapes[0].offsets, axis=1)
    # per-point mix of low sigmas only: the big-offset tail of the default
    # 2.5% bin must be absent
    assert np.quantile(off, 0.99) < 1.5e-2
    # outlier labels use max(levels), not the hardcoded 2.5%
    assert ds_mix.shapes[0].labels.sum() > 0
