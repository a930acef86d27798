"""OutlierSegmentationDataset + Katz features + voting evaluation."""
import os

import numpy as np
import pytest

from deep3dpointclouddenoising_tpu.data.meshio import write_ply
from deep3dpointclouddenoising_tpu.data.outlier_dataset import (
    OutlierSegmentationDataset,
    compute_katz,
    hpr_visible_indices,
    pad_features_to_3,
    _kfold_splits,
)
from deep3dpointclouddenoising_tpu.evaluate import (
    evaluate_outlier_segmentation)


def make_scan(rng, n=600, n_out=60):
    """Unit-sphere surface points + uniform box outliers, EDF-style labels
    (GT==2 marks outliers)."""
    u = rng.normal(size=(n - n_out, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    outliers = rng.uniform(-1.5, 1.5, size=(n_out, 3))
    pts = np.concatenate([u, outliers]).astype(np.float32)
    gt = np.concatenate([np.zeros(n - n_out), np.full(n_out, 2.0)])
    normals = pts / np.maximum(np.linalg.norm(pts, axis=1, keepdims=True),
                               1e-9)
    intensity = rng.random(n).astype(np.float32) * 255
    order = rng.permutation(n)
    return pts[order], gt[order], normals[order], intensity[order]


@pytest.fixture
def edf_root(tmp_path, rng):
    for i in range(14):
        pts, gt, normals, intensity = make_scan(rng)
        write_ply(str(tmp_path / f"pointcloud_{i:02d}.ply"),
                  [pts, gt, normals, intensity],
                  ["vertex", "GT", "normal", "intensity"])
    return str(tmp_path)


def test_hpr_visibility_sphere(rng):
    """Every point of a sphere shell seen from its center is visible; a
    point pushed well inside is hidden."""
    u = rng.normal(size=(500, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    u[0] *= 2.0  # beyond the shell: occluded from the origin viewpoint
    # small parameter -> small inversion radius -> robust occlusion margins
    vis = hpr_visible_indices(u, parameter=0.5)
    assert 0 not in vis
    assert len(vis) > 300


def test_compute_katz_shapes(rng):
    u = rng.normal(size=(100, 3))
    k = compute_katz(u, [1.0, 2.0])
    assert k.shape == (100, 2)
    assert set(np.unique(k)) <= {0.0, 1.0}


def test_pad_features_to_3():
    f = np.zeros((10, 4), np.float32)
    out = pad_features_to_3(f)
    assert out.shape == (10, 6)
    assert np.all(out[:, :2] == 1.0)


def test_kfold_splits():
    folds = _kfold_splits([f"c{i}" for i in range(13)], 3)
    assert len(folds) == 3
    all_test = sorted(i for _, t in folds for i in t)
    assert all_test == list(range(13))
    for train, test in folds:
        assert not set(train) & set(test)


def test_dataset_patches(edf_root, rng):
    ds = OutlierSegmentationDataset(
        edf_root, "train", dataset_type="EDFS",
        input_features=["normal", "intensity"],
        in_radius=0.8, num_points=128, num_steps=6, num_epochs=2,
        subsampling_parameter=0.0, debug=True, seed=0)
    assert len(ds) == 6
    s = ds[0]
    assert s["points"].shape == (128, 3)
    assert s["mask"].shape == (128,)
    # normal(3) + intensity(1) = 4 -> padded to 6
    assert s["features"].shape == (128, 6)
    assert s["labels"].shape == (128,)
    assert ds.input_features_dim == 6
    # balanced interleave: even slots center on outliers
    lab0 = ds.sub_labels[int(ds.cloud_inds[0])][int(ds.point_inds[0])]
    assert lab0 == 1


def test_dataset_subsampled_projections(edf_root):
    ds = OutlierSegmentationDataset(
        edf_root, "test", dataset_type="EDFS",
        in_radius=0.8, num_points=128, num_steps=4,
        subsampling_parameter=0.1, debug=True, seed=0)
    for c in range(len(ds.clouds_points)):
        proj = ds.projections[c]
        assert proj.shape == (len(ds.clouds_points[c]),)
        assert proj.max() < len(ds.sub_points[c])
    # test split covers the clouds with grid centers
    assert len(ds) == len(ds.point_inds)


def test_voting_evaluation_with_oracle(tmp_path, rng):
    """An oracle predictor must score ~perfectly through the whole voting
    pipeline.  The label is smuggled through the intensity feature channel
    so the oracle can read it from (points, mask, features) alone."""
    for i in range(14):
        pts, gt, normals, _ = make_scan(rng)
        intensity = (gt == 2).astype(np.float32) * 255.0
        write_ply(str(tmp_path / f"pointcloud_{i:02d}.ply"),
                  [pts, gt, normals, intensity],
                  ["vertex", "GT", "normal", "intensity"])

    ds = OutlierSegmentationDataset(
        str(tmp_path), "test", dataset_type="EDFS",
        input_features=["intensity"],
        in_radius=0.8, num_points=128, num_steps=4,
        subsampling_parameter=0.0, debug=True, seed=0)

    def oracle(points, mask, features):
        lab = features[..., -1]  # intensity column (after ones-padding)
        logits = np.zeros((*lab.shape, 2), np.float32)
        logits[..., 1] = lab * 10.0 - 5.0
        logits[..., 0] = -logits[..., 1]
        return logits

    m = evaluate_outlier_segmentation(oracle, ds, batch_size=2)
    assert m["macc"] > 99.0
    assert m["miou"] > 95.0


def test_voting_multi_vote_augmented(tmp_path, rng):
    """num_votes>1 applies batch augmentation on later rounds; an oracle that
    reads labels from features is rotation-invariant, so metrics stay
    perfect."""
    for i in range(14):
        pts, gt, normals, _ = make_scan(rng, n=300, n_out=30)
        intensity = (gt == 2).astype(np.float32) * 255.0
        write_ply(str(tmp_path / f"pointcloud_{i:02d}.ply"),
                  [pts, gt, normals, intensity],
                  ["vertex", "GT", "normal", "intensity"])

    ds = OutlierSegmentationDataset(
        str(tmp_path), "test", dataset_type="EDFS",
        input_features=["intensity"],
        in_radius=0.8, num_points=96, num_steps=4,
        subsampling_parameter=0.0, debug=True, seed=0)

    def oracle(points, mask, features):
        lab = features[..., -1]
        logits = np.zeros((*lab.shape, 2), np.float32)
        logits[..., 1] = lab * 10.0 - 5.0
        logits[..., 0] = -logits[..., 1]
        return logits

    m = evaluate_outlier_segmentation(oracle, ds, batch_size=2, num_votes=3)
    assert m["macc"] > 99.0


def test_batch_transforms_shapes(rng):
    from deep3dpointclouddenoising_tpu.data.transforms import (
        BatchPointcloudRandomRotate, BatchPointcloudScaleAndJitter)
    pc = rng.random((2, 10, 3), dtype=np.float32)
    rot = BatchPointcloudRandomRotate()(pc, rng)
    assert rot.shape == pc.shape
    # rotations preserve norms
    np.testing.assert_allclose(np.linalg.norm(rot, axis=-1),
                               np.linalg.norm(pc, axis=-1), rtol=1e-5)
    sj = BatchPointcloudScaleAndJitter(std=0.0, clip=0.0)(pc, rng)
    assert sj.shape == pc.shape
