"""Outlier-segmentation dataset: full scans -> radius patches with labels.

Re-implements /root/reference/u_net_arch/outlier_segmentation_dataset.py for
the JAX pipeline:

  * EDF scan datasets (``.ply`` with GT/normal/intensity, :198-221) and the
    PCN outlier dataset (file lists ``trainingset.txt`` / ``validationset.txt``
    / ``testset.txt``, :443-451);
  * Katz hidden-point-removal visibility features (:53-84);
  * optional voxel pre-subsampling of each cloud (:285-291, via the native
    grid subsampler);
  * per-point density from 1-NN cluster counts (:302-309, numpy instead of
    torch_scatter);
  * balanced inlier/outlier patch-center sampling for train/val (:336-351)
    and grid-covered centers for test (:353-366);
  * projection indices mapping full-cloud points onto the (subsampled)
    segmentation output for voting eval (:381-404);
  * K-fold EDF splits (``EDFS{K}f{i}``, :417-441) without the sklearn
    dependency;
  * ``__getitem__`` (:488-576): sorted radius query, pad/truncate with mask,
    random feature drop, transforms; channels-last output dicts.
"""
from __future__ import annotations

import logging
import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..utils.native import GridIndex, grid_subsample
from .meshio import read_ply

logger = logging.getLogger("d3pcd")

EDF_SMALL = [f"pointcloud_{i:02d}" for i in range(14)]
EDF_TEST_EXT = [f"test_pointcloud_{i}" for i in range(13, 21)]


# ---------------------------------------------------------------------------
# Katz visibility (hidden point removal)


def hpr_visible_indices(pos: np.ndarray, parameter: float,
                        ktype: str = "std") -> np.ndarray:
    """Katz et al. hidden-point-removal: indices of points visible from the
    origin (outlier_segmentation_dataset.py:53-68).

    std: spherical inversion with R = max|p| * 10**parameter;
    exp: exponential kernel  dir * (|p|/max|p|)**parameter.
    """
    from scipy.spatial import ConvexHull
    norm = np.linalg.norm(pos, axis=1, keepdims=True)
    norm = np.maximum(norm, 1e-12)
    direction = pos / norm
    if ktype == "std":
        R = norm.max() * 10.0 ** parameter
        pos_hat = pos + 2.0 * (R - norm) * direction
    elif ktype == "exp":
        pos_hat = direction * (norm / norm.max()) ** parameter
    else:
        raise ValueError(f"Unknown katz type {ktype}")
    pos_hat = np.concatenate([pos_hat, np.zeros((1, 3))], axis=0)
    hull = ConvexHull(pos_hat)
    visible = hull.vertices
    return visible[visible != len(pos)]  # drop the origin vertex


def compute_katz(pos: np.ndarray, parameters: Sequence[float],
                 ktype: str = "std") -> np.ndarray:
    """Per-point hidden-ness (1 = hidden, 0 = visible) for each parameter
    (outlier_segmentation_dataset.py:71-84).  Output (N, len(parameters))."""
    cols = []
    for parameter in parameters:
        col = np.ones((len(pos), 1), np.float32)
        col[hpr_visible_indices(pos, parameter, ktype)] = 0.0
        cols.append(col)
    return np.concatenate(cols, axis=1)


def pad_features_to_3(features: np.ndarray) -> np.ndarray:
    """Left-pad feature columns with ones to a multiple of 3
    (get_scene_seg_features, outlier_segmentation_dataset.py:102-109)."""
    dim = features.shape[1]
    rem = abs(3 - dim % 3) % 3
    if rem:
        ones = np.ones((len(features), rem), np.float32)
        features = np.concatenate([ones, features], axis=1)
    return features


def _kfold_splits(items: Sequence[str], num_folds: int):
    """Deterministic contiguous K-fold (replaces sklearn.KFold semantics:
    fold sizes n//k +1 for the first n%k folds)."""
    n = len(items)
    sizes = [n // num_folds + (1 if i < n % num_folds else 0)
             for i in range(num_folds)]
    folds = []
    start = 0
    for s in sizes:
        test_idx = list(range(start, start + s))
        train_idx = [i for i in range(n) if i not in test_idx]
        folds.append((train_idx, test_idx))
        start += s
    return folds


def _read_file_list(path: str) -> List[str]:
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


class OutlierSegmentationDataset:
    """Radius-patch dataset over full labeled scans
    (outlier_segmentation_dataset.py:118-576)."""

    def __init__(self, data_root: str, split: str = "train", *,
                 dataset_type: str = "EDFS",
                 input_features: Sequence[str] = (),
                 katz_params: Sequence[float] = (),
                 katz_type: str = "std",
                 subsampling_parameter: float = 0.0,
                 in_radius: float = 2.0, num_points: int = 15000,
                 num_steps: int = 500, num_epochs: int = 1,
                 feature_drop: float = 0.0, transforms=None,
                 debug: bool = False, seed: int = 0,
                 native_patches: bool = True):
        self.split = split
        self.native_patches = native_patches \
            and os.environ.get("D3D_DISABLE_NATIVE") != "1"
        self.dataset_type = dataset_type
        self.input_features = list(input_features)
        self.katz_params = list(katz_params)
        self.katz_type = katz_type
        self.subsampling_parameter = subsampling_parameter
        self.in_radius = in_radius
        self.num_points = num_points
        self.num_steps = num_steps
        self.num_epochs = num_epochs
        self.feature_drop = feature_drop
        self.transforms = transforms
        self.epoch = 0
        self.rng = np.random.default_rng(seed)
        self._sample_seed = 0 if seed is None else int(seed)
        self.label_to_names = {0: "inlier", 1: "outlier"}

        dim = 0
        for f in self.input_features:
            if f == "normal":
                dim += 3
            if "katz" in f:
                dim += len(self.katz_params)
            if f == "intensity":
                dim += 1
        self.raw_features_dim = dim if dim > 0 else 3
        self.input_features_dim = (self.raw_features_dim
                                   + abs(3 - self.raw_features_dim % 3) % 3)

        self.data_root = data_root
        self.data_dir = os.path.join(data_root, "processed")
        os.makedirs(self.data_dir, exist_ok=True)

        self.cloud_names = self._resolve_split(split, debug)

        # per-cloud state
        self.clouds_points: List[np.ndarray] = []
        self.clouds_features: List[np.ndarray] = []
        self.clouds_labels: List[np.ndarray] = []
        self.sub_points: List[np.ndarray] = []
        self.sub_features: List[np.ndarray] = []
        self.sub_labels: List[np.ndarray] = []
        self.sub_density: List[np.ndarray] = []
        self.sub_indexes: List[GridIndex] = []
        for i, name in enumerate(self.cloud_names):
            self._load_cloud(name)
            # heartbeat per cloud: an uncached EDF load + subsample can take
            # minutes, and the stall supervisor watches log-file mtime
            logger.info(f"{split}: cloud {i + 1}/{len(self.cloud_names)} "
                        f"({name}) loaded")

        self._build_patch_table()
        logger.info(f"{split}: patch table ready")
        self._build_projections()
        logger.info(f"{split}: projections built")

    # -- splits -------------------------------------------------------------
    def _resolve_split(self, split: str, debug: bool) -> List[str]:
        t = self.dataset_type
        if t == "EDFM":
            train, val, test = (EDF_SMALL[:11], EDF_SMALL[11:], EDF_TEST_EXT)
        elif t == "EDFS":
            train, val, test = (EDF_SMALL[:9], EDF_SMALL[9:11],
                                EDF_SMALL[11:])
        elif t.startswith("EDFS") and "f" in t:
            num_folds, fold_id = (int(x) for x in t[4:].split("f"))
            folds = _kfold_splits(EDF_SMALL[:-1], num_folds)
            train_idx, test_idx = folds[fold_id]
            # first two train folds become val; the last ("difficult") scan
            # is appended to train (outlier_segmentation_dataset.py:436-438)
            train = [EDF_SMALL[i] for i in train_idx[2:]] + [EDF_SMALL[-1]]
            val = [EDF_SMALL[i] for i in train_idx[:2]]
            test = [EDF_SMALL[i] for i in test_idx]
        elif t == "PCN":
            train_dir = os.path.join(self.data_root, "outliers_TRAIN_W_NOR")
            test_dir = os.path.join(self.data_root, "outliers_TEST_W_NOR")
            train = [os.path.join("outliers_TRAIN_W_NOR", n) for n in
                     _read_file_list(os.path.join(train_dir,
                                                  "trainingset.txt"))]
            val = [os.path.join("outliers_TRAIN_W_NOR", n) for n in
                   _read_file_list(os.path.join(train_dir,
                                                "validationset.txt"))]
            test = [os.path.join("outliers_TEST_W_NOR", n) for n in
                    _read_file_list(os.path.join(test_dir, "testset.txt"))]
        else:
            raise ValueError(f"Unknown dataset type {t}")

        table = {"train": train, "val": val, "test": test}
        names = table.get(split, val + train)
        if debug:
            names = names[:2]
        return names

    # -- per-cloud processing ----------------------------------------------
    def _load_cloud(self, name: str) -> None:
        tag = name.replace(os.sep, "_")
        cache = os.path.join(self.data_dir, f"{tag}.pkl")
        if os.path.exists(cache):
            with open(cache, "rb") as f:
                points, intensity, normals, labels = pickle.load(f)
        else:
            ply = read_ply(os.path.join(self.data_root, name + ".ply"))
            points = ply["vertex"]
            if "normal" in ply:
                normals = ply["normal"]
            elif "nx" in ply:
                normals = np.stack([ply["nx"], ply["ny"], ply["nz"]], axis=1)
            elif "normal_0" in ply:
                normals = np.stack([ply["normal_0"], ply["normal_1"],
                                    ply["normal_2"]], axis=1)
            else:
                normals = np.zeros_like(points)
            intensity = (ply.get("intensity", np.zeros(len(points)))
                         / 255.0).astype(np.float32).reshape(-1, 1)
            gt = np.asarray(ply["GT"]).squeeze()
            if self.dataset_type == "PCN":
                labels = (gt == 1).astype(np.int32)
            else:
                labels = (gt == 2).astype(np.int32)
            with open(cache, "wb") as f:
                pickle.dump((points, intensity, normals, labels), f)

        feats = self._features_for(name, points, intensity, normals)

        points = np.ascontiguousarray(points, np.float32)
        self.clouds_points.append(points)
        self.clouds_features.append(feats)
        self.clouds_labels.append(labels)

        if self.subsampling_parameter > 0:
            sp, sf, sl = grid_subsample(points, self.subsampling_parameter,
                                        features=feats, labels=labels)
        else:
            sp, sf, sl = points, feats, labels
        sl = np.asarray(sl).squeeze()
        index = GridIndex(sp, cell=self.in_radius)

        # density: how many full-cloud points project onto each sub point
        cluster = np.array([index.nearest(p) for p in points], np.int64) \
            if len(sp) != len(points) else np.arange(len(points))
        counts = np.zeros(len(sp), np.float32)
        np.add.at(counts, cluster, 1.0)
        density = counts / max(counts.max(), 1.0)

        self.sub_points.append(np.ascontiguousarray(sp, np.float32))
        self.sub_features.append(np.asarray(sf, np.float32))
        self.sub_labels.append(sl.astype(np.int32))
        self.sub_density.append(density)
        self.sub_indexes.append(index)
        self._clusters = getattr(self, "_clusters", [])
        self._clusters.append(cluster)

    def _features_for(self, name, points, intensity, normals) -> np.ndarray:
        if not self.input_features:
            return np.ones((len(points), 3), np.float32)
        cols = []
        for f in self.input_features:
            if f == "intensity":
                cols.append(intensity.reshape(-1, 1))
            elif f == "normal":
                cols.append(normals)
            elif "katz" in f:
                cols.append(self._katz_for(name, points))
        return np.concatenate(cols, axis=1).astype(np.float32)

    def _katz_for(self, name: str, points: np.ndarray) -> np.ndarray:
        tag = name.replace(os.sep, "_")
        cols = []
        katz_dir = os.path.join(self.data_dir, "katz_values")
        os.makedirs(katz_dir, exist_ok=True)
        for p in self.katz_params:
            cache = os.path.join(
                katz_dir, f"{self.katz_type}Ktz{p:.3f}_{tag}.npy")
            if os.path.exists(cache):
                cols.append(np.load(cache))
            else:
                k = compute_katz(points, [p], self.katz_type)
                np.save(cache, k)
                cols.append(k)
        return np.concatenate(cols, axis=1)

    # -- patch table ---------------------------------------------------------
    def _balanced_class_sample(self, class_id: int, count: int):
        pts = np.concatenate([np.nonzero(l == class_id)[0]
                              for l in self.sub_labels])
        clouds = np.concatenate([np.full(int((l == class_id).sum()), i)
                                 for i, l in enumerate(self.sub_labels)])
        perm = self.rng.permutation(len(pts))
        pts, clouds = pts[perm], clouds[perm]
        if len(pts) >= count:
            return pts[:count], clouds[:count]
        extra = self.rng.integers(0, max(len(pts), 1), count - len(pts))
        return (np.concatenate([pts, pts[extra]]),
                np.concatenate([clouds, clouds[extra]]))

    def _build_patch_table(self) -> None:
        total = self.num_epochs * self.num_steps
        if "test" not in self.split:
            n_out = total // 2
            has_outliers = any((l == 1).any() for l in self.sub_labels)
            if has_outliers:
                o_pts, o_clouds = self._balanced_class_sample(1, n_out)
                i_pts, i_clouds = self._balanced_class_sample(0,
                                                              total - n_out)
                self.point_inds = np.empty(total, np.int64)
                self.cloud_inds = np.empty(total, np.int64)
                self.point_inds[0::2] = o_pts
                self.point_inds[1::2] = i_pts
                self.cloud_inds[0::2] = o_clouds
                self.cloud_inds[1::2] = i_clouds
            else:
                self.point_inds, self.cloud_inds = \
                    self._balanced_class_sample(0, total)
            self.center_noise = self.rng.normal(
                scale=2.0 * self.subsampling_parameter, size=(total, 3)) \
                if self.subsampling_parameter > 0 else np.zeros((total, 3))
        else:
            # grid-covered centers: voxel size 0.25*min(in_radius, 2)
            # (outlier_segmentation_dataset.py:360)
            dl = 0.25 * min(self.in_radius, 2.0)
            pts_ls, cloud_ls = [], []
            for i, (sp, index) in enumerate(zip(self.sub_points,
                                                self.sub_indexes)):
                sub = grid_subsample(sp, dl)
                inds = np.array([index.nearest(c) for c in sub], np.int64)
                pts_ls.append(inds)
                cloud_ls.append(np.full(len(inds), i, np.int64))
            self.point_inds = np.concatenate(pts_ls)
            self.cloud_inds = np.concatenate(cloud_ls)
            self.num_steps = len(self.point_inds)
            self.center_noise = np.zeros((len(self.point_inds), 3))

    def _build_projections(self) -> None:
        """proj[i][j] = segmentation-output slot of full-cloud point j:
        identity for PCN (no subsampling of label space), 1-NN into the
        subsampled cloud otherwise (outlier_segmentation_dataset.py:381-404).
        """
        self.projections = []
        for i, points in enumerate(self.clouds_points):
            if self.dataset_type == "PCN":
                self.projections.append(np.arange(len(points), dtype=np.int64))
            else:
                self.projections.append(self._clusters[i].astype(np.int64))

    def __len__(self) -> int:
        return self.num_steps

    # -- patch extraction ----------------------------------------------------
    def get(self, idx: int, epoch: Optional[int] = None) -> Dict[str, np.ndarray]:
        epoch = self.epoch if epoch is None else epoch
        index = (idx + epoch * self.num_steps) % len(self.point_inds)
        cloud_ind = int(self.cloud_inds[index])
        point_ind = int(self.point_inds[index])
        sp = self.sub_points[cloud_ind]
        sf = self.sub_features[cloud_ind]
        sl = self.sub_labels[cloud_ind]
        gi = self.sub_indexes[cloud_ind]

        # per-sample rng: thread-safe under the loader worker pool
        rng = np.random.default_rng((self._sample_seed, index))
        pick = sp[point_ind].reshape(1, 3) \
            + self.center_noise[index].astype(np.float32)

        # fused native assembly (no center swap: the reference outlier-seg
        # loader keeps the shuffled order); Python path = oracle/fallback
        native = gi.assemble_patch(
            pick[0], point_ind, self.in_radius, self.num_points,
            swap_center=False, seed=(self._sample_seed, index),
            offsets=sf, labels=sl) if self.native_patches else None
        if native is not None:
            points, feats, labels_n, mask, input_inds, _ = native
        else:
            query_inds, total = gi.query_radius_sorted(pick[0],
                                                       self.in_radius)
            if total == 0:
                query_inds, _ = gi.query_radius_sorted(pick[0],
                                                       2 * self.in_radius)
            query_inds = query_inds.astype(np.int64)
            cur = len(query_inds)

            if self.num_points < cur:
                keep = query_inds[: self.num_points]
                input_inds = keep[rng.permutation(self.num_points)]
                mask = np.ones(self.num_points, np.float32)
            else:
                query_inds = query_inds[rng.permutation(cur)]
                pad = rng.integers(0, cur, self.num_points - cur)
                input_inds = np.concatenate([query_inds, query_inds[pad]])
                mask = np.zeros(self.num_points, np.float32)
                mask[:cur] = 1.0

            points = sp[input_inds] - pick
            feats = sf[input_inds]
            labels_n = None
        if self.feature_drop > 0 and rng.random() < self.feature_drop:
            feats = np.zeros_like(feats)
        feats = pad_features_to_3(feats)
        labels = sl[input_inds] if labels_n is None else labels_n

        if self.transforms is not None:
            points = self.transforms(points, rng)

        return {
            "points": points.astype(np.float32),
            "mask": mask,
            "features": feats.astype(np.float32),
            "labels": labels.astype(np.int32),
            "cloud_ind": np.int64(cloud_ind),
            "input_inds": input_inds.astype(np.int64),
        }

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        return self.get(idx)
