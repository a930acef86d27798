"""Offset-regression dataset: PCN shapes -> noisy patches with GT offsets.

Re-implements /root/reference/offset_dataset.py for the JAX pipeline:
  * :func:`process_off_file` (:196-264): load + normalize an OFF mesh,
    even-sample inliers, draw uniform-box outliers, shuffle, add noise, and
    compute ground-truth offsets = closest-surface-point - noisy-position;
  * per-(noise level, shape) pickle caches (:399-419) because offset
    synthesis (mesh closest-point) is the expensive step;
  * balanced patch-center tables for all epochs up front: 50/50
    outlier/inlier interleave for train/val (:515-537), grid-subsampled
    covering centers for test/qualitative (:538-561);
  * ``__getitem__`` (:598-733): radius patch via KD-tree (sorted by
    distance), pad/truncate to ``num_points`` with mask, swap the center
    point into slot 0, subtract the pick point, jointly augment
    points+offsets, features = patch-relative xyz (or Fourier features).

Output is channels-last numpy; batching happens in :mod:`.loader`.
"""
from __future__ import annotations

import dataclasses
import glob
import logging
import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# Heartbeat lines during the (minutes-long) shape-cache build: the stall
# supervisor (scripts/supervise.py) keys liveness off log-file mtime, and a
# silent ctor longer than --stall_timeout gets the run killed mid-setup.
logger = logging.getLogger("d3pcd")

from ..utils.native import GridIndex, grid_subsample
from .meshio import TriMesh, closest_point_on_mesh, load_off, \
    sample_surface_even

NOISE_CLIP = 3.0 / 100.0  # noise clipped to 3% of the diagonal (:144)
DIVERSE_LEVELS = (0.0, 0.25, 0.5, 1.0, 1.5, 2.5)  # percent (:163)


def fourier_input_mapping(x: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Fourier feature mapping (offset_dataset.py:28-33)."""
    proj = (2.0 * np.pi * x) @ B.T
    return np.concatenate([np.sin(proj), np.cos(proj)], axis=-1)


@dataclasses.dataclass
class ShapeData:
    mesh: TriMesh
    points: np.ndarray    # (P, 3) noisy positions
    labels: np.ndarray    # (P,) int32: 1 = outlier
    offsets: np.ndarray   # (P, 3) GT offsets (denoised = noisy + offset)

    def __getstate__(self):
        # spatial indexes (non-picklable native handles) are rebuilt by the
        # dataset after unpickling
        return {k: v for k, v in self.__dict__.items() if k != "index"}


def _add_noise(pos: np.ndarray, gt: np.ndarray, noise_type: str,
               noise_level: float, rng: np.random.Generator,
               levels: Optional[Sequence[float]] = None) -> np.ndarray:
    """Noise injection for inliers (offset_dataset.py:131-194).

    ``levels`` overrides the sigma set (in percent) of the 'diverse'
    per-point mix; default = the reference's DIVERSE_LEVELS."""
    inlier = gt == 0
    n_in = int(inlier.sum())
    if n_in == 0:
        return pos
    if noise_type == "diverse":
        levels = list(levels or DIVERSE_LEVELS)
        per_bin = n_in // len(levels)
        noises = []
        used = 0
        for i, lvl in enumerate(levels):
            cnt = n_in - used if i == len(levels) - 1 else per_bin
            used += cnt
            lvl = lvl / 100.0
            noises.append(lvl * rng.standard_normal((cnt, 3))
                          if lvl > 0 else np.zeros((cnt, 3)))
        noise = np.clip(np.concatenate(noises), -NOISE_CLIP, NOISE_CLIP)
        rng.shuffle(noise)
    elif noise_level <= 0:
        noise = np.zeros((n_in, 3))
    elif noise_type == "gaussian":
        noise = np.clip(noise_level * rng.standard_normal((n_in, 3)),
                        -NOISE_CLIP, NOISE_CLIP)
    elif noise_type == "white":
        noise = np.clip(noise_level * rng.random((n_in, 3)),
                        -NOISE_CLIP, NOISE_CLIP)
    else:
        raise ValueError(f"Unknown noise type {noise_type}")
    out = pos.copy()
    out[inlier] += noise
    return out


def process_off_file(filepath: str, num_points_per_shape: int,
                     outlier_proportion: float, noise_type: str,
                     noise_level: float, margin: float = 0.1,
                     rng: Optional[np.random.Generator] = None,
                     mesh: Optional[TriMesh] = None,
                     levels: Optional[Sequence[float]] = None) -> ShapeData:
    """Build one shape's noisy cloud + GT offsets (offset_dataset.py:196-264)."""
    rng = rng or np.random.default_rng()
    n_out = int(num_points_per_shape * outlier_proportion)
    n_in = num_points_per_shape - n_out

    shape = (mesh or load_off(filepath)).copy()
    shape.vertices = shape.vertices - shape.vertices.mean(axis=0)
    diagonal = np.linalg.norm(shape.vertices.max(0) - shape.vertices.min(0))
    shape.vertices = shape.vertices / diagonal

    in_pos, _ = sample_surface_even(shape, n_in, rng)
    in_mean = in_pos.mean(0)
    amplitude = in_pos.max() - in_pos.min()
    in_pos = (1.0 - margin) * (in_pos - in_mean) / amplitude
    shape.vertices = (1.0 - margin) * (shape.vertices - in_mean) / amplitude

    low = in_pos.min(0) - margin
    high = in_pos.max(0) + margin
    out_pos = rng.uniform(low=low, high=high, size=(n_out, 3))

    pos = np.concatenate([in_pos, out_pos], axis=0)
    mean_pos = pos.mean(0)
    pos -= mean_pos
    shape.vertices = shape.vertices - mean_pos
    gt = np.concatenate([np.zeros(n_in), np.ones(n_out)])

    order = rng.permutation(num_points_per_shape)
    pos, gt = pos[order], gt[order]

    noisy = _add_noise(pos, gt, noise_type, noise_level, rng, levels=levels)
    closest, _ = closest_point_on_mesh(shape, noisy)
    offsets = closest - noisy

    if noise_type == "diverse":
        # labels become "offset larger than max σ" (offset_dataset.py:256-258)
        max_lvl = max(levels) if levels else 2.5
        gt = (np.linalg.norm(offsets, axis=1) > max_lvl / 100.0) \
            .astype(np.int32)

    return ShapeData(mesh=shape, points=noisy.astype(np.float32),
                     labels=gt.astype(np.int32),
                     offsets=offsets.astype(np.float32))


def _interleave(a_pts, a_clouds, b_pts, b_clouds):
    pts = np.empty(len(a_pts) + len(b_pts), dtype=np.int64)
    clouds = np.empty_like(pts)
    pts[0::2], pts[1::2] = a_pts, b_pts
    clouds[0::2], clouds[1::2] = a_clouds, b_clouds
    return pts, clouds


def _sample_class(labels_per_cloud: Sequence[np.ndarray], class_id: int,
                  count: int, rng: np.random.Generator):
    """Sample (point, cloud) index pairs of one class across clouds with
    repetition-padding (offset_dataset.py:37-58)."""
    pts = np.concatenate([np.nonzero(l == class_id)[0]
                          for l in labels_per_cloud])
    clouds = np.concatenate([np.full((l == class_id).sum(), i)
                             for i, l in enumerate(labels_per_cloud)])
    perm = rng.permutation(len(pts))
    pts, clouds = pts[perm], clouds[perm]
    if len(pts) >= count:
        return pts[:count], clouds[:count]
    extra = rng.integers(0, len(pts), count - len(pts))
    return (np.concatenate([pts, pts[extra]]),
            np.concatenate([clouds, clouds[extra]]))


class OffsetDataset:
    """Patch dataset over a directory tree ``{train,val,test,
    qualitative_test}/*.off`` (offset_dataset.py:266-736)."""

    def __init__(self, data_root: str, split: str = "train", *,
                 in_radius: float = 2.0, num_points: int = 500,
                 num_steps: int = 2000, num_epochs: int = 1,
                 noise_type: str = "gaussian", noise_level: float = 5e-3,
                 num_points_per_shape: int = 140000,
                 outlier_proportion: float = 0.0,
                 transforms=None, architecture: str = "U-Net",
                 sample_dl_patches: Optional[float] = None,
                 fourier_features: bool = False,
                 subsampling_parameter: float = 0.0,
                 debug: bool = False, seed: int = 0,
                 shapes: Optional[Dict[str, TriMesh]] = None,
                 diverse_levels: Optional[Sequence[float]] = None,
                 native_patches: bool = True):
        if "test" not in split:
            assert num_steps * num_epochs % 2 == 0, \
                "balanced inlier/outlier interleave needs an even table"
        self.split = split
        self.in_radius = in_radius
        self.num_points = num_points
        self.num_steps = num_steps
        self.num_epochs = num_epochs
        self.architecture = architecture
        self.transforms = transforms
        self.fourier_features = fourier_features
        self.subsampling_parameter = subsampling_parameter
        self.epoch = 0
        # fused C patch assembly (own deterministic random stream); the
        # numpy path below stays as the semantic oracle + fallback
        self.native_patches = native_patches \
            and os.environ.get("D3D_DISABLE_NATIVE") != "1"
        self.rng = np.random.default_rng(seed)
        self._sample_seed = 0 if seed is None else int(seed)
        self.fourier_B = self.rng.normal(0.0, 12.0, size=(32, 3))
        if sample_dl_patches is None:
            sample_dl_patches = in_radius

        self.data_root = data_root
        self.cache_dir = os.path.join(data_root, "processed")
        os.makedirs(self.cache_dir, exist_ok=True)

        names = sorted(
            os.path.join(split, os.path.basename(f)[:-4])
            for f in glob.glob(os.path.join(data_root, split, "*.off")))
        if shapes is not None:  # injected meshes (tests / synthetic data)
            names = sorted(shapes)
        if debug:
            names = names[:2]
        if not names:
            raise FileNotFoundError(
                f"no .off shapes under {data_root}/{split}")
        self.cloud_names = names

        # diverse_levels (percent) overrides the sigma set of both diverse
        # regimes: diverse_stable replicates shapes per level; diverse mixes
        # them per point (specialist models, e.g. a low-noise regime)
        self.diverse_levels = list(diverse_levels) if diverse_levels else None
        levels = list(self.diverse_levels or DIVERSE_LEVELS) \
            if noise_type == "diverse_stable" else [noise_level]
        self.shapes: List[ShapeData] = []
        n_total = len(levels) * len(names)
        for lvl in levels:
            for name in names:
                ntype = "gaussian" if noise_type == "diverse_stable" \
                    else noise_type
                lvl_val = lvl / 100.0 if noise_type == "diverse_stable" \
                    else lvl
                self.shapes.append(self._load_or_process(
                    name, ntype, lvl_val, num_points_per_shape,
                    outlier_proportion,
                    mesh=None if shapes is None else shapes[name]))
                # heartbeat EVERY shape: one uncached process_off_file call
                # can take minutes, and the stall supervisor watches log
                # mtime — logging only every 8th shape risked a false kill
                logger.info(f"{split}: shape cache "
                            f"{len(self.shapes)}/{n_total}")

        # native uniform-grid spatial index per shape (utils/native.py);
        # the per-sample radius query is the host-side hot path
        self.indexes = []
        for i, s in enumerate(self.shapes):
            self.indexes.append(GridIndex(s.points, cell=in_radius))
            if (i + 1) % 8 == 0:
                logger.info(f"{split}: spatial index {i + 1}"
                            f"/{len(self.shapes)}")
        logger.info(f"{split}: spatial indexes built "
                    f"({len(self.indexes)} shapes)")
        self._build_patch_table(sample_dl_patches)
        logger.info(f"{split}: patch table ready "
                    f"({self.num_epochs}x{self.num_steps} samples)")

    # -- shape cache --------------------------------------------------------
    def _load_or_process(self, name, noise_type, noise_level, npts, outprop,
                         mesh=None) -> ShapeData:
        # custom diverse sigma sets get their own cache entries (the mix is
        # baked into the stored noisy cloud)
        lvl_tag = "" if not (self.diverse_levels and noise_type == "diverse") \
            else "_lv" + "-".join(f"{l:g}" for l in self.diverse_levels)
        tag = (f"{name.replace(os.sep, '_')}_{noise_type}_{noise_level:.2e}"
               f"_{npts:06d}_{outprop:.2f}{lvl_tag}.pkl")
        cache = os.path.join(self.cache_dir, tag)
        if os.path.exists(cache):
            with open(cache, "rb") as f:
                return pickle.load(f)
        data = process_off_file(
            os.path.join(self.data_root, name + ".off"), npts, outprop,
            noise_type, noise_level, rng=self.rng, mesh=mesh,
            levels=self.diverse_levels)
        with open(cache, "wb") as f:
            pickle.dump(data, f)
        return data

    # -- patch table --------------------------------------------------------
    def _build_patch_table(self, sample_dl_patches: float) -> None:
        labels = [s.labels for s in self.shapes]
        total = self.num_epochs * self.num_steps
        if "test" not in self.split:
            if any((l == 1).any() for l in labels):
                n_out = total // 2
                o_pts, o_clouds = _sample_class(labels, 1, n_out, self.rng)
                i_pts, i_clouds = _sample_class(labels, 0, total - n_out,
                                                self.rng)
                self.point_inds, self.cloud_inds = _interleave(
                    o_pts, o_clouds, i_pts, i_clouds)
            else:
                self.point_inds, self.cloud_inds = _sample_class(
                    labels, 0, total, self.rng)
            # center jitter: scale 2*subsampling_parameter — zero in the
            # reference runs since dataset sampleDl==0 (train_dist.py:221)
            self.center_noise = self.rng.normal(
                scale=2.0 * self.subsampling_parameter,
                size=(len(self.point_inds), 3)) \
                if self.subsampling_parameter > 0 \
                else np.zeros((len(self.point_inds), 3))
        else:
            pts_ls, cloud_ls = [], []
            for i, s in enumerate(self.shapes):
                sub = grid_subsample(s.points, sample_dl_patches)
                if self.architecture == "PCN":
                    inds = np.arange(len(s.points))
                else:
                    inds = np.array([self.indexes[i].nearest(c)
                                     for c in sub])
                pts_ls.append(np.asarray(inds).ravel())
                cloud_ls.append(np.full(len(pts_ls[-1]), i))
            self.point_inds = np.concatenate(pts_ls)
            self.cloud_inds = np.concatenate(cloud_ls)
            self.num_steps = len(self.point_inds)
            self.center_noise = np.zeros((len(self.point_inds), 3))

    def __len__(self) -> int:
        return self.num_steps

    # -- patch extraction ---------------------------------------------------
    def get(self, idx: int, epoch: Optional[int] = None) -> Dict[str, np.ndarray]:
        """One patch sample; epoch indexes the pre-sampled table
        (offset_dataset.py:608)."""
        epoch = self.epoch if epoch is None else epoch
        index = (idx + epoch * self.num_steps) % len(self.point_inds)
        cloud_ind = int(self.cloud_inds[index])
        point_ind = int(self.point_inds[index])
        shape = self.shapes[cloud_ind]
        # per-sample rng (seeded by the global sample index): thread-safe
        # under the loader's worker pool and reproducible independent of
        # iteration order — unlike the reference's shared numpy state
        rng = np.random.default_rng((self._sample_seed, index))

        pick = shape.points[point_ind].reshape(1, 3) \
            + self.center_noise[index].astype(np.float32)
        spatial_index = self.indexes[cloud_ind]

        # fused native assembly (one C call: query + pad/truncate + shuffle
        # + center swap + gather + recenter); Python path is the fallback
        # and the semantic oracle (tests/test_native.py)
        native = spatial_index.assemble_patch(
            pick[0], point_ind, self.in_radius, self.num_points,
            pcn=self.architecture == "PCN",
            seed=(self._sample_seed, index),
            offsets=shape.offsets, labels=shape.labels) \
            if self.native_patches else None
        if native is not None:
            points, offsets, labels, mask, input_inds, _ = native
            labels = labels.astype(np.int32)
        else:
            # sorted-by-distance radius query (:630-633), retry doubled
            # (:640-652); sorting happens inside the native index
            query_inds, total = spatial_index.query_radius_sorted(
                pick[0], self.in_radius)
            if total == 0:
                query_inds, _ = spatial_index.query_radius_sorted(
                    pick[0], 2 * self.in_radius)
            query_inds = query_inds.astype(np.int64)
            cur = len(query_inds)

            if self.num_points < cur:
                keep = query_inds[: self.num_points]
                input_inds = keep[rng.permutation(self.num_points)]
                mask = np.ones(self.num_points, np.float32)
            else:
                if "U-Net" in self.architecture:
                    query_inds = query_inds[rng.permutation(cur)]
                    pad = rng.integers(0, cur, self.num_points - cur)
                    input_inds = np.concatenate(
                        [query_inds, query_inds[pad]])
                else:  # PCN pads with point 0 of the cloud (:666-668)
                    pad = np.zeros(self.num_points - cur, dtype=np.int64)
                    input_inds = np.concatenate([query_inds, pad])
                mask = np.zeros(self.num_points, np.float32)
                mask[:cur] = 1.0

            # swap the true center into slot 0 (:677-685)
            where = np.nonzero(input_inds == point_ind)[0]
            ci = int(where[0]) if len(where) \
                else int(np.nonzero(input_inds == query_inds[0])[0][0])
            input_inds[0], input_inds[ci] = input_inds[ci], input_inds[0]

            points = shape.points[input_inds] - pick
            offsets = shape.offsets[input_inds]
            labels = shape.labels[input_inds]

        if self.transforms is not None:
            stack = np.concatenate([points, offsets], axis=0)
            stack = self.transforms(stack, rng)
            points = stack[: self.num_points]
            offsets = stack[self.num_points:]

        if self.architecture == "PCN":
            out = {"points": points.astype(np.float32),
                   "center_ind": np.int64(0),
                   "cloud_ind": np.int64(cloud_ind),
                   "input_inds": input_inds.astype(np.int64)}
            out["offsets"] = (offsets[0].astype(np.float32)
                              if "test" in self.split
                              else offsets.astype(np.float32))
            return out

        feats = fourier_input_mapping(points, self.fourier_B) \
            if self.fourier_features else points
        return {
            "points": points.astype(np.float32),
            "mask": mask,
            "features": feats.astype(np.float32),
            "labels": labels.astype(np.int32),
            "offsets": offsets.astype(np.float32),
            "cloud_ind": np.int64(cloud_ind),
            "input_inds": input_inds.astype(np.int64),
        }

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        return self.get(idx)
