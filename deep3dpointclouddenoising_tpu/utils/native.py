"""ctypes bindings for the native host-ops library (native/src/host_ops.cc).

The native library is the TPU-framework equivalent of the reference's C++
CPU extension (cpp_wrappers/cpp_subsampling) plus its kd-tree patch queries:
a voxel barycenter subsampler and a uniform-grid spatial index with
distance-sorted radius queries.  Python callers go through

  * :func:`grid_subsample` — native when built, numpy fallback otherwise
    (identical semantics; see tests/test_native.py);
  * :class:`GridIndex` — native when built, scipy cKDTree fallback.

The library is built lazily with ``make -C native`` on first use (a few
seconds, cached as native/libd3d_host.so).  Set ``D3D_DISABLE_NATIVE=1`` to
force the fallbacks.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libd3d_host.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    with _lock:
        if _lib is not None or _lib_tried:
            return _lib
        _lib_tried = True
        if os.environ.get("D3D_DISABLE_NATIVE") == "1":
            return None
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.d3d_grid_subsample.restype = ctypes.c_int64
        lib.d3d_grid_subsample.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_float,
            f32p, ctypes.c_void_p, ctypes.c_void_p]
        lib.d3d_grid_index_build.restype = ctypes.c_void_p
        lib.d3d_grid_index_build.argtypes = [f32p, ctypes.c_int64,
                                             ctypes.c_float]
        lib.d3d_grid_index_free.restype = None
        lib.d3d_grid_index_free.argtypes = [ctypes.c_void_p]
        lib.d3d_radius_query.restype = ctypes.c_int64
        lib.d3d_radius_query.argtypes = [
            ctypes.c_void_p, f32p, ctypes.c_float, ctypes.c_int64,
            i32p, ctypes.c_void_p]
        lib.d3d_nearest_query.restype = ctypes.c_int32
        lib.d3d_nearest_query.argtypes = [ctypes.c_void_p, f32p]
        lib.d3d_assemble_patch.restype = ctypes.c_int64
        lib.d3d_assemble_patch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, f32p,
            ctypes.c_int64, ctypes.c_float, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_uint64, ctypes.c_uint64,
            f32p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_lib() is not None


def grid_subsample(points: np.ndarray, sample_dl: float,
                   features: Optional[np.ndarray] = None,
                   labels: Optional[np.ndarray] = None):
    """Voxel-grid barycenter subsampling (native; numpy fallback).

    Matches the reference CPU extension ``grid_subsampling.compute``
    semantics (grid_subsampling.cpp:5-106): per-voxel barycenter of points
    (and features), majority-vote labels; deterministic ascending-voxel-id
    output order.
    """
    lib = _load_lib()
    if lib is None:
        from ..ops.subsample import grid_subsample_numpy
        return grid_subsample_numpy(points, sample_dl, features, labels)

    pts = np.ascontiguousarray(points, dtype=np.float32)
    n = len(pts)
    out_pts = np.empty((n, 3), np.float32)
    fdim = 0
    feats_arg = None
    out_feats = None
    if features is not None:
        feats = np.ascontiguousarray(features, dtype=np.float32)
        fdim = feats.shape[1]
        out_feats = np.empty((n, fdim), np.float32)
        feats_arg = feats.ctypes.data_as(ctypes.c_void_p)
    labels_arg = None
    out_labels = None
    nlabels = 0
    if labels is not None:
        lab = np.ascontiguousarray(labels, dtype=np.int32).ravel()
        nlabels = int(lab.max()) + 1 if lab.size else 1
        out_labels = np.empty(n, np.int32)
        labels_arg = lab.ctypes.data_as(ctypes.c_void_p)

    nvox = lib.d3d_grid_subsample(
        pts, n, feats_arg, fdim, labels_arg, nlabels,
        ctypes.c_float(sample_dl), out_pts,
        None if out_feats is None
        else out_feats.ctypes.data_as(ctypes.c_void_p),
        None if out_labels is None
        else out_labels.ctypes.data_as(ctypes.c_void_p))

    out = [out_pts[:nvox]]
    if out_feats is not None:
        out.append(out_feats[:nvox])
    if out_labels is not None:
        out.append(out_labels[:nvox])
    return out[0] if len(out) == 1 else tuple(out)


class GridIndex:
    """Spatial index for distance-sorted radius queries over one cloud.

    Native uniform-grid index when the library is available; scipy cKDTree
    fallback with identical results (ascending distance, ties by index).
    """

    def __init__(self, points: np.ndarray, cell: float):
        self._pts = np.ascontiguousarray(points, dtype=np.float32)
        self._lib = _load_lib()
        self._handle = None
        self._tree = None
        if self._lib is not None:
            self._handle = self._lib.d3d_grid_index_build(
                self._pts, len(self._pts), ctypes.c_float(cell))
        if self._handle is None:
            from scipy.spatial import cKDTree
            self._tree = cKDTree(self._pts)

    def __del__(self):
        if self._handle is not None and self._lib is not None:
            self._lib.d3d_grid_index_free(self._handle)
            self._handle = None

    def query_radius_sorted(self, center: np.ndarray, radius: float,
                            capacity: Optional[int] = None
                            ) -> Tuple[np.ndarray, int]:
        """Indices of points within ``radius`` of ``center``, sorted by
        ascending distance (ties by index), truncated to ``capacity``.

        Returns (indices, total_in_radius); total > len(indices) indicates
        truncation.
        """
        center = np.ascontiguousarray(center, dtype=np.float32).ravel()
        if self._handle is not None:
            cap = len(self._pts) if capacity is None else int(capacity)
            out = np.empty(cap, np.int32)
            total = self._lib.d3d_radius_query(
                self._handle, center, ctypes.c_float(radius), cap, out, None)
            return out[:min(cap, total)], int(total)
        inds = self._tree.query_ball_point(center, r=radius)
        inds = np.asarray(inds, dtype=np.int64)
        d = np.linalg.norm(self._pts[inds] - center, axis=1)
        order = np.lexsort((inds, d))
        inds = inds[order].astype(np.int32)
        total = len(inds)
        if capacity is not None:
            inds = inds[:capacity]
        return inds, total

    def assemble_patch(self, center: np.ndarray, center_ind: int,
                       radius: float, num_points: int, *,
                       pcn: bool = False, swap_center: bool = True,
                       seed: Tuple[int, int] = (0, 0),
                       offsets: Optional[np.ndarray] = None,
                       labels: Optional[np.ndarray] = None):
        """Fused per-sample patch assembly (native only; returns ``None``
        when the native library is unavailable so callers take the Python
        path).

        One C call does the loader hot path of the reference's
        ``offset_dataset.py:608-733``: distance-sorted radius query (retry
        at 2r when empty), truncate-to-closest / pad (repetition for U-Net,
        point 0 for PCN), shuffle, center swap into slot 0 (disable with
        ``swap_center=False`` for outlier-seg semantics), gather + recenter.
        ``offsets`` is any (n, fdim) per-point float table (GT offsets,
        scan features, ...).  Randomness is the library's own deterministic
        SplitMix stream — seeded by ``seed`` and platform-stable, but not
        bit-identical to the numpy path (identical distribution).

        Returns ``(points, offsets, labels, mask, input_inds, total)``;
        ``offsets``/``labels`` are ``None`` when not supplied.  Raises if
        even the doubled-radius retry finds no points.
        """
        if self._handle is None:
            return None
        center = np.ascontiguousarray(center, dtype=np.float32).ravel()
        out_points = np.empty((num_points, 3), np.float32)
        out_offsets = out_labels = None
        off_arg = lab_arg = out_off_arg = out_lab_arg = None
        fdim = 0
        if offsets is not None:
            offsets = np.ascontiguousarray(offsets, dtype=np.float32)
            fdim = offsets.shape[1]
            out_offsets = np.empty((num_points, fdim), np.float32)
            off_arg = offsets.ctypes.data_as(ctypes.c_void_p)
            out_off_arg = out_offsets.ctypes.data_as(ctypes.c_void_p)
        if labels is not None:
            labels = np.ascontiguousarray(labels, dtype=np.int32)
            out_labels = np.empty(num_points, np.int32)
            lab_arg = labels.ctypes.data_as(ctypes.c_void_p)
            out_lab_arg = out_labels.ctypes.data_as(ctypes.c_void_p)
        mask = np.empty(num_points, np.float32)
        input_inds = np.empty(num_points, np.int64)
        total = self._lib.d3d_assemble_patch(
            self._handle, off_arg, ctypes.c_int64(fdim), lab_arg, center,
            ctypes.c_int64(int(center_ind)), ctypes.c_float(radius),
            ctypes.c_int64(int(num_points)), ctypes.c_int32(int(pcn)),
            ctypes.c_int32(int(swap_center)),
            ctypes.c_uint64(seed[0] & (2**64 - 1)),
            ctypes.c_uint64(seed[1] & (2**64 - 1)),
            out_points, out_off_arg, out_lab_arg,
            mask.ctypes.data_as(ctypes.c_void_p),
            input_inds.ctypes.data_as(ctypes.c_void_p))
        if total < 0:
            raise ValueError("assemble_patch: no points within 2*radius "
                             "of the query center")
        return out_points, out_offsets, out_labels, mask, input_inds, \
            int(total)

    def nearest(self, center: np.ndarray) -> int:
        center = np.ascontiguousarray(center, dtype=np.float32).ravel()
        if self._handle is not None:
            return int(self._lib.d3d_nearest_query(self._handle, center))
        _, idx = self._tree.query(center, k=1)
        return int(idx)
