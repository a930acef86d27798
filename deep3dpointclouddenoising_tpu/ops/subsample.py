"""Masked voxel-grid subsampling (barycenter pooling).

TPU-native equivalent of the reference GPU kernel
(/root/reference/u_net_arch/pt_custom_ops/_ext_src/src/masked_grid_subsampling_gpu.cu:11-162,
which runs ONE CUDA thread per cloud) and of the CPU C++ extension
(/root/reference/u_net_arch/cpp_wrappers/cpp_subsampling/grid_subsampling/grid_subsampling.cpp:5-106).

Algorithm (contract preserved exactly):
  1. voxel id ``iX + NX*iY + NX*NY*iZ`` on a grid anchored at
     ``floor(min/dl)*dl``;
  2. average all points sharing a voxel (barycenter);
  3. deterministically pseudo-shuffle the voxel centroids with the LCG
     ``k[i] = (17*k[i-1] + 139) % 256`` seeded from the smallest voxel id,
     then sort by those keys (…_gpu.cu:125-135) — this decides WHICH voxels
     survive truncation to ``npoint``;
  4. emit the first ``npoint`` centroids with mask=1, padding by cycling real
     centroids with mask=0 (…_gpu.cu:138-151).

Implementation is fully vectorized: sort-by-voxel-id + segment sums instead
of the reference's serial scan, vmapped over the batch, jit/TPU friendly.
The LCG sequence depends only on its seed, so keys are computed in closed
form ``k[i] = (17^i * k0 + 139 * sum_{j<i} 17^j) mod 256`` from precomputed
tables.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

_LCG_A, _LCG_B, _LCG_MOD = 17, 139, 256
_INVALID = np.int32(2 ** 30)  # np, not jnp: no backend init at import time


@functools.lru_cache(maxsize=32)
def _lcg_tables(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """(17^i mod 256, 139*sum_{j<i} 17^j mod 256) for i in [0, n)."""
    a_pow = np.empty(n, dtype=np.int32)
    geo = np.empty(n, dtype=np.int32)
    ap, g = 1, 0
    for i in range(n):
        a_pow[i] = ap
        geo[i] = g
        g = (_LCG_A * g + _LCG_B) % _LCG_MOD
        ap = (ap * _LCG_A) % _LCG_MOD
    # note: geo recurrence: g_{i+1} = a*g_i + b with g_0 = 0 gives
    # g_i = b * (a^{i-1} + ... + 1), matching k[i] = a^i k0 + g_i (mod m).
    return a_pow, geo


def _subsample_one(xyz: jnp.ndarray, mask: jnp.ndarray, npoint: int,
                   sample_dl: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single cloud: (N,3), (N,) -> (npoint,3), (npoint,)."""
    n = xyz.shape[0]
    valid = mask > 0.0
    inf = jnp.float32(np.inf)
    mins = jnp.min(jnp.where(valid[:, None], xyz, inf), axis=0)
    maxs = jnp.max(jnp.where(valid[:, None], xyz, -inf), axis=0)
    origin = jnp.floor(mins / sample_dl) * sample_dl
    nx = jnp.floor((maxs[0] - origin[0]) / sample_dl).astype(jnp.int32) + 1
    ny = jnp.floor((maxs[1] - origin[1]) / sample_dl).astype(jnp.int32) + 1

    cell = jnp.floor((xyz - origin[None, :]) / sample_dl).astype(jnp.int32)
    vid = cell[:, 0] + nx * cell[:, 1] + nx * ny * cell[:, 2]
    vid = jnp.where(valid, vid, _INVALID)

    order = jnp.argsort(vid)  # stable; invalid points go last
    svid = vid[order]
    spts = xyz[order]
    pos = jnp.arange(n, dtype=jnp.int32)
    sval = svid < _INVALID
    is_new = sval & ((pos == 0) | (svid != jnp.roll(svid, 1)))
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # segment per sorted point
    seg = jnp.where(sval, seg, n - 1)
    w = sval.astype(jnp.float32)
    # segment_sum (scatter-add) is the right reduction HERE: only N rows
    # scatter once (~N/55M s on v5e — 0.58 ms at N=500 measured), while
    # the scatter-free segmented scan's fixed log-depth overhead measures
    # 3x slower at these sizes.  The scan variant
    # (neighbors.segment_sums_presorted) wins where row counts are huge
    # (the >2048-support gather backward, device-voting accumulation).
    sums = jax.ops.segment_sum(spts * w[:, None], seg, num_segments=n)
    cnts = jax.ops.segment_sum(w, seg, num_segments=n)
    centroids = sums / jnp.maximum(cnts, 1.0)[:, None]
    end = jnp.sum(is_new.astype(jnp.int32))  # number of occupied voxels

    # Deterministic LCG pseudo-shuffle of the voxel order (seeded from the
    # smallest voxel id), then stable sort by key.
    a_pow_np, geo_np = _lcg_tables(n)
    a_pow = jnp.asarray(a_pow_np)
    geo = jnp.asarray(geo_np)
    k0 = jnp.where(end > 0, svid[0], 0) % _LCG_MOD
    keys = (a_pow * k0 + geo) % _LCG_MOD
    keys = jnp.where(pos < end, keys, _INVALID)  # only real voxels shuffle
    shuffled = jnp.argsort(keys)  # stable

    out_pos = jnp.arange(npoint, dtype=jnp.int32)
    safe_end = jnp.maximum(end, 1)
    src = jnp.where(out_pos < end, out_pos, out_pos % safe_end)
    sub_xyz = centroids[shuffled[src]]
    sub_mask = (out_pos < end).astype(jnp.float32)
    return sub_xyz, sub_mask


def masked_grid_subsampling(xyz: jnp.ndarray, mask: jnp.ndarray, *,
                            npoint: int, sample_dl: float
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched masked voxel-grid barycenter subsampling.

    Args:
      xyz: (B, N, 3) points; padding slots must replicate real points (the
        producer contract throughout the framework).
      mask: (B, N) float {0,1}.
      npoint: fixed output capacity (static).
      sample_dl: voxel edge length (static).

    Returns:
      sub_xyz: (B, npoint, 3) voxel barycenters (padded by cycling).
      sub_mask: (B, npoint) float {0,1}.
    """
    fn = jax.vmap(functools.partial(_subsample_one, npoint=npoint,
                                    sample_dl=sample_dl))
    sub_xyz, sub_mask = fn(xyz, mask.astype(jnp.float32))
    return jax.lax.stop_gradient(sub_xyz), jax.lax.stop_gradient(sub_mask)


def grid_subsample_numpy(points: np.ndarray, sample_dl: float,
                         features: np.ndarray | None = None,
                         labels: np.ndarray | None = None):
    """CPU voxel-grid barycenter subsampling for the data pipeline.

    Equivalent of the reference CPU extension ``grid_subsampling.compute``
    (cpp_wrappers/cpp_subsampling/grid_subsampling/grid_subsampling.cpp:5-106):
    barycenter of points (and features) per voxel, majority label per voxel.
    Used at dataset-build time to pick evenly spaced test patch centers
    (offset_dataset.py:548-550).  Output order is ascending voxel id
    (deterministic).
    """
    pts = np.asarray(points, dtype=np.float32)
    mins = pts.min(axis=0)
    origin = np.floor(mins / sample_dl) * sample_dl
    cell = np.floor((pts - origin) / sample_dl).astype(np.int64)
    dims = cell.max(axis=0) + 1
    vid = cell[:, 0] + dims[0] * cell[:, 1] + dims[0] * dims[1] * cell[:, 2]
    uniq, inv, cnt = np.unique(vid, return_inverse=True, return_counts=True)
    nvox = uniq.shape[0]
    sub = np.zeros((nvox, 3), dtype=np.float64)
    np.add.at(sub, inv, pts)
    sub = (sub / cnt[:, None]).astype(np.float32)
    out = [sub]
    if features is not None:
        f = np.asarray(features, dtype=np.float64)
        sf = np.zeros((nvox, f.shape[1]), dtype=np.float64)
        np.add.at(sf, inv, f)
        out.append((sf / cnt[:, None]).astype(np.float32))
    if labels is not None:
        lab = np.asarray(labels).astype(np.int64).ravel()
        nlab = int(lab.max()) + 1 if lab.size else 1
        hist = np.zeros((nvox, nlab), dtype=np.int64)
        np.add.at(hist, (inv, lab), 1)
        out.append(hist.argmax(axis=1).astype(np.int32))
    return out[0] if len(out) == 1 else tuple(out)
