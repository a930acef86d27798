// TPU-host native ops for the denoising data pipeline.
//
// The reference ships two native host components: a CPU voxel-grid
// subsampler (cpp_wrappers/cpp_subsampling/grid_subsampling/
// grid_subsampling.cpp:5-106, barycenter of points/features + majority
// label per voxel) and kd-tree patch queries (sklearn / vendored
// nanoflann).  This library is their TPU-framework equivalent: a voxel
// barycenter subsampler with identical semantics plus a uniform-grid
// spatial index for distance-sorted radius patch queries (the per-sample
// hot path of the patch loader, offset_dataset.py:630-633 in the
// reference).  Exposed as a plain C ABI for ctypes; all functions release
// the GIL by construction (no Python API).
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

inline int64_t floor_div(float v, float dl) {
  return static_cast<int64_t>(std::floor(v / dl));
}

// Deterministic, platform-independent RNG for the patch assembler
// (splitmix64 stream + Lemire bounded reduction).  The native loader path
// is its own documented random stream: same (seed_hi, seed_lo) -> same
// patch, on every platform, but NOT bit-identical to the numpy fallback
// (both draw from the identical distribution).
struct SplitMix {
  uint64_t s;
  SplitMix(uint64_t hi, uint64_t lo) : s(hi * 0x9e3779b97f4a7c15ull ^ lo) {
    next();  // decorrelate adjacent (hi, lo) seeds
    next();
  }
  uint64_t next() {
    uint64_t z = (s += 0x9e3779b97f4a7c15ull);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
    return z ^ (z >> 31);
  }
  // unbiased integer in [0, n)
  uint64_t bounded(uint64_t n) {
    __uint128_t m = static_cast<__uint128_t>(next()) * n;
    uint64_t lo = static_cast<uint64_t>(m);
    if (lo < n) {
      const uint64_t t = (-n) % n;
      while (lo < t) {
        m = static_cast<__uint128_t>(next()) * n;
        lo = static_cast<uint64_t>(m);
      }
    }
    return static_cast<uint64_t>(m >> 64);
  }
  template <typename T>
  void shuffle(T* a, int64_t n) {  // Fisher-Yates
    for (int64_t i = n - 1; i > 0; --i)
      std::swap(a[i], a[static_cast<int64_t>(bounded(i + 1))]);
  }
};

// ---------------------------------------------------------------------------
// Voxel-grid barycenter subsampling.

struct VoxelAccum {
  double px = 0, py = 0, pz = 0;
  int64_t count = 0;
  int64_t feat_slot = -1;   // row into the feature accumulator
};

}  // namespace

extern "C" {

// Voxel-grid subsample `n` points (and optional features / labels) with edge
// `dl`.  Output order is ascending voxel id (deterministic), voxel value =
// barycenter of its points (and features), label = majority vote.
// Buffers out_pts (n*3), out_feats (n*fdim), out_labels (n) must be caller-
// allocated; feats/labels may be null.  Returns the number of voxels.
int64_t d3d_grid_subsample(const float* pts, int64_t n, const float* feats,
                           int64_t fdim, const int32_t* labels,
                           int32_t nlabels, float dl, float* out_pts,
                           float* out_feats, int32_t* out_labels) {
  if (n <= 0 || dl <= 0) return 0;
  float minx = pts[0], miny = pts[1], minz = pts[2];
  for (int64_t i = 1; i < n; ++i) {
    minx = std::min(minx, pts[3 * i]);
    miny = std::min(miny, pts[3 * i + 1]);
    minz = std::min(minz, pts[3 * i + 2]);
  }
  const float ox = std::floor(minx / dl) * dl;
  const float oy = std::floor(miny / dl) * dl;
  const float oz = std::floor(minz / dl) * dl;
  // grid extents for the flat voxel id iX + NX*iY + NX*NY*iZ
  int64_t nx = 0, ny = 0;
  for (int64_t i = 0; i < n; ++i) {
    nx = std::max(nx, floor_div(pts[3 * i] - ox, dl) + 1);
    ny = std::max(ny, floor_div(pts[3 * i + 1] - oy, dl) + 1);
  }

  std::unordered_map<int64_t, VoxelAccum> voxels;
  voxels.reserve(static_cast<size_t>(n));
  std::vector<double> feat_acc;      // nvox * fdim, slot-indexed
  std::vector<std::unordered_map<int32_t, int64_t>> label_hist;
  int64_t next_slot = 0;

  for (int64_t i = 0; i < n; ++i) {
    const int64_t ix = floor_div(pts[3 * i] - ox, dl);
    const int64_t iy = floor_div(pts[3 * i + 1] - oy, dl);
    const int64_t iz = floor_div(pts[3 * i + 2] - oz, dl);
    const int64_t vid = ix + nx * (iy + ny * iz);
    auto& acc = voxels[vid];
    if (acc.count == 0) {
      acc.feat_slot = next_slot++;
      if (feats) feat_acc.resize(next_slot * fdim, 0.0);
      if (labels) label_hist.emplace_back();
    }
    acc.px += pts[3 * i];
    acc.py += pts[3 * i + 1];
    acc.pz += pts[3 * i + 2];
    acc.count += 1;
    if (feats) {
      double* row = feat_acc.data() + acc.feat_slot * fdim;
      const float* src = feats + i * fdim;
      for (int64_t f = 0; f < fdim; ++f) row[f] += src[f];
    }
    if (labels) label_hist[acc.feat_slot][labels[i]] += 1;
  }

  // deterministic order: ascending voxel id
  std::vector<std::pair<int64_t, const VoxelAccum*>> order;
  order.reserve(voxels.size());
  for (const auto& kv : voxels) order.emplace_back(kv.first, &kv.second);
  std::sort(order.begin(), order.end(),
            [](const auto& a, const auto& b) { return a.first < b.first; });

  int64_t w = 0;
  for (const auto& kv : order) {
    const VoxelAccum& acc = *kv.second;
    const double inv = 1.0 / static_cast<double>(acc.count);
    out_pts[3 * w] = static_cast<float>(acc.px * inv);
    out_pts[3 * w + 1] = static_cast<float>(acc.py * inv);
    out_pts[3 * w + 2] = static_cast<float>(acc.pz * inv);
    if (feats && out_feats) {
      const double* row = feat_acc.data() + acc.feat_slot * fdim;
      for (int64_t f = 0; f < fdim; ++f)
        out_feats[w * fdim + f] = static_cast<float>(row[f] * inv);
    }
    if (labels && out_labels) {
      const auto& hist = label_hist[acc.feat_slot];
      int32_t best = 0;
      int64_t best_cnt = -1;
      for (int32_t lab = 0; lab < nlabels; ++lab) {
        auto it = hist.find(lab);
        const int64_t cnt = it == hist.end() ? 0 : it->second;
        if (cnt > best_cnt) {
          best_cnt = cnt;
          best = lab;
        }
      }
      out_labels[w] = best;
    }
    ++w;
  }
  return w;
}

// ---------------------------------------------------------------------------
// Uniform-grid spatial index for radius queries.

struct GridIndex {
  std::vector<Vec3> pts;
  float cell;
  float ox, oy, oz;
  int64_t nx, ny, nz;
  // CSR layout: cell_start[c]..cell_start[c+1] indexes into point_ids
  std::vector<int64_t> cell_start;
  std::vector<int32_t> point_ids;

  int64_t cell_of(float x, float y, float z) const {
    int64_t ix = floor_div(x - ox, cell);
    int64_t iy = floor_div(y - oy, cell);
    int64_t iz = floor_div(z - oz, cell);
    ix = std::max<int64_t>(0, std::min(ix, nx - 1));
    iy = std::max<int64_t>(0, std::min(iy, ny - 1));
    iz = std::max<int64_t>(0, std::min(iz, nz - 1));
    return ix + nx * (iy + ny * iz);
  }
};

// Build an index with the given cell edge (callers use the query radius).
void* d3d_grid_index_build(const float* pts, int64_t n, float cell) {
  if (n <= 0 || cell <= 0) return nullptr;
  auto* g = new GridIndex();
  g->pts.resize(n);
  std::memcpy(g->pts.data(), pts, sizeof(float) * 3 * n);
  g->cell = cell;
  float minx = pts[0], miny = pts[1], minz = pts[2];
  float maxx = minx, maxy = miny, maxz = minz;
  for (int64_t i = 1; i < n; ++i) {
    minx = std::min(minx, pts[3 * i]);
    maxx = std::max(maxx, pts[3 * i]);
    miny = std::min(miny, pts[3 * i + 1]);
    maxy = std::max(maxy, pts[3 * i + 1]);
    minz = std::min(minz, pts[3 * i + 2]);
    maxz = std::max(maxz, pts[3 * i + 2]);
  }
  g->ox = minx;
  g->oy = miny;
  g->oz = minz;
  g->nx = floor_div(maxx - minx, cell) + 1;
  g->ny = floor_div(maxy - miny, cell) + 1;
  g->nz = floor_div(maxz - minz, cell) + 1;
  const int64_t ncells = g->nx * g->ny * g->nz;

  std::vector<int64_t> counts(ncells + 1, 0);
  std::vector<int64_t> cid(n);
  for (int64_t i = 0; i < n; ++i) {
    cid[i] = g->cell_of(pts[3 * i], pts[3 * i + 1], pts[3 * i + 2]);
    counts[cid[i] + 1] += 1;
  }
  for (int64_t c = 0; c < ncells; ++c) counts[c + 1] += counts[c];
  g->cell_start = counts;
  g->point_ids.resize(n);
  std::vector<int64_t> cursor(g->cell_start.begin(), g->cell_start.end() - 1);
  for (int64_t i = 0; i < n; ++i)
    g->point_ids[cursor[cid[i]]++] = static_cast<int32_t>(i);
  return g;
}

void d3d_grid_index_free(void* handle) {
  delete static_cast<GridIndex*>(handle);
}

// Collect (squared distance, id) of all points within `radius` (unsorted).
static void radius_collect(const GridIndex* g, const float* center,
                           float radius,
                           std::vector<std::pair<float, int32_t>>* found) {
  const float r2 = radius * radius;
  const int64_t reach =
      static_cast<int64_t>(std::ceil(radius / g->cell));
  const int64_t cx = floor_div(center[0] - g->ox, g->cell);
  const int64_t cy = floor_div(center[1] - g->oy, g->cell);
  const int64_t cz = floor_div(center[2] - g->oz, g->cell);

  // training geometries (l1.yaml in_radius=2.0 over a unit cloud) cover the
  // whole grid: scan the point array linearly (cache-friendly, vectorizes)
  // instead of indirecting through every cell's id list
  if (cx - reach <= 0 && cy - reach <= 0 && cz - reach <= 0 &&
      cx + reach >= g->nx - 1 && cy + reach >= g->ny - 1 &&
      cz + reach >= g->nz - 1) {
    const int64_t n = static_cast<int64_t>(g->pts.size());
    for (int64_t i = 0; i < n; ++i) {
      const Vec3& p = g->pts[i];
      const float dx = p.x - center[0];
      const float dy = p.y - center[1];
      const float dz = p.z - center[2];
      const float d2 = dx * dx + dy * dy + dz * dz;
      if (d2 <= r2) found->emplace_back(d2, static_cast<int32_t>(i));
    }
    return;
  }

  for (int64_t iz = std::max<int64_t>(0, cz - reach);
       iz <= std::min(g->nz - 1, cz + reach); ++iz) {
    for (int64_t iy = std::max<int64_t>(0, cy - reach);
         iy <= std::min(g->ny - 1, cy + reach); ++iy) {
      for (int64_t ix = std::max<int64_t>(0, cx - reach);
           ix <= std::min(g->nx - 1, cx + reach); ++ix) {
        const int64_t c = ix + g->nx * (iy + g->ny * iz);
        for (int64_t s = g->cell_start[c]; s < g->cell_start[c + 1]; ++s) {
          const int32_t pid = g->point_ids[s];
          const Vec3& p = g->pts[pid];
          const float dx = p.x - center[0];
          const float dy = p.y - center[1];
          const float dz = p.z - center[2];
          const float d2 = dx * dx + dy * dy + dz * dz;
          if (d2 <= r2) found->emplace_back(d2, pid);
        }
      }
    }
  }
}

// True when a radius query at `center` must visit every grid cell.
static bool grid_covered(const GridIndex* g, const float* center,
                         float radius) {
  const int64_t reach =
      static_cast<int64_t>(std::ceil(radius / g->cell));
  const int64_t cx = floor_div(center[0] - g->ox, g->cell);
  const int64_t cy = floor_div(center[1] - g->oy, g->cell);
  const int64_t cz = floor_div(center[2] - g->oz, g->cell);
  return cx - reach <= 0 && cy - reach <= 0 && cz - reach <= 0 &&
         cx + reach >= g->nx - 1 && cy + reach >= g->ny - 1 &&
         cz + reach >= g->nz - 1;
}

// Linear scan with a bounded k-max-heap: leaves the k closest in-radius
// (d2, id) pairs in `heap` (heap order) and returns the TOTAL in-radius
// count.  One read pass over the cloud, ~4KB of heap traffic — no
// million-entry candidate vector to write and re-read.  Kept set is
// identical to sorting (ties by index: pair comparison).
static int64_t heap_topk_scan(const GridIndex* g, const float* center,
                              float radius, int64_t k,
                              std::vector<std::pair<float, int32_t>>* heap) {
  const float r2 = radius * radius;
  const int64_t n = static_cast<int64_t>(g->pts.size());
  int64_t total = 0;
  heap->clear();
  for (int64_t i = 0; i < n; ++i) {
    const Vec3& p = g->pts[i];
    const float dx = p.x - center[0];
    const float dy = p.y - center[1];
    const float dz = p.z - center[2];
    const float d2 = dx * dx + dy * dy + dz * dz;
    if (d2 > r2) continue;
    ++total;
    const std::pair<float, int32_t> cand(d2, static_cast<int32_t>(i));
    if (static_cast<int64_t>(heap->size()) < k) {
      heap->push_back(cand);
      std::push_heap(heap->begin(), heap->end());
    } else if (cand < heap->front()) {
      std::pop_heap(heap->begin(), heap->end());
      heap->back() = cand;
      std::push_heap(heap->begin(), heap->end());
    }
  }
  return total;
}

// Distance-sorted radius query around `center`.  Writes up to `capacity`
// point indices (ascending distance, ties by index) into out_idx and, if
// non-null, their distances into out_dist.  Returns the TOTAL number of
// in-radius points (callers detect truncation by comparing to capacity).
int64_t d3d_radius_query(void* handle, const float* center, float radius,
                         int64_t capacity, int32_t* out_idx,
                         float* out_dist) {
  const auto* g = static_cast<const GridIndex*>(handle);
  if (!g) return 0;
  std::vector<std::pair<float, int32_t>> found;
  radius_collect(g, center, radius, &found);
  std::sort(found.begin(), found.end());
  const int64_t keep =
      std::min<int64_t>(capacity, static_cast<int64_t>(found.size()));
  for (int64_t i = 0; i < keep; ++i) {
    out_idx[i] = found[i].second;
    if (out_dist) out_dist[i] = std::sqrt(found[i].first);
  }
  return static_cast<int64_t>(found.size());
}

// 1-NN query: index of the nearest point to `center` (expanding-ring search).
int32_t d3d_nearest_query(void* handle, const float* center) {
  const auto* g = static_cast<const GridIndex*>(handle);
  if (!g) return -1;
  const int64_t max_reach = std::max({g->nx, g->ny, g->nz});
  for (int64_t reach = 1; reach <= 2 * max_reach; reach *= 2) {
    const float r = g->cell * static_cast<float>(reach);
    int32_t idx;
    float dist;
    const int64_t cnt = d3d_radius_query(
        const_cast<GridIndex*>(g), center, r, 1, &idx, &dist);
    if (cnt > 0) return idx;
  }
  // center far outside the indexed bbox: brute-force scan
  float best_d2 = 0.0f;
  int32_t best = -1;
  for (size_t i = 0; i < g->pts.size(); ++i) {
    const Vec3& p = g->pts[i];
    const float dx = p.x - center[0];
    const float dy = p.y - center[1];
    const float dz = p.z - center[2];
    const float d2 = dx * dx + dy * dy + dz * dz;
    if (best < 0 || d2 < best_d2) {
      best_d2 = d2;
      best = static_cast<int32_t>(i);
    }
  }
  return best;
}

// ---------------------------------------------------------------------------
// Fused patch assembly: the per-sample hot path of the patch loaders
// (reference offset_dataset.py:608-733) in ONE native call over the indexed
// cloud: distance-sorted radius query (retry at 2r when empty), truncate to
// the num_points closest / pad with repetition (U-Net) or point 0 (PCN),
// shuffle, swap the true center into slot 0, gather points/offsets/labels
// and recenter by `center`.  This replaces ~8 numpy kernels + a full-cloud
// scratch allocation per sample with one pass over the in-radius points.
//
// `fvals` (n*fdim per-point float values: GT offsets, scan features, ...)
// and `labels` (n) may be null (their outputs are skipped).  `pcn_mode` != 0
// pads with index 0 and keeps the distance order of the unpadded prefix
// (offset_dataset.py:666-668).  `swap_center` != 0 swaps the true center
// into slot 0 (offset semantics); 0 keeps the shuffled order (outlier-seg
// semantics, outlier_segmentation_dataset.py).  Randomness is the SplitMix
// stream seeded by (seed_hi, seed_lo) — deterministic and platform-stable.
// Returns the TOTAL number of in-radius points (cur = min(total,
// num_points)), or -1 if the 2r retry still finds nothing.
int64_t d3d_assemble_patch(void* handle, const float* fvals, int64_t fdim,
                           const int32_t* labels, const float* center,
                           int64_t center_ind, float radius,
                           int64_t num_points, int32_t pcn_mode,
                           int32_t swap_center,
                           uint64_t seed_hi, uint64_t seed_lo,
                           float* out_points, float* out_fvals,
                           int32_t* out_labels, float* out_mask,
                           int64_t* out_inds) {
  const auto* g = static_cast<const GridIndex*>(handle);
  if (!g || num_points <= 0) return -1;
  // thread-local scratch: the training geometry (in_radius 2.0 over a unit
  // cloud) makes every query return the full 140k cloud — reallocating a
  // 1MB+ vector per sample would dominate
  thread_local std::vector<std::pair<float, int32_t>> found;
  found.clear();
  int64_t total;
  if (grid_covered(g, center, radius)) {
    // whole-grid query: fused linear scan + bounded k-heap (selection
    // happens during collection; no candidate vector materialized)
    total = heap_topk_scan(g, center, radius, num_points, &found);
    if (total == 0)
      total = heap_topk_scan(g, center, 2.0f * radius, num_points, &found);
    if (total == 0) return -1;
    std::sort_heap(found.begin(), found.end());
  } else {
    radius_collect(g, center, radius, &found);
    if (found.empty()) radius_collect(g, center, 2.0f * radius, &found);
    if (found.empty()) return -1;
    total = static_cast<int64_t>(found.size());
    if (total > num_points) {
      // keep the num_points closest (ascending distance, ties by index).
      // partial_sort beats nth_element here: with k << n the k-heap scan
      // is read-mostly (~n compares), while nth_element partition-writes
      // the whole multi-MB scratch (measured 2x slower at n=140k, k=500)
      std::partial_sort(found.begin(), found.begin() + num_points,
                        found.end());
    } else {
      std::sort(found.begin(), found.end());
    }
  }
  SplitMix rng(seed_hi, seed_lo);
  const int64_t cur = std::min(total, num_points);
  std::vector<int64_t> inds(num_points);
  const int64_t closest = found[0].second;  // swap fallback (always kept)
  for (int64_t i = 0; i < cur; ++i) inds[i] = found[i].second;
  if (!pcn_mode || total > num_points) rng.shuffle(inds.data(), cur);
  if (total < num_points) {
    for (int64_t i = cur; i < num_points; ++i)
      inds[i] = pcn_mode ? 0
                         : inds[static_cast<int64_t>(rng.bounded(cur))];
  }

  // swap the true center into slot 0; if it fell outside the patch, use the
  // closest in-radius point instead (offset_dataset.py:677-685)
  if (swap_center) {
    int64_t ci = -1;
    for (int64_t i = 0; i < num_points && ci < 0; ++i)
      if (inds[i] == center_ind) ci = i;
    if (ci < 0)
      for (int64_t i = 0; i < num_points && ci < 0; ++i)
        if (inds[i] == closest) ci = i;
    if (ci > 0) std::swap(inds[0], inds[ci]);
  }

  for (int64_t i = 0; i < num_points; ++i) {
    const int64_t id = inds[i];
    const Vec3& p = g->pts[id];
    out_points[3 * i] = p.x - center[0];
    out_points[3 * i + 1] = p.y - center[1];
    out_points[3 * i + 2] = p.z - center[2];
    if (fvals && out_fvals) {
      const float* src = fvals + id * fdim;
      float* dst = out_fvals + i * fdim;
      for (int64_t f = 0; f < fdim; ++f) dst[f] = src[f];
    }
    if (labels && out_labels) out_labels[i] = labels[id];
    if (out_mask)
      out_mask[i] = (total >= num_points || i < cur) ? 1.0f : 0.0f;
    if (out_inds) out_inds[i] = id;
  }
  return total;
}

}  // extern "C"
