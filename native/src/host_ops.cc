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

// Distance-sorted radius query around `center`.  Writes up to `capacity`
// point indices (ascending distance, ties by index) into out_idx and, if
// non-null, their distances into out_dist.  Returns the TOTAL number of
// in-radius points (callers detect truncation by comparing to capacity).
int64_t d3d_radius_query(void* handle, const float* center, float radius,
                         int64_t capacity, int32_t* out_idx,
                         float* out_dist) {
  const auto* g = static_cast<const GridIndex*>(handle);
  if (!g) return 0;
  const float r2 = radius * radius;
  const int64_t reach =
      static_cast<int64_t>(std::ceil(radius / g->cell));
  const int64_t cx = floor_div(center[0] - g->ox, g->cell);
  const int64_t cy = floor_div(center[1] - g->oy, g->cell);
  const int64_t cz = floor_div(center[2] - g->oz, g->cell);

  std::vector<std::pair<float, int32_t>> found;
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
          if (d2 <= r2) found.emplace_back(d2, pid);
        }
      }
    }
  }
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

}  // extern "C"
