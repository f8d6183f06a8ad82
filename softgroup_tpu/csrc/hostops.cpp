// Native host-side geometry kernels for the input pipeline.
//
// The reference builds its voxel structures in C++ on the host too
// (voxelize_idx with a dense hash map, called from the DataLoader collate —
// softgroup/ops/src/voxelize/voxelize.cpp:59-165).  Here the host work is
// bigger — we also precompute the full U-Net rulebook pyramid so the TPU
// step is a pure dense program — so these kernels keep the CPU ahead of the
// chip.  Exposed via a C ABI and loaded with ctypes (no pybind11 in the
// image); softgroup_tpu/ops/{voxelize,rulebook}.py fall back to numpy when
// the library is absent.
//
// Build: cc -O3 -shared -fPIC hostops.cpp -o libhostops.so  (see build.py)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

inline int64_t pack(const int32_t* c) {
  // (b, x, y, z) with 16 bits per spatial component is ample for every
  // supported dataset (max extent ~1536 voxels)
  return (int64_t(c[0]) << 48) | (int64_t(c[1]) << 32) |
         (int64_t(c[2]) << 16) | int64_t(c[3]);
}

struct KeyHash {
  size_t operator()(int64_t k) const {
    // 64-bit mix (splitmix64 finalizer)
    uint64_t z = uint64_t(k) + 0x9e3779b97f4a7c15ull;
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
    return size_t(z ^ (z >> 31));
  }
};

}  // namespace

extern "C" {

// Deduplicate coords (n,4) -> sorted-key-unique voxels.
// Outputs: p2v (n), vox_coords (capacity,4).  Returns m (may exceed
// capacity — caller must check; writes are clipped).
int64_t sg_voxelize(const int32_t* coords, int64_t n, int32_t* p2v,
                    int32_t* vox_coords, int64_t capacity) {
  std::vector<int64_t> keys(n);
  for (int64_t i = 0; i < n; ++i) keys[i] = pack(coords + 4 * i);
  std::vector<int64_t> sorted(keys);
  std::sort(sorted.begin(), sorted.end());
  sorted.erase(std::unique(sorted.begin(), sorted.end()), sorted.end());
  const int64_t m = int64_t(sorted.size());

  std::unordered_map<int64_t, int32_t, KeyHash> index;
  index.reserve(size_t(m) * 2);
  for (int64_t v = 0; v < m; ++v) index.emplace(sorted[v], int32_t(v));

  for (int64_t i = 0; i < n; ++i) {
    const int32_t v = index.find(keys[i])->second;
    p2v[i] = v;
    if (v < capacity) std::memcpy(vox_coords + 4 * v, coords + 4 * i, 16);
  }
  return m;
}

// 3^3 submanifold rulebook over voxel coords (m,4): rules (27, m), -1 when
// the neighbour is absent or out of [0, dims).
void sg_subm_rules(const int32_t* vox, int64_t m, const int32_t* dims,
                   int32_t* rules) {
  std::unordered_map<int64_t, int32_t, KeyHash> index;
  index.reserve(size_t(m) * 2);
  for (int64_t v = 0; v < m; ++v) index.emplace(pack(vox + 4 * v), int32_t(v));

  int64_t k = 0;
  for (int dx = -1; dx <= 1; ++dx)
    for (int dy = -1; dy <= 1; ++dy)
      for (int dz = -1; dz <= 1; ++dz, ++k) {
        int32_t* row = rules + k * m;
        if (dx == 0 && dy == 0 && dz == 0) {
          for (int64_t v = 0; v < m; ++v) row[v] = int32_t(v);
          continue;
        }
        for (int64_t v = 0; v < m; ++v) {
          const int32_t* c = vox + 4 * v;
          const int32_t q[4] = {c[0], c[1] + dx, c[2] + dy, c[3] + dz};
          if (q[1] < 0 || q[2] < 0 || q[3] < 0 || q[1] >= dims[0] ||
              q[2] >= dims[1] || q[3] >= dims[2]) {
            row[v] = -1;
            continue;
          }
          auto it = index.find(pack(q));
          row[v] = (it == index.end()) ? -1 : it->second;
        }
      }
}

// k=2 s=2 downsample maps.  Outputs: out_coords (capacity,4) in sorted key
// order, down_rules (8, capacity) child table, parent_idx (m), child_tap (m).
// Returns the coarse voxel count c (may exceed capacity; writes clipped).
int64_t sg_downsample(const int32_t* vox, int64_t m, int32_t* out_coords,
                      int32_t* down_rules, int32_t* parent_idx,
                      int32_t* child_tap, int64_t capacity) {
  std::vector<int32_t> parents(size_t(m) * 4);
  for (int64_t v = 0; v < m; ++v) {
    const int32_t* c = vox + 4 * v;
    int32_t* p = parents.data() + 4 * v;
    p[0] = c[0];
    p[1] = c[1] >> 1;
    p[2] = c[2] >> 1;
    p[3] = c[3] >> 1;
  }
  const int64_t c =
      sg_voxelize(parents.data(), m, parent_idx, out_coords, capacity);
  const int64_t cc = std::min(c, capacity);
  std::fill(down_rules, down_rules + 8 * capacity, -1);
  for (int64_t v = 0; v < m; ++v) {
    const int32_t* cv = vox + 4 * v;
    const int32_t tap =
        ((cv[1] & 1) << 2) | ((cv[2] & 1) << 1) | (cv[3] & 1);
    child_tap[v] = tap;
    if (parent_idx[v] < cc) down_rules[tap * capacity + parent_idx[v]] =
        int32_t(v);
  }
  return c;
}

// Windowed-conv metadata for one rulebook (the C twin of
// conv_kernel.window_rules_np + build_window_meta_np — bit-identical greedy
// dual-window placement, m_step=1).  The python mirror is the reference
// implementation; this one exists because the numpy version costs ~4 s per
// ScanNet-scale scan (the metadata is built per batch on the host).
//
// rules: (k, v_out) int32 row-major.  Outputs:
//   local  (k, v_out) int32 window-local indices (>= n_win*w: dropped)
//   starts (n_groups*n_win + 2, nb) int32 (units of 16 rows; -1 unused;
//          last two rows = per-block any-live flag, duplicated)
//   corr_ke / corr_ve / corr_src (corr_cap) int32, -1 pad: compacted
//          dropped entries in flat (tap-major) order
// Returns total n_overflow (may exceed corr_cap).
int64_t sg_window_meta(const int32_t* rules, int64_t k, int64_t v_out,
                       const int32_t* group_of_tap, int64_t n_groups,
                       int64_t w, int64_t b, int64_t v_in, int64_t n_win,
                       int32_t* local, int32_t* starts, int32_t* corr_ke,
                       int32_t* corr_ve, int32_t* corr_src,
                       int64_t corr_cap) {
  const int64_t nb = v_out / b;
  const int32_t kINT_MAX = INT32_MAX;
  const int64_t smax = v_in - w > 0 ? v_in - w : 0;
  const int64_t drop = n_win * w;
  std::vector<int32_t> taps_of_group[32];
  for (int64_t t = 0; t < k; ++t)
    taps_of_group[group_of_tap[t]].push_back(int32_t(t));

  std::vector<uint8_t> blk_valid(nb, 0);
  for (int64_t t = 0; t < k; ++t) {
    const int32_t* row = rules + t * v_out;
    for (int64_t i = 0; i < nb; ++i) {
      if (blk_valid[i]) continue;
      const int32_t* blk = row + i * b;
      for (int64_t j = 0; j < b; ++j)
        if (blk[j] >= 0) { blk_valid[i] = 1; break; }
    }
  }

  const int64_t srows = n_groups * n_win + 2;
  std::fill(starts, starts + srows * nb, -1);
  // per-(group, block) work runs on a contiguous scratch copy of the
  // block's tap rows: the naive strided walk re-touches k cache-distant
  // rulebook rows per pass (measured 188 ms at ScanNet L0; ~4x faster
  // blocked like this)
  std::vector<int32_t> sel_s(size_t(32) * b);
  std::vector<int32_t> loc_s(size_t(32) * b);
  for (int64_t g = 0; g < n_groups; ++g) {
    const auto& taps = taps_of_group[g];
    const int64_t tpg = int64_t(taps.size());
    for (int64_t i = 0; i < nb; ++i) {
      const int64_t ne = tpg * b;
      for (int64_t p = 0; p < tpg; ++p)
        std::memcpy(sel_s.data() + p * b,
                    rules + int64_t(taps[p]) * v_out + i * b, 4 * b);
      // init: dead entries -1 & assigned; live entries default dropped
      for (int64_t e = 0; e < ne; ++e)
        loc_s[e] = sel_s[e] >= 0 ? int32_t(drop) : -1;
      for (int64_t win = 0; win < n_win; ++win) {
        int32_t s = kINT_MAX;
        for (int64_t e = 0; e < ne; ++e)
          if (loc_s[e] == drop && sel_s[e] < s) s = sel_s[e];
        const bool empty = s == kINT_MAX;
        int64_t sc = empty ? 0 : s;
        if (sc > smax) sc = smax;
        if (sc < 0) sc = 0;
        sc /= 16;
        if (blk_valid[i])
          starts[(g * n_win + win) * nb + i] = empty ? -1 : int32_t(sc);
        const int64_t lo = sc * 16;
        for (int64_t e = 0; e < ne; ++e) {
          if (loc_s[e] != drop) continue;
          const int64_t lj = int64_t(sel_s[e]) - lo;
          if (lj >= 0 && lj < w) loc_s[e] = int32_t(win * w + lj);
        }
      }
      for (int64_t p = 0; p < tpg; ++p)
        std::memcpy(local + int64_t(taps[p]) * v_out + i * b,
                    loc_s.data() + p * b, 4 * b);
    }
  }
  for (int64_t i = 0; i < nb; ++i) {
    starts[(n_groups * n_win) * nb + i] = blk_valid[i];
    starts[(n_groups * n_win + 1) * nb + i] = blk_valid[i];
  }

  std::fill(corr_ke, corr_ke + corr_cap, -1);
  std::fill(corr_ve, corr_ve + corr_cap, -1);
  std::fill(corr_src, corr_src + corr_cap, -1);
  int64_t n_over = 0;
  for (int64_t t = 0; t < k; ++t) {
    const int32_t* loc = local + t * v_out;
    const int32_t* row = rules + t * v_out;
    for (int64_t v = 0; v < v_out; ++v) {
      if (loc[v] >= drop) {
        if (n_over < corr_cap) {
          corr_ke[n_over] = int32_t(t);
          corr_ve[n_over] = int32_t(v);
          corr_src[n_over] = row[v];
        }
        ++n_over;
      }
    }
  }
  return n_over;
}

}  // extern "C"
