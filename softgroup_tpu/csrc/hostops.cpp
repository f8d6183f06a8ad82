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

}  // extern "C"
