// Native mesh-connectivity kernels for the host-side preprocessing path.
//
// The reference does connectivity with per-face hash-map loops in C++
// (ForceBuilder.cpp:25-74 hinge dedup, VertexSort.hpp int2/int3 maps,
// TetMesh.cpp:231-270 surface extraction). This library provides the same
// operations as a C API consumed from Python via ctypes
// (admm_elastic_tpu/geometry/native.py), with numpy fallbacks when the
// library isn't built. For multi-million-element meshes these run ~10x
// faster than the numpy sort-based fallbacks.
//
// Build: make -C admm_elastic_tpu/native  (produces libmeshops.so)

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Key2 {
  int32_t a, b;
  bool operator==(const Key2& o) const { return a == o.a && b == o.b; }
};
struct Key3 {
  int32_t a, b, c;
  bool operator==(const Key3& o) const {
    return a == o.a && b == o.b && c == o.c;
  }
};
struct HashK2 {
  size_t operator()(const Key2& k) const {
    return std::hash<uint64_t>()((uint64_t(uint32_t(k.a)) << 32) |
                                 uint32_t(k.b));
  }
};
struct HashK3 {
  size_t operator()(const Key3& k) const {
    uint64_t h = uint64_t(uint32_t(k.a)) * 0x9E3779B97F4A7C15ull;
    h ^= uint64_t(uint32_t(k.b)) * 0xC2B2AE3D27D4EB4Full + (h << 6);
    h ^= uint64_t(uint32_t(k.c)) * 0x165667B19E3779F9ull + (h >> 3);
    return size_t(h);
  }
};

inline Key2 sorted2(int32_t a, int32_t b) {
  return a < b ? Key2{a, b} : Key2{b, a};
}
inline Key3 sorted3(int32_t a, int32_t b, int32_t c) {
  int32_t v[3] = {a, b, c};
  std::sort(v, v + 3);
  return Key3{v[0], v[1], v[2]};
}

}  // namespace

extern "C" {

// Unique undirected edges in first-occurrence order (per-face edge order
// (v0,v1),(v0,v2),(v1,v2) like the reference spring builder).
// out_edges must hold 2*3*n_faces int32; returns the edge count.
int64_t aet_unique_edges(const int32_t* faces, int64_t n_faces,
                         int32_t* out_edges) {
  std::unordered_map<Key2, int32_t, HashK2> seen;
  seen.reserve(size_t(n_faces) * 2);
  int64_t n_out = 0;
  for (int64_t f = 0; f < n_faces; ++f) {
    const int32_t* v = faces + 3 * f;
    const int32_t pairs[3][2] = {{v[0], v[1]}, {v[0], v[2]}, {v[1], v[2]}};
    for (int e = 0; e < 3; ++e) {
      Key2 k = sorted2(pairs[e][0], pairs[e][1]);
      if (seen.emplace(k, 1).second) {
        out_edges[2 * n_out] = pairs[e][0];
        out_edges[2 * n_out + 1] = pairs[e][1];
        ++n_out;
      }
    }
  }
  return n_out;
}

// across_edge adjacency: out[f*3+c] = face sharing the edge opposite corner c,
// or -1 (trimesh2 semantics). Non-manifold edges pair first-come.
void aet_across_edge(const int32_t* faces, int64_t n_faces, int32_t* out) {
  std::unordered_map<Key2, int64_t, HashK2> open;  // edge -> f*3+c
  open.reserve(size_t(n_faces) * 2);
  std::fill(out, out + 3 * n_faces, -1);
  for (int64_t f = 0; f < n_faces; ++f) {
    const int32_t* v = faces + 3 * f;
    for (int c = 0; c < 3; ++c) {
      Key2 k = sorted2(v[(c + 1) % 3], v[(c + 2) % 3]);
      auto it = open.find(k);
      if (it == open.end()) {
        open.emplace(k, f * 3 + c);
      } else if (it->second >= 0) {
        int64_t of = it->second / 3, oc = it->second % 3;
        out[f * 3 + c] = int32_t(of);
        out[of * 3 + oc] = int32_t(f);
        it->second = -1;  // consumed; further faces on this edge stay -1
      }
    }
  }
}

// Bend hinges in Volino ordering (wing0, wing1, shared_a, shared_b),
// deduplicated by sorted 4-tuple, reference emission order
// (ForceBuilder.cpp:155-216). out_hinges must hold 4*3*n_faces int32.
int64_t aet_hinges(const int32_t* faces, int64_t n_faces, int32_t* out_hinges) {
  std::vector<int32_t> adj(3 * n_faces);
  aet_across_edge(faces, n_faces, adj.data());

  struct Key4 {
    int32_t v[4];
    bool operator==(const Key4& o) const {
      return std::memcmp(v, o.v, sizeof v) == 0;
    }
  };
  struct HashK4 {
    size_t operator()(const Key4& k) const {
      uint64_t h = 1469598103934665603ull;
      for (int i = 0; i < 4; ++i) {
        h ^= uint32_t(k.v[i]);
        h *= 1099511628211ull;
      }
      return size_t(h);
    }
  };
  std::unordered_map<Key4, char, HashK4> seen;
  seen.reserve(size_t(n_faces) * 2);

  int64_t n_out = 0;
  for (int64_t f = 0; f < n_faces; ++f) {
    const int32_t* p = faces + 3 * f;
    for (int c = 0; c < 3; ++c) {
      int32_t nf = adj[3 * f + c];
      if (nf < 0) continue;
      int32_t s1 = p[(c + 1) % 3], s2 = p[(c + 2) % 3];
      // neighbor's vertex not shared with f
      const int32_t* q = faces + 3 * nf;
      int32_t other = -1;
      for (int j = 0; j < 3; ++j)
        if (q[j] != s1 && q[j] != s2) other = q[j];
      if (other < 0) continue;
      int32_t hv[4] = {p[c], other, s2, s1};
      Key4 key;
      std::memcpy(key.v, hv, sizeof hv);
      std::sort(key.v, key.v + 4);
      if (!seen.emplace(key, 1).second) continue;
      std::memcpy(out_hinges + 4 * n_out, hv, sizeof hv);
      ++n_out;
    }
  }
  return n_out;
}

// Boundary faces of a tet mesh (faces used by exactly one tet), orientation
// per the reference's per-tet face list (TetMesh.cpp:243-247).
// out_faces must hold 3*4*n_tets int32.
int64_t aet_surface_faces(const int32_t* tets, int64_t n_tets,
                          int32_t* out_faces) {
  std::unordered_map<Key3, int64_t, HashK3> count;  // key -> first slot | -1
  count.reserve(size_t(n_tets) * 4);
  std::vector<int32_t> all(12 * n_tets);
  for (int64_t t = 0; t < n_tets; ++t) {
    const int32_t* v = tets + 4 * t;
    const int32_t fcs[4][3] = {{v[0], v[1], v[3]},
                               {v[0], v[2], v[1]},
                               {v[0], v[3], v[2]},
                               {v[1], v[2], v[3]}};
    for (int i = 0; i < 4; ++i) {
      int64_t slot = t * 4 + i;
      std::memcpy(all.data() + 3 * slot, fcs[i], sizeof fcs[i]);
      Key3 k = sorted3(fcs[i][0], fcs[i][1], fcs[i][2]);
      auto it = count.find(k);
      if (it == count.end())
        count.emplace(k, slot);
      else
        it->second = -1;  // interior
    }
  }
  int64_t n_out = 0;
  for (int64_t t = 0; t < n_tets * 4; ++t) {
    // emit in slot order for determinism
    const int32_t* fc = all.data() + 3 * t;
    Key3 k = sorted3(fc[0], fc[1], fc[2]);
    auto it = count.find(k);
    if (it != count.end() && it->second == t) {
      std::memcpy(out_faces + 3 * n_out, fc, 3 * sizeof(int32_t));
      ++n_out;
    }
  }
  return n_out;
}

}  // extern "C"
