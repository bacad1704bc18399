// Native tet-connectivity builder.
//
// Derives (faces, face_tets, tet_faces) from a tet list -- the connectivity
// arrays the reference renderer requires its callers to construct by hand
// (dmesh_renderer/__init__.py:461-463). This is the host-side "graph
// builder" of the framework's runtime; the NumPy fallback lives in
// dmesh_renderer_tpu/utils/connectivity.py and this implementation matches
// its output exactly (face ids in lexicographically-sorted key order, face
// corner order taken from the first introducing tet, face_tets filled in
// tet-iteration order).
//
// Build: see build.sh (g++ -O3 -shared -fPIC). Loaded via ctypes
// (runtime/native.py).

#include <algorithm>
#include <array>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

struct KeyHash {
  size_t operator()(const std::array<int32_t, 3>& k) const {
    uint64_t h = 1469598103934665603ull;
    for (int32_t v : k) {
      h ^= static_cast<uint64_t>(static_cast<uint32_t>(v));
      h *= 1099511628211ull;
    }
    return static_cast<size_t>(h);
  }
};

struct FaceRec {
  int32_t corners[3];   // original corner order (first introducing tet)
  int32_t tets[2];      // owning tets in tet-iteration order
  int32_t n_tets;
  int32_t emit_count;   // total owners seen (for non-manifold detection)
};

// vertex corner triples of the 4 faces of a tet (matches
// utils/connectivity.py::_TET_FACE_CORNERS)
constexpr int kFaceCorners[4][3] = {{0, 1, 2}, {0, 1, 3}, {0, 2, 3}, {1, 2, 3}};

}  // namespace

extern "C" {

// Returns the number of unique faces F (<= 4*n_tets), or -1 on a
// non-manifold input (a face shared by more than two tets).
//
// faces_out:     [4*n_tets, 3] int32 (first F rows filled)
// face_tets_out: [4*n_tets, 2] int32 (first F rows filled, -1 padded)
// tet_faces_out: [n_tets, 4] int32
int64_t dmrt_build_tet_connectivity(
    int64_t n_tets, const int32_t* tets, int32_t* faces_out,
    int32_t* face_tets_out, int32_t* tet_faces_out) {
  using Key = std::array<int32_t, 3>;
  std::unordered_map<Key, FaceRec, KeyHash> table;
  table.reserve(static_cast<size_t>(n_tets) * 4);

  // local face index within the map insertion pass, used to restore the
  // first-occurrence corner order
  std::vector<Key> keys;
  keys.reserve(static_cast<size_t>(n_tets) * 4);

  bool bad = false;
  for (int64_t t = 0; t < n_tets; ++t) {
    const int32_t* tv = tets + 4 * t;
    for (int fi = 0; fi < 4; ++fi) {
      int32_t c0 = tv[kFaceCorners[fi][0]];
      int32_t c1 = tv[kFaceCorners[fi][1]];
      int32_t c2 = tv[kFaceCorners[fi][2]];
      Key key = {c0, c1, c2};
      std::sort(key.begin(), key.end());
      auto it = table.find(key);
      if (it == table.end()) {
        FaceRec rec;
        rec.corners[0] = c0;
        rec.corners[1] = c1;
        rec.corners[2] = c2;
        rec.tets[0] = static_cast<int32_t>(t);
        rec.tets[1] = -1;
        rec.n_tets = 1;
        rec.emit_count = 1;
        table.emplace(key, rec);
        keys.push_back(key);
      } else {
        FaceRec& rec = it->second;
        rec.emit_count += 1;
        if (rec.n_tets < 2) {
          rec.tets[rec.n_tets] = static_cast<int32_t>(t);
          rec.n_tets += 1;
        } else {
          bad = true;
        }
      }
    }
  }
  if (bad) return -1;

  // face ids in lexicographically sorted key order (matches np.unique)
  std::sort(keys.begin(), keys.end());
  std::unordered_map<Key, int32_t, KeyHash> ids;
  ids.reserve(keys.size());
  for (size_t i = 0; i < keys.size(); ++i) {
    ids.emplace(keys[i], static_cast<int32_t>(i));
    const FaceRec& rec = table.at(keys[i]);
    faces_out[3 * i + 0] = rec.corners[0];
    faces_out[3 * i + 1] = rec.corners[1];
    faces_out[3 * i + 2] = rec.corners[2];
    face_tets_out[2 * i + 0] = rec.tets[0];
    face_tets_out[2 * i + 1] = rec.tets[1];
  }

  for (int64_t t = 0; t < n_tets; ++t) {
    const int32_t* tv = tets + 4 * t;
    for (int fi = 0; fi < 4; ++fi) {
      Key key = {tv[kFaceCorners[fi][0]], tv[kFaceCorners[fi][1]],
                 tv[kFaceCorners[fi][2]]};
      std::sort(key.begin(), key.end());
      tet_faces_out[4 * t + fi] = ids.at(key);
    }
  }
  return static_cast<int64_t>(keys.size());
}

}  // extern "C"
