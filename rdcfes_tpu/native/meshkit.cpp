// meshkit: native host-side mesh runtime for rdcfes_tpu.
//
// The reference delegates all host-side mesh work to libMesh (C++): Gmsh
// parsing, boundary topology, dof/sparsity construction, partitioning
// (SURVEY.md section 2.3).  This library is the TPU-framework equivalent —
// the operations that sit OFF the XLA compute path but on the critical
// startup path for production-scale meshes:
//
//   * fast Gmsh 2.x ASCII parsing (strtod streaming, no per-line Python)
//   * node-pair block-CSR sparsity construction + per-(element,i,j) slot
//     table (the host precompute that makes device assembly a pure
//     segment-sum)
//   * boundary-face extraction via sorted-face hashing
//   * recursive coordinate bisection (RCB) element partitioning for
//     device sharding (locality-preserving replacement for METIS)
//
// Exposed as a C ABI consumed through ctypes (rdcfes_tpu/native/__init__.py);
// every entry point has a NumPy fallback so the Python package works without
// the compiled library.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Gmsh 2.x ASCII parser
// ---------------------------------------------------------------------------
// Parses the $Nodes and $Elements sections.  Returns 0 on success.
// Outputs are allocated with malloc and owned by the caller (free via
// meshkit_free).
struct GmshMesh {
  int64_t n_nodes;
  double* coords;        // [n_nodes * 3]
  int64_t n_vol;         // volume elements
  int32_t vol_type;      // gmsh code: 4 = TET4, 5 = HEX8
  int32_t* vol_conn;     // [n_vol * k]
  int32_t* vol_phys;     // [n_vol]
  int64_t n_surf;
  int32_t surf_type;     // 2 = TRI3, 3 = QUAD4
  int32_t* surf_conn;    // [n_surf * kf]
  int32_t* surf_phys;    // [n_surf]
};

static int gmsh_nnodes(int t) {
  switch (t) {
    case 1: return 2; case 2: return 3; case 3: return 4;
    case 4: return 4; case 5: return 8; case 6: return 6;
    case 7: return 5; case 15: return 1; default: return -1;
  }
}

void meshkit_free(void* p) { free(p); }

int meshkit_read_gmsh(const char* path, GmshMesh* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(size + 1);
  if (fread(buf.data(), 1, size, f) != (size_t)size) { fclose(f); return 2; }
  fclose(f);
  buf[size] = 0;
  char* p = buf.data();

  auto seek_section = [&](const char* name) -> char* {
    char* s = strstr(p, name);
    if (!s) return nullptr;
    s = strchr(s, '\n');
    return s ? s + 1 : nullptr;
  };

  // --- nodes ---
  char* s = seek_section("$Nodes");
  if (!s) return 3;
  char* end;
  int64_t n_nodes = strtoll(s, &end, 10);
  if (end == s || n_nodes <= 0) return 3;     // truncated/garbage header
  s = end;
  out->n_nodes = n_nodes;
  out->coords = (double*)malloc(sizeof(double) * n_nodes * 3);
  std::vector<int64_t> gmsh_id(n_nodes);
  int64_t max_id = 0;
  for (int64_t i = 0; i < n_nodes; ++i) {
    int64_t id = strtoll(s, &end, 10);
    if (end == s || id <= 0) { free(out->coords); out->coords = nullptr; return 3; }
    s = end;
    gmsh_id[i] = id;
    if (id > max_id) max_id = id;
    for (int d = 0; d < 3; ++d) {
      out->coords[i * 3 + d] = strtod(s, &end);
      if (end == s) { free(out->coords); out->coords = nullptr; return 3; }
      s = end;
    }
  }
  // id -> index map (gmsh files use 1-based, possibly sparse ids)
  std::vector<int32_t> id_map(max_id + 1, -1);
  for (int64_t i = 0; i < n_nodes; ++i) id_map[gmsh_id[i]] = (int32_t)i;

  // --- elements ---
  // error paths from here on free the node buffer allocated above
  auto fail = [&](int code) { free(out->coords); out->coords = nullptr; return code; };
  s = strstr(s, "$Elements");
  if (!s) return fail(4);
  s = strchr(s, '\n');
  if (!s) return fail(4);                      // truncated after header
  s += 1;
  int64_t n_elems = strtoll(s, &end, 10);
  if (end == s || n_elems < 0) return fail(4);
  s = end;
  // node-id lookup with validity checks: ids outside (0, max_id] or ids
  // never defined in $Nodes are file corruption, not silent -1 conn
  auto lookup = [&](int64_t g) -> int32_t {
    if (g <= 0 || g > max_id) return -1;
    return id_map[g];
  };

  std::vector<int32_t> vol_conn, vol_phys, surf_conn, surf_phys;
  int vol_type = -1, surf_type = -1;
  for (int64_t e = 0; e < n_elems; ++e) {
    strtoll(s, &end, 10); s = end;              // element id
    int etype = (int)strtol(s, &end, 10); s = end;
    int ntags = (int)strtol(s, &end, 10); s = end;
    int phys = 0;
    for (int t = 0; t < ntags; ++t) {
      long tag = strtol(s, &end, 10); s = end;
      if (t == 0) phys = (int)tag;
    }
    int k = gmsh_nnodes(etype);
    if (k < 0) return fail(5);
    if (etype == 4 || etype == 5) {             // TET4 / HEX8
      if (vol_type == -1) vol_type = etype;
      else if (vol_type != etype) return fail(6);  // mixed volume types
      for (int i = 0; i < k; ++i) {
        int64_t g = strtoll(s, &end, 10);
        if (end == s) return fail(8);
        s = end;
        int32_t idx = lookup(g);
        if (idx < 0) return fail(8);           // unknown/out-of-range node id
        vol_conn.push_back(idx);
      }
      vol_phys.push_back(phys);
    } else if (etype == 2 || etype == 3) {      // TRI3 / QUAD4
      if (surf_type == -1) surf_type = etype;
      for (int i = 0; i < k; ++i) {
        int64_t g = strtoll(s, &end, 10);
        if (end == s) return fail(8);
        s = end;
        int32_t idx = lookup(g);
        if (idx < 0) return fail(8);           // unknown/out-of-range node id
        surf_conn.push_back(idx);
      }
      surf_phys.push_back(phys);
    } else if (etype == 6 || etype == 7) {      // PRISM6 / PYRAMID5
      // mixed-element meshes take the Python MixedMesh path; bailing out
      // (instead of skipping) prevents silently dropping volume elements
      return fail(6);
    } else {                                    // points / edges: skip
      for (int i = 0; i < k; ++i) { strtoll(s, &end, 10); s = end; }
    }
  }
  if (vol_type == -1) return fail(7);

  out->vol_type = vol_type;
  out->n_vol = (int64_t)vol_phys.size();
  out->vol_conn = (int32_t*)malloc(sizeof(int32_t) * vol_conn.size());
  memcpy(out->vol_conn, vol_conn.data(), sizeof(int32_t) * vol_conn.size());
  out->vol_phys = (int32_t*)malloc(sizeof(int32_t) * vol_phys.size());
  memcpy(out->vol_phys, vol_phys.data(), sizeof(int32_t) * vol_phys.size());
  out->surf_type = surf_type;
  out->n_surf = (int64_t)surf_phys.size();
  if (out->n_surf) {
    out->surf_conn = (int32_t*)malloc(sizeof(int32_t) * surf_conn.size());
    memcpy(out->surf_conn, surf_conn.data(), sizeof(int32_t) * surf_conn.size());
    out->surf_phys = (int32_t*)malloc(sizeof(int32_t) * surf_phys.size());
    memcpy(out->surf_phys, surf_phys.data(), sizeof(int32_t) * surf_phys.size());
  } else {
    out->surf_conn = nullptr;
    out->surf_phys = nullptr;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Node-pair block-CSR sparsity + slot table
// ---------------------------------------------------------------------------
// From connectivity [E, K] over n_nodes, produce the sorted unique node
// pairs (rows, cols) and the slot index of every (element, i, j).
// Returns nnz, or -1 on error.  rows/cols sized nnz (malloc'd); slots sized
// E*K*K (caller-allocated).
int64_t meshkit_build_sparsity(const int32_t* conn, int64_t E, int32_t K,
                               int64_t n_nodes, int32_t** rows_out,
                               int32_t** cols_out, int32_t* slots) {
  const int64_t n_pairs = E * K * K;
  std::vector<std::pair<int64_t, int64_t>> keyed(n_pairs);
  for (int64_t e = 0; e < E; ++e) {
    const int32_t* ce = conn + e * K;
    for (int i = 0; i < K; ++i)
      for (int j = 0; j < K; ++j) {
        int64_t idx = (e * K + i) * K + j;
        keyed[idx] = {(int64_t)ce[i] * n_nodes + ce[j], idx};
      }
  }
  std::sort(keyed.begin(), keyed.end());
  // count unique
  int64_t nnz = 0;
  int64_t prev = -1;
  for (auto& kv : keyed)
    if (kv.first != prev) { ++nnz; prev = kv.first; }
  *rows_out = (int32_t*)malloc(sizeof(int32_t) * nnz);
  *cols_out = (int32_t*)malloc(sizeof(int32_t) * nnz);
  prev = -1;
  int64_t slot = -1;
  for (auto& kv : keyed) {
    if (kv.first != prev) {
      ++slot;
      prev = kv.first;
      (*rows_out)[slot] = (int32_t)(kv.first / n_nodes);
      (*cols_out)[slot] = (int32_t)(kv.first % n_nodes);
    }
    slots[kv.second] = (int32_t)slot;
  }
  return nnz;
}

// ---------------------------------------------------------------------------
// Recursive coordinate bisection element partitioning
// ---------------------------------------------------------------------------
// centers [E, 3], n_parts must be a power of two times anything — we split
// recursively along the longest axis into equal halves until n_parts blocks
// exist.  part_out sized E.
static void rcb(const double* centers, std::vector<int64_t>& ids, int lo_part,
                int n_parts, int32_t* part_out) {
  if (n_parts == 1 || ids.size() <= 1) {
    for (auto e : ids) part_out[e] = lo_part;
    return;
  }
  // longest axis of the bounding box
  double mn[3] = {1e300, 1e300, 1e300}, mx[3] = {-1e300, -1e300, -1e300};
  for (auto e : ids)
    for (int d = 0; d < 3; ++d) {
      double c = centers[e * 3 + d];
      if (c < mn[d]) mn[d] = c;
      if (c > mx[d]) mx[d] = c;
    }
  int axis = 0;
  for (int d = 1; d < 3; ++d)
    if (mx[d] - mn[d] > mx[axis] - mn[axis]) axis = d;
  int left_parts = n_parts / 2;
  size_t split = ids.size() * left_parts / n_parts;
  std::nth_element(ids.begin(), ids.begin() + split, ids.end(),
                   [&](int64_t a, int64_t b) {
                     return centers[a * 3 + axis] < centers[b * 3 + axis];
                   });
  std::vector<int64_t> left(ids.begin(), ids.begin() + split);
  std::vector<int64_t> right(ids.begin() + split, ids.end());
  rcb(centers, left, lo_part, left_parts, part_out);
  rcb(centers, right, lo_part + left_parts, n_parts - left_parts, part_out);
}

void meshkit_partition_rcb(const double* centers, int64_t E, int32_t n_parts,
                           int32_t* part_out) {
  std::vector<int64_t> ids(E);
  for (int64_t e = 0; e < E; ++e) ids[e] = e;
  rcb(centers, ids, 0, n_parts, part_out);
}

// ---------------------------------------------------------------------------
// Bipartite edge coloring by recursive Euler-circuit halving (Gabow)
// ---------------------------------------------------------------------------
// Host-side router of the Benes permutation kernels (fem/benes.py): a
// 2^k-regular bipartite multigraph splits into perfect matchings by
// repeatedly orienting Euler circuits and keeping each direction class.
// This is the setup-time critical path of the TPU fast-gather plans
// (tens of seconds in pure Python at production scale, dominated by the
// per-edge circuit walks), replacing the routing libMesh/PETSc never
// needed because CPUs gather natively.

namespace {

struct EulerWS {  // reusable workspace across recursion levels
  std::vector<int64_t> adj;     // 2E edge slots sorted by endpoint
  std::vector<int64_t> ptr;     // nv + 1
  std::vector<int64_t> cursor;  // per-vertex scan position
  std::vector<int64_t> deg;
  std::vector<uint8_t> used;    // per local edge
  std::vector<uint8_t> side;    // per local edge: true = left-to-right
};

// Split the sub-multigraph over edge ids `idx` into two regular halves.
// side[i] (local, parallel to idx) = true for the first half.
void euler_split(const int64_t* src, const int64_t* dst, int64_t n_left,
                 int64_t n_right, const std::vector<int64_t>& idx,
                 EulerWS& ws) {
  const int64_t E = (int64_t)idx.size();
  const int64_t nv = n_left + n_right;
  ws.deg.assign(nv, 0);
  for (int64_t i = 0; i < E; ++i) {
    ++ws.deg[src[idx[i]]];
    ++ws.deg[n_left + dst[idx[i]]];
  }
  ws.ptr.assign(nv + 1, 0);
  for (int64_t v = 0; v < nv; ++v) ws.ptr[v + 1] = ws.ptr[v] + ws.deg[v];
  ws.adj.resize(2 * E);
  ws.cursor.assign(ws.ptr.begin(), ws.ptr.end() - 1);
  for (int64_t i = 0; i < E; ++i) {
    ws.adj[ws.cursor[src[idx[i]]]++] = i;
    ws.adj[ws.cursor[n_left + dst[idx[i]]]++] = i;
  }
  ws.cursor.assign(ws.ptr.begin(), ws.ptr.end() - 1);
  ws.used.assign(E, 0);
  ws.side.assign(E, 0);
  for (int64_t start_v = 0; start_v < nv; ++start_v) {
    for (;;) {
      int64_t c = ws.cursor[start_v];
      while (c < ws.ptr[start_v + 1] && ws.used[ws.adj[c]]) ++c;
      ws.cursor[start_v] = c;
      if (c >= ws.ptr[start_v + 1]) break;
      int64_t v = start_v;
      for (;;) {  // walk one circuit, orienting edges alternately
        int64_t cv = ws.cursor[v];
        while (cv < ws.ptr[v + 1] && ws.used[ws.adj[cv]]) ++cv;
        ws.cursor[v] = cv;
        if (cv >= ws.ptr[v + 1]) break;
        int64_t e = ws.adj[cv];
        ws.used[e] = 1;
        if (v < n_left) {
          ws.side[e] = 1;
          v = n_left + dst[idx[e]];
        } else {
          ws.side[e] = 0;
          v = src[idx[e]];
        }
      }
    }
  }
}

void color_rec(const int64_t* src, const int64_t* dst, int64_t n_left,
               int64_t n_right, std::vector<int64_t>& idx, int32_t base,
               int32_t k, int32_t* colors, EulerWS& ws) {
  if (k == 1) {
    for (int64_t e : idx) colors[e] = base;
    return;
  }
  euler_split(src, dst, n_left, n_right, idx, ws);
  std::vector<int64_t> a, b;
  a.reserve(idx.size() / 2);
  b.reserve(idx.size() / 2);
  for (size_t i = 0; i < idx.size(); ++i)
    (ws.side[i] ? a : b).push_back(idx[i]);
  color_rec(src, dst, n_left, n_right, a, base, k / 2, colors, ws);
  color_rec(src, dst, n_left, n_right, b, base + k / 2, k / 2, colors, ws);
}

}  // namespace

// Color n_seg independent `degree`-regular bipartite multigraphs (edges of
// segment s are [seg_ptr[s], seg_ptr[s+1]) in src/dst, vertex ids local to
// the segment).  degree must be a power of two.  colors: out, per edge, in
// [0, degree).  Returns 0 on success.
int32_t meshkit_benes_color_batch(const int64_t* src, const int64_t* dst,
                                  const int64_t* seg_ptr, int64_t n_seg,
                                  int64_t n_left, int64_t n_right,
                                  int32_t degree, int32_t* colors) {
  if (degree <= 0 || (degree & (degree - 1))) return -1;
  EulerWS ws;
  for (int64_t s = 0; s < n_seg; ++s) {
    int64_t lo = seg_ptr[s], hi = seg_ptr[s + 1];
    if (hi < lo) return -1;
    std::vector<int64_t> idx((size_t)(hi - lo));
    for (int64_t i = lo; i < hi; ++i) idx[(size_t)(i - lo)] = i;
    color_rec(src, dst, n_left, n_right, idx, 0, degree, colors, ws);
  }
  return 0;
}

}  // extern "C"
