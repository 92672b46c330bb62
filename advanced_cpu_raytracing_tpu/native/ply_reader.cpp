// Native PLY reader: binary little-endian fast path (the format used by the
// reference's committed assets), tri + quad faces split like
// parser.cpp:1428-1439.  ASCII and exotic layouts fall back to the python
// reader (scene/ply.py).
//
// API: two-phase.  acrt_ply_open parses the header + counts, the caller
// allocates, acrt_ply_read fills the buffers.  Only supports files whose
// vertex element leads with float x,y,z properties and whose face element is
// a single (uint8/int count, int32 indices) list — everything else returns a
// negative code so the caller falls back.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>

namespace {

struct PlyInfo {
  long data_offset = 0;
  int64_t n_vert = 0;
  int64_t n_face_rows = 0;
  int vert_stride = 0;   // bytes per vertex row
  int vert_xyz_off = 0;  // byte offset of x within the row
  bool count_is_u8 = true;
  bool idx_is_i32 = true;
  std::string path;
};

int dtype_size(const std::string& t) {
  if (t == "char" || t == "uchar" || t == "int8" || t == "uint8") return 1;
  if (t == "short" || t == "ushort" || t == "int16" || t == "uint16") return 2;
  if (t == "int" || t == "uint" || t == "int32" || t == "uint32" ||
      t == "float" || t == "float32") return 4;
  if (t == "double" || t == "float64") return 8;
  return -1;
}

}  // namespace

extern "C" {

// Returns 0 on success (fast path supported), <0 otherwise.
// out: [n_vertices, n_face_rows] written to counts[0..1]; handle via path re-parse.
int32_t acrt_ply_open(const char* path, int64_t* counts) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char line[4096];
  if (!std::fgets(line, sizeof line, f) || std::strncmp(line, "ply", 3)) {
    std::fclose(f);
    return -2;
  }
  PlyInfo info;
  bool little = false;
  std::string cur_elem;
  int vert_off = 0;
  int prop_index_in_vertex = 0;
  int xyz_found = 0;
  bool face_list_seen = false;
  while (std::fgets(line, sizeof line, f)) {
    std::string s(line);
    while (!s.empty() && (s.back() == '\n' || s.back() == '\r')) s.pop_back();
    if (s.rfind("comment", 0) == 0 || s.rfind("obj_info", 0) == 0) continue;
    if (s.rfind("format", 0) == 0) {
      little = s.find("binary_little_endian") != std::string::npos;
      if (!little) { std::fclose(f); return -3; }
    } else if (s.rfind("element", 0) == 0) {
      char name[256];
      long long cnt;
      if (std::sscanf(s.c_str(), "element %255s %lld", name, &cnt) != 2) {
        std::fclose(f); return -4;
      }
      cur_elem = name;
      if (cur_elem == "vertex") info.n_vert = cnt;
      else if (cur_elem == "face") info.n_face_rows = cnt;
      else if (cnt != 0) { std::fclose(f); return -5; }  // unknown nonempty elem
    } else if (s.rfind("property", 0) == 0) {
      if (cur_elem == "vertex") {
        char t[64], n[256];
        if (s.rfind("property list", 0) == 0) { std::fclose(f); return -6; }
        if (std::sscanf(s.c_str(), "property %63s %255s", t, n) != 2) {
          std::fclose(f); return -7;
        }
        int sz = dtype_size(t);
        if (sz < 0) { std::fclose(f); return -8; }
        std::string pname(n);
        if (pname == "x") {
          if (std::string(t) != "float" && std::string(t) != "float32") {
            std::fclose(f); return -9;
          }
          info.vert_xyz_off = vert_off;
          xyz_found |= 1;
        } else if (pname == "y") xyz_found |= 2;
        else if (pname == "z") xyz_found |= 4;
        vert_off += sz;
        prop_index_in_vertex++;
      } else if (cur_elem == "face") {
        char ct[64], it[64], n[256];
        if (std::sscanf(s.c_str(), "property list %63s %63s %255s",
                        ct, it, n) != 3) { std::fclose(f); return -10; }
        if (dtype_size(ct) != 1) { std::fclose(f); return -11; }
        if (dtype_size(it) != 4 || it[0] == 'f') { std::fclose(f); return -12; }
        face_list_seen = true;
      }
    } else if (s == "end_header") {
      info.data_offset = std::ftell(f);
      break;
    }
  }
  std::fclose(f);
  if (xyz_found != 7 || !face_list_seen || info.n_vert <= 0) return -13;
  info.vert_stride = vert_off;
  counts[0] = info.n_vert;
  counts[1] = info.n_face_rows;
  counts[2] = info.data_offset;
  counts[3] = info.vert_stride;
  counts[4] = info.vert_xyz_off;
  return 0;
}

// verts: (n_vert,3) float32 out.  tris: (max_tris,3) int32 out where
// max_tris = 2*n_face_rows.  Returns number of triangles, or <0 on error.
int32_t acrt_ply_read(const char* path, const int64_t* counts,
                      float* verts, int32_t* tris) {
  const int64_t n_vert = counts[0], n_rows = counts[1];
  const long off = (long)counts[2];
  const int stride = (int)counts[3], xyz_off = (int)counts[4];

  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, off, SEEK_SET);

  std::vector<unsigned char> row(stride);
  for (int64_t i = 0; i < n_vert; i++) {
    if (std::fread(row.data(), 1, stride, f) != (size_t)stride) {
      std::fclose(f); return -2;
    }
    std::memcpy(verts + 3 * i, row.data() + xyz_off, 12);
  }
  int64_t nt = 0;
  for (int64_t r = 0; r < n_rows; r++) {
    unsigned char cnt;
    if (std::fread(&cnt, 1, 1, f) != 1) { std::fclose(f); return -3; }
    int32_t idx[4];
    if (cnt == 3) {
      if (std::fread(idx, 4, 3, f) != 3) { std::fclose(f); return -4; }
      tris[3 * nt + 0] = idx[0]; tris[3 * nt + 1] = idx[1];
      tris[3 * nt + 2] = idx[2];
      nt++;
    } else if (cnt == 4) {
      if (std::fread(idx, 4, 4, f) != 4) { std::fclose(f); return -5; }
      // quad -> (v0,v1,v2) + (v2,v3,v0) (parser.cpp:1431-1437)
      tris[3 * nt + 0] = idx[0]; tris[3 * nt + 1] = idx[1];
      tris[3 * nt + 2] = idx[2];
      nt++;
      tris[3 * nt + 0] = idx[2]; tris[3 * nt + 1] = idx[3];
      tris[3 * nt + 2] = idx[0];
      nt++;
    } else {
      std::fclose(f);
      return -6;  // unsupported arity -> python fallback raises like the ref
    }
  }
  std::fclose(f);
  return (int32_t)nt;
}

}  // extern "C"
