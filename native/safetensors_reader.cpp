// Zero-copy mmap safetensors reader.
//
// TPU-native runtime component replacing the Python-side checkpoint read path
// (the reference loads every shard through python safetensors into host
// tensors, Model/utils.py:53-69). This reader mmaps the shard and exposes
// tensor views directly into the page cache, so host RAM holds at most one
// copy of the weights and the Python layer can hand slices straight to
// jax.device_put — no per-tensor allocation or copy on the host path.
//
// C API (ctypes-friendly):
//   stro_open(path)            -> handle | NULL
//   stro_error(handle)         -> last error string (valid until close)
//   stro_num_tensors(handle)   -> n
//   stro_name(handle, i)       -> tensor name
//   stro_info(handle, name, dtype_out[16], shape_out[8], &ndim, &nbytes)
//   stro_data_offset(handle, name) -> absolute file offset of payload | -1
//                              -> data pointer | NULL
//   stro_close(handle)
//
// Build: g++ -O2 -std=c++17 -shared -fPIC safetensors_reader.cpp -o libstreader.so

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct TensorMeta {
  std::string dtype;
  std::vector<int64_t> shape;
  int64_t begin = 0;
  int64_t end = 0;
};

struct Reader {
  int fd = -1;
  const uint8_t* base = nullptr;  // mmap base
  size_t size = 0;
  const uint8_t* data = nullptr;  // start of the tensor-data section
  size_t data_size = 0;
  std::vector<std::string> names;
  std::unordered_map<std::string, TensorMeta> tensors;
  std::string error;
};

// --- minimal JSON parser for the safetensors header subset ----------------

struct Parser {
  const char* p;
  const char* end;
  std::string err;

  bool fail(const char* msg) {
    if (err.empty()) err = msg;
    return false;
  }
  void ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) ++p;
  }
  bool expect(char c) {
    ws();
    if (p >= end || *p != c) return fail("unexpected character");
    ++p;
    return true;
  }
  bool parse_string(std::string* out) {
    ws();
    if (p >= end || *p != '"') return fail("expected string");
    ++p;
    out->clear();
    while (p < end && *p != '"') {
      if (*p == '\\') {
        ++p;
        if (p >= end) return fail("bad escape");
        switch (*p) {
          case 'n': out->push_back('\n'); break;
          case 't': out->push_back('\t'); break;
          case 'r': out->push_back('\r'); break;
          case 'u': {  // skip \uXXXX (header names are ASCII in practice)
            if (end - p < 5) return fail("bad \\u escape");
            p += 4;
            out->push_back('?');
            break;
          }
          default: out->push_back(*p); break;
        }
        ++p;
      } else {
        out->push_back(*p++);
      }
    }
    if (p >= end) return fail("unterminated string");
    ++p;
    return true;
  }
  bool parse_int(int64_t* out) {
    ws();
    bool neg = false;
    if (p < end && *p == '-') { neg = true; ++p; }
    if (p >= end || *p < '0' || *p > '9') return fail("expected integer");
    int64_t v = 0;
    while (p < end && *p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
    *out = neg ? -v : v;
    return true;
  }
  // skip any JSON value (for __metadata__)
  bool skip_value() {
    ws();
    if (p >= end) return fail("eof");
    if (*p == '"') { std::string s; return parse_string(&s); }
    if (*p == '{') {
      ++p; ws();
      if (p < end && *p == '}') { ++p; return true; }
      while (true) {
        std::string k;
        if (!parse_string(&k) || !expect(':') || !skip_value()) return false;
        ws();
        if (p < end && *p == ',') { ++p; continue; }
        return expect('}');
      }
    }
    if (*p == '[') {
      ++p; ws();
      if (p < end && *p == ']') { ++p; return true; }
      while (true) {
        if (!skip_value()) return false;
        ws();
        if (p < end && *p == ',') { ++p; continue; }
        return expect(']');
      }
    }
    // number / true / false / null
    while (p < end && *p != ',' && *p != '}' && *p != ']' &&
           *p != ' ' && *p != '\n' && *p != '\t' && *p != '\r')
      ++p;
    return true;
  }
};

bool parse_header(Reader* r, const char* hdr, size_t hdr_len) {
  Parser ps{hdr, hdr + hdr_len};
  if (!ps.expect('{')) { r->error = ps.err; return false; }
  ps.ws();
  if (ps.p < ps.end && *ps.p == '}') return true;  // empty
  while (true) {
    std::string name;
    if (!ps.parse_string(&name) || !ps.expect(':')) { r->error = ps.err; return false; }
    if (name == "__metadata__") {
      if (!ps.skip_value()) { r->error = ps.err; return false; }
    } else {
      TensorMeta tm;
      if (!ps.expect('{')) { r->error = ps.err; return false; }
      while (true) {
        std::string key;
        if (!ps.parse_string(&key) || !ps.expect(':')) { r->error = ps.err; return false; }
        if (key == "dtype") {
          if (!ps.parse_string(&tm.dtype)) { r->error = ps.err; return false; }
        } else if (key == "shape") {
          if (!ps.expect('[')) { r->error = ps.err; return false; }
          ps.ws();
          if (ps.p < ps.end && *ps.p == ']') {
            ++ps.p;
          } else {
            while (true) {
              int64_t d;
              if (!ps.parse_int(&d)) { r->error = ps.err; return false; }
              tm.shape.push_back(d);
              ps.ws();
              if (ps.p < ps.end && *ps.p == ',') { ++ps.p; continue; }
              if (!ps.expect(']')) { r->error = ps.err; return false; }
              break;
            }
          }
        } else if (key == "data_offsets") {
          if (!ps.expect('[') || !ps.parse_int(&tm.begin) || !ps.expect(',') ||
              !ps.parse_int(&tm.end) || !ps.expect(']')) {
            r->error = ps.err.empty() ? "bad data_offsets" : ps.err;
            return false;
          }
        } else {
          if (!ps.skip_value()) { r->error = ps.err; return false; }
        }
        ps.ws();
        if (ps.p < ps.end && *ps.p == ',') { ++ps.p; continue; }
        if (!ps.expect('}')) { r->error = ps.err; return false; }
        break;
      }
      if (tm.begin < 0 || tm.end < tm.begin ||
          static_cast<size_t>(tm.end) > r->data_size) {
        r->error = "tensor '" + name + "' data_offsets out of range";
        return false;
      }
      r->names.push_back(name);
      r->tensors.emplace(std::move(name), std::move(tm));
    }
    ps.ws();
    if (ps.p < ps.end && *ps.p == ',') { ++ps.p; continue; }
    if (!ps.expect('}')) { r->error = ps.err; return false; }
    break;
  }
  return true;
}

}  // namespace

extern "C" {

void* stro_open(const char* path) {
  auto* r = new Reader();
  r->fd = ::open(path, O_RDONLY);
  if (r->fd < 0) {
    delete r;
    return nullptr;
  }
  struct stat st;
  if (fstat(r->fd, &st) != 0 || st.st_size < 8) {
    ::close(r->fd);
    delete r;
    return nullptr;
  }
  r->size = static_cast<size_t>(st.st_size);
  void* m = mmap(nullptr, r->size, PROT_READ, MAP_PRIVATE, r->fd, 0);
  if (m == MAP_FAILED) {
    ::close(r->fd);
    delete r;
    return nullptr;
  }
  r->base = static_cast<const uint8_t*>(m);
  madvise(m, r->size, MADV_SEQUENTIAL);

  uint64_t hdr_len;
  std::memcpy(&hdr_len, r->base, 8);  // little-endian per spec
  if (hdr_len > r->size - 8) {
    munmap(m, r->size);
    ::close(r->fd);
    delete r;
    return nullptr;
  }
  r->data = r->base + 8 + hdr_len;
  r->data_size = r->size - 8 - hdr_len;
  if (!parse_header(r, reinterpret_cast<const char*>(r->base + 8), hdr_len)) {
    // keep handle alive so the caller can read stro_error, but mark empty
    r->names.clear();
    r->tensors.clear();
    if (r->error.empty()) r->error = "header parse failed";
  }
  return r;
}

const char* stro_error(void* h) {
  auto* r = static_cast<Reader*>(h);
  return r->error.c_str();
}

int stro_num_tensors(void* h) {
  return static_cast<int>(static_cast<Reader*>(h)->names.size());
}

const char* stro_name(void* h, int i) {
  auto* r = static_cast<Reader*>(h);
  if (i < 0 || static_cast<size_t>(i) >= r->names.size()) return nullptr;
  return r->names[i].c_str();
}

const uint8_t* stro_info(void* h, const char* name, char* dtype_out,
                         int64_t* shape_out, int* ndim_out, int64_t* nbytes_out) {
  auto* r = static_cast<Reader*>(h);
  auto it = r->tensors.find(name);
  if (it == r->tensors.end()) return nullptr;
  const TensorMeta& tm = it->second;
  std::snprintf(dtype_out, 16, "%s", tm.dtype.c_str());
  int nd = static_cast<int>(tm.shape.size());
  if (nd > 8) return nullptr;
  for (int i = 0; i < nd; ++i) shape_out[i] = tm.shape[i];
  *ndim_out = nd;
  *nbytes_out = tm.end - tm.begin;
  return r->data + tm.begin;
}

int64_t stro_data_offset(void* h, const char* name) {
  // Absolute file offset of the tensor's payload — lets bindings map the
  // file themselves (e.g. through a lifetime-tracked buffer) instead of
  // borrowing this reader's mapping.
  auto* r = static_cast<Reader*>(h);
  auto it = r->tensors.find(name);
  if (it == r->tensors.end()) return -1;
  return static_cast<int64_t>(r->data - r->base) + it->second.begin;
}

void stro_close(void* h) {
  auto* r = static_cast<Reader*>(h);
  if (r->base) munmap(const_cast<uint8_t*>(r->base), r->size);
  if (r->fd >= 0) ::close(r->fd);
  delete r;
}

}  // extern "C"
