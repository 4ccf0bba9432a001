// Native checkpoint loader: mmap-based zero-copy safetensors reader.
//
// TPU-native replacement for the runtime role mmgp's fast safetensors
// loader plays in the reference (reached via
// offload.fast_load_transformers_model, /root/reference/ltx_video/
// ltxv.py:171,181,207 and wan loaders): the file is mapped once, the JSON
// header parsed natively, and tensor payloads exposed as zero-copy
// pointers into the mapping. A parallel page-prefetch pool warms the
// mapping so the first device_put streams at disk/page-cache bandwidth
// instead of faulting page-by-page.
//
// C ABI (consumed from Python via ctypes — no pybind11 in this image):
//   st_open(path)            -> handle (0 on failure; st_error() has why)
//   st_num_tensors(h)        -> int64
//   st_tensor_name(h, i)     -> const char*
//   st_tensor_dtype(h, i)    -> const char*  ("F32", "BF16", "I8", ...)
//   st_tensor_ndim(h, i)     -> int
//   st_tensor_shape(h, i, out int64[ndim])
//   st_tensor_data(h, i)     -> const void*  (zero-copy into the mmap)
//   st_tensor_nbytes(h, i)   -> int64
//   st_metadata(h)           -> const char*  (the __metadata__ JSON or "")
//   st_prefetch(h, nthreads) -> void         (parallel page-touch)
//   st_close(h)

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct TensorInfo {
  std::string name;
  std::string dtype;
  std::vector<int64_t> shape;
  uint64_t begin = 0, end = 0;  // offsets into the data section
};

struct Handle {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t map_size = 0;
  const uint8_t* data = nullptr;  // payload base (after header)
  std::vector<TensorInfo> tensors;
  std::string metadata;
};

thread_local std::string g_error;

// --- minimal JSON scanning (safetensors headers are a flat object of
// objects; values are strings, int arrays, or the __metadata__ string map)

struct Cursor {
  const char* p;
  const char* end;
  bool fail = false;

  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
      ++p;
  }
  bool expect(char c) {
    skip_ws();
    if (p < end && *p == c) { ++p; return true; }
    fail = true;
    return false;
  }
  bool peek(char c) {
    skip_ws();
    return p < end && *p == c;
  }
  std::string parse_string() {
    skip_ws();
    std::string out;
    if (p >= end || *p != '"') { fail = true; return out; }
    ++p;
    while (p < end && *p != '"') {
      if (*p == '\\' && p + 1 < end) {
        // full JSON escape handling: tensor keys from other writers may
        // legally contain \uXXXX etc.; dropping the backslash and
        // keeping the letter would silently corrupt the key (a
        // wrong-weights bug with no error)
        char e = p[1];
        p += 2;
        switch (e) {
          case 'n': out.push_back('\n'); break;
          case 't': out.push_back('\t'); break;
          case 'r': out.push_back('\r'); break;
          case 'b': out.push_back('\b'); break;
          case 'f': out.push_back('\f'); break;
          case '"': out.push_back('"'); break;
          case '\\': out.push_back('\\'); break;
          case '/': out.push_back('/'); break;
          case 'u': {
            if (p + 4 > end) { fail = true; return out; }
            unsigned cp = 0;
            for (int k = 0; k < 4; ++k) {
              char c = p[k];
              cp <<= 4;
              if (c >= '0' && c <= '9') cp |= (unsigned)(c - '0');
              else if (c >= 'a' && c <= 'f') cp |= (unsigned)(c - 'a' + 10);
              else if (c >= 'A' && c <= 'F') cp |= (unsigned)(c - 'A' + 10);
              else { fail = true; return out; }
            }
            p += 4;
            // UTF-8 encode (BMP only; surrogate pairs are not used by
            // any known checkpoint writer — reject rather than corrupt)
            if (cp >= 0xD800 && cp <= 0xDFFF) { fail = true; return out; }
            if (cp < 0x80) {
              out.push_back((char)cp);
            } else if (cp < 0x800) {
              out.push_back((char)(0xC0 | (cp >> 6)));
              out.push_back((char)(0x80 | (cp & 0x3F)));
            } else {
              out.push_back((char)(0xE0 | (cp >> 12)));
              out.push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
              out.push_back((char)(0x80 | (cp & 0x3F)));
            }
            break;
          }
          default: fail = true; return out;
        }
      } else {
        out.push_back(*p++);
      }
    }
    if (p >= end) { fail = true; return out; }
    ++p;  // closing quote
    return out;
  }
  int64_t parse_int() {
    skip_ws();
    bool neg = false;
    if (p < end && *p == '-') { neg = true; ++p; }
    int64_t v = 0;
    bool any = false;
    while (p < end && *p >= '0' && *p <= '9') {
      v = v * 10 + (*p - '0');
      ++p;
      any = true;
    }
    if (!any) fail = true;
    return neg ? -v : v;
  }
  // skip any JSON value (used for unknown fields)
  void skip_value() {
    skip_ws();
    if (p >= end) { fail = true; return; }
    if (*p == '"') { parse_string(); return; }
    if (*p == '{') {
      ++p;
      if (peek('}')) { ++p; return; }
      while (!fail) {
        parse_string();
        expect(':');
        skip_value();
        if (peek(',')) { ++p; continue; }
        expect('}');
        return;
      }
      return;
    }
    if (*p == '[') {
      ++p;
      if (peek(']')) { ++p; return; }
      while (!fail) {
        skip_value();
        if (peek(',')) { ++p; continue; }
        expect(']');
        return;
      }
      return;
    }
    // number / literal
    while (p < end && *p != ',' && *p != '}' && *p != ']') ++p;
  }
};

bool parse_header(const char* hdr, size_t len, Handle* h) {
  Cursor c{hdr, hdr + len};
  if (!c.expect('{')) return false;
  if (c.peek('}')) return true;
  while (!c.fail) {
    std::string key = c.parse_string();
    c.expect(':');
    if (key == "__metadata__") {
      const char* start = c.p;
      c.skip_value();
      if (!c.fail) h->metadata.assign(start, c.p - start);
    } else {
      TensorInfo t;
      t.name = key;
      c.expect('{');
      while (!c.fail) {
        std::string field = c.parse_string();
        c.expect(':');
        if (field == "dtype") {
          t.dtype = c.parse_string();
        } else if (field == "shape") {
          c.expect('[');
          if (c.peek(']')) {
            ++c.p;
          } else {
            while (!c.fail) {
              t.shape.push_back(c.parse_int());
              if (c.peek(',')) { ++c.p; continue; }
              c.expect(']');
              break;
            }
          }
        } else if (field == "data_offsets") {
          c.expect('[');
          t.begin = (uint64_t)c.parse_int();
          c.expect(',');
          t.end = (uint64_t)c.parse_int();
          c.expect(']');
        } else {
          c.skip_value();
        }
        if (c.peek(',')) { ++c.p; continue; }
        c.expect('}');
        break;
      }
      if (!c.fail) h->tensors.push_back(std::move(t));
    }
    if (c.peek(',')) { ++c.p; continue; }
    c.expect('}');
    break;
  }
  return !c.fail;
}

}  // namespace

extern "C" {

void st_close(void* hp);  // forward declaration (used by st_open cleanup)

const char* st_error() { return g_error.c_str(); }

void* st_open(const char* path) {
  g_error.clear();
  Handle* h = new Handle();
  h->fd = ::open(path, O_RDONLY);
  if (h->fd < 0) {
    g_error = std::string("open failed: ") + path;
    delete h;
    return nullptr;
  }
  struct stat st {};
  if (fstat(h->fd, &st) != 0 || st.st_size < 8) {
    g_error = "stat failed or file too small";
    ::close(h->fd);
    delete h;
    return nullptr;
  }
  h->map_size = (size_t)st.st_size;
  void* m = mmap(nullptr, h->map_size, PROT_READ, MAP_PRIVATE, h->fd, 0);
  if (m == MAP_FAILED) {
    g_error = "mmap failed";
    ::close(h->fd);
    delete h;
    return nullptr;
  }
  h->map = (const uint8_t*)m;
  madvise(m, h->map_size, MADV_SEQUENTIAL);

  uint64_t header_len = 0;
  memcpy(&header_len, h->map, 8);  // little-endian per spec
  // compare without `8 + header_len`: a corrupt length near UINT64_MAX
  // would wrap the sum past the check and drive the parser out of bounds
  if (header_len > h->map_size - 8) {
    g_error = "corrupt header length";
    st_close(h);
    return nullptr;
  }
  h->data = h->map + 8 + header_len;
  if (!parse_header((const char*)h->map + 8, header_len, h)) {
    g_error = "header parse failed";
    st_close(h);
    return nullptr;
  }
  // validate offsets
  size_t payload = h->map_size - 8 - header_len;
  for (const auto& t : h->tensors) {
    if (t.end < t.begin || t.end > payload) {
      g_error = "tensor offsets out of range: " + t.name;
      st_close(h);
      return nullptr;
    }
  }
  return h;
}

int64_t st_num_tensors(void* hp) {
  return hp ? (int64_t)((Handle*)hp)->tensors.size() : 0;
}

const char* st_tensor_name(void* hp, int64_t i) {
  Handle* h = (Handle*)hp;
  return h->tensors[(size_t)i].name.c_str();
}

const char* st_tensor_dtype(void* hp, int64_t i) {
  Handle* h = (Handle*)hp;
  return h->tensors[(size_t)i].dtype.c_str();
}

int st_tensor_ndim(void* hp, int64_t i) {
  Handle* h = (Handle*)hp;
  return (int)h->tensors[(size_t)i].shape.size();
}

void st_tensor_shape(void* hp, int64_t i, int64_t* out) {
  Handle* h = (Handle*)hp;
  const auto& s = h->tensors[(size_t)i].shape;
  for (size_t j = 0; j < s.size(); ++j) out[j] = s[j];
}

const void* st_tensor_data(void* hp, int64_t i) {
  Handle* h = (Handle*)hp;
  return h->data + h->tensors[(size_t)i].begin;
}

int64_t st_tensor_nbytes(void* hp, int64_t i) {
  Handle* h = (Handle*)hp;
  const auto& t = h->tensors[(size_t)i];
  return (int64_t)(t.end - t.begin);
}

const char* st_metadata(void* hp) {
  Handle* h = (Handle*)hp;
  return h->metadata.c_str();
}

void st_prefetch(void* hp, int nthreads) {
  Handle* h = (Handle*)hp;
  if (!h || h->map_size == 0) return;
  if (nthreads < 1) nthreads = 1;
  madvise((void*)h->map, h->map_size, MADV_WILLNEED);
  size_t chunk = (h->map_size + nthreads - 1) / nthreads;
  std::vector<std::thread> threads;
  // per-thread accumulators: an unsynchronized shared `sink +=` would be
  // a data race (volatile is not atomic); one volatile store after join
  // still defeats dead-code elimination
  std::vector<uint64_t> accs((size_t)nthreads, 0);
  for (int t = 0; t < nthreads; ++t) {
    size_t begin = t * chunk;
    size_t end = std::min(h->map_size, begin + chunk);
    if (begin >= end) break;
    uint64_t* acc_slot = &accs[(size_t)t];
    threads.emplace_back([h, begin, end, acc_slot] {
      uint64_t acc = 0;
      const size_t page = 4096;
      for (size_t off = begin; off < end; off += page) acc += h->map[off];
      *acc_slot = acc;
    });
  }
  for (auto& th : threads) th.join();
  uint64_t total = 0;
  for (uint64_t a : accs) total += a;
  static volatile uint64_t sink = 0;
  sink = sink + total;  // read+write so -Wunused stays quiet too
}

void st_close(void* hp) {
  Handle* h = (Handle*)hp;
  if (!h) return;
  if (h->map) munmap((void*)h->map, h->map_size);
  if (h->fd >= 0) ::close(h->fd);
  delete h;
}

}  // extern "C"
