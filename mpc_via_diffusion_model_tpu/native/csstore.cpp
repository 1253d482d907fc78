// csstore: memory-mapped tensor shard store (C++17, C ABI for ctypes).
//
// Native runtime component replacing the reference's dataset IO path:
// torch.save/torch.load of .pt tensors plus the host-side shard
// concatenation script (`scripts/mpc_data_collecting/cart_pole_nmpc/
// data_concatenate.py:20-63`). Design goals:
//   - zero-copy reads: tensors are mmap'd and handed to numpy as views,
//     so a 672k x 64 expert dataset loads in microseconds and the OS page
//     cache backs repeated epoch sweeps;
//   - append-free concat: css_concat streams N shards into one file with a
//     single pass per tensor (no Python loop over torch tensors);
//   - fp32/i32/i64 tensors, 64-byte aligned data (friendly to both host
//     SIMD and DMA into device buffers).
//
// File layout (little endian):
//   magic "CSS1" | u32 n_tensors
//   per tensor: u32 name_len | name bytes | u32 dtype | u32 ndim |
//               i64 dims[ndim] | u64 offset | u64 nbytes
//   ...64-byte aligned data blobs...

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0x31535343;  // "CSS1"
constexpr size_t kAlign = 64;

struct TensorMeta {
  std::string name;
  uint32_t dtype = 0;  // 0=f32, 1=i32, 2=i64
  std::vector<int64_t> dims;
  uint64_t offset = 0;
  uint64_t nbytes = 0;
};

struct Store {
  int fd = -1;
  void* map = nullptr;
  size_t map_size = 0;
  std::vector<TensorMeta> tensors;
  std::string error;
};

size_t dtype_size(uint32_t dt) { return dt == 0 ? 4 : dt == 1 ? 4 : 8; }

size_t align_up(size_t v) { return (v + kAlign - 1) / kAlign * kAlign; }

bool write_all(FILE* f, const void* p, size_t n) {
  return fwrite(p, 1, n, f) == n;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Writing
// ---------------------------------------------------------------------------

// Write a store with n tensors. names: array of C strings; dtypes: codes;
// ndims/dims: shape table (dims flattened); data: pointers to row-major
// buffers. Returns 0 on success.
int css_write(const char* path, int32_t n, const char** names,
              const uint32_t* dtypes, const int32_t* ndims,
              const int64_t* dims_flat, const void** data) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;

  // first pass: compute header size and offsets
  size_t header = 8;  // magic + count
  std::vector<TensorMeta> metas(n);
  const int64_t* dp = dims_flat;
  for (int i = 0; i < n; ++i) {
    TensorMeta& m = metas[i];
    m.name = names[i];
    m.dtype = dtypes[i];
    m.dims.assign(dp, dp + ndims[i]);
    dp += ndims[i];
    uint64_t count = 1;
    for (int64_t d : m.dims) count *= static_cast<uint64_t>(d);
    m.nbytes = count * dtype_size(m.dtype);
    header += 4 + m.name.size() + 4 + 4 + 8ull * ndims[i] + 8 + 8;
  }
  size_t offset = align_up(header);
  for (auto& m : metas) {
    m.offset = offset;
    offset = align_up(offset + m.nbytes);
  }

  // header
  bool ok = write_all(f, &kMagic, 4);
  uint32_t n32 = static_cast<uint32_t>(n);
  ok = ok && write_all(f, &n32, 4);
  for (auto& m : metas) {
    uint32_t nl = static_cast<uint32_t>(m.name.size());
    uint32_t nd = static_cast<uint32_t>(m.dims.size());
    ok = ok && write_all(f, &nl, 4) && write_all(f, m.name.data(), nl) &&
         write_all(f, &m.dtype, 4) && write_all(f, &nd, 4) &&
         write_all(f, m.dims.data(), 8ull * nd) &&
         write_all(f, &m.offset, 8) && write_all(f, &m.nbytes, 8);
  }
  // data (seek to aligned offsets)
  for (int i = 0; i < n && ok; ++i) {
    ok = fseek(f, static_cast<long>(metas[i].offset), SEEK_SET) == 0 &&
         write_all(f, data[i], metas[i].nbytes);
  }
  fclose(f);
  return ok ? 0 : -2;
}

// ---------------------------------------------------------------------------
// Reading (mmap)
// ---------------------------------------------------------------------------

void* css_open(const char* path) {
  Store* s = new Store();
  s->fd = open(path, O_RDONLY);
  if (s->fd < 0) { delete s; return nullptr; }
  struct stat st;
  if (fstat(s->fd, &st) != 0) { close(s->fd); delete s; return nullptr; }
  s->map_size = static_cast<size_t>(st.st_size);
  s->map = mmap(nullptr, s->map_size, PROT_READ, MAP_SHARED, s->fd, 0);
  if (s->map == MAP_FAILED) { close(s->fd); delete s; return nullptr; }

  const uint8_t* p = static_cast<const uint8_t*>(s->map);
  const uint8_t* end = p + s->map_size;
  auto rd = [&](void* dst, size_t n) -> bool {
    if (p + n > end) return false;
    memcpy(dst, p, n);
    p += n;
    return true;
  };
  uint32_t magic = 0, count = 0;
  if (!rd(&magic, 4) || magic != kMagic || !rd(&count, 4)) {
    munmap(s->map, s->map_size); close(s->fd); delete s; return nullptr;
  }
  s->tensors.resize(count);
  for (uint32_t i = 0; i < count; ++i) {
    TensorMeta& m = s->tensors[i];
    uint32_t nl = 0, nd = 0;
    if (!rd(&nl, 4)) goto fail;
    m.name.resize(nl);
    if (!rd(m.name.data(), nl) || !rd(&m.dtype, 4) || !rd(&nd, 4)) goto fail;
    m.dims.resize(nd);
    if (!rd(m.dims.data(), 8ull * nd) || !rd(&m.offset, 8) || !rd(&m.nbytes, 8)) goto fail;
    if (m.offset + m.nbytes > s->map_size) goto fail;
  }
  return s;
fail:
  munmap(s->map, s->map_size);
  close(s->fd);
  delete s;
  return nullptr;
}

int32_t css_n_tensors(void* h) { return static_cast<Store*>(h)->tensors.size(); }

const char* css_name(void* h, int32_t i) {
  return static_cast<Store*>(h)->tensors[i].name.c_str();
}

uint32_t css_dtype(void* h, int32_t i) {
  return static_cast<Store*>(h)->tensors[i].dtype;
}

int32_t css_ndim(void* h, int32_t i) {
  return static_cast<Store*>(h)->tensors[i].dims.size();
}

void css_dims(void* h, int32_t i, int64_t* out) {
  auto& d = static_cast<Store*>(h)->tensors[i].dims;
  memcpy(out, d.data(), 8ull * d.size());
}

// Zero-copy pointer into the mmap'd region.
const void* css_data(void* h, int32_t i) {
  Store* s = static_cast<Store*>(h);
  return static_cast<const uint8_t*>(s->map) + s->tensors[i].offset;
}

void css_close(void* h) {
  Store* s = static_cast<Store*>(h);
  if (s->map) munmap(s->map, s->map_size);
  if (s->fd >= 0) close(s->fd);
  delete s;
}

// ---------------------------------------------------------------------------
// Concatenation: stack same-name tensors from n shards along axis 0
// ---------------------------------------------------------------------------

int css_concat(const char** paths, int32_t n_paths, const char* out_path) {
  if (n_paths <= 0) return -1;
  std::vector<void*> stores;
  for (int i = 0; i < n_paths; ++i) {
    void* h = css_open(paths[i]);
    if (!h) {
      for (void* s : stores) css_close(s);
      return -2;
    }
    stores.push_back(h);
  }
  Store* first = static_cast<Store*>(stores[0]);
  int32_t nt = first->tensors.size();

  // validate shapes and accumulate leading dims
  std::vector<TensorMeta> out_meta(nt);
  for (int32_t t = 0; t < nt; ++t) {
    TensorMeta m = first->tensors[t];
    int64_t lead = 0;
    for (void* hv : stores) {
      Store* s = static_cast<Store*>(hv);
      const TensorMeta& sm = s->tensors[t];
      if (sm.name != m.name || sm.dtype != m.dtype ||
          sm.dims.size() != m.dims.size()) {
        for (void* x : stores) css_close(x);
        return -3;
      }
      for (size_t d = 1; d < m.dims.size(); ++d) {
        if (sm.dims[d] != m.dims[d]) {
          for (void* x : stores) css_close(x);
          return -3;
        }
      }
      lead += sm.dims[0];
    }
    m.dims[0] = lead;
    uint64_t count = 1;
    for (int64_t d : m.dims) count *= static_cast<uint64_t>(d);
    m.nbytes = count * dtype_size(m.dtype);
    out_meta[t] = m;
  }

  // Stream shard blobs straight from the source mmaps to the output file in
  // bounded chunks — peak RAM is one chunk, not the whole concatenated
  // dataset (matters once shards total tens of GB; the OS prefetches the
  // sequential mmap reads).
  size_t header = 8;
  for (int32_t t = 0; t < nt; ++t) {
    header += 4 + out_meta[t].name.size() + 4 + 4 +
              8ull * out_meta[t].dims.size() + 8 + 8;
  }
  size_t off = align_up(header);
  for (auto& m : out_meta) {
    m.offset = off;
    off = align_up(off + m.nbytes);
  }

  FILE* f = fopen(out_path, "wb");
  if (!f) {
    for (void* s : stores) css_close(s);
    return -4;
  }
  bool ok = write_all(f, &kMagic, 4);
  uint32_t n32 = static_cast<uint32_t>(nt);
  ok = ok && write_all(f, &n32, 4);
  for (auto& m : out_meta) {
    uint32_t nl = static_cast<uint32_t>(m.name.size());
    uint32_t nd = static_cast<uint32_t>(m.dims.size());
    ok = ok && write_all(f, &nl, 4) && write_all(f, m.name.data(), nl) &&
         write_all(f, &m.dtype, 4) && write_all(f, &nd, 4) &&
         write_all(f, m.dims.data(), 8ull * nd) &&
         write_all(f, &m.offset, 8) && write_all(f, &m.nbytes, 8);
  }

  constexpr size_t kChunk = 8ull << 20;  // 8 MiB copy window
  for (int32_t t = 0; t < nt && ok; ++t) {
    ok = fseek(f, static_cast<long>(out_meta[t].offset), SEEK_SET) == 0;
    for (void* hv : stores) {
      if (!ok) break;
      Store* s = static_cast<Store*>(hv);
      const uint8_t* src = static_cast<const uint8_t*>(css_data(hv, t));
      uint64_t left = s->tensors[t].nbytes;
      while (ok && left > 0) {
        size_t n = left < kChunk ? static_cast<size_t>(left) : kChunk;
        ok = write_all(f, src, n);
        src += n;
        left -= n;
      }
    }
  }
  fclose(f);
  for (void* s : stores) css_close(s);
  return ok ? 0 : -5;
}

}  // extern "C"
