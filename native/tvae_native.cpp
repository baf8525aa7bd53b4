// tvae_native: host-side data runtime for targetvae_tpu.
//
// C ABI, loaded from Python via ctypes (targetvae_tpu/data/native.py).
// Provides the performance-critical host data path for cryo-EM particle
// stacks: memory-mapped MRC reads, multithreaded decode -> center-crop ->
// per-image standardization into a caller-provided float32 buffer, and a
// multithreaded batch gatherer for the training feed. The reference does all
// of this single-threaded in Python/numpy (train_particles.py:454-475,
// :584-600).
//
// Build: make -C native   (g++ -O3 -shared -fPIC -pthread)

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cmath>
#include <atomic>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Mirrors the MRC2000 fixed header fields we need.
struct TvaeMrcInfo {
  int32_t nx, ny, nz;
  int32_t mode;
  int32_t ext_bytes;
};

// Returns 0 on success.
int tvae_mrc_info(const char* path, TvaeMrcInfo* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  unsigned char hdr[1024];
  if (fread(hdr, 1, 1024, f) != 1024) { fclose(f); return 2; }
  fclose(f);
  memcpy(&out->nx, hdr + 0, 4);
  memcpy(&out->ny, hdr + 4, 4);
  memcpy(&out->nz, hdr + 8, 4);
  memcpy(&out->mode, hdr + 12, 4);
  memcpy(&out->ext_bytes, hdr + 92, 4);
  return 0;
}

namespace {

inline float decode_at(const unsigned char* data, int mode, int64_t idx) {
  switch (mode) {
    case 0: return static_cast<float>(reinterpret_cast<const int8_t*>(data)[idx]);
    case 1: return static_cast<float>(reinterpret_cast<const int16_t*>(data)[idx]);
    case 2: { float v; memcpy(&v, data + idx * 4, 4); return v; }
    case 6: return static_cast<float>(reinterpret_cast<const uint16_t*>(data)[idx]);
    default: return 0.0f;
  }
}

struct MappedFile {
  int fd = -1;
  size_t size = 0;
  const unsigned char* ptr = nullptr;
  bool ok() const { return ptr != nullptr; }
  explicit MappedFile(const char* path) {
    fd = open(path, O_RDONLY);
    if (fd < 0) return;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); fd = -1; return; }
    size = static_cast<size_t>(st.st_size);
    void* m = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (m == MAP_FAILED) { close(fd); fd = -1; return; }
    ptr = static_cast<const unsigned char*>(m);
    madvise(const_cast<unsigned char*>(ptr), size, MADV_SEQUENTIAL);
  }
  ~MappedFile() {
    if (ptr) munmap(const_cast<unsigned char*>(ptr), size);
    if (fd >= 0) close(fd);
  }
};

void process_range(const unsigned char* data, int mode, int ny, int nx,
                   int crop, int do_normalize, float* out,
                   int64_t lo, int64_t hi) {
  const int on = crop > 0 ? crop : ny;
  const int om = crop > 0 ? crop : nx;
  const int si = crop > 0 ? (ny - crop) / 2 : 0;
  const int sj = crop > 0 ? (nx - crop) / 2 : 0;
  for (int64_t z = lo; z < hi; ++z) {
    const int64_t in_base = z * static_cast<int64_t>(ny) * nx;
    float* dst = out + z * static_cast<int64_t>(on) * om;
    for (int i = 0; i < on; ++i) {
      const int64_t row = in_base + static_cast<int64_t>(si + i) * nx + sj;
      for (int j = 0; j < om; ++j) dst[i * om + j] = decode_at(data, mode, row + j);
    }
    if (do_normalize) {
      const int64_t n = static_cast<int64_t>(on) * om;
      double mu = 0.0;
      for (int64_t t = 0; t < n; ++t) mu += dst[t];
      mu /= n;
      double var = 0.0;
      for (int64_t t = 0; t < n; ++t) {
        const double d = dst[t] - mu;
        var += d * d;
      }
      const float inv = 1.0f / static_cast<float>(std::sqrt(var / n) + 1e-12);
      for (int64_t t = 0; t < n; ++t)
        dst[t] = (dst[t] - static_cast<float>(mu)) * inv;
    }
  }
}

}  // namespace

// Load an MRC stack into `out` (nz * on * om f32, caller-allocated), with
// optional center-crop to `crop` and per-image standardization, using
// `nthreads` workers over a memory-mapped file. Returns 0 on success.
int tvae_mrc_load_f32(const char* path, float* out, int crop,
                      int do_normalize, int nthreads) {
  TvaeMrcInfo info;
  if (tvae_mrc_info(path, &info) != 0) return 1;
  if (info.mode != 0 && info.mode != 1 && info.mode != 2 && info.mode != 6)
    return 3;  // unsupported mode for the fast path
  MappedFile mf(path);
  if (!mf.ok()) return 2;
  const unsigned char* data = mf.ptr + 1024 + info.ext_bytes;

  const int nz = info.nz;
  if (nthreads < 1) nthreads = 1;
  if (nthreads > nz) nthreads = nz;
  std::vector<std::thread> ts;
  const int64_t per = (nz + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    const int64_t lo = t * per;
    const int64_t hi = std::min<int64_t>(nz, lo + per);
    if (lo >= hi) break;
    ts.emplace_back(process_range, data, info.mode, info.ny, info.nx, crop,
                    do_normalize, out, lo, hi);
  }
  for (auto& th : ts) th.join();
  return 0;
}

// Gather a batch: out[i] = images[idx[i]] for float32 source of shape
// (n, rows, cols), multithreaded memcpy. The training feed's hot host op.
int tvae_gather_f32(const float* images, const int64_t* idx, int64_t count,
                    int64_t rows, int64_t cols, float* out, int nthreads) {
  const int64_t im = rows * cols;
  if (nthreads < 1) nthreads = 1;
  std::vector<std::thread> ts;
  const int64_t per = (count + nthreads - 1) / nthreads;
  std::atomic<int> bad{0};
  for (int t = 0; t < nthreads; ++t) {
    const int64_t lo = t * per;
    const int64_t hi = std::min<int64_t>(count, lo + per);
    if (lo >= hi) break;
    ts.emplace_back([&, lo, hi] {
      for (int64_t i = lo; i < hi; ++i) {
        memcpy(out + i * im, images + idx[i] * im, im * sizeof(float));
      }
    });
  }
  for (auto& th : ts) th.join();
  return bad.load();
}

}  // extern "C"
