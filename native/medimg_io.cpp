// medimg_io — native host-side data loading for medical_image_editing_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; this is the native runtime piece
// around it: a multithreaded .npy slice reader + batch assembler that fills a
// caller-provided float32 NHWC buffer without the GIL. It replaces the
// reference's torch DataLoader worker processes (SURVEY.md §2.5: per-slice
// `.npy` files produced by the offline preprocessing) on hosts with few cores
// where Python-side loading would serialize with the training loop.
//
// Supports NumPy format v1.0/2.0, C-order, dtypes {<f4, <f8, <i4, <i2, |u1},
// 2-D arrays of a fixed (H, W). Returns 0 on success, a negative error code
// identifying the first failing file otherwise.
//
// Build: make -C native   (g++ -O3 -shared -fPIC -pthread)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kErrOpen = -1;
constexpr int kErrMagic = -2;
constexpr int kErrHeader = -3;
constexpr int kErrDtype = -4;
constexpr int kErrShape = -5;
constexpr int kErrRead = -6;

struct NpyInfo {
  char dtype;       // 'f'=f32, 'd'=f64, 'i'=i32, 'h'=i16, 'B'=u8
  size_t item;      // bytes per element
  long rows, cols;  // shape
  size_t data_offset;
};

// Parse the npy header of an already-open file.
int parse_header(FILE* f, NpyInfo* info) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return kErrMagic;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return kErrMagic;
  int major = magic[6];
  size_t header_len = 0;
  if (major == 1) {
    unsigned char hl[2];
    if (fread(hl, 1, 2, f) != 2) return kErrHeader;
    header_len = hl[0] | (hl[1] << 8);
    info->data_offset = 10 + header_len;
  } else {
    unsigned char hl[4];
    if (fread(hl, 1, 4, f) != 4) return kErrHeader;
    header_len = hl[0] | (hl[1] << 8) | (hl[2] << 16) | ((size_t)hl[3] << 24);
    info->data_offset = 12 + header_len;
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) return kErrHeader;

  if (header.find("'fortran_order': True") != std::string::npos)
    return kErrHeader;

  size_t dt = header.find("'descr':");
  if (dt == std::string::npos) return kErrDtype;
  size_t q1 = header.find('\'', dt + 8);
  size_t q2 = header.find('\'', q1 + 1);
  std::string descr = header.substr(q1 + 1, q2 - q1 - 1);
  if (descr == "<f4") { info->dtype = 'f'; info->item = 4; }
  else if (descr == "<f8") { info->dtype = 'd'; info->item = 8; }
  else if (descr == "<i4") { info->dtype = 'i'; info->item = 4; }
  else if (descr == "<i2") { info->dtype = 'h'; info->item = 2; }
  else if (descr == "|u1") { info->dtype = 'B'; info->item = 1; }
  else return kErrDtype;

  size_t sh = header.find("'shape':");
  if (sh == std::string::npos) return kErrShape;
  size_t p1 = header.find('(', sh);
  size_t p2 = header.find(')', p1);
  std::string shape = header.substr(p1 + 1, p2 - p1 - 1);
  if (sscanf(shape.c_str(), "%ld, %ld", &info->rows, &info->cols) != 2)
    return kErrShape;
  return 0;
}

// Per-slice elementwise epilogues, applied inside the worker threads so the
// post-processing parallelizes with the IO of the other slices.
constexpr int kEpNone = 0;
constexpr int kEpWindow = 1;     // HU windowing (ops/windowing.normalize)
constexpr int kEpIntensity = 2;  // NormalizeIntensity (transforms.py:52-71)

struct Epilogue {
  int kind = kEpNone;
  float p0 = 0, p1 = 0, p2 = 0;  // window: width,center,scale; intensity: vmin,vmax,-
};

void apply_epilogue(float* out, size_t count, const Epilogue& ep) {
  if (ep.kind == kEpWindow) {
    // `//` bounds parity with ops/windowing.normalize: integer halving of width
    const float vmax = ep.p1 + (float)((long)ep.p0 / 2);
    const float vmin = ep.p1 - (float)((long)ep.p0 / 2);
    const float inv = 1.0f / (vmax - vmin);
    for (size_t i = 0; i < count; ++i) {
      float v = out[i];
      v = v < vmin ? vmin : (v > vmax ? vmax : v);
      out[i] = ((v - vmin) * inv - 0.5f) * ep.p2;
    }
  } else if (ep.kind == kEpIntensity) {
    // clamp [vmin,vmax] -> [-1,1]
    const float vmin = ep.p0, vmax = ep.p1;
    const float inv = 2.0f / (vmax - vmin);
    for (size_t i = 0; i < count; ++i) {
      float v = out[i];
      v = v < vmin ? vmin : (v > vmax ? vmax : v);
      out[i] = (v - vmin) * inv - 1.0f;
    }
  }
}

// Load one slice into out (row-major float32, rows*cols).
int load_one(const char* path, float* out, long rows, long cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return kErrOpen;
  NpyInfo info;
  int rc = parse_header(f, &info);
  if (rc != 0) { fclose(f); return rc; }
  if (info.rows != rows || info.cols != cols) { fclose(f); return kErrShape; }

  const size_t count = (size_t)rows * cols;
  std::vector<unsigned char> raw(count * info.item);
  if (fseek(f, (long)info.data_offset, SEEK_SET) != 0 ||
      fread(raw.data(), info.item, count, f) != count) {
    fclose(f);
    return kErrRead;
  }
  fclose(f);

  switch (info.dtype) {
    case 'f': memcpy(out, raw.data(), count * 4); break;
    case 'd': { const double* p = (const double*)raw.data();
                for (size_t i = 0; i < count; ++i) out[i] = (float)p[i]; break; }
    case 'i': { const int32_t* p = (const int32_t*)raw.data();
                for (size_t i = 0; i < count; ++i) out[i] = (float)p[i]; break; }
    case 'h': { const int16_t* p = (const int16_t*)raw.data();
                for (size_t i = 0; i < count; ++i) out[i] = (float)p[i]; break; }
    case 'B': { const unsigned char* p = raw.data();
                for (size_t i = 0; i < count; ++i) out[i] = (float)p[i]; break; }
  }
  return 0;
}

}  // namespace

extern "C" {

// paths: n NUL-terminated strings concatenated; offsets[i] = start of path i.
// out: float32 buffer of n*rows*cols. n_threads <= 0 → hardware concurrency.
// ep_kind 0=none, 1=HU windowing (p0,p1,p2 = width,center,scale),
// 2=NormalizeIntensity (p0,p1 = vmin,vmax → [-1,1]); the epilogue runs
// per-slice inside the worker threads, fully overlapped with the other
// slices' IO. Returns 0, or (err*1000 - index) of the first failing file.
int medimg_load_npy_batch_ep(const char* paths, const long* offsets, long n,
                             float* out, long rows, long cols, int ep_kind,
                             float p0, float p1, float p2, int n_threads) {
  if (n_threads <= 0) {
    unsigned hc = std::thread::hardware_concurrency();
    n_threads = hc ? (int)hc : 1;
  }
  if (n_threads > n) n_threads = (int)n;

  std::atomic<long> next(0);
  std::atomic<long> err(0);
  const size_t stride = (size_t)rows * cols;
  const Epilogue ep{ep_kind, p0, p1, p2};

  auto worker = [&]() {
    long i;
    while ((i = next.fetch_add(1)) < n) {
      if (err.load() != 0) return;
      float* dst = out + (size_t)i * stride;
      int rc = load_one(paths + offsets[i], dst, rows, cols);
      if (rc != 0) {
        long code = (long)rc * 1000 - i;
        long expected = 0;
        err.compare_exchange_strong(expected, code);
        return;
      }
      apply_epilogue(dst, stride, ep);
    }
  };

  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return (int)err.load();
}

int medimg_load_npy_batch(const char* paths, const long* offsets, long n,
                          float* out, long rows, long cols, int n_threads) {
  return medimg_load_npy_batch_ep(paths, offsets, n, out, rows, cols, kEpNone,
                                  0, 0, 0, n_threads);
}

// Fused load + HU windowing (ops/windowing.normalize semantics) — saves one
// pass over the batch when the dataset windows at load (NCCLungDataset).
int medimg_load_npy_batch_windowed(const char* paths, const long* offsets,
                                   long n, float* out, long rows, long cols,
                                   float width, float center, float scale,
                                   int n_threads) {
  return medimg_load_npy_batch_ep(paths, offsets, n, out, rows, cols,
                                  kEpWindow, width, center, scale, n_threads);
}

}  // extern "C"
