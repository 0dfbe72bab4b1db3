// Native runtime for lbfgs_ffnn_tpu: IDX dataset parsing, one-hot encoding,
// and CSV history writing, exposed through a plain C ABI consumed via ctypes.
//
// This is the TPU framework's counterpart of the reference's native data
// loader (reference: tests/mnist/mnist_loader.hpp — big-endian IDX parse,
// /255 normalization, one-hot labels) and CSV history writers (reference:
// src/unified_optimization.hpp:66-85). Host-side work stays native C++;
// device compute is XLA/Pallas.
//
// All functions return 0 on success, negative error codes otherwise.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <vector>

namespace {

// Big-endian 32-bit read (IDX files are big-endian).
inline uint32_t read_be32(const unsigned char *p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

struct File {
  std::FILE *f = nullptr;
  explicit File(const char *path) : f(std::fopen(path, "rb")) {}
  ~File() {
    if (f) std::fclose(f);
  }
};

constexpr int kErrOpen = -1;
constexpr int kErrMagic = -2;
constexpr int kErrRead = -3;
constexpr int kErrArgs = -4;

}  // namespace

extern "C" {

// Query an IDX file: item count and per-item element count.
// dtype byte must be 0x08 (unsigned byte) — the MNIST family.
int idx_query(const char *path, int64_t *n_items, int64_t *item_elems) {
  File file(path);
  if (!file.f) return kErrOpen;
  unsigned char hdr[4];
  if (std::fread(hdr, 1, 4, file.f) != 4) return kErrRead;
  if (hdr[0] != 0 || hdr[1] != 0 || hdr[2] != 0x08) return kErrMagic;
  const int ndim = hdr[3];
  if (ndim < 1 || ndim > 4) return kErrMagic;
  int64_t dims[4] = {0, 0, 0, 0};
  for (int i = 0; i < ndim; ++i) {
    unsigned char d[4];
    if (std::fread(d, 1, 4, file.f) != 4) return kErrRead;
    dims[i] = read_be32(d);
  }
  *n_items = dims[0];
  int64_t elems = 1;
  for (int i = 1; i < ndim; ++i) elems *= dims[i];
  *item_elems = elems;
  return 0;
}

// Load up to max_items images as float32 scaled by 1/255, row-major
// (n, item_elems). `out` must hold max_items*item_elems floats.
int idx_load_images_f32(const char *path, int64_t max_items, float *out,
                        int64_t *n_loaded) {
  int64_t n_items = 0, elems = 0;
  int rc = idx_query(path, &n_items, &elems);
  if (rc != 0) return rc;
  File file(path);
  if (!file.f) return kErrOpen;
  unsigned char hdr[4];
  if (std::fread(hdr, 1, 4, file.f) != 4) return kErrRead;
  const int ndim = hdr[3];
  if (std::fseek(file.f, 4 + 4 * ndim, SEEK_SET) != 0) return kErrRead;

  const int64_t n = max_items > 0 && max_items < n_items ? max_items : n_items;
  std::vector<unsigned char> buf(static_cast<size_t>(elems));
  constexpr float kInv255 = 1.0f / 255.0f;
  for (int64_t i = 0; i < n; ++i) {
    if (std::fread(buf.data(), 1, buf.size(), file.f) != buf.size())
      return kErrRead;
    float *row = out + i * elems;
    for (int64_t j = 0; j < elems; ++j) row[j] = buf[j] * kInv255;
  }
  *n_loaded = n;
  return 0;
}

// Load up to max_items labels one-hot encoded into (n, num_classes) float32.
int idx_load_labels_onehot_f32(const char *path, int64_t max_items,
                               int num_classes, float *out,
                               int64_t *n_loaded) {
  if (num_classes <= 0) return kErrArgs;
  int64_t n_items = 0, elems = 0;
  int rc = idx_query(path, &n_items, &elems);
  if (rc != 0) return rc;
  if (elems != 1) return kErrMagic;
  File file(path);
  if (!file.f) return kErrOpen;
  unsigned char hdr[4];
  if (std::fread(hdr, 1, 4, file.f) != 4) return kErrRead;
  const int ndim = hdr[3];
  if (std::fseek(file.f, 4 + 4 * ndim, SEEK_SET) != 0) return kErrRead;

  const int64_t n = max_items > 0 && max_items < n_items ? max_items : n_items;
  std::vector<unsigned char> labels(static_cast<size_t>(n));
  if (std::fread(labels.data(), 1, labels.size(), file.f) != labels.size())
    return kErrRead;
  std::memset(out, 0, sizeof(float) * n * num_classes);
  for (int64_t i = 0; i < n; ++i) {
    const int c = labels[i];
    if (c < num_classes) out[i * num_classes + c] = 1.0f;
  }
  *n_loaded = n;
  return 0;
}

// Load raw uint8 labels (n,).
int idx_load_labels_u8(const char *path, int64_t max_items, uint8_t *out,
                       int64_t *n_loaded) {
  int64_t n_items = 0, elems = 0;
  int rc = idx_query(path, &n_items, &elems);
  if (rc != 0) return rc;
  if (elems != 1) return kErrMagic;
  File file(path);
  if (!file.f) return kErrOpen;
  unsigned char hdr[4];
  if (std::fread(hdr, 1, 4, file.f) != 4) return kErrRead;
  const int ndim = hdr[3];
  if (std::fseek(file.f, 4 + 4 * ndim, SEEK_SET) != 0) return kErrRead;
  const int64_t n = max_items > 0 && max_items < n_items ? max_items : n_items;
  if (std::fread(out, 1, static_cast<size_t>(n), file.f) !=
      static_cast<size_t>(n))
    return kErrRead;
  *n_loaded = n;
  return 0;
}

// Write an IDX file of unsigned bytes with the given dims (ndim <= 4).
int idx_write_u8(const char *path, const uint8_t *data, const int64_t *dims,
                 int ndim) {
  if (ndim < 1 || ndim > 4) return kErrArgs;
  std::FILE *f = std::fopen(path, "wb");
  if (!f) return kErrOpen;
  unsigned char hdr[4] = {0, 0, 0x08, static_cast<unsigned char>(ndim)};
  std::fwrite(hdr, 1, 4, f);
  int64_t total = 1;
  for (int i = 0; i < ndim; ++i) {
    uint32_t d = static_cast<uint32_t>(dims[i]);
    unsigned char b[4] = {static_cast<unsigned char>(d >> 24),
                          static_cast<unsigned char>(d >> 16),
                          static_cast<unsigned char>(d >> 8),
                          static_cast<unsigned char>(d)};
    std::fwrite(b, 1, 4, f);
    total *= dims[i];
  }
  size_t written = std::fwrite(data, 1, static_cast<size_t>(total), f);
  std::fclose(f);
  return written == static_cast<size_t>(total) ? 0 : kErrRead;
}

// Write a training-history CSV with the reference's exact format:
// header "Iteration,Loss,GradNorm,TimeMs", rows strided by log_interval
// (reference: src/unified_optimization.hpp:66-85).
int csv_write_history(const char *path, const double *loss,
                      const double *gnorm, const double *time_ms, int64_t n,
                      int log_interval) {
  if (log_interval <= 0) return kErrArgs;
  std::FILE *f = std::fopen(path, "w");
  if (!f) return kErrOpen;
  std::fputs("Iteration,Loss,GradNorm,TimeMs\n", f);
  for (int64_t i = 0; i < n; i += log_interval) {
    std::fprintf(f, "%lld,%.17g,%.17g,%.17g\n", static_cast<long long>(i),
                 loss[i], gnorm ? gnorm[i] : 0.0, time_ms ? time_ms[i] : 0.0);
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
