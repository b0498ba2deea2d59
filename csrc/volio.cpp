// volio: native volume I/O + host-side staging for torchregister-tpu.
//
// The reference has no I/O layer at all (volumes arrive as pickled torch
// tensors, reference README.md:24-33). Serving registration at cohort scale
// makes host-side loading the feeder bottleneck: this library provides
//   - a minimal NIfTI-1 reader/writer (.nii and .nii.gz via zlib), the
//     standard medical-imaging container,
//   - dtype conversion to float32 with optional slope/intercept scaling,
//   - multithreaded batch staging (load a cohort into one contiguous host
//     buffer in parallel, ready for a single jax.device_put),
//   - multithreaded min-max normalization (the tr.norm preprocessing).
//
// Exposed as a C ABI consumed from Python via ctypes (no pybind11 in the
// image). Thread-safety: each call is independent; no globals.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <atomic>
#include <functional>
#include <limits>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

// ----------------------------------------------------------- NIfTI-1 header
// Offsets per the NIfTI-1 standard (348-byte header).
#pragma pack(push, 1)
struct Nifti1Header {
  int32_t sizeof_hdr;     // 348
  char data_type[10];
  char db_name[18];
  int32_t extents;
  int16_t session_error;
  char regular;
  char dim_info;
  int16_t dim[8];         // dim[0]=ndim, dim[1..]=sizes
  float intent_p1, intent_p2, intent_p3;
  int16_t intent_code;
  int16_t datatype;       // 2=u8 4=i16 8=i32 16=f32 64=f64 256=i8 512=u16
  int16_t bitpix;
  int16_t slice_start;
  float pixdim[8];
  float vox_offset;       // start of data
  float scl_slope, scl_inter;
  int16_t slice_end;
  char slice_code;
  char xyzt_units;
  float cal_max, cal_min;
  float slice_duration, toffset;
  int32_t glmax, glmin;
  char descrip[80];
  char aux_file[24];
  int16_t qform_code, sform_code;
  float quatern_b, quatern_c, quatern_d;
  float qoffset_x, qoffset_y, qoffset_z;
  float srow_x[4], srow_y[4], srow_z[4];
  char intent_name[16];
  char magic[4];          // "n+1\0"
};
#pragma pack(pop)

static_assert(sizeof(Nifti1Header) == 348, "NIfTI-1 header must be 348 bytes");

enum DType : int16_t {
  DT_UINT8 = 2,
  DT_INT16 = 4,
  DT_INT32 = 8,
  DT_FLOAT32 = 16,
  DT_FLOAT64 = 64,
  DT_INT8 = 256,
  DT_UINT16 = 512,
};

int dtype_size(int16_t dt) {
  switch (dt) {
    case DT_UINT8: case DT_INT8: return 1;
    case DT_INT16: case DT_UINT16: return 2;
    case DT_INT32: case DT_FLOAT32: return 4;
    case DT_FLOAT64: return 8;
    default: return 0;
  }
}

template <typename T>
void convert_to_f32(const uint8_t* raw, float* out, int64_t n, float slope,
                    float inter) {
  const T* src = reinterpret_cast<const T*>(raw);
  if (slope == 0.0f) {  // NIfTI-1 spec: scl_slope==0 means "no scaling at all"
    slope = 1.0f;       // (ignore scl_inter too; it may hold stale garbage)
    inter = 0.0f;
  }
  for (int64_t i = 0; i < n; ++i)
    out[i] = static_cast<float>(src[i]) * slope + inter;
}

// gz-transparent file reader (zlib reads plain files too).
bool read_all(const char* path, std::vector<uint8_t>& buf) {
  gzFile f = gzopen(path, "rb");
  if (!f) return false;
  const size_t chunk = 1 << 20;
  size_t used = 0;
  for (;;) {
    buf.resize(used + chunk);
    int got = gzread(f, buf.data() + used, static_cast<unsigned>(chunk));
    if (got < 0) { gzclose(f); return false; }
    used += static_cast<size_t>(got);
    if (static_cast<size_t>(got) < chunk) break;
  }
  buf.resize(used);
  gzclose(f);
  return true;
}

void parallel_for(int64_t n, int nthreads, const std::function<void(int64_t, int64_t)>& fn) {
  nthreads = std::max(1, std::min<int>(nthreads, (int)std::thread::hardware_concurrency()));
  if (nthreads == 1 || n < (1 << 16)) { fn(0, n); return; }
  std::vector<std::thread> ts;
  int64_t per = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int64_t lo = t * per, hi = std::min<int64_t>(n, lo + per);
    if (lo >= hi) break;
    ts.emplace_back(fn, lo, hi);
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// Read only the shape/dtype: fills shape_out[0..7] and ndim. Returns 0 on ok.
// Reads just the 348-byte header — NOT the whole file: the shape probe runs
// before every volume read, and inflating a multi-hundred-MB .nii.gz twice
// per load would halve staging throughput.
int volio_nifti_shape(const char* path, int64_t* shape_out, int* ndim_out) {
  Nifti1Header hdr;
  gzFile f = gzopen(path, "rb");
  if (!f) return -1;
  int got = gzread(f, &hdr, sizeof(hdr));
  gzclose(f);
  if (got != static_cast<int>(sizeof(hdr))) return -1;
  if (hdr.sizeof_hdr != 348) return -2;
  int nd = hdr.dim[0];
  if (nd < 1 || nd > 7) return -3;
  *ndim_out = nd;
  for (int i = 0; i < nd; ++i) shape_out[i] = hdr.dim[i + 1];
  return 0;
}

// Read a NIfTI-1 volume into a caller-allocated float32 buffer of n elems.
// Applies scl_slope/scl_inter. Returns 0 on success.
int volio_read_nifti(const char* path, float* out, int64_t n) {
  std::vector<uint8_t> buf;
  if (!read_all(path, buf) || buf.size() < sizeof(Nifti1Header)) return -1;
  const Nifti1Header* h = reinterpret_cast<const Nifti1Header*>(buf.data());
  if (h->sizeof_hdr != 348) return -2;
  int nd = h->dim[0];
  if (nd < 1 || nd > 7) return -3;
  int64_t total = 1;
  for (int i = 0; i < nd; ++i) total *= h->dim[i + 1];
  if (total != n) return -4;
  int esz = dtype_size(h->datatype);
  if (esz == 0) return -5;
  size_t off = static_cast<size_t>(h->vox_offset);
  if (off < sizeof(Nifti1Header)) off = 352;
  if (buf.size() < off + static_cast<size_t>(total) * esz) return -6;
  const uint8_t* raw = buf.data() + off;
  float slope = h->scl_slope, inter = h->scl_inter;
  switch (h->datatype) {
    case DT_UINT8: convert_to_f32<uint8_t>(raw, out, total, slope, inter); break;
    case DT_INT8: convert_to_f32<int8_t>(raw, out, total, slope, inter); break;
    case DT_INT16: convert_to_f32<int16_t>(raw, out, total, slope, inter); break;
    case DT_UINT16: convert_to_f32<uint16_t>(raw, out, total, slope, inter); break;
    case DT_INT32: convert_to_f32<int32_t>(raw, out, total, slope, inter); break;
    case DT_FLOAT32: convert_to_f32<float>(raw, out, total, slope, inter); break;
    case DT_FLOAT64: convert_to_f32<double>(raw, out, total, slope, inter); break;
    default: return -5;
  }
  return 0;
}

// Write a float32 volume as uncompressed .nii. shape has ndim entries.
int volio_write_nifti(const char* path, const float* data, const int64_t* shape,
                      int ndim) {
  if (ndim < 1 || ndim > 7) return -1;
  // NIfTI-1 dims are int16: silently truncating through the cast would write
  // a corrupt header under a full-size data payload.
  for (int i = 0; i < ndim; ++i)
    if (shape[i] < 1 || shape[i] > 32767) return -1;
  Nifti1Header h;
  std::memset(&h, 0, sizeof(h));
  h.sizeof_hdr = 348;
  h.dim[0] = static_cast<int16_t>(ndim);
  int64_t total = 1;
  for (int i = 0; i < 7; ++i) h.dim[i + 1] = 1;
  for (int i = 0; i < ndim; ++i) {
    h.dim[i + 1] = static_cast<int16_t>(shape[i]);
    total *= shape[i];
  }
  h.datatype = DT_FLOAT32;
  h.bitpix = 32;
  for (int i = 0; i < 8; ++i) h.pixdim[i] = 1.0f;
  h.vox_offset = 352.0f;
  h.scl_slope = 1.0f;
  h.sform_code = 1;
  h.srow_x[0] = h.srow_y[1] = h.srow_z[2] = 1.0f;
  std::memcpy(h.magic, "n+1", 4);

  FILE* f = std::fopen(path, "wb");
  if (!f) return -2;
  const char ext_pad[4] = {0, 0, 0, 0};
  bool ok = std::fwrite(&h, sizeof(h), 1, f) == 1 &&
            std::fwrite(ext_pad, 4, 1, f) == 1 &&
            std::fwrite(data, sizeof(float), total, f) == static_cast<size_t>(total);
  std::fclose(f);
  return ok ? 0 : -3;
}

// Parallel batch load: count NIfTI volumes, each of exactly elems_per_vol
// elements, into out (contiguous [count, elems_per_vol]). Returns the number
// of volumes loaded successfully; failed slots are zero-filled.
int volio_load_batch(const char** paths, int count, float* out,
                     int64_t elems_per_vol, int nthreads) {
  std::atomic<int> ok_count{0};
  std::atomic<int> next{0};
  nthreads = std::max(1, std::min(nthreads, count));
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= count) return;
      float* dst = out + static_cast<int64_t>(i) * elems_per_vol;
      if (volio_read_nifti(paths[i], dst, elems_per_vol) == 0) {
        ok_count.fetch_add(1);
      } else {
        std::memset(dst, 0, sizeof(float) * elems_per_vol);
      }
    }
  };
  std::vector<std::thread> ts;
  for (int t = 0; t < nthreads; ++t) ts.emplace_back(worker);
  for (auto& t : ts) t.join();
  return ok_count.load();
}

// In-place min-max normalization to [0, 1] (eps matches tr.norm's 1e-9).
int volio_normalize_minmax(float* data, int64_t n, int nthreads) {
  if (n <= 0) return -1;
  float lo = std::numeric_limits<float>::infinity();
  float hi = -std::numeric_limits<float>::infinity();
  std::vector<float> los((size_t)std::max(1, nthreads), lo);
  std::vector<float> his((size_t)std::max(1, nthreads), hi);
  std::atomic<int> tid{0};
  parallel_for(n, nthreads, [&](int64_t a, int64_t b) {
    int t = tid.fetch_add(1) % std::max(1, nthreads);
    float l = los[t], h = his[t];
    for (int64_t i = a; i < b; ++i) {
      l = std::min(l, data[i]);
      h = std::max(h, data[i]);
    }
    los[t] = l; his[t] = h;
  });
  for (float v : los) lo = std::min(lo, v);
  for (float v : his) hi = std::max(hi, v);
  float scale = 1.0f / ((hi - lo) + 1e-9f);
  parallel_for(n, nthreads, [&](int64_t a, int64_t b) {
    for (int64_t i = a; i < b; ++i) data[i] = (data[i] - lo) * scale;
  });
  return 0;
}

}  // extern "C"
