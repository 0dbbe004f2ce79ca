// WellPack HDF5 decode: native bulk path for the one-time cache build.
//
// Round-3 verdict (weak #7): the WellPack cache build decoded HDF5
// through h5py — a Python stage at the head of the "native input
// pipeline" that costs real time at real-data scale (The Well splits are
// tens of GB).  This module moves the PER-BYTE work to C++: the bulk
// H5Dread of each field trajectory, the z-score normalization and the
// channels-last interleave into the flat (T, H, W, C) cache layout all
// happen here.  Python keeps only the METADATA work (attribute schema,
// stats.yaml parsing, field ordering) — a few hundred bytes per dataset.
//
// HDF5 linkage: the image ships libhdf5 as a runtime library only (no
// /usr/include/hdf5*), so instead of compile-time linkage this dlopens
// the library and binds the handful of stable C-API symbols it needs
// (the HDF5 1.8+ C ABI: hid_t is int64, H5T_NATIVE_FLOAT is the global
// H5T_NATIVE_FLOAT_g).  The Python side passes the soname it found (the
// system libhdf5_serial or h5py's bundled copy).
//
// Thread-safety: serial HDF5 is not thread-safe; all H5* calls are
// serialized behind one mutex.  The normalize+interleave runs outside
// it.  The cache build is one-time per split, so the win here is
// dropping the Python per-element path, not parallel decode.
//
// C ABI (ctypes, tante_tpu/data/wellpack.py):
//   wph5_init(libpath)                     -> 0 ok
//   wph5_open(path)                        -> file handle (0 on error)
//   wph5_decode_field(file, dset, sample, t, h, w, ncomp,
//                     mean*, std*, dst*, c_total, c_off) -> 0 ok
//   wph5_close(file)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <dlfcn.h>
#include <mutex>
#include <vector>

namespace {

using hid_t = int64_t;
using herr_t = int;
using hsize_t = uint64_t;

struct H5Api {
  herr_t (*H5open)();
  hid_t (*H5Fopen)(const char*, unsigned, hid_t);
  herr_t (*H5Fclose)(hid_t);
  hid_t (*H5Dopen2)(hid_t, const char*, hid_t);
  herr_t (*H5Dclose)(hid_t);
  hid_t (*H5Dget_space)(hid_t);
  herr_t (*H5Sclose)(hid_t);
  int (*H5Sget_simple_extent_ndims)(hid_t);
  int (*H5Sget_simple_extent_dims)(hid_t, hsize_t*, hsize_t*);
  herr_t (*H5Sselect_hyperslab)(hid_t, int, const hsize_t*, const hsize_t*,
                                const hsize_t*, const hsize_t*);
  hid_t (*H5Screate_simple)(int, const hsize_t*, const hsize_t*);
  herr_t (*H5Dread)(hid_t, hid_t, hid_t, hid_t, hid_t, void*);
  hid_t native_float = -1;
  bool ok = false;
};

H5Api g_api;
std::mutex g_h5_mutex;  // serial HDF5: one H5* call at a time

constexpr unsigned kAccRdonly = 0u;  // H5F_ACC_RDONLY
constexpr hid_t kDefault = 0;        // H5P_DEFAULT
constexpr int kSelectSet = 0;        // H5S_SELECT_SET

template <typename T>
bool bind(void* lib, const char* name, T& fn) {
  fn = reinterpret_cast<T>(dlsym(lib, name));
  return fn != nullptr;
}

}  // namespace

extern "C" {

int wph5_init(const char* libpath) {
  std::lock_guard<std::mutex> lock(g_h5_mutex);
  if (g_api.ok) return 0;
  // RTLD_LOCAL: h5py has its own HDF5 loaded in this process; keep the
  // two libraries' symbol tables apart.
  void* lib = dlopen(libpath, RTLD_NOW | RTLD_LOCAL);
  if (!lib) return 1;
  bool ok = bind(lib, "H5open", g_api.H5open) &&
            bind(lib, "H5Fopen", g_api.H5Fopen) &&
            bind(lib, "H5Fclose", g_api.H5Fclose) &&
            bind(lib, "H5Dopen2", g_api.H5Dopen2) &&
            bind(lib, "H5Dclose", g_api.H5Dclose) &&
            bind(lib, "H5Dget_space", g_api.H5Dget_space) &&
            bind(lib, "H5Sclose", g_api.H5Sclose) &&
            bind(lib, "H5Sget_simple_extent_ndims",
                 g_api.H5Sget_simple_extent_ndims) &&
            bind(lib, "H5Sget_simple_extent_dims",
                 g_api.H5Sget_simple_extent_dims) &&
            bind(lib, "H5Sselect_hyperslab", g_api.H5Sselect_hyperslab) &&
            bind(lib, "H5Screate_simple", g_api.H5Screate_simple) &&
            bind(lib, "H5Dread", g_api.H5Dread);
  if (!ok) return 2;
  if (g_api.H5open() < 0) return 3;
  hid_t* native_float_g =
      reinterpret_cast<hid_t*>(dlsym(lib, "H5T_NATIVE_FLOAT_g"));
  if (!native_float_g || *native_float_g < 0) return 4;
  g_api.native_float = *native_float_g;
  g_api.ok = true;
  return 0;
}

int64_t wph5_open(const char* path) {
  std::lock_guard<std::mutex> lock(g_h5_mutex);
  if (!g_api.ok) return 0;
  hid_t f = g_api.H5Fopen(path, kAccRdonly, kDefault);
  return f < 0 ? 0 : static_cast<int64_t>(f);
}

void wph5_close(int64_t file) {
  std::lock_guard<std::mutex> lock(g_h5_mutex);
  if (g_api.ok && file > 0) g_api.H5Fclose(static_cast<hid_t>(file));
}

// Decode one field's full trajectory into the flat cache buffer.
//
//   dset_path     e.g. "t1_fields/velocity"
//   sample_idx    trajectory index; -1 if the field is not sample_varying
//   t, h, w       expected trajectory extents
//   ncomp         1 (order-0) / d (order-1) / d*d (order-2, flattened)
//   mean, std     per-component stats (std pre-clipped at min_std)
//   dst           (t, h, w, c_total) float32, channels c_off..c_off+ncomp
//
// Returns 0 on success; small positive codes identify the failure site.
int wph5_decode_field(int64_t file, const char* dset_path, int64_t sample_idx,
                      int64_t t, int64_t h, int64_t w, int64_t ncomp,
                      const float* mean, const float* std_, float* dst,
                      int64_t c_total, int64_t c_off) {
  const size_t n_elems = size_t(t) * h * w * ncomp;
  std::vector<float> scratch(n_elems);
  {
    std::lock_guard<std::mutex> lock(g_h5_mutex);
    if (!g_api.ok || file <= 0) return 10;
    hid_t dset = g_api.H5Dopen2(static_cast<hid_t>(file), dset_path, kDefault);
    if (dset < 0) return 11;
    hid_t fspace = g_api.H5Dget_space(dset);
    if (fspace < 0) {
      g_api.H5Dclose(dset);
      return 12;
    }
    int nd = g_api.H5Sget_simple_extent_ndims(fspace);
    hsize_t dims[8] = {0};
    int rc = 0;
    if (nd < 1 || nd > 8 ||
        g_api.H5Sget_simple_extent_dims(fspace, dims, nullptr) != nd) {
      rc = 13;
    } else {
      hsize_t start[8] = {0}, count[8];
      std::memcpy(count, dims, sizeof(dims));
      if (sample_idx >= 0) {  // leading trajectory axis
        start[0] = static_cast<hsize_t>(sample_idx);
        count[0] = 1;
      }
      size_t sel = 1;
      for (int i = 0; i < nd; ++i) sel *= count[i];
      if (sel != n_elems) {
        rc = 14;  // plan/extent mismatch
      } else if (g_api.H5Sselect_hyperslab(fspace, kSelectSet, start, nullptr,
                                           count, nullptr) < 0) {
        rc = 15;
      } else {
        hsize_t mdims[1] = {static_cast<hsize_t>(n_elems)};
        hid_t mspace = g_api.H5Screate_simple(1, mdims, nullptr);
        if (mspace < 0) {
          rc = 16;
        } else {
          if (g_api.H5Dread(dset, g_api.native_float, mspace, fspace, kDefault,
                            scratch.data()) < 0)
            rc = 17;
          g_api.H5Sclose(mspace);
        }
      }
    }
    g_api.H5Sclose(fspace);
    g_api.H5Dclose(dset);
    if (rc) return rc;
  }

  // Normalize + interleave outside the HDF5 lock.
  std::vector<float> inv(ncomp);
  for (int64_t k = 0; k < ncomp; ++k) inv[k] = 1.0f / std_[k];
  const float* src = scratch.data();
  const size_t pixels = size_t(t) * h * w;
  for (size_t p = 0; p < pixels; ++p) {
    float* out = dst + p * c_total + c_off;
    const float* in = src + p * ncomp;
    for (int64_t k = 0; k < ncomp; ++k) out[k] = (in[k] - mean[k]) * inv[k];
  }
  return 0;
}

}  // extern "C"
