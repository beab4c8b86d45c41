// diffphycon native IO: threaded .npy / .npz batch loader.
//
// The reference feeds its trainers with torch DataLoader worker processes
// (num_workers=cpu_count / 16 / 32, e.g.
// /root/reference/diffusion/diffusion_2d_smoke.py:904); its datasets are
// directories of .npy (smoke: Density/Velocity/Control/Smoke per sim,
// dataset/data_2d.py:174-185) and DEFLATE-compressed .npz (jellyfish,
// dataset/data_2d.py:69-92). This library is the TPU-framework equivalent:
// a pthread pool that parses npy headers and decompresses/reads file batches
// directly into one contiguous float32 buffer the host then feeds to
// jax.device_put — no Python in the per-file path, no per-worker process
// forks.
//
// C ABI (see diffphycon_tpu/utils/native_io.py for the ctypes wrapper):
//   dpc_npy_info(path, shape_out[8], &ndim, &dtype_code) -> 0/err
//   dpc_load_npy_batch(paths, n, n_threads, out, elems_per_file) -> 0/err
//   dpc_load_npz_batch(paths, member, n, n_threads, out, elems) -> 0/err
//
// dtype codes: 1 = float32, 2 = float64 (converted to f32 on load),
// 3 = int64 (converted), 4 = float16 (converted).
//
// Build: ./build_native.sh  (g++ -O3 -shared -fPIC -lz -lpthread)

#include <atomic>
#include <climits>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct NpyInfo {
  int dtype_code = 0;           // 1=f32 2=f64 3=i64 4=f16
  int ndim = 0;
  long shape[8] = {0};
  long header_bytes = 0;        // offset of raw data in the file
  long elems = 0;
};

int parse_npy_header(const unsigned char* buf, long len, NpyInfo* info) {
  if (len < 10 || memcmp(buf, "\x93NUMPY", 6) != 0) return -2;
  int major = buf[6];
  long hlen, off;
  if (major == 1) {
    hlen = buf[8] | (buf[9] << 8);
    off = 10;
  } else {
    hlen = buf[8] | (buf[9] << 8) | (buf[10] << 16) | ((long)buf[11] << 24);
    off = 12;
  }
  if (off + hlen > len) return -3;
  std::string header((const char*)buf + off, hlen);
  info->header_bytes = off + hlen;

  // dtype
  auto dpos = header.find("'descr':");
  if (dpos == std::string::npos) return -4;
  auto q1 = header.find('\'', dpos + 8);
  auto q2 = header.find('\'', q1 + 1);
  std::string descr = header.substr(q1 + 1, q2 - q1 - 1);
  if (descr == "<f4" || descr == "|f4") info->dtype_code = 1;
  else if (descr == "<f8") info->dtype_code = 2;
  else if (descr == "<i8") info->dtype_code = 3;
  else if (descr == "<f2") info->dtype_code = 4;
  else return -5;
  if (header.find("'fortran_order': True") != std::string::npos) return -6;

  // shape
  auto spos = header.find("'shape':");
  auto p1 = header.find('(', spos);
  auto p2 = header.find(')', p1);
  std::string shape_s = header.substr(p1 + 1, p2 - p1 - 1);
  info->ndim = 0;
  info->elems = 1;
  const char* s = shape_s.c_str();
  while (*s) {
    while (*s == ' ' || *s == ',') s++;
    if (!*s) break;
    long v = strtol(s, (char**)&s, 10);
    if (v < 0) return -9;
    if (info->ndim < 8) info->shape[info->ndim] = v;
    info->ndim++;
    // overflow-safe running product (see check_npy_payload)
    if (v != 0 && info->elems > LONG_MAX / v) return -9;
    info->elems *= v;
  }
  if (info->ndim == 0) { info->shape[0] = 1; }
  return 0;
}

long npy_itemsize(int dtype_code) {
  switch (dtype_code) {
    case 1: return 4;   // f32
    case 2: return 8;   // f64
    case 3: return 8;   // i64
    case 4: return 2;   // f16
  }
  return 0;
}

// A truncated/malformed file whose header declares more elements than the
// payload holds must not cause a heap over-read.
int check_npy_payload(const NpyInfo& info, long total_bytes) {
  long itemsize = npy_itemsize(info.dtype_code);
  if (itemsize <= 0 || info.elems < 0) return -9;
  // overflow-safe: validate the product against LONG_MAX before multiplying
  // (a huge declared dim must not signed-overflow into a small positive
  // value that passes the bounds check)
  if (info.elems != 0 && info.elems > LONG_MAX / itemsize) return -9;
  long need = info.elems * itemsize;
  // compare without forming header_bytes + need (which can itself overflow)
  if (info.header_bytes < 0 || info.header_bytes > total_bytes) return -9;
  if (need > total_bytes - info.header_bytes) return -9;
  return 0;
}

int convert_to_f32(const unsigned char* raw, const NpyInfo& info, float* out) {
  long n = info.elems;
  switch (info.dtype_code) {
    case 1:
      memcpy(out, raw, n * 4);
      return 0;
    case 2: {
      const double* p = (const double*)raw;
      for (long i = 0; i < n; i++) out[i] = (float)p[i];
      return 0;
    }
    case 3: {
      const int64_t* p = (const int64_t*)raw;
      for (long i = 0; i < n; i++) out[i] = (float)p[i];
      return 0;
    }
    case 4: {
      const uint16_t* p = (const uint16_t*)raw;
      for (long i = 0; i < n; i++) {
        uint16_t h = p[i];
        uint32_t sign = (uint32_t)(h >> 15) << 31;
        uint32_t exp = (h >> 10) & 0x1f;
        uint32_t man = h & 0x3ff;
        uint32_t f;
        if (exp == 0) {
          if (man == 0) f = sign;
          else {
            exp = 127 - 15 + 1;
            while (!(man & 0x400)) { man <<= 1; exp--; }
            man &= 0x3ff;
            f = sign | (exp << 23) | (man << 13);
          }
        } else if (exp == 31) {
          f = sign | 0x7f800000 | (man << 13);
        } else {
          f = sign | ((exp - 15 + 127) << 23) | (man << 13);
        }
        memcpy(&out[i], &f, 4);
      }
      return 0;
    }
  }
  return -7;
}

int load_one_npy(const char* path, float* out, long expect_elems) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<unsigned char> buf(fsize);
  if (fread(buf.data(), 1, fsize, f) != (size_t)fsize) { fclose(f); return -1; }
  fclose(f);
  NpyInfo info;
  int rc = parse_npy_header(buf.data(), fsize, &info);
  if (rc) return rc;
  if (expect_elems >= 0 && info.elems != expect_elems) return -8;
  if ((rc = check_npy_payload(info, fsize))) return rc;
  return convert_to_f32(buf.data() + info.header_bytes, info, out);
}

// ---- minimal zip (npz) reader: stored or deflate members -----------------

struct ZipMember {
  long offset = -1;       // offset of local header
  long comp_size = 0;
  long uncomp_size = 0;
  int method = 0;         // 0 stored, 8 deflate
};

int find_zip_member(const unsigned char* buf, long len, const char* name,
                    ZipMember* m) {
  // scan for End Of Central Directory
  long eocd = -1;
  for (long i = len - 22; i >= 0 && i >= len - 22 - 65536; i--) {
    if (buf[i] == 0x50 && buf[i + 1] == 0x4b && buf[i + 2] == 0x05 &&
        buf[i + 3] == 0x06) { eocd = i; break; }
  }
  if (eocd < 0) return -10;
  uint16_t n_entries = buf[eocd + 10] | (buf[eocd + 11] << 8);
  uint32_t cd_off = buf[eocd + 16] | (buf[eocd + 17] << 8) |
                    (buf[eocd + 18] << 16) | ((uint32_t)buf[eocd + 19] << 24);
  long p = cd_off;
  std::string want = std::string(name) + ".npy";
  for (int e = 0; e < n_entries; e++) {
    if (p + 46 > len || memcmp(buf + p, "PK\x01\x02", 4) != 0) return -11;
    uint16_t method = buf[p + 10] | (buf[p + 11] << 8);
    uint32_t csize = buf[p + 20] | (buf[p + 21] << 8) | (buf[p + 22] << 16) |
                     ((uint32_t)buf[p + 23] << 24);
    uint32_t usize = buf[p + 24] | (buf[p + 25] << 8) | (buf[p + 26] << 16) |
                     ((uint32_t)buf[p + 27] << 24);
    uint16_t nlen = buf[p + 28] | (buf[p + 29] << 8);
    uint16_t elen = buf[p + 30] | (buf[p + 31] << 8);
    uint16_t clen = buf[p + 32] | (buf[p + 33] << 8);
    uint32_t lho = buf[p + 42] | (buf[p + 43] << 8) | (buf[p + 44] << 16) |
                   ((uint32_t)buf[p + 45] << 24);
    std::string fname((const char*)buf + p + 46, nlen);
    if (fname == want || fname == name) {
      m->offset = lho;
      m->comp_size = csize;
      m->uncomp_size = usize;
      m->method = method;
      return 0;
    }
    p += 46 + nlen + elen + clen;
  }
  return -12;
}

int load_one_npz(const char* path, const char* member, float* out,
                 long expect_elems) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<unsigned char> buf(fsize);
  if (fread(buf.data(), 1, fsize, f) != (size_t)fsize) { fclose(f); return -1; }
  fclose(f);

  ZipMember m;
  int rc = find_zip_member(buf.data(), fsize, member, &m);
  if (rc) return rc;
  // local header: skip name + extra (bounds-check every derived offset
  // against the file size — a corrupt central directory must not cause
  // reads past the buffer)
  long p = m.offset;
  if (p < 0 || p + 30 > fsize) return -17;
  if (memcmp(buf.data() + p, "PK\x03\x04", 4) != 0) return -13;
  uint16_t nlen = buf[p + 26] | (buf[p + 27] << 8);
  uint16_t elen = buf[p + 28] | (buf[p + 29] << 8);
  long data_off = p + 30 + nlen + elen;
  if (m.comp_size < 0 || data_off + m.comp_size > fsize) return -17;

  std::vector<unsigned char> npy;
  if (m.method == 0) {
    npy.assign(buf.begin() + data_off, buf.begin() + data_off + m.comp_size);
  } else if (m.method == 8) {
    npy.resize(m.uncomp_size);
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, -15) != Z_OK) return -14;
    zs.next_in = buf.data() + data_off;
    zs.avail_in = m.comp_size;
    zs.next_out = npy.data();
    zs.avail_out = m.uncomp_size;
    int zrc = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    if (zrc != Z_STREAM_END) return -15;
  } else {
    return -16;
  }
  NpyInfo info;
  rc = parse_npy_header(npy.data(), (long)npy.size(), &info);
  if (rc) return rc;
  if (expect_elems >= 0 && info.elems != expect_elems) return -8;
  if ((rc = check_npy_payload(info, (long)npy.size()))) return rc;
  return convert_to_f32(npy.data() + info.header_bytes, info, out);
}

template <typename Fn>
int parallel_for(int n, int n_threads, Fn fn) {
  if (n_threads <= 1) {
    for (int i = 0; i < n; i++) {
      int rc = fn(i);
      if (rc) return rc;
    }
    return 0;
  }
  std::atomic<int> next(0);
  std::atomic<int> err(0);
  std::vector<std::thread> workers;
  for (int t = 0; t < n_threads; t++) {
    workers.emplace_back([&] {
      int i;
      while ((i = next.fetch_add(1)) < n) {
        if (err.load()) return;
        int rc = fn(i);
        if (rc) err.store(rc);
      }
    });
  }
  for (auto& w : workers) w.join();
  return err.load();
}

}  // namespace

extern "C" {

int dpc_npy_info(const char* path, long* shape_out, int* ndim_out,
                 int* dtype_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  unsigned char buf[4096];
  long n = (long)fread(buf, 1, sizeof(buf), f);
  fclose(f);
  NpyInfo info;
  int rc = parse_npy_header(buf, n, &info);
  if (rc) return rc;
  for (int i = 0; i < info.ndim && i < 8; i++) shape_out[i] = info.shape[i];
  *ndim_out = info.ndim;
  *dtype_out = info.dtype_code;
  return 0;
}

int dpc_load_npy_batch(const char** paths, int n, int n_threads, float* out,
                       long elems_per_file) {
  return parallel_for(n, n_threads, [&](int i) {
    return load_one_npy(paths[i], out + (long)i * elems_per_file,
                        elems_per_file);
  });
}

int dpc_load_npz_batch(const char** paths, const char* member, int n,
                       int n_threads, float* out, long elems_per_file) {
  return parallel_for(n, n_threads, [&](int i) {
    return load_one_npz(paths[i], member, out + (long)i * elems_per_file,
                        elems_per_file);
  });
}

}  // extern "C"
