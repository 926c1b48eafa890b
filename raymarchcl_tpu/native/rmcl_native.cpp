// Native data-pipeline for raymarchcl_tpu: procedural volume generation,
// mesh voxelization, and .vox file I/O.
//
// This is the host-side data tier (the TPU compute path is JAX/XLA/Pallas).
// The reference's equivalent is single-threaded Clojure (generators.clj,
// meshvoxel.clj, io.clj — minutes for a 512^3 volume); here the volume
// builders are OpenMP-parallel C++ (sub-second for 512^3 on a few cores).
//
// Formula parity:
//   gyroid      generators.clj:18-42  (z-sliced, x-banded shell, values
//                                      64/128/255, scale 0.01*(512/rx),
//                                      offset (0.3875,0,0))
//   terrain     generators.clj:44-60
//   voxelize    meshvoxel.clj:60-69   (point stamp, z-major)
//   voxelize_ks meshvoxel.clj:45-58   (cube dilation, z-major)
//   .vox format io.clj:9-17           ("VOXEL" + 3x int32 BE + elem size)
//
// Exposed as a C ABI consumed via ctypes (binding.py).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------- gyroid --
void rmcl_gyroid_volume(int32_t rx, int32_t ry, int32_t rz, float scl,
                        uint8_t *out) {
  const double ox = 0.3875, t = 1.0;
  const int64_t rxy = (int64_t)rx * ry;
#pragma omp parallel for schedule(static)
  for (int32_t z = 0; z < rz; z++) {
    uint8_t *slab = out + (int64_t)z * rxy;
    if ((z & 0x3f) < 32) {  // z-slicing (generators.clj:35)
      memset(slab, 0, rxy);
      continue;
    }
    const double sz = sin(z * (double)scl), cz = cos(z * (double)scl);
    for (int32_t y = 0; y < ry; y++) {
      const double sy = sin(y * (double)scl), cy = cos(y * (double)scl);
      uint8_t *row = slab + (int64_t)y * rx;
      for (int32_t x = 0; x < rx; x++) {
        const double xs = x * (double)scl + ox;
        const double v = fabs(cos(xs) * sz + cy * sin(xs) + cz * sy) - t;
        uint8_t b = 0;
        if (fabs(0.2 - v) < 0.05)          // shell (generators.clj:39)
          b = ((x & 0x3f) < 32) ? 64 : 128;  // x-banding (generators.clj:40)
        else if (v > 0.35)                 // interior (generators.clj:41)
          b = 255;
        row[x] = b;
      }
    }
  }
}

// --------------------------------------------------------------- terrain --
void rmcl_terrain_volume(int32_t rx, int32_t ry, int32_t rz, uint8_t *out) {
  const int64_t rxy = (int64_t)rx * ry;
  memset(out, 0, (int64_t)rz * rxy);
  const int32_t wall_y = (int32_t)(ry * 0.666);
  // wall 2 iterates x over slabs (generators.clj:51 index x*rxy+y*rx+(rx-1-z));
  // the reference assumes cubic volumes — clamp to the real slab count so
  // non-cubic grids neither overflow (rx > rz) nor diverge from the python
  // path (rz > rx)
  const int32_t wall2_slabs = rx < rz ? rx : rz;
  for (int32_t z = 0; z < 4 && z < rz; z++)
    for (int32_t y = 0; y < wall_y; y++) {
      for (int32_t x = 0; x < rx; x++)
        out[(int64_t)z * rxy + (int64_t)y * rx + x] = 64;
      if (rx - 1 - z >= 0)
        for (int32_t x = 0; x < wall2_slabs; x++)
          out[(int64_t)x * rxy + (int64_t)y * rx + (rx - 1 - z)] = 64;
    }
#pragma omp parallel for schedule(static)
  for (int32_t z = 0; z < rz; z++)
    for (int32_t x = 0; x < rx; x++) {
      const int32_t dx = 16 - (x % 32), dz = 16 - (z % 32);
      if (dx * dx + dz * dz <= 121) {
        const int32_t h =
            (int32_t)(ry * (0.25 + 0.125 * (sin(z * 0.02) * cos(x * 0.03))));
        for (int32_t yy = 0; yy <= h && yy < ry; yy++)
          out[(int64_t)z * rxy + (int64_t)yy * rx + x] = 255;
      }
    }
}

// ------------------------------------------------------------ voxelizers --
void rmcl_voxelize_points(const float *verts, int64_t nv, int32_t res,
                          const double *off, const double *pmin, double scale,
                          uint8_t *out) {
  const int64_t rxy = (int64_t)res * res;
  memset(out, 0, rxy * res);
  for (int64_t i = 0; i < nv; i++) {
    const int64_t x = (int64_t)(off[0] + (verts[i * 3 + 0] - pmin[0]) * scale);
    const int64_t y = (int64_t)(off[1] + (verts[i * 3 + 1] - pmin[1]) * scale);
    const int64_t z = (int64_t)(off[2] + (verts[i * 3 + 2] - pmin[2]) * scale);
    if (x >= 0 && x < res && y >= 0 && y < res && z >= 0 && z < res)
      out[z * rxy + y * res + x] = 255;
  }
}

void rmcl_voxelize_ks(const float *verts, int64_t nv, int32_t res, int32_t ks,
                      const double *off, const double *pmin, double scale,
                      uint8_t *out) {
  const int64_t rxy = (int64_t)res * res;
  memset(out, 0, rxy * res);
  for (int64_t i = 0; i < nv; i++) {
    const int64_t cx = (int64_t)(off[0] + (verts[i * 3 + 0] - pmin[0]) * scale);
    const int64_t cy = (int64_t)(off[1] + (verts[i * 3 + 1] - pmin[1]) * scale);
    const int64_t cz = (int64_t)(off[2] + (verts[i * 3 + 2] - pmin[2]) * scale);
    for (int64_t z = cz - ks < 0 ? 0 : cz - ks; z < res && z <= cz + ks; z++)
      for (int64_t y = cy - ks < 0 ? 0 : cy - ks; y < res && y <= cy + ks; y++)
        for (int64_t x = cx - ks < 0 ? 0 : cx - ks; x < res && x <= cx + ks;
             x++)
          out[z * rxy + y * res + x] = 255;
  }
}

// Scatter/streak voxelizer (meshvoxel.clj:25-43 semantics; Y-MAJOR index).
// Randomness is the counter-based splitmix64 stream defined in
// models/mesh.py::_scatter_draws — u(i,d) = sm64(sm64(seed) + i*GOLDEN +
// d*LEAP), float = (u >> 11) * 2^-53 — so this path is byte-identical to
// the numpy fallback (tests/test_native.py).
static inline uint64_t sm64(uint64_t z) {
  z += 0x9E3779B97F4A7C15ULL;
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

void rmcl_voxelize_scatter(const float *verts, int64_t nv, int32_t res,
                           const double *off, const double *pmin, double scale,
                           uint64_t seed, uint8_t *out) {
  const int64_t rxy = (int64_t)res * res;
  memset(out, 0, rxy * res);
  const uint64_t base = sm64(seed);
  const double r2 = res / 2.0;
  for (int64_t i = 0; i < nv; i++) {
    const uint64_t vi = base + (uint64_t)i * 0x9E3779B97F4A7C15ULL;
    double f[12];
    for (int d = 0; d < 12; d++)
      f[d] = (double)(sm64(vi + (uint64_t)d * 0xD1B54A32D192ED03ULL) >> 11) *
             (1.0 / 9007199254740992.0);
    const int64_t x0 = (int64_t)(off[0] + (verts[i * 3 + 0] - pmin[0]) * scale);
    const int64_t y0 = (int64_t)(off[1] + (verts[i * 3 + 1] - pmin[1]) * scale);
    const int64_t z0 = (int64_t)(off[2] + (verts[i * 3 + 2] - pmin[2]) * scale);
    int64_t n = f[0] < 0.25 ? (int64_t)ceil(5.0 * f[1]) : 1;
    if (n < 1) n = 1;
    const int64_t y = (int64_t)(y0 + res * 0.4);
    for (int64_t k = 0; k < n && k < 5; k++) {
      const int64_t dx = (int64_t)(f[2 + 2 * k] * ((k / 5.0) * r2));
      const int64_t x = (int64_t)(x0 - dx + res * 0.4);
      int64_t z = z0 - (int64_t)(r2 * (0.125 * f[3 + 2 * k] + 0.125));
      if (z < 0) z = 0;
      for (int64_t zz = z - 1; zz <= z + 1; zz++)
        for (int64_t yy = y - 1; yy <= y + 1; yy++)
          for (int64_t xx = x - 1; xx <= x + 1; xx++)
            if (xx >= 0 && xx < res && yy >= 0 && yy < res && zz >= 0 &&
                zz < res)
              out[yy * rxy + zz * res + xx] = 64;
    }
  }
}

// ------------------------------------------------------------- .vox I/O --
static void write_be32(FILE *f, int32_t v) {
  unsigned char b[4] = {(unsigned char)((v >> 24) & 0xff),
                        (unsigned char)((v >> 16) & 0xff),
                        (unsigned char)((v >> 8) & 0xff),
                        (unsigned char)(v & 0xff)};
  fwrite(b, 1, 4, f);
}

static int32_t read_be32(FILE *f) {
  unsigned char b[4];
  if (fread(b, 1, 4, f) != 4) return -1;
  return ((int32_t)b[0] << 24) | ((int32_t)b[1] << 16) | ((int32_t)b[2] << 8) |
         (int32_t)b[3];
}

int32_t rmcl_save_volume(const char *path, int32_t rx, int32_t ry, int32_t rz,
                         const uint8_t *vox) {
  FILE *f = fopen(path, "wb");
  if (!f) return -1;
  fwrite("VOXEL", 1, 5, f);
  write_be32(f, rx);
  write_be32(f, ry);
  write_be32(f, rz);
  const unsigned char es = 1;
  fwrite(&es, 1, 1, f);
  const int64_t n = (int64_t)rx * ry * rz;
  const size_t w = fwrite(vox, 1, n, f);
  fclose(f);
  return w == (size_t)n ? 0 : -2;
}

// Reads header into res[3]; returns 0 on success.
int32_t rmcl_load_volume_header(const char *path, int32_t *res) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  char magic[5];
  if (fread(magic, 1, 5, f) != 5 || memcmp(magic, "VOXEL", 5) != 0) {
    fclose(f);
    return -2;
  }
  res[0] = read_be32(f);
  res[1] = read_be32(f);
  res[2] = read_be32(f);
  unsigned char es;
  if (fread(&es, 1, 1, f) != 1 || es != 1) {
    fclose(f);
    return -3;
  }
  fclose(f);
  return 0;
}

int32_t rmcl_load_volume_data(const char *path, uint8_t *out, int64_t n) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 5 + 12 + 1, SEEK_SET);
  const size_t r = fread(out, 1, n, f);
  fclose(f);
  return r == (size_t)n ? 0 : -2;
}

int32_t rmcl_num_threads(void) {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
