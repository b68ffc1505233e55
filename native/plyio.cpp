// PLY point-cloud writer.
//
// Parity target: kinectfusion::savePointcloud writes an ascii xyz PLY
// (kinectfusion.cpp:148-166). Binary little-endian is supported as the fast
// path for multi-million-point clouds. Exposed via ctypes from
// kinfu_tpu/io/native.py; the pure-Python writer in kinfu_tpu/io/ply.py
// produces byte-identical files and is the fallback.

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

int kio_write_ply(const char* path, const float* xyz, size_t n_points,
                  int binary) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  std::fprintf(f,
               "ply\nformat %s 1.0\nelement vertex %zu\n"
               "property float x\nproperty float y\nproperty float z\n"
               "end_header\n",
               binary ? "binary_little_endian" : "ascii", n_points);
  if (binary) {
    size_t put = n_points ? std::fwrite(xyz, sizeof(float) * 3, n_points, f) : 0;
    std::fclose(f);
    return put == n_points ? 0 : -1;
  }
  for (size_t i = 0; i < n_points; ++i) {
    // %g matches the Python fallback's f-string ":g" formatting
    std::fprintf(f, "%g %g %g\n", xyz[3 * i], xyz[3 * i + 1], xyz[3 * i + 2]);
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
