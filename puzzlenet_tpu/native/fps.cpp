// Host-side farthest-point-sampling kernel.
//
// Replaces the reference data path's per-item Python FPS loop
// (dataset.py:1147-1163): identical iterated max-min algorithm, C++ speed.
// Built into libpuzzlenet_native.so by the Makefile; bound via ctypes in
// puzzlenet_tpu/native/__init__.py.

#include <cstdint>
#include <limits>
#include <vector>

extern "C" void fps_f32(const float* xyz, int n, int npoint, int start,
                        int64_t* out) {
  std::vector<float> dist(n, std::numeric_limits<float>::infinity());
  int far = start;
  for (int i = 0; i < npoint; ++i) {
    out[i] = far;
    const float cx = xyz[3 * far], cy = xyz[3 * far + 1],
                cz = xyz[3 * far + 2];
    float best = -1.0f;
    int best_idx = 0;
    for (int j = 0; j < n; ++j) {
      const float dx = xyz[3 * j] - cx;
      const float dy = xyz[3 * j + 1] - cy;
      const float dz = xyz[3 * j + 2] - cz;
      const float d = dx * dx + dy * dy + dz * dz;
      if (d < dist[j]) dist[j] = d;
      if (dist[j] > best) {
        best = dist[j];
        best_idx = j;
      }
    }
    far = best_idx;
  }
}
