// Native host kernels for the data pipeline (plain C ABI, loaded via
// ctypes). TPU-side compute lives in XLA/Pallas; these cover the
// host-side hot loops the reference implemented natively (numba CPU
// voxelizer `efg/geometry/point_cloud_ops.py`, CUDA points-in-box): the
// dataloader runs on few host cores, so the single-pass C++ voxelizer and
// box-membership tests keep augmentation + parity tooling fast.
//
// Build: python setup_native.py build_ext --inplace  (or cmake; see file).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Hard voxelization, reference semantics (first-appearance voxel order,
// per-voxel point cap, reversed (z, y, x) coords). Returns #voxels.
// points: [n, c] float32 (xyz first); grid sizes from range/voxel size.
// out_voxels: [max_voxels, max_points, c]; out_coords: [max_voxels, 3];
// out_num:   [max_voxels]
int64_t points_to_voxel(
    const float* points, int64_t n, int64_t c,
    const float* voxel_size, const float* range,
    int64_t max_points, int64_t max_voxels,
    float* out_voxels, int32_t* out_coords, int32_t* out_num) {
  int64_t gx = (int64_t)std::round((range[3] - range[0]) / voxel_size[0]);
  int64_t gy = (int64_t)std::round((range[4] - range[1]) / voxel_size[1]);
  int64_t gz = (int64_t)std::round((range[5] - range[2]) / voxel_size[2]);
  std::vector<int32_t> table((size_t)(gx * gy * gz), -1);

  int64_t nvox = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float* p = points + i * c;
    int64_t cx = (int64_t)std::floor((p[0] - range[0]) / voxel_size[0]);
    int64_t cy = (int64_t)std::floor((p[1] - range[1]) / voxel_size[1]);
    int64_t cz = (int64_t)std::floor((p[2] - range[2]) / voxel_size[2]);
    if (cx < 0 || cx >= gx || cy < 0 || cy >= gy || cz < 0 || cz >= gz) continue;
    int64_t cell = (cz * gy + cy) * gx + cx;
    int32_t v = table[(size_t)cell];
    if (v == -1) {
      if (nvox >= max_voxels) break;  // reference truncation semantics
      v = (int32_t)nvox++;
      table[(size_t)cell] = v;
      out_coords[v * 3 + 0] = (int32_t)cz;
      out_coords[v * 3 + 1] = (int32_t)cy;
      out_coords[v * 3 + 2] = (int32_t)cx;
      out_num[v] = 0;
    }
    int32_t k = out_num[v];
    if (k < max_points) {
      std::memcpy(out_voxels + ((int64_t)v * max_points + k) * c, p,
                  sizeof(float) * (size_t)c);
      out_num[v] = k + 1;
    }
  }
  return nvox;
}

// Points-in-rotated-box membership: points [n, 3+] (stride cp), boxes
// [m, 7+] (x, y, z, dx, dy, dz, ..., yaw at index cb-1). out: [n, m] uint8.
void points_in_rbbox(
    const float* points, int64_t n, int64_t cp,
    const float* boxes, int64_t m, int64_t cb,
    float margin, uint8_t* out) {
  for (int64_t j = 0; j < m; ++j) {
    const float* b = boxes + j * cb;
    float cyaw = std::cos(b[cb - 1]);
    float syaw = std::sin(b[cb - 1]);
    float hx = b[3] * 0.5f + margin;
    float hy = b[4] * 0.5f + margin;
    float hz = b[5] * 0.5f + margin;
    for (int64_t i = 0; i < n; ++i) {
      const float* p = points + i * cp;
      float dx = p[0] - b[0];
      float dy = p[1] - b[1];
      float dz = p[2] - b[2];
      float lx = dx * cyaw + dy * syaw;
      float ly = -dx * syaw + dy * cyaw;
      out[i * m + j] =
          (std::fabs(lx) <= hx && std::fabs(ly) <= hy && std::fabs(dz) <= hz)
              ? 1 : 0;
    }
  }
}

}  // extern "C"
