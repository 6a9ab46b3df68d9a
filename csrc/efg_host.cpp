// Native host kernels for the data pipeline (plain C ABI, loaded via
// ctypes). TPU-side compute lives in XLA/Pallas; these cover the
// host-side hot loops the reference implemented natively (numba CPU
// voxelizer `efg/geometry/point_cloud_ops.py`, CUDA points-in-box): the
// dataloader runs on few host cores, so the single-pass C++ voxelizer and
// box-membership tests keep augmentation + parity tooling fast.
//
// Build: python setup_native.py build_ext --inplace  (or cmake; see file).

#include <algorithm>
#include <cmath>
#include <cstdio>
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

// BEV rotated-box collision test, exact mirror of
// `efg_tpu/geometry/box_ops_np.py box_collision_test` (itself the
// reference numba edge-intersection + containment test,
// `efg/geometry/box_ops.py:27-96`): overlap iff the axis-aligned bounds
// overlap AND (any edge pair properly intersects, or either polygon
// contains a corner of the other). float32 arithmetic to match the
// numpy path bit-for-bit on float32 corners.
// ca: [n, 4, 2], cb: [k, 4, 2], out: [n, k] uint8.
static inline float cross2(const float* o, const float* a, const float* b) {
  return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0]);
}

static inline bool seg_intersect(const float* a0, const float* a1,
                                 const float* b0, const float* b1) {
  float d1 = cross2(b0, b1, a0);
  float d2 = cross2(b0, b1, a1);
  float d3 = cross2(a0, a1, b0);
  float d4 = cross2(a0, a1, b1);
  return (d1 * d2 < 0.f) && (d3 * d4 < 0.f);
}

static inline bool poly_contains(const float* poly, const float* p) {
  // sign of cross(next-vert, p-vert) per edge; inside iff all same sign
  bool all_ge = true, all_le = true;
  for (int e = 0; e < 4; ++e) {
    const float* v0 = poly + e * 2;
    const float* v1 = poly + ((e + 1) & 3) * 2;
    float ex = v1[0] - v0[0], ey = v1[1] - v0[1];
    float dx = p[0] - v0[0], dy = p[1] - v0[1];
    float cr = ex * dy - ey * dx;
    all_ge &= (cr >= 0.f);
    all_le &= (cr <= 0.f);
  }
  return all_ge || all_le;
}

void box_collision_test(
    const float* ca, int64_t n, const float* cb, int64_t k, uint8_t* out) {
  std::vector<float> sa(4 * (size_t)n), sb(4 * (size_t)k);
  for (int64_t i = 0; i < n; ++i) {
    const float* c = ca + i * 8;
    float mnx = c[0], mny = c[1], mxx = c[0], mxy = c[1];
    for (int j = 1; j < 4; ++j) {
      mnx = std::min(mnx, c[j * 2]); mxx = std::max(mxx, c[j * 2]);
      mny = std::min(mny, c[j * 2 + 1]); mxy = std::max(mxy, c[j * 2 + 1]);
    }
    sa[i * 4] = mnx; sa[i * 4 + 1] = mny; sa[i * 4 + 2] = mxx; sa[i * 4 + 3] = mxy;
  }
  for (int64_t i = 0; i < k; ++i) {
    const float* c = cb + i * 8;
    float mnx = c[0], mny = c[1], mxx = c[0], mxy = c[1];
    for (int j = 1; j < 4; ++j) {
      mnx = std::min(mnx, c[j * 2]); mxx = std::max(mxx, c[j * 2]);
      mny = std::min(mny, c[j * 2 + 1]); mxy = std::max(mxy, c[j * 2 + 1]);
    }
    sb[i * 4] = mnx; sb[i * 4 + 1] = mny; sb[i * 4 + 2] = mxx; sb[i * 4 + 3] = mxy;
  }
  for (int64_t i = 0; i < n; ++i) {
    const float* pa = ca + i * 8;
    for (int64_t j = 0; j < k; ++j) {
      const float* pb = cb + j * 8;
      uint8_t r = 0;
      if (std::min(sa[i * 4 + 2], sb[j * 4 + 2]) > std::max(sa[i * 4], sb[j * 4]) &&
          std::min(sa[i * 4 + 3], sb[j * 4 + 3]) > std::max(sa[i * 4 + 1], sb[j * 4 + 1])) {
        bool hit = false;
        for (int e1 = 0; e1 < 4 && !hit; ++e1)
          for (int e2 = 0; e2 < 4 && !hit; ++e2)
            hit = seg_intersect(pa + e1 * 2, pa + ((e1 + 1) & 3) * 2,
                                pb + e2 * 2, pb + ((e2 + 1) & 3) * 2);
        for (int v = 0; v < 4 && !hit; ++v) hit = poly_contains(pa, pb + v * 2);
        for (int v = 0; v < 4 && !hit; ++v) hit = poly_contains(pb, pa + v * 2);
        r = hit ? 1 : 0;
      }
      out[i * k + j] = r;
    }
  }
}

// ---------------------------------------------------------------------------
// TFRecord scanner: record framing + masked CRC32C verification.
// The python decoder (`cli/data_preparation/waymo/tfrecord_decoder.py`)
// skips CRC checks (no crc32c in the stdlib) and pays interpreter cost per
// record; this scans GB-scale files natively. Two-pass API:
// max_records == 0 -> count records only; otherwise fill offsets/lengths of
// each payload (byte offset into the file). Returns #records scanned, or
// -(1 + index) at the first corrupt record.
static uint32_t crc32c_table[256];
static bool crc32c_init_done = false;

static void crc32c_init() {
  if (crc32c_init_done) return;
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int j = 0; j < 8; ++j)
      c = (c & 1) ? (0x82F63B78u ^ (c >> 1)) : (c >> 1);
    crc32c_table[i] = c;
  }
  crc32c_init_done = true;
}

static uint32_t crc32c(const uint8_t* data, size_t len) {
  crc32c_init();
  uint32_t c = 0xFFFFFFFFu;
  for (size_t i = 0; i < len; ++i)
    c = crc32c_table[(c ^ data[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

static inline uint32_t masked_crc(uint32_t crc) {
  return ((crc >> 15) | (crc << 17)) + 0xa282ead8u;
}

int64_t tfrecord_scan(
    const char* path, int64_t max_records, int32_t verify_payload_crc,
    int64_t* out_offsets, int64_t* out_lengths) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  int64_t idx = 0;
  int64_t pos = 0;
  std::vector<uint8_t> buf;
  for (;;) {
    uint8_t hdr[12];
    size_t got = std::fread(hdr, 1, 12, f);
    if (got == 0) break;  // clean EOF
    if (got != 12) { std::fclose(f); return -(1 + idx); }
    uint64_t len;
    uint32_t len_crc;
    std::memcpy(&len, hdr, 8);
    std::memcpy(&len_crc, hdr + 8, 4);
    if (masked_crc(crc32c(hdr, 8)) != len_crc) { std::fclose(f); return -(1 + idx); }
    int64_t payload_off = pos + 12;
    if (verify_payload_crc) {
      buf.resize((size_t)len + 4);
      if (std::fread(buf.data(), 1, (size_t)len + 4, f) != (size_t)len + 4) {
        std::fclose(f);
        return -(1 + idx);
      }
      uint32_t data_crc;
      std::memcpy(&data_crc, buf.data() + len, 4);
      if (masked_crc(crc32c(buf.data(), (size_t)len)) != data_crc) {
        std::fclose(f);
        return -(1 + idx);
      }
    } else {
      if (std::fseek(f, (long)(len + 4), SEEK_CUR) != 0) { std::fclose(f); return -(1 + idx); }
    }
    if (max_records > 0) {
      if (idx >= max_records) break;
      out_offsets[idx] = payload_off;
      out_lengths[idx] = (int64_t)len;
    }
    pos = payload_off + (int64_t)len + 4;
    ++idx;
  }
  std::fclose(f);
  return idx;
}

}  // extern "C"
