// Native runtime kernels for the host-side asset pipeline.
//
// The reference implements its whole host layer in C++ (scene flattening
// with per-vertex compression scene.cpp:190-274, stb_image HDR decoding,
// the alias-map build hdr_sampling.cpp:107-176). These are the same hot
// loops, exposed through a C ABI for ctypes (no pybind11 in this image).
//
// Build: see vk_raytrace_tpu/runtime/build.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Radiance RGBE (.hdr) decode: new-style RLE + flat scanlines.
// Mirrors stb_image's HDR path used by HdrSampling::loadEnvironment
// (hdr_sampling.cpp:56-99). Returns 0 on success.
// ---------------------------------------------------------------------------
int rgbe_decode(const uint8_t* data, int64_t len, int width, int height,
                float* out /* height*width*3 */) {
  int64_t ptr = 0;
  std::vector<uint8_t> row(static_cast<size_t>(width) * 4);

  for (int y = 0; y < height; ++y) {
    if (ptr + 4 > len) return -1;
    const bool rle = width >= 8 && width < 0x8000 && data[ptr] == 2 &&
                     data[ptr + 1] == 2 &&
                     ((data[ptr + 2] << 8) | data[ptr + 3]) == width;
    if (!rle) {
      if (ptr + int64_t(width) * 4 > len) return -2;
      std::memcpy(row.data(), data + ptr, size_t(width) * 4);
      ptr += int64_t(width) * 4;
      // interleaved RGBE per pixel
      for (int x = 0; x < width; ++x) {
        const uint8_t* p = row.data() + size_t(x) * 4;
        const int e = p[3];
        const float scale = e ? std::ldexp(1.0f, e - 136) : 0.0f;
        float* o = out + (size_t(y) * width + x) * 3;
        o[0] = p[0] * scale;
        o[1] = p[1] * scale;
        o[2] = p[2] * scale;
      }
      continue;
    }
    ptr += 4;
    // planar RLE: 4 channels
    for (int c = 0; c < 4; ++c) {
      int x = 0;
      while (x < width) {
        if (ptr >= len) return -3;
        int count = data[ptr++];
        if (count > 128) {  // run
          if (ptr >= len) return -4;
          const uint8_t v = data[ptr++];
          count -= 128;
          if (x + count > width) return -5;
          for (int k = 0; k < count; ++k) row[size_t(x + k) * 4 + c] = v;
          x += count;
        } else {  // literal
          if (ptr + count > len || x + count > width) return -6;
          for (int k = 0; k < count; ++k) row[size_t(x + k) * 4 + c] = data[ptr++];
          x += count;
        }
      }
    }
    for (int x = 0; x < width; ++x) {
      const uint8_t* p = row.data() + size_t(x) * 4;
      const int e = p[3];
      const float scale = e ? std::ldexp(1.0f, e - 136) : 0.0f;
      float* o = out + (size_t(y) * width + x) * 3;
      o[0] = p[0] * scale;
      o[1] = p[1] * scale;
      o[2] = p[2] * scale;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Octahedral unit-vector compression (compress.glsl:111-139 semantics):
// 2x16-bit snorm, lower-hemisphere fold in integer space, round-half-even.
// ---------------------------------------------------------------------------
static inline int32_t round_even_i(float x) {
  return static_cast<int32_t>(std::nearbyintf(x));  // FE_TONEAREST = half-even
}

void oct_encode_batch(const float* vecs /* n*3 */, int64_t n, uint32_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    const float vx = vecs[i * 3 + 0];
    const float vy = vecs[i * 3 + 1];
    const float vz = vecs[i * 3 + 2];
    const float d = 32767.0f / (std::fabs(vx) + std::fabs(vy) + std::fabs(vz));
    int32_t x = round_even_i(vx * d);
    int32_t y = round_even_i(vy * d);
    if (vz < 0.0f) {
      const int32_t maskx = x >> 31;
      const int32_t masky = y >> 31;
      const int32_t tmp = 32767 + maskx + masky;
      const int32_t tmpx = x;
      x = (tmp - (y ^ masky)) ^ maskx;
      y = (tmp - (tmpx ^ maskx)) ^ masky;
    }
    uint32_t packed =
        (uint32_t(y + 32767) << 16) | uint32_t(x + 32767);
    if (packed == 0xFFFFFFFFu) packed = 0xFFFFFFFEu;
    out[i] = packed;
  }
}

void oct_decode_batch(const uint32_t* packed, int64_t n, float* out /* n*3 */) {
  for (int64_t i = 0; i < n; ++i) {
    int32_t x = int32_t(packed[i] & 0xFFFFu) - 32767;
    int32_t y = int32_t(packed[i] >> 16) - 32767;
    const int32_t maskx = x >> 31;
    const int32_t masky = y >> 31;
    const int32_t tmp0 = 32767 + maskx + masky;
    const int32_t ymask = y ^ masky;
    const int32_t tmp1 = tmp0 - (x ^ maskx);
    const int32_t z = tmp1 - ymask;
    if (z < 0) {
      x = (tmp0 - ymask) ^ maskx;
      y = tmp1 ^ masky;
    }
    float fx = x / 32768.0f, fy = y / 32768.0f, fz = z / 32768.0f;
    const float inv = 1.0f / std::sqrt(fx * fx + fy * fy + fz * fz);
    out[i * 3 + 0] = fx * inv;
    out[i * 3 + 1] = fy * inv;
    out[i * 3 + 2] = fz * inv;
  }
}

// ---------------------------------------------------------------------------
// Area-weighted smooth vertex normals (nvh::GltfScene-style import helper).
// ---------------------------------------------------------------------------
void smooth_normals(const double* pos /* nv*3 */, int64_t nv,
                    const int64_t* idx /* nt*3 */, int64_t nt,
                    double* out /* nv*3 */) {
  std::memset(out, 0, sizeof(double) * size_t(nv) * 3);
  for (int64_t t = 0; t < nt; ++t) {
    const int64_t a = idx[t * 3], b = idx[t * 3 + 1], c = idx[t * 3 + 2];
    const double* pa = pos + a * 3;
    const double* pb = pos + b * 3;
    const double* pc = pos + c * 3;
    const double e1x = pb[0] - pa[0], e1y = pb[1] - pa[1], e1z = pb[2] - pa[2];
    const double e2x = pc[0] - pa[0], e2y = pc[1] - pa[1], e2z = pc[2] - pa[2];
    const double nx = e1y * e2z - e1z * e2y;
    const double ny = e1z * e2x - e1x * e2z;
    const double nz = e1x * e2y - e1y * e2x;
    for (int64_t v : {a, b, c}) {
      out[v * 3 + 0] += nx;
      out[v * 3 + 1] += ny;
      out[v * 3 + 2] += nz;
    }
  }
  for (int64_t v = 0; v < nv; ++v) {
    double* o = out + v * 3;
    const double l = std::sqrt(o[0] * o[0] + o[1] * o[1] + o[2] * o[2]);
    if (l < 1e-20) {
      o[0] = 0.0; o[1] = 0.0; o[2] = 1.0;
    } else {
      o[0] /= l; o[1] /= l; o[2] /= l;
    }
  }
}

// ---------------------------------------------------------------------------
// Walker alias table, exact sequential construction — a faithful C++ port of
// the reference pairing loop (hdr_sampling.cpp:107-176) including the
// consumed-large requeue behavior. Used as a CPU fallback / cross-check for
// the parallel on-device cascade (models/hdr.py). Returns the integral.
// ---------------------------------------------------------------------------
float alias_table_build(const float* importance, int64_t n,
                        float* q_out, uint32_t* alias_out) {
  double sum = 0.0;
  for (int64_t i = 0; i < n; ++i) sum += importance[i];
  if (sum <= 0.0) {
    for (int64_t i = 0; i < n; ++i) { q_out[i] = 1.0f; alias_out[i] = uint32_t(i); }
    return 0.0f;
  }
  const double inv_avg = double(n) / sum;
  std::vector<double> q(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) {
    q[i] = importance[i] * inv_avg;
    alias_out[i] = uint32_t(i);
  }
  std::vector<int64_t> part(static_cast<size_t>(n));
  int64_t s = 0, large = n;
  for (int64_t i = 0; i < n; ++i) {
    if (q[i] < 1.0) part[size_t(s++)] = i;
    else part[size_t(--large)] = i;
  }
  for (s = 0; s < large && large < n; ++s) {
    const int64_t lo = part[size_t(s)];
    const int64_t hi = part[size_t(large)];
    alias_out[lo] = uint32_t(hi);
    q[hi] -= 1.0 - q[lo];
    if (q[hi] < 1.0) ++large;
  }
  for (int64_t i = 0; i < n; ++i) q_out[i] = float(q[i]);
  return float(sum);
}

// ---------------------------------------------------------------------------
// RGBA8 vertex color packing (scene.cpp:219-242 style).
// ---------------------------------------------------------------------------
void pack_rgba8(const float* colors /* n*4 */, int64_t n, uint32_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    uint32_t v = 0;
    for (int c = 0; c < 4; ++c) {
      float f = colors[i * 4 + c];
      f = f < 0.0f ? 0.0f : (f > 1.0f ? 1.0f : f);
      v |= uint32_t(std::lround(f * 255.0f)) << (8 * c);
    }
    out[i] = v;
  }
}

}  // extern "C"
