// Native frame-preparation kernels for the dataset layer.
//
// The reference preprocesses frames on a CPU worker process
// (/root/reference/src/utils/dataset.py:74-93): OpenCV undistort-remap +
// resize + depth scaling, feeding the GPU through a queue. These are the
// first-party C++ equivalents, invoked from the Python prefetch thread via
// ctypes (NumPy releases the GIL around the call, so the remap overlaps the
// device pipeline):
//
//   ef_remap_u8 / ef_remap_f32 — bilinear inverse remap (undistortion) with
//       the same (mapx, mapy) tables cv2.initUndistortRectifyMap produces.
//   ef_depth_convert_u16 — raw uint16 depth -> metric float with scale and
//       validity clamping, fused with the remap table (nearest sample:
//       interpolating depth across edges creates phantom geometry).
//
// Row-parallel with std::thread.

#include <cstdint>
#include <cmath>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

template <typename Fn>
void parallel_rows(int h, Fn&& fn) {
  const unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  const int n_threads = static_cast<int>(std::min<unsigned>(hw, 8));
  if (n_threads <= 1 || h < 64) {
    fn(0, h);
    return;
  }
  std::vector<std::thread> ts;
  const int rows = (h + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int y0 = t * rows, y1 = std::min(h, y0 + rows);
    if (y0 >= y1) break;
    ts.emplace_back(fn, y0, y1);
  }
  for (auto& t : ts) t.join();
}

template <typename T>
inline void remap_bilinear(const T* src, int h, int w, int c,
                           const float* mapx, const float* mapy, T* dst) {
  parallel_rows(h, [&](int y0, int y1) {
    for (int y = y0; y < y1; ++y) {
      for (int x = 0; x < w; ++x) {
        const float sx = mapx[y * w + x];
        const float sy = mapy[y * w + x];
        T* out = dst + (static_cast<size_t>(y) * w + x) * c;
        if (sx < 0.0f || sy < 0.0f || sx > w - 1.001f || sy > h - 1.001f) {
          for (int k = 0; k < c; ++k) out[k] = T(0);
          continue;
        }
        const int x0 = static_cast<int>(sx), y0i = static_cast<int>(sy);
        const float ax = sx - x0, ay = sy - y0i;
        const T* p00 = src + (static_cast<size_t>(y0i) * w + x0) * c;
        const T* p01 = p00 + c;
        const T* p10 = p00 + static_cast<size_t>(w) * c;
        const T* p11 = p10 + c;
        for (int k = 0; k < c; ++k) {
          const float v = (1 - ay) * ((1 - ax) * p00[k] + ax * p01[k]) +
                          ay * ((1 - ax) * p10[k] + ax * p11[k]);
          out[k] = static_cast<T>(v + (std::is_integral<T>::value ? 0.5f : 0.0f));
        }
      }
    }
  });
}

}  // namespace

extern "C" {

void ef_remap_u8(const uint8_t* src, int h, int w, int c,
                 const float* mapx, const float* mapy, uint8_t* dst) {
  remap_bilinear<uint8_t>(src, h, w, c, mapx, mapy, dst);
}

void ef_remap_f32(const float* src, int h, int w, int c,
                  const float* mapx, const float* mapy, float* dst) {
  remap_bilinear<float>(src, h, w, c, mapx, mapy, dst);
}

// Raw uint16 depth -> metric float32, optionally through the undistortion
// map (nearest-neighbor: bilinear across depth edges invents geometry).
// mapx/mapy may be null for the identity map. Values outside
// [min_m, max_m] (after scaling) become 0 (invalid).
void ef_depth_convert_u16(const uint16_t* src, int h, int w,
                          const float* mapx, const float* mapy,
                          float inv_scale, float min_m, float max_m,
                          float* dst) {
  parallel_rows(h, [&](int y0, int y1) {
    for (int y = y0; y < y1; ++y) {
      for (int x = 0; x < w; ++x) {
        int sx = x, sy = y;
        if (mapx != nullptr) {
          const float fxp = mapx[y * w + x];
          const float fyp = mapy[y * w + x];
          sx = static_cast<int>(std::lround(fxp));
          sy = static_cast<int>(std::lround(fyp));
          if (sx < 0 || sy < 0 || sx >= w || sy >= h) {
            dst[y * w + x] = 0.0f;
            continue;
          }
        }
        const float d = src[sy * w + sx] * inv_scale;
        dst[y * w + x] = (d >= min_m && d <= max_m) ? d : 0.0f;
      }
    }
  });
}

}  // extern "C"
