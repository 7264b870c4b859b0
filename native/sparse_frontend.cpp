// Native sparse visual-odometry frontend for eggfusion_tpu.
//
// First-party C++ replacement for the reference's ORB-SLAM2 submodule
// (reference integration at /root/reference/src/core/tracker.py:85-122): the
// dense TPU tracker only needs a pose *delta seed*, so this implements the
// minimal robust RGB-D odometer:
//
//   FAST-9 corners (grid-bucketed, Harris-free score, 3x3 NMS)
//   -> intensity-centroid orientation
//   -> steered 256-bit binary descriptors (BRIEF-style, deterministic
//      xorshift-generated test pattern)
//   -> brute-force Hamming matching with Lowe ratio test
//   -> 3D-3D Horn/quaternion alignment under RANSAC (both frames carry
//      depth, so the 3D-3D closed form replaces ORB-SLAM2's PnP; it is
//      exact with 3 samples and needs no iterative solver)
//
// Exposed as a plain C ABI consumed from Python via ctypes — no pybind11.
// CPU-side by design (like ORB-SLAM2), overlapped with TPU device work.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>

namespace {

// ---------------------------------------------------------------- FAST-9 --

// Bresenham circle of radius 3 (16 pixels), clockwise from 12 o'clock.
static const int CIRC_DX[16] = {0, 1, 2, 3, 3, 3, 2, 1, 0, -1, -2, -3, -3, -3, -2, -1};
static const int CIRC_DY[16] = {-3, -3, -2, -1, 0, 1, 2, 3, 3, 3, 2, 1, 0, -1, -2, -3};

struct Corner {
  int x, y;
  int score;
  float angle;
};

inline bool fast9_is_corner(const uint8_t* img, int w, int x, int y, int t, int* score) {
  const int c = img[y * w + x];
  int vals[16];
  for (int i = 0; i < 16; ++i) vals[i] = img[(y + CIRC_DY[i]) * w + (x + CIRC_DX[i])];

  // quick reject: at least one of the N/S/E/W pairs must be far from center
  int nb = 0, nd = 0;
  for (int i = 0; i < 16; i += 4) {
    if (vals[i] > c + t) nb++;
    if (vals[i] < c - t) nd++;
  }
  if (nb < 2 && nd < 2) return false;

  // 9 contiguous brighter or darker (wrap-around via doubled loop)
  for (int mode = 0; mode < 2; ++mode) {
    int run = 0, best = 0;
    for (int i = 0; i < 32; ++i) {
      const int v = vals[i & 15];
      const bool hit = mode == 0 ? (v > c + t) : (v < c - t);
      run = hit ? run + 1 : 0;
      best = std::max(best, run);
      if (best >= 9) break;
    }
    if (best >= 9) {
      int s = 0;
      for (int i = 0; i < 16; ++i) s += std::abs(vals[i] - c);
      *score = s;
      return true;
    }
  }
  return false;
}

inline float ic_angle(const uint8_t* img, int w, int h, int x, int y) {
  // intensity centroid over a radius-15 circular patch
  const int R = 15;
  double m01 = 0.0, m10 = 0.0;
  for (int dy = -R; dy <= R; ++dy) {
    const int yy = y + dy;
    if (yy < 0 || yy >= h) continue;
    const int xmax = static_cast<int>(std::sqrt(static_cast<double>(R * R - dy * dy)));
    for (int dx = -xmax; dx <= xmax; ++dx) {
      const int xx = x + dx;
      if (xx < 0 || xx >= w) continue;
      const int v = img[yy * w + xx];
      m10 += dx * v;
      m01 += dy * v;
    }
  }
  return static_cast<float>(std::atan2(m01, m10));
}

// ------------------------------------------------------------ descriptor --

struct TestPattern {
  int8_t x0[256], y0[256], x1[256], y1[256];
  TestPattern() {
    // deterministic xorshift32; offsets roughly gaussian via sum of two
    // uniforms, clamped to the +-13 patch so rotation stays in +-15
    uint32_t s = 0x9E3779B9u;
    auto rnd = [&s]() {
      s ^= s << 13; s ^= s >> 17; s ^= s << 5;
      return s;
    };
    auto coord = [&rnd]() {
      int a = static_cast<int>(rnd() % 27) - 13;
      int b = static_cast<int>(rnd() % 27) - 13;
      int v = (a + b) / 2;
      return static_cast<int8_t>(std::max(-13, std::min(13, v)));
    };
    for (int i = 0; i < 256; ++i) {
      x0[i] = coord(); y0[i] = coord(); x1[i] = coord(); y1[i] = coord();
    }
  }
};
static const TestPattern kPattern;

inline void describe(const uint8_t* img, int w, int h, const Corner& kp, uint64_t* out4) {
  const float ca = std::cos(kp.angle), sa = std::sin(kp.angle);
  uint64_t bits[4] = {0, 0, 0, 0};
  for (int i = 0; i < 256; ++i) {
    auto sample = [&](int8_t px, int8_t py) {
      const int rx = static_cast<int>(std::lround(ca * px - sa * py));
      const int ry = static_cast<int>(std::lround(sa * px + ca * py));
      const int xx = std::max(0, std::min(w - 1, kp.x + rx));
      const int yy = std::max(0, std::min(h - 1, kp.y + ry));
      return img[yy * w + xx];
    };
    if (sample(kPattern.x0[i], kPattern.y0[i]) < sample(kPattern.x1[i], kPattern.y1[i]))
      bits[i >> 6] |= (1ull << (i & 63));
  }
  std::memcpy(out4, bits, sizeof(bits));
}

// ---------------------------------------------------------------- SE(3) ---

// Horn's closed-form 3D-3D alignment: R, t minimizing sum |q_i - (R p_i + t)|^2.
// Rotation from the max-eigenvalue eigenvector (unit quaternion) of the 4x4
// correlation matrix, found by Jacobi sweeps (symmetric, tiny, always safe).
struct Pose {
  double R[9];
  double t[3];
};

static void jacobi4(double a[4][4], double v[4][4]) {
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) v[i][j] = (i == j) ? 1.0 : 0.0;
  for (int sweep = 0; sweep < 32; ++sweep) {
    double off = 0.0;
    for (int p = 0; p < 4; ++p)
      for (int q = p + 1; q < 4; ++q) off += a[p][q] * a[p][q];
    if (off < 1e-24) break;
    for (int p = 0; p < 4; ++p) {
      for (int q = p + 1; q < 4; ++q) {
        if (std::abs(a[p][q]) < 1e-30) continue;
        const double theta = (a[q][q] - a[p][p]) / (2.0 * a[p][q]);
        const double tt = (theta >= 0 ? 1.0 : -1.0) /
                          (std::abs(theta) + std::sqrt(theta * theta + 1.0));
        const double c = 1.0 / std::sqrt(tt * tt + 1.0), s = tt * c;
        for (int k = 0; k < 4; ++k) {
          const double akp = a[k][p], akq = a[k][q];
          a[k][p] = c * akp - s * akq;
          a[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 4; ++k) {
          const double apk = a[p][k], aqk = a[q][k];
          a[p][k] = c * apk - s * aqk;
          a[q][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 4; ++k) {
          const double vkp = v[k][p], vkq = v[k][q];
          v[k][p] = c * vkp - s * vkq;
          v[k][q] = s * vkp + c * vkq;
        }
      }
    }
  }
}

static bool horn_align(const double* P, const double* Q, const int* idx, int n, Pose* out) {
  if (n < 3) return false;
  double cp[3] = {0, 0, 0}, cq[3] = {0, 0, 0};
  for (int i = 0; i < n; ++i) {
    const double* p = P + 3 * idx[i];
    const double* q = Q + 3 * idx[i];
    for (int k = 0; k < 3; ++k) { cp[k] += p[k]; cq[k] += q[k]; }
  }
  for (int k = 0; k < 3; ++k) { cp[k] /= n; cq[k] /= n; }

  double S[9] = {0};  // correlation sum p' q'^T
  for (int i = 0; i < n; ++i) {
    const double* p = P + 3 * idx[i];
    const double* q = Q + 3 * idx[i];
    double pp[3], qq[3];
    for (int k = 0; k < 3; ++k) { pp[k] = p[k] - cp[k]; qq[k] = q[k] - cq[k]; }
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) S[3 * r + c] += pp[r] * qq[c];
  }
  const double Sxx = S[0], Sxy = S[1], Sxz = S[2];
  const double Syx = S[3], Syy = S[4], Syz = S[5];
  const double Szx = S[6], Szy = S[7], Szz = S[8];
  double N[4][4] = {
      {Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx},
      {Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz},
      {Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy},
      {Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz},
  };
  double V[4][4];
  jacobi4(N, V);
  int best = 0;
  for (int i = 1; i < 4; ++i)
    if (N[i][i] > N[best][best]) best = i;
  double w = V[0][best], x = V[1][best], y = V[2][best], z = V[3][best];
  const double nq = std::sqrt(w * w + x * x + y * y + z * z);
  if (nq < 1e-12) return false;
  w /= nq; x /= nq; y /= nq; z /= nq;
  double* R = out->R;
  R[0] = 1 - 2 * (y * y + z * z); R[1] = 2 * (x * y - w * z); R[2] = 2 * (x * z + w * y);
  R[3] = 2 * (x * y + w * z); R[4] = 1 - 2 * (x * x + z * z); R[5] = 2 * (y * z - w * x);
  R[6] = 2 * (x * z - w * y); R[7] = 2 * (y * z + w * x); R[8] = 1 - 2 * (x * x + y * y);
  for (int k = 0; k < 3; ++k)
    out->t[k] = cq[k] - (R[3 * k] * cp[0] + R[3 * k + 1] * cp[1] + R[3 * k + 2] * cp[2]);
  return true;
}

inline double transfer_err(const Pose& T, const double* p, const double* q) {
  double e = 0.0;
  for (int k = 0; k < 3; ++k) {
    const double r = q[k] - (T.R[3 * k] * p[0] + T.R[3 * k + 1] * p[1] + T.R[3 * k + 2] * p[2] + T.t[k]);
    e += r * r;
  }
  return std::sqrt(e);
}

inline uint32_t xorshift(uint32_t* s) {
  *s ^= *s << 13; *s ^= *s >> 17; *s ^= *s << 5;
  return *s;
}

}  // namespace

extern "C" {

// Detect FAST corners + oriented binary descriptors.
//   gray:     (h, w) uint8 row-major
//   kp_out:   (max_kp, 3) float  -> x, y, angle
//   desc_out: (max_kp, 4) uint64 -> 256-bit descriptor
// Returns the number of keypoints written.
int ef_detect(const uint8_t* gray, int h, int w, int threshold, int max_kp,
              float* kp_out, uint64_t* desc_out) {
  if (h < 32 || w < 32) return 0;
  std::vector<int> scores(static_cast<size_t>(h) * w, 0);
  std::vector<Corner> corners;
  corners.reserve(4096);
  const int B = 16;  // border: descriptor patch + circle
  for (int y = B; y < h - B; ++y) {
    for (int x = B; x < w - B; ++x) {
      int s;
      if (fast9_is_corner(gray, w, x, y, threshold, &s)) scores[y * w + x] = s;
    }
  }
  // 3x3 non-max suppression
  for (int y = B; y < h - B; ++y) {
    for (int x = B; x < w - B; ++x) {
      const int s = scores[y * w + x];
      if (s == 0) continue;
      bool maxi = true;
      for (int dy = -1; dy <= 1 && maxi; ++dy)
        for (int dx = -1; dx <= 1; ++dx) {
          if (dx == 0 && dy == 0) continue;
          if (scores[(y + dy) * w + (x + dx)] > s) { maxi = false; break; }
        }
      if (maxi) corners.push_back({x, y, s, 0.0f});
    }
  }
  // grid bucketing for spatial spread: keep the best per 32x32 cell first,
  // then fill remaining budget by global score
  std::sort(corners.begin(), corners.end(),
            [](const Corner& a, const Corner& b) { return a.score > b.score; });
  const int gw = (w + 31) / 32, gh = (h + 31) / 32;
  std::vector<uint8_t> cell(static_cast<size_t>(gw) * gh, 0);
  std::vector<Corner> picked;
  picked.reserve(max_kp);
  for (const Corner& c : corners) {
    if (static_cast<int>(picked.size()) >= max_kp) break;
    uint8_t& used = cell[(c.y / 32) * gw + (c.x / 32)];
    if (used < 4) {  // at most 4 per cell in the first pass
      used++;
      picked.push_back(c);
    }
  }
  for (const Corner& c : corners) {
    if (static_cast<int>(picked.size()) >= max_kp) break;
    bool dup = false;
    for (const Corner& p : picked)
      if (p.x == c.x && p.y == c.y) { dup = true; break; }
    if (!dup) picked.push_back(c);
  }

  int n = 0;
  for (Corner& c : picked) {
    c.angle = ic_angle(gray, w, h, c.x, c.y);
    kp_out[3 * n] = static_cast<float>(c.x);
    kp_out[3 * n + 1] = static_cast<float>(c.y);
    kp_out[3 * n + 2] = c.angle;
    describe(gray, w, h, c, desc_out + 4 * n);
    ++n;
  }
  return n;
}

// Match descriptors (Hamming + ratio test) and robustly estimate the SE(3)
// delta mapping frame-0 camera coords to frame-1 camera coords, from 3D-3D
// correspondences back-projected with each frame's depth map.
//   kp0/kp1:      (n, 3) float (x, y, angle)
//   d0/d1:        (n, 4) uint64
//   depth0/1:     (h, w) float, metric; <= 0 means invalid
//   delta_out:    (16,) float row-major 4x4
// Returns inlier count (>= min_inliers on success), 0 or negative on failure.
int ef_track(const float* kp0, const uint64_t* d0, int n0,
             const float* kp1, const uint64_t* d1, int n1,
             const float* depth0, const float* depth1, int h, int w,
             float fx, float fy, float cx, float cy,
             int min_inliers, float inlier_thresh,
             float* delta_out) {
  if (n0 < 3 || n1 < 3) return 0;

  // brute-force Hamming with ratio test
  std::vector<int> m0, m1;
  m0.reserve(n0); m1.reserve(n0);
  for (int i = 0; i < n0; ++i) {
    int best = -1, bd = 257, bd2 = 257;
    const uint64_t* a = d0 + 4 * i;
    for (int j = 0; j < n1; ++j) {
      const uint64_t* b = d1 + 4 * j;
      const int dist = __builtin_popcountll(a[0] ^ b[0]) + __builtin_popcountll(a[1] ^ b[1]) +
                       __builtin_popcountll(a[2] ^ b[2]) + __builtin_popcountll(a[3] ^ b[3]);
      if (dist < bd) { bd2 = bd; bd = dist; best = j; }
      else if (dist < bd2) bd2 = dist;
    }
    if (best >= 0 && bd < 64 && bd * 4 < bd2 * 3) {  // ratio 0.75
      m0.push_back(i);
      m1.push_back(best);
    }
  }

  // back-project matched keypoints with valid depth on both sides
  std::vector<double> P, Q;
  for (size_t k = 0; k < m0.size(); ++k) {
    const float* a = kp0 + 3 * m0[k];
    const float* b = kp1 + 3 * m1[k];
    const int ax = static_cast<int>(std::lround(a[0])), ay = static_cast<int>(std::lround(a[1]));
    const int bx = static_cast<int>(std::lround(b[0])), by = static_cast<int>(std::lround(b[1]));
    const float da = depth0[ay * w + ax], db = depth1[by * w + bx];
    if (da <= 0.1f || da > 30.0f || db <= 0.1f || db > 30.0f) continue;
    P.push_back((a[0] - cx) * da / fx); P.push_back((a[1] - cy) * da / fy); P.push_back(da);
    Q.push_back((b[0] - cx) * db / fx); Q.push_back((b[1] - cy) * db / fy); Q.push_back(db);
  }
  const int n = static_cast<int>(P.size() / 3);
  if (n < min_inliers) return 0;

  // RANSAC over 3-point Horn alignments
  uint32_t seed = 0xC0FFEEu;
  Pose best_pose{};
  int best_inl = 0;
  std::vector<int> tri(3), inliers, best_inliers;
  for (int it = 0; it < 128; ++it) {
    tri[0] = xorshift(&seed) % n;
    tri[1] = xorshift(&seed) % n;
    tri[2] = xorshift(&seed) % n;
    if (tri[0] == tri[1] || tri[1] == tri[2] || tri[0] == tri[2]) continue;
    Pose T;
    if (!horn_align(P.data(), Q.data(), tri.data(), 3, &T)) continue;
    inliers.clear();
    for (int i = 0; i < n; ++i)
      if (transfer_err(T, &P[3 * i], &Q[3 * i]) < inlier_thresh) inliers.push_back(i);
    if (static_cast<int>(inliers.size()) > best_inl) {
      best_inl = static_cast<int>(inliers.size());
      best_pose = T;
      best_inliers = inliers;
    }
  }
  if (best_inl < min_inliers) return 0;

  // refine on the full inlier set, twice (re-gating between rounds)
  for (int round = 0; round < 2; ++round) {
    Pose T;
    if (!horn_align(P.data(), Q.data(), best_inliers.data(),
                    static_cast<int>(best_inliers.size()), &T))
      break;
    best_pose = T;
    best_inliers.clear();
    for (int i = 0; i < n; ++i)
      if (transfer_err(best_pose, &P[3 * i], &Q[3 * i]) < inlier_thresh)
        best_inliers.push_back(i);
    best_inl = static_cast<int>(best_inliers.size());
  }
  if (best_inl < min_inliers) return 0;

  for (int r = 0; r < 3; ++r) {
    for (int c = 0; c < 3; ++c) delta_out[4 * r + c] = static_cast<float>(best_pose.R[3 * r + c]);
    delta_out[4 * r + 3] = static_cast<float>(best_pose.t[r]);
  }
  delta_out[12] = delta_out[13] = delta_out[14] = 0.0f;
  delta_out[15] = 1.0f;
  return best_inl;
}

}  // extern "C"
