// NARF-style interest image for 3D keypoints (keypoints3d).
//
// Native C++ counterpart of the reference's PCL-based NARF binary
// (omnidata_annotator/scripts/narf_interest_image.cpp + pcl_narf.{h,hpp}).
// This is a fresh implementation of the NARF interest operator (Steder,
// Rusu, Konolige, Burgard: "Point Feature Extraction on 3D Range Scans
// Taking into Account Object Boundaries", ICRA 2011) on a planar range
// image, not a port of PCL's code. I/O contract matches the reference
// driver: planar range image from a metric depth map, unseen pixels set to
// max range, dense per-pixel interest in [0, 1] (the caller scales by 2^16
// into a 16-bit PNG).
//
// Pipeline:
//   1. unproject depth -> 3D points (pinhole fx, fy, cx, cy)
//   2. object borders: range discontinuities above a relative threshold
//   3. surface change score: 1 - |n_l . n_r| style normal variation in a
//      3x3 neighborhood (strong at creases/corners), direction = image-plane
//      direction of maximal range second-derivative
//   4. interest: for each pixel, look at surface-change scores within the
//      metric support radius (support_size / 2), weight by an
//      optimal-distance profile, bin by change direction, and score high
//      where strong changes come from *diverse* directions (corner-ness)
//   5. light 3x3 smoothing of the interest image
//
// Build:  g++ -O3 -shared -fPIC -o libnarf.so narf.cpp
// ABI  :  narf_interest_image(depth, H, W, fx, fy, cx, cy,
//                             support_size, max_range, out)
#include <cmath>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

inline Vec3 sub(const Vec3& a, const Vec3& b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline Vec3 cross(const Vec3& a, const Vec3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline float dot(const Vec3& a, const Vec3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline float norm(const Vec3& a) { return std::sqrt(dot(a, a)); }
inline Vec3 normalize(const Vec3& a) {
  float n = norm(a);
  if (n < 1e-12f) return {0.f, 0.f, 0.f};
  return {a.x / n, a.y / n, a.z / n};
}

constexpr int kNumAngleBins = 8;
constexpr float kOptimalDistance = 0.25f;  // of the support radius
constexpr float kMinSurfaceChange = 0.05f;

}  // namespace

extern "C" {

// depth: H*W metric depths (<=0 or >=max_range treated as unseen).
// out:   H*W interest values in [0, 1].
void narf_interest_image(const float* depth, int H, int W, float fx, float fy,
                         float cx, float cy, float support_size,
                         float max_range, float* out) {
  const int N = H * W;
  std::vector<float> range(N);
  std::vector<unsigned char> valid(N);
  std::vector<Vec3> pts(N);

  // 1. range image (unseen -> max range, like setUnseenToMaxRange)
  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      int i = y * W + x;
      float d = depth[i];
      bool v = d > 1e-6f && d < max_range;
      float dx = (static_cast<float>(x) + 0.5f - cx) / fx;
      float dy = (static_cast<float>(y) + 0.5f - cy) / fy;
      float dz = v ? d : max_range;
      pts[i] = {dx * dz, dy * dz, dz};
      range[i] = std::sqrt(dot(pts[i], pts[i]));
      valid[i] = v ? 1 : 0;
    }
  }

  auto at = [&](int y, int x) { return y * W + x; };
  auto clampi = [](int v, int lo, int hi) { return std::max(lo, std::min(v, hi)); };

  // 2. object borders: relative range jumps to 4-neighbors
  std::vector<float> border(N, 0.f);
  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      int i = at(y, x);
      if (!valid[i]) continue;
      float r = range[i];
      float max_jump = 0.f;
      const int dy4[4] = {0, 0, -1, 1};
      const int dx4[4] = {-1, 1, 0, 0};
      for (int k = 0; k < 4; ++k) {
        int yn = clampi(y + dy4[k], 0, H - 1), xn = clampi(x + dx4[k], 0, W - 1);
        float rn = range[at(yn, xn)];
        max_jump = std::max(max_jump, (rn - r) / std::max(r, 1e-6f));
      }
      // borders are foreground pixels where the background falls away
      border[i] = std::min(1.f, std::max(0.f, max_jump * 5.f - 0.1f));
    }
  }

  // 3. surface change score + image-plane direction (crease detector)
  std::vector<float> change(N, 0.f);
  std::vector<float> direction(N, 0.f);  // radians in [0, pi)
  for (int y = 1; y < H - 1; ++y) {
    for (int x = 1; x < W - 1; ++x) {
      int i = at(y, x);
      if (!valid[i]) continue;
      // normals of the left/right (and up/down) surface patches
      Vec3 c = pts[i];
      Vec3 l = pts[at(y, x - 1)], r = pts[at(y, x + 1)];
      Vec3 u = pts[at(y - 1, x)], d = pts[at(y + 1, x)];
      Vec3 n_left = normalize(cross(sub(l, c), sub(d, c)));
      Vec3 n_right = normalize(cross(sub(r, c), sub(u, c)));
      Vec3 n_up = normalize(cross(sub(u, c), sub(l, c)));
      Vec3 n_down = normalize(cross(sub(d, c), sub(r, c)));
      float ch_h = 1.f - std::fabs(dot(n_left, n_right));
      float ch_v = 1.f - std::fabs(dot(n_up, n_down));
      // ignore jumps across borders (shadow edges would dominate)
      if (border[i] > 0.5f) {
        ch_h = ch_v = 0.f;
      }
      float ch = std::sqrt(0.5f * (ch_h * ch_h + ch_v * ch_v));
      change[i] = std::min(1.f, ch);
      direction[i] = 0.5f * std::atan2(ch_v - ch_h, 2.f * std::sqrt(ch_h * ch_v) + 1e-12f) + static_cast<float>(M_PI) * 0.25f;
      if (direction[i] < 0) direction[i] += static_cast<float>(M_PI);
    }
  }

  // 4. interest: diversity-weighted strong changes within the support radius
  std::vector<float> interest(N, 0.f);
  const float support_radius = 0.5f * support_size;
  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      int i = at(y, x);
      if (!valid[i]) { interest[i] = 0.f; continue; }
      float z = pts[i].z;
      // metric support radius in pixels at this depth
      int R = static_cast<int>(std::ceil(support_radius * fx / std::max(z, 1e-3f)));
      R = std::max(2, std::min(R, 40));
      float hist[kNumAngleBins];
      std::fill(hist, hist + kNumAngleBins, 0.f);
      for (int dy = -R; dy <= R; ++dy) {
        int yn = y + dy;
        if (yn < 0 || yn >= H) continue;
        for (int dx = -R; dx <= R; ++dx) {
          int xn = x + dx;
          if (xn < 0 || xn >= W) continue;
          int j = at(yn, xn);
          float s = change[j];
          if (s < kMinSurfaceChange || !valid[j]) continue;
          float dist = std::sqrt(static_cast<float>(dx * dx + dy * dy)) / static_cast<float>(R);
          if (dist > 1.f) continue;
          // optimal-distance profile: peak at kOptimalDistance * R
          float w = 1.f - std::fabs(dist - kOptimalDistance) /
                              std::max(kOptimalDistance, 1.f - kOptimalDistance);
          if (w <= 0.f) continue;
          int b = static_cast<int>(direction[j] / static_cast<float>(M_PI) * kNumAngleBins) % kNumAngleBins;
          hist[b] = std::max(hist[b], s * w);
        }
      }
      float hmax = 0.f, hsum = 0.f;
      int active = 0;
      for (int b = 0; b < kNumAngleBins; ++b) {
        hmax = std::max(hmax, hist[b]);
        hsum += hist[b];
        if (hist[b] > 0.25f * hmax + 1e-6f) ++active;
      }
      // corner-ness: strong changes from diverse directions
      float diversity = hmax > 0.f ? (hsum / (hmax * kNumAngleBins)) : 0.f;
      float v = hmax * (0.5f + 0.5f * diversity);
      interest[i] = std::min(1.f, v);
    }
  }

  // 5. 3x3 box smoothing
  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      float acc = 0.f;
      int cnt = 0;
      for (int dy = -1; dy <= 1; ++dy) {
        for (int dx = -1; dx <= 1; ++dx) {
          int yn = y + dy, xn = x + dx;
          if (yn < 0 || yn >= H || xn < 0 || xn >= W) continue;
          acc += interest[at(yn, xn)];
          ++cnt;
        }
      }
      out[at(y, x)] = acc / static_cast<float>(cnt);
    }
  }
}

}  // extern "C"
