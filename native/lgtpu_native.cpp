// Native host-side runtime ops for lightglue_tpu.
//
// The TPU-native analog of the reference's C++ runtime layer (demo/):
// where the reference spends host time on per-pixel image conversion in the
// demo hot loop (demo/demo_mono.cpp:146-162) and verifies matches with
// cv::findFundamentalMat RANSAC (demo/demo_mono.cpp:339-346), this library
// provides:
//   - preprocess_image: fused bilinear-resize + RGB->gray + /255 normalize,
//     one pass over the output, no intermediate buffers;
//   - ransac_fundamental: normalized 8-point fundamental-matrix estimation
//     with Sampson-distance scoring (the same algorithm family OpenCV's
//     FM_RANSAC uses), deterministic under a caller-provided seed.
// Exposed as a plain C ABI for ctypes (no pybind11 in the image).
//
// Build: make (g++ -O3 -shared -fPIC).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// image preprocessing
// ---------------------------------------------------------------------------

// rgb: (h, w, 3) uint8 row-major; out: (out_h, out_w) float32 in [0, 1].
// Area-style sampling is approximated with bilinear taps at pixel centers,
// matching cv2.INTER_LINEAR closely for mild downscales.
void preprocess_image(const uint8_t* rgb, int h, int w,
                      float* out, int out_h, int out_w) {
  const float sx = static_cast<float>(w) / out_w;
  const float sy = static_cast<float>(h) / out_h;
  const float wr = 0.299f / 255.0f, wg = 0.587f / 255.0f, wb = 0.114f / 255.0f;
  for (int oy = 0; oy < out_h; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float ty = fy - y0;
    int y1 = std::min(y0 + 1, h - 1);
    y0 = std::max(y0, 0);
    for (int ox = 0; ox < out_w; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      float tx = fx - x0;
      int x1 = std::min(x0 + 1, w - 1);
      x0 = std::max(x0, 0);
      const uint8_t* p00 = rgb + (y0 * w + x0) * 3;
      const uint8_t* p01 = rgb + (y0 * w + x1) * 3;
      const uint8_t* p10 = rgb + (y1 * w + x0) * 3;
      const uint8_t* p11 = rgb + (y1 * w + x1) * 3;
      float g00 = wr * p00[0] + wg * p00[1] + wb * p00[2];
      float g01 = wr * p01[0] + wg * p01[1] + wb * p01[2];
      float g10 = wr * p10[0] + wg * p10[1] + wb * p10[2];
      float g11 = wr * p11[0] + wg * p11[1] + wb * p11[2];
      out[oy * out_w + ox] = (g00 * (1 - ty) * (1 - tx) + g01 * (1 - ty) * tx +
                              g10 * ty * (1 - tx) + g11 * ty * tx);
    }
  }
}

// ---------------------------------------------------------------------------
// small linear algebra (no external deps)
// ---------------------------------------------------------------------------

namespace {

// Jacobi eigen-decomposition of a symmetric n x n matrix (n <= 9).
// A is overwritten; V receives eigenvectors in columns; eig the eigenvalues.
void jacobi_eigen(double* A, double* V, double* eig, int n) {
  for (int i = 0; i < n * n; ++i) V[i] = 0.0;
  for (int i = 0; i < n; ++i) V[i * n + i] = 1.0;
  for (int sweep = 0; sweep < 60; ++sweep) {
    double off = 0.0;
    for (int p = 0; p < n; ++p)
      for (int q = p + 1; q < n; ++q) off += A[p * n + q] * A[p * n + q];
    if (off < 1e-24) break;
    for (int p = 0; p < n; ++p) {
      for (int q = p + 1; q < n; ++q) {
        double apq = A[p * n + q];
        if (std::fabs(apq) < 1e-30) continue;
        double app = A[p * n + p], aqq = A[q * n + q];
        double theta = 0.5 * (aqq - app) / apq;
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::fabs(theta) + std::sqrt(theta * theta + 1.0));
        double c = 1.0 / std::sqrt(t * t + 1.0);
        double s = t * c;
        for (int k = 0; k < n; ++k) {
          double akp = A[k * n + p], akq = A[k * n + q];
          A[k * n + p] = c * akp - s * akq;
          A[k * n + q] = s * akp + c * akq;
        }
        for (int k = 0; k < n; ++k) {
          double apk = A[p * n + k], aqk = A[q * n + k];
          A[p * n + k] = c * apk - s * aqk;
          A[q * n + k] = s * apk + c * aqk;
        }
        for (int k = 0; k < n; ++k) {
          double vkp = V[k * n + p], vkq = V[k * n + q];
          V[k * n + p] = c * vkp - s * vkq;
          V[k * n + q] = s * vkp + c * vkq;
        }
      }
    }
  }
  for (int i = 0; i < n; ++i) eig[i] = A[i * n + i];
}

// Solve min ||A f|| s.t. ||f||=1 for A (m x 9): smallest eigenvector of A^T A.
void min_singular_vector9(const double* A, int m, double* f) {
  double ata[81] = {0};
  for (int i = 0; i < m; ++i)
    for (int r = 0; r < 9; ++r)
      for (int c = 0; c < 9; ++c) ata[r * 9 + c] += A[i * 9 + r] * A[i * 9 + c];
  double V[81], eig[9];
  jacobi_eigen(ata, V, eig, 9);
  int best = 0;
  for (int i = 1; i < 9; ++i)
    if (eig[i] < eig[best]) best = i;
  for (int r = 0; r < 9; ++r) f[r] = V[r * 9 + best];
}

// Enforce rank 2 on F (3x3) via eigen-decomposition of F^T F and F F^T.
void enforce_rank2(double* F) {
  // SVD via eigen of F^T F (V, singular values) and F F^T (U)
  double ftf[9] = {0}, fft[9] = {0};
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c)
      for (int k = 0; k < 3; ++k) {
        ftf[r * 3 + c] += F[k * 3 + r] * F[k * 3 + c];
        fft[r * 3 + c] += F[r * 3 + k] * F[c * 3 + k];
      }
  double V[9], U[9], eigv[3], eigu[3];
  jacobi_eigen(ftf, V, eigv, 3);
  jacobi_eigen(fft, U, eigu, 3);
  // order singular values descending (eig of F^T F are s^2)
  int idx[3] = {0, 1, 2};
  std::sort(idx, idx + 3, [&](int a, int b) { return eigv[a] > eigv[b]; });
  // rebuild F with the smallest singular value zeroed: F2 = sum s_i u_i v_i^T.
  // sign of u_i resolved from F v_i = s_i u_i.
  double F2[9] = {0};
  for (int t = 0; t < 2; ++t) {
    int i = idx[t];
    double s = std::sqrt(std::max(eigv[i], 0.0));
    if (s < 1e-15) continue;
    double fv[3] = {0, 0, 0};
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) fv[r] += F[r * 3 + c] * V[c * 3 + i];
    // u_i = F v_i / s  (exactly unit-norm up to numerics)
    for (int r = 0; r < 3; ++r) fv[r] /= s;
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) F2[r * 3 + c] += s * fv[r] * V[c * 3 + i];
  }
  std::memcpy(F, F2, sizeof(F2));
}

struct Norm {
  double cx, cy, scale;
};

Norm normalize_points(const float* pts, const int* sel, int k, double* out) {
  double cx = 0, cy = 0;
  for (int i = 0; i < k; ++i) {
    cx += pts[sel[i] * 2];
    cy += pts[sel[i] * 2 + 1];
  }
  cx /= k;
  cy /= k;
  double md = 0;
  for (int i = 0; i < k; ++i) {
    double dx = pts[sel[i] * 2] - cx, dy = pts[sel[i] * 2 + 1] - cy;
    md += std::sqrt(dx * dx + dy * dy);
  }
  md /= k;
  double s = (md > 1e-12) ? std::sqrt(2.0) / md : 1.0;
  for (int i = 0; i < k; ++i) {
    out[i * 2] = (pts[sel[i] * 2] - cx) * s;
    out[i * 2 + 1] = (pts[sel[i] * 2 + 1] - cy) * s;
  }
  return {cx, cy, s};
}

void eight_point(const float* p0, const float* p1, const int* sel, int k,
                 double* F) {
  double n0[16 * 2], n1[16 * 2];  // k <= 16
  Norm t0 = normalize_points(p0, sel, k, n0);
  Norm t1 = normalize_points(p1, sel, k, n1);
  double A[16 * 9];
  for (int i = 0; i < k; ++i) {
    double x0 = n0[i * 2], y0 = n0[i * 2 + 1];
    double x1 = n1[i * 2], y1 = n1[i * 2 + 1];
    double* row = A + i * 9;
    row[0] = x1 * x0; row[1] = x1 * y0; row[2] = x1;
    row[3] = y1 * x0; row[4] = y1 * y0; row[5] = y1;
    row[6] = x0;      row[7] = y0;      row[8] = 1.0;
  }
  double f[9];
  min_singular_vector9(A, k, f);
  double Fn[9];
  std::memcpy(Fn, f, sizeof(Fn));
  enforce_rank2(Fn);
  // denormalize: F = T1^T Fn T0 with T = [[s,0,-s*cx],[0,s,-s*cy],[0,0,1]]
  double T0[9] = {t0.scale, 0, -t0.scale * t0.cx,
                  0, t0.scale, -t0.scale * t0.cy, 0, 0, 1};
  double T1[9] = {t1.scale, 0, -t1.scale * t1.cx,
                  0, t1.scale, -t1.scale * t1.cy, 0, 0, 1};
  double tmp[9] = {0};
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c)
      for (int kk = 0; kk < 3; ++kk)
        tmp[r * 3 + c] += T1[kk * 3 + r] * Fn[kk * 3 + c];  // T1^T * Fn
  double Fd[9] = {0};
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c)
      for (int kk = 0; kk < 3; ++kk)
        Fd[r * 3 + c] += tmp[r * 3 + kk] * T0[kk * 3 + c];
  std::memcpy(F, Fd, sizeof(Fd));
}

inline double sampson_dist(const double* F, double x0, double y0, double x1,
                           double y1) {
  double Fx0[3] = {F[0] * x0 + F[1] * y0 + F[2],
                   F[3] * x0 + F[4] * y0 + F[5],
                   F[6] * x0 + F[7] * y0 + F[8]};
  double Ftx1[3] = {F[0] * x1 + F[3] * y1 + F[6],
                    F[1] * x1 + F[4] * y1 + F[7],
                    F[2] * x1 + F[5] * y1 + F[8]};
  double num = x1 * Fx0[0] + y1 * Fx0[1] + Fx0[2];
  double den = Fx0[0] * Fx0[0] + Fx0[1] * Fx0[1] + Ftx1[0] * Ftx1[0] +
               Ftx1[1] * Ftx1[1];
  return (den > 1e-18) ? num * num / den : 1e18;
}

uint64_t xorshift64(uint64_t* s) {
  uint64_t x = *s;
  x ^= x << 13;
  x ^= x >> 7;
  x ^= x << 17;
  return *s = x;
}

}  // namespace

// pts0/pts1: (n, 2) float32 matched pixel coordinates.
// Returns inlier count; inlier_mask (n) uint8 and F_out (9) double filled.
int ransac_fundamental(const float* pts0, const float* pts1, int n,
                       int max_iters, float thresh, uint64_t seed,
                       uint8_t* inlier_mask, double* F_out) {
  if (n < 8) {
    std::memset(inlier_mask, 0, n);
    std::memset(F_out, 0, 9 * sizeof(double));
    return 0;
  }
  uint64_t rng = seed ? seed : 0x9E3779B97F4A7C15ull;
  double best_F[9] = {0};
  int best_inliers = -1;
  const double th2 = static_cast<double>(thresh) * thresh;
  for (int it = 0; it < max_iters; ++it) {
    int sel[8];
    for (int i = 0; i < 8; ++i) {
      bool dup;
      do {
        sel[i] = static_cast<int>(xorshift64(&rng) % n);
        dup = false;
        for (int j = 0; j < i; ++j) dup |= (sel[j] == sel[i]);
      } while (dup);
    }
    double F[9];
    eight_point(pts0, pts1, sel, 8, F);
    int inliers = 0;
    for (int i = 0; i < n; ++i) {
      if (sampson_dist(F, pts0[i * 2], pts0[i * 2 + 1], pts1[i * 2],
                       pts1[i * 2 + 1]) < th2)
        ++inliers;
    }
    if (inliers > best_inliers) {
      best_inliers = inliers;
      std::memcpy(best_F, F, sizeof(best_F));
    }
  }
  // refit on all inliers of the best model (up to 16-point LS refinement
  // batches for the fixed-size normalize buffers; use the first 16 inliers)
  int refit_sel[16];
  int k = 0;
  for (int i = 0; i < n && k < 16; ++i) {
    if (sampson_dist(best_F, pts0[i * 2], pts0[i * 2 + 1], pts1[i * 2],
                     pts1[i * 2 + 1]) < th2)
      refit_sel[k++] = i;
  }
  if (k >= 8) {
    double F[9];
    eight_point(pts0, pts1, refit_sel, k, F);
    int inliers = 0;
    for (int i = 0; i < n; ++i)
      if (sampson_dist(F, pts0[i * 2], pts0[i * 2 + 1], pts1[i * 2],
                       pts1[i * 2 + 1]) < th2)
        ++inliers;
    if (inliers >= best_inliers) {
      best_inliers = inliers;
      std::memcpy(best_F, F, sizeof(best_F));
    }
  }
  int count = 0;
  for (int i = 0; i < n; ++i) {
    bool in = sampson_dist(best_F, pts0[i * 2], pts0[i * 2 + 1], pts1[i * 2],
                           pts1[i * 2 + 1]) < th2;
    inlier_mask[i] = in ? 1 : 0;
    count += in;
  }
  std::memcpy(F_out, best_F, sizeof(best_F));
  return count;
}

}  // extern "C"
