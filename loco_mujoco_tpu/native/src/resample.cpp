// Native data-loader kernel: batched not-a-knot cubic-spline resampling.
//
// The reference's trajectory engine resamples every dataset key from
// traj_dt to control_dt with scipy.interpolate.interp1d(kind="cubic")
// (reference utils/trajectory.py:184-234) — the host-side hot spot of env
// construction (SURVEY.md §3.1): O(keys × samples) spline solves per
// trajectory, pure Python/scipy. This C++ kernel computes the same
// not-a-knot cubic spline (interp1d kind="cubic" == make_interp_spline
// k=3 with not-a-knot boundaries) directly from the moment equations on
// the uniform knot grid x = 0..n-1, many rows in parallel (OpenMP).
//
// Exposed via ctypes (loco_mujoco_tpu/native/__init__.py); scipy remains
// the fallback and the parity oracle (tests/test_native.py).

#include <cstdint>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// Solve the not-a-knot moment system for one row y[0..n-1] on the uniform
// grid (h = 1). Moments M_i = S''(x_i) satisfy, for i = 1..n-2:
//   M_{i-1} + 4 M_i + M_{i+1} = 6 (y_{i-1} - 2 y_i + y_{i+1})
// with not-a-knot corners (S''' continuous at x_1 and x_{n-2}):
//   M_0 = 2 M_1 - M_2,   M_{n-1} = 2 M_{n-2} - M_{n-3}.
// Substituting the corners into the first/last interior equations leaves a
// tridiagonal system in M_1..M_{n-2}, solved by the Thomas algorithm.
void solve_moments(const double* y, int n, double* M, double* c_scratch,
                   double* d_scratch) {
  const int m = n - 2;  // unknowns M_1..M_{n-2}
  double* cp = c_scratch;
  double* dp = d_scratch;

  // Row i (for M_{i+1}), i = 0..m-1: a_i M_{i} + b_i M_{i+1} + c_i M_{i+2}
  // rhs_i = 6 * (y_i - 2 y_{i+1} + y_{i+2})
  // Interior rows: a = 1, b = 4, c = 1.
  // First row after substituting M_0 = 2 M_1 - M_2: b = 6, c = 0.
  // Last  row after substituting M_{n-1} = 2 M_{n-2} - M_{n-3}:
  //   a = 0, b = 6  (the M_{n-3} terms: 1 - 1 = 0... careful below).
  //
  // First interior equation (i = 1): M_0 + 4 M_1 + M_2 = r_1
  //   -> (2 M_1 - M_2) + 4 M_1 + M_2 = 6 M_1 = r_1.
  // Last interior equation (i = n-2): M_{n-3} + 4 M_{n-2} + M_{n-1} = r
  //   -> M_{n-3} + 4 M_{n-2} + 2 M_{n-2} - M_{n-3} = 6 M_{n-2} = r.
  // So the corner rows are fully decoupled: M_1 = r_1 / 6, M_{n-2} = r/6?
  // No — that is only true when the corner equations are *exactly* the
  // first/last interior rows. They are (not-a-knot uses the same knots),
  // so rows 0 and m-1 become diagonal. The remaining rows stay coupled to
  // them; run Thomas with per-row coefficients.
  for (int i = 0; i < m; ++i) {
    const double rhs = 6.0 * (y[i] - 2.0 * y[i + 1] + y[i + 2]);
    double a = (i == 0) ? 0.0 : 1.0;
    double b = 4.0;
    double c = (i == m - 1) ? 0.0 : 1.0;
    if (i == 0) b = 6.0, c = 0.0;
    if (i == m - 1) { b = 6.0; a = 0.0; }
    if (i == 0) {
      cp[i] = c / b;
      dp[i] = rhs / b;
    } else {
      const double den = b - a * cp[i - 1];
      cp[i] = c / den;
      dp[i] = (rhs - a * dp[i - 1]) / den;
    }
  }
  for (int i = m - 1; i >= 0; --i) {
    M[i + 1] = dp[i] - (i + 1 <= m - 1 ? cp[i] * M[i + 2] : 0.0);
  }
  M[0] = 2.0 * M[1] - M[2];
  M[n - 1] = 2.0 * M[n - 2] - M[n - 3];
}

}  // namespace

extern "C" {

// y: (n_rows, n) row-major; x_new: (n_new) query points in [0, n-1];
// out: (n_rows, n_new) row-major. Returns 0 on success.
int cubic_resample_uniform(const double* y, int64_t n_rows, int64_t n,
                           const double* x_new, int64_t n_new, double* out) {
  if (n < 4) return 1;  // not-a-knot needs >= 4 points (scipy does too)
#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    std::vector<double> M(n), cs(n), ds(n);
#ifdef _OPENMP
#pragma omp for
#endif
    for (int64_t r = 0; r < n_rows; ++r) {
      const double* yr = y + r * n;
      solve_moments(yr, static_cast<int>(n), M.data(), cs.data(), ds.data());
      double* o = out + r * n_new;
      for (int64_t k = 0; k < n_new; ++k) {
        double x = x_new[k];
        int64_t i = static_cast<int64_t>(x);
        if (i < 0) i = 0;
        if (i > n - 2) i = n - 2;
        const double t = x - static_cast<double>(i);
        // S(x) = y_i + b_i t + M_i/2 t^2 + (M_{i+1}-M_i)/6 t^3,
        // b_i = (y_{i+1} - y_i) - (2 M_i + M_{i+1}) / 6       (h = 1)
        const double b =
            (yr[i + 1] - yr[i]) - (2.0 * M[i] + M[i + 1]) / 6.0;
        o[k] = yr[i] +
               t * (b + t * (0.5 * M[i] +
                             t * (M[i + 1] - M[i]) / 6.0));
      }
    }
  }
  return 0;
}

}  // extern "C"
