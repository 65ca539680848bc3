// Host-side dense two-phase simplex (float64) — C ABI for ctypes.
//
// Role: the native CPU engine of the framework, playing the part scipy's
// vendored HiGHS C++ dual simplex plays in the reference
// (/root/reference/app/controllers/solver_controller.py:78-85) — but
// implemented from scratch.  Used as (a) a zero-dispatch-latency fallback
// for tiny problems, (b) an exact float64 cross-check/refinement engine for
// the TPU kernels, and (c) the reference implementation in differential
// tests.
//
// Algorithm: primal tableau simplex, two phases, Dantzig pricing with a
// Bland fallback after a stall budget (anti-cycling), epsilon ratio-test
// tie-breaking on the smallest basis index.  Mirrors the semantics of the
// JAX kernels in simplex_tpu/ops/tableau.py so differential tests compare
// like for like.
//
// Build: g++ -O3 -march=native -shared -fPIC simplex_host.cpp -o libsimplex_host.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int STATUS_OPTIMAL = 0;
constexpr int STATUS_ITER_LIMIT = 1;
constexpr int STATUS_INFEASIBLE = 2;
constexpr int STATUS_UNBOUNDED = 3;

struct Tableau {
  int rows;        // constraint rows
  int cols;        // structural + slack + artificial columns (no RHS)
  std::vector<double> data;   // (rows + 1) x (cols + 1); last row obj,
                              // last col RHS
  std::vector<int> basis;     // rows

  double& at(int r, int c) { return data[(size_t)r * (cols + 1) + c]; }
};

void pivot(Tableau& t, int r, int s) {
  const int W = t.cols + 1;
  double* T = t.data.data();
  double* prow = T + (size_t)r * W;
  const double inv = 1.0 / prow[s];
  for (int j = 0; j < W; ++j) prow[j] *= inv;
  for (int i = 0; i <= t.rows; ++i) {
    if (i == r) continue;
    double* row = T + (size_t)i * W;
    const double f = row[s];
    if (f == 0.0) continue;
    for (int j = 0; j < W; ++j) row[j] -= f * prow[j];
    row[s] = 0.0;
  }
  prow[s] = 1.0;
  t.basis[r] = s;
}

// Returns status; `allowed` marks columns eligible for entering.
int run_phase(Tableau& t, const std::vector<uint8_t>& allowed, double tol,
              long max_iters, long bland_after, long* iters_io) {
  const int m = t.rows, n = t.cols;
  long iters = *iters_io;
  for (; iters < max_iters; ++iters) {
    const bool use_bland = iters >= bland_after;
    // Pricing.
    int s = -1;
    double best = -tol;
    for (int j = 0; j < n; ++j) {
      if (!allowed[j]) continue;
      const double rc = t.at(m, j);
      if (rc < best) {
        if (use_bland) { s = j; break; }   // first eligible index
        best = rc;
        s = j;
      } else if (use_bland && rc < -tol) { s = j; break; }
    }
    if (s < 0) { *iters_io = iters; return STATUS_OPTIMAL; }

    // Ratio test with near-tie Bland tie-break on basis index.
    int r = -1;
    double min_ratio = HUGE_VAL;
    for (int i = 0; i < m; ++i) {
      const double a = t.at(i, s);
      if (a > tol) {
        const double ratio = t.at(i, n) / a;
        if (ratio < min_ratio) min_ratio = ratio;
      }
    }
    if (!std::isfinite(min_ratio)) { *iters_io = iters; return STATUS_UNBOUNDED; }
    const double near = min_ratio + 1e-12 * (1.0 + std::fabs(min_ratio));
    int best_basis = INT32_MAX;
    for (int i = 0; i < m; ++i) {
      const double a = t.at(i, s);
      if (a > tol && t.at(i, n) / a <= near && t.basis[i] < best_basis) {
        best_basis = t.basis[i];
        r = i;
      }
    }
    pivot(t, r, s);
  }
  *iters_io = iters;
  return STATUS_ITER_LIMIT;
}

}  // namespace

extern "C" {

// ops: -1 (<=), 0 (=), 1 (>=).  Returns scipy-compatible status.
// x_out: n doubles; z_out: min-form objective; iters_out: pivots used.
int simplex_solve_dense(int m, int n, const double* A, const double* b,
                        const double* c, const int8_t* ops, int maximize,
                        double tol, long max_iters,
                        double* x_out, double* z_out, long* iters_out) {
  if (m <= 0 || n <= 0) return -1;

  // Count layout: slack for every inequality, artificial for >=/=.
  std::vector<double> brow(b, b + m);
  std::vector<int8_t> op(ops, ops + m);
  std::vector<std::vector<double>> Arows(m, std::vector<double>(n));
  for (int i = 0; i < m; ++i) {
    for (int j = 0; j < n; ++j) Arows[i][j] = A[(size_t)i * n + j];
    if (brow[i] < 0.0) {       // normalize to non-negative RHS
      for (int j = 0; j < n; ++j) Arows[i][j] = -Arows[i][j];
      brow[i] = -brow[i];
      op[i] = (int8_t)(-op[i]);
    }
  }
  int n_slack = 0, n_art = 0;
  for (int i = 0; i < m; ++i) {
    if (op[i] != 0) ++n_slack;
    if (op[i] != -1) ++n_art;
  }
  const int cols = n + n_slack + n_art;

  Tableau t;
  t.rows = m;
  t.cols = cols;
  t.data.assign((size_t)(m + 1) * (cols + 1), 0.0);
  t.basis.assign(m, -1);

  int slack_at = n, art_at = n + n_slack;
  std::vector<uint8_t> is_art(cols, 0);
  for (int i = 0; i < m; ++i) {
    for (int j = 0; j < n; ++j) t.at(i, j) = Arows[i][j];
    t.at(i, cols) = brow[i];
    if (op[i] == -1) {                 // <=
      t.at(i, slack_at) = 1.0;
      t.basis[i] = slack_at++;
    } else if (op[i] == 1) {           // >=
      t.at(i, slack_at) = -1.0;
      ++slack_at;
      t.at(i, art_at) = 1.0;
      is_art[art_at] = 1;
      t.basis[i] = art_at++;
    } else {                           // =
      t.at(i, art_at) = 1.0;
      is_art[art_at] = 1;
      t.basis[i] = art_at++;
    }
  }

  const bool need_phase1 = n_art > 0;
  long iters = 0;
  double bscale = 1.0;
  for (int i = 0; i < m; ++i) bscale = std::max(bscale, std::fabs(brow[i]));

  if (need_phase1) {
    // Phase-1 objective: minimize sum of artificials, priced out.
    for (int j = 0; j <= cols; ++j) {
      double sum = 0.0;
      for (int i = 0; i < m; ++i)
        if (is_art[t.basis[i]]) sum += t.at(i, j);
      t.at(m, j) = is_art.size() > (size_t)j && j < cols && is_art[j]
                       ? 0.0 : -sum;
    }
    std::vector<uint8_t> allowed(cols, 1);
    int st = run_phase(t, allowed, tol, max_iters, max_iters / 2, &iters);
    const double p1 = -t.at(m, cols);
    if (st != STATUS_OPTIMAL && st != STATUS_UNBOUNDED) return st;
    if (p1 > 1e-7 * (1.0 + bscale)) return STATUS_INFEASIBLE;

    // Evict basic artificials where possible.
    for (int i = 0; i < m; ++i) {
      if (!is_art[t.basis[i]]) continue;
      for (int j = 0; j < cols; ++j) {
        if (!is_art[j] && std::fabs(t.at(i, j)) > tol) { pivot(t, i, j); break; }
      }
    }
  }

  // Install + price out the phase-2 objective (min form).
  std::vector<double> cost(cols + 1, 0.0);
  for (int j = 0; j < n; ++j) cost[j] = maximize ? -c[j] : c[j];
  for (int j = 0; j <= cols; ++j) {
    double v = cost[j];
    for (int i = 0; i < m; ++i) v -= cost[t.basis[i]] * t.at(i, j);
    t.at(m, j) = v;
  }

  std::vector<uint8_t> allowed(cols, 1);
  for (int j = 0; j < cols; ++j) allowed[j] = is_art[j] ? 0 : 1;
  int st = run_phase(t, allowed, tol, max_iters, max_iters / 2, &iters);
  *iters_out = iters;
  if (st != STATUS_OPTIMAL) return st;

  for (int j = 0; j < n; ++j) x_out[j] = 0.0;
  for (int i = 0; i < m; ++i)
    if (t.basis[i] < n) x_out[t.basis[i]] = t.at(i, cols);
  *z_out = -t.at(m, cols);
  return STATUS_OPTIMAL;
}

}  // extern "C"
