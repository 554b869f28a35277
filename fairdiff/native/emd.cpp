// Exact EMD for the fairness OT targets — native replacement for the
// reference's POT C extension (ot.emd at exp-3:1531 / exp-6:1480).
//
// Problem shape (see fairdiff/fairness/emd.py): source masses a = ones(N),
// integer target masses b with sum(b) == N, cost [N, C] with N <= ~64 and
// C <= 16. An integral optimal plan exists, so the LP reduces to a
// rectangular assignment problem on the column-expanded cost matrix. We
// solve it with the Jonker-Volgenant shortest augmenting path algorithm
// (O(N^3)), identical optimum to scipy's linear_sum_assignment but callable
// from a worker thread without the GIL and without per-call numpy overhead
// — the trainer solves 100+ of these per optimizer step (exp-3:1528-1532).
//
// Exposed C ABI (ctypes):
//   int emd_assignment(const double* cost /* N*C */, const long* b /* C */,
//                      int n, int c, double* plan /* N*C out */);
//   int emd_batch(const double* cost, const long* bs /* D*C */,
//                 int d, int n, int c, double* plans /* D*N*C out */);
// Returns 0 on success, nonzero on mass mismatch.

#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

// Jonker-Volgenant square assignment on an implicit cost matrix
// cost(i, j) = cost_nc[i * c + col_of[j]].
// returns 0 on success, -1 if no augmenting column was found (only
// possible with non-finite costs, which the Python wrapper rejects —
// this is the in-depth guard so a bad call can never write out of
// bounds through j1 == -1)
int solve_assignment(const double* cost_nc, const int* col_of, int n, int c,
                     int* row_to_col) {
  std::vector<double> u(n + 1, 0.0), v(n + 1, 0.0);
  std::vector<int> p(n + 1, n);    // p[j] = row matched to column j (n = none)
  std::vector<int> way(n + 1, 0);
  for (int i = 0; i < n; ++i) {
    // augment from row i (classic Hungarian with potentials)
    std::vector<double> minv(n + 1, kInf);
    std::vector<char> used(n + 1, 0);
    int j0 = n;  // virtual start column
    p[n] = i;
    do {
      used[j0] = 1;
      int i0 = p[j0], j1 = -1;
      double delta = kInf;
      for (int j = 0; j < n; ++j) {
        if (used[j]) continue;
        double cur = cost_nc[i0 * c + col_of[j]] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      if (j1 < 0) return -1;  // non-finite costs: refuse, don't corrupt
      for (int j = 0; j <= n; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != n);
    do {
      int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0 != n);
  }
  for (int j = 0; j < n; ++j) row_to_col[p[j]] = j;
  return 0;
}

}  // namespace

extern "C" {

int emd_assignment(const double* cost, const long* b, int n, int c,
                   double* plan) {
  long total = 0;
  for (int j = 0; j < c; ++j) total += b[j];
  if (total != n) return 1;

  std::vector<int> col_of;
  col_of.reserve(n);
  for (int j = 0; j < c; ++j)
    for (long k = 0; k < b[j]; ++k) col_of.push_back(j);

  std::vector<int> row_to_col(n);
  if (solve_assignment(cost, col_of.data(), n, c, row_to_col.data()) != 0)
    return 2;

  std::memset(plan, 0, sizeof(double) * n * c);
  for (int i = 0; i < n; ++i) plan[i * c + col_of[row_to_col[i]]] = 1.0;
  return 0;
}

int emd_batch(const double* cost, const long* bs, int d, int n, int c,
              double* plans) {
  for (int k = 0; k < d; ++k) {
    int rc = emd_assignment(cost, bs + (size_t)k * c, n, c,
                            plans + (size_t)k * n * c);
    if (rc != 0) return rc;
  }
  return 0;
}

}  // extern "C"
