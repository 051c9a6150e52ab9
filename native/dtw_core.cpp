// Native DTW core: banded dynamic programming over a local-cost matrix.
//
// This replaces the compiled core of the `dtw-python` package the reference
// depends on (used via util/neighbors.py). Two step patterns are provided,
// matching R-dtw semantics exactly:
//   symmetric2   - diagonal weight 2, unit steps, normalization N+M
//   symmetricP2  - Sakoe-Chiba P=2 slope constraint, normalization N+M
// plus a fused entry point that computes the pairwise Euclidean cost matrix
// and the DTW distance in one pass (no Python round trip per pair).
//
// Built as a shared library, bound via ctypes (vpd_tpu/ops/dtw_native.py).

#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

namespace {

constexpr double INF = std::numeric_limits<double>::infinity();

inline double cell(const double* d, int64_t m, int64_t i, int64_t j) {
    return d[i * m + j];
}

double dtw_symmetric2(const double* d, int64_t n, int64_t m) {
    std::vector<double> prev(m, INF), curr(m, INF);
    for (int64_t i = 0; i < n; ++i) {
        for (int64_t j = 0; j < m; ++j) {
            double dij = cell(d, m, i, j);
            double best;
            if (i == 0 && j == 0) {
                best = dij;
            } else {
                best = INF;
                if (i > 0 && j > 0) best = prev[j - 1] + 2 * dij;
                if (i > 0 && prev[j] + dij < best) best = prev[j] + dij;
                if (j > 0 && curr[j - 1] + dij < best) best = curr[j - 1] + dij;
            }
            curr[j] = best;
        }
        std::swap(prev, curr);
    }
    return prev[m - 1];
}

double dtw_symmetricP2(const double* d, int64_t n, int64_t m) {
    // needs three previous rows
    std::vector<std::vector<double>> rows(
        4, std::vector<double>(m, INF));
    for (int64_t i = 0; i < n; ++i) {
        auto& curr = rows[i % 4];
        const auto& r1 = rows[(i + 3) % 4];  // i-1
        const auto& r2 = rows[(i + 2) % 4];  // i-2
        const auto& r3 = rows[(i + 1) % 4];  // i-3
        for (int64_t j = 0; j < m; ++j) {
            double dij = cell(d, m, i, j);
            double best;
            if (i == 0 && j == 0) {
                best = dij;
            } else {
                best = INF;
                if (i >= 1 && j >= 1) best = r1[j - 1] + 2 * dij;
                if (i >= 2 && j >= 3) {
                    double c = r2[j - 3] + 2 * cell(d, m, i - 1, j - 2)
                               + 2 * cell(d, m, i, j - 1) + dij;
                    if (c < best) best = c;
                }
                if (i >= 3 && j >= 2) {
                    // weights 2,2,1: mirror of the (i-2,j-3) pattern
                    // (Sakoe-Chiba symmetric weight = di+dj per step)
                    double c = r3[j - 2] + 2 * cell(d, m, i - 2, j - 1)
                               + 2 * cell(d, m, i - 1, j) + dij;
                    if (c < best) best = c;
                }
            }
            curr[j] = best;
        }
    }
    return rows[(n - 1) % 4][m - 1];
}

}  // namespace

extern "C" {

// step_pattern: 0 = symmetric2, 1 = symmetricP2.
// Returns cost / (n + m) if normalized, else raw cost. INF if unreachable.
double vpd_dtw_from_costs(const double* d, int64_t n, int64_t m,
                          int32_t step_pattern, int32_t normalized) {
    if (n <= 0 || m <= 0) return INF;
    double cost = step_pattern == 0 ? dtw_symmetric2(d, n, m)
                                    : dtw_symmetricP2(d, n, m);
    return normalized ? cost / static_cast<double>(n + m) : cost;
}

// Fused: pairwise Euclidean distances between a (n, dim) and b (m, dim)
// computed row-blockwise, then DTW. Avoids materializing the cost matrix
// in Python.
double vpd_dtw_from_seqs(const double* a, int64_t n, const double* b,
                         int64_t m, int64_t dim, int32_t step_pattern,
                         int32_t normalized) {
    if (n <= 0 || m <= 0) return INF;
    std::vector<double> d(static_cast<size_t>(n) * m);
    for (int64_t i = 0; i < n; ++i) {
        const double* ai = a + i * dim;
        for (int64_t j = 0; j < m; ++j) {
            const double* bj = b + j * dim;
            double s = 0;
            for (int64_t k = 0; k < dim; ++k) {
                double diff = ai[k] - bj[k];
                s += diff * diff;
            }
            d[i * m + j] = std::sqrt(s);
        }
    }
    return vpd_dtw_from_costs(d.data(), n, m, step_pattern, normalized);
}

// Batched: one query against T targets stored contiguously with lengths.
void vpd_dtw_one_to_many(const double* q, int64_t qn, const double* targets,
                         const int64_t* t_offsets, const int64_t* t_lens,
                         int64_t num_targets, int64_t dim,
                         int32_t step_pattern, int32_t normalized,
                         double* out) {
    for (int64_t t = 0; t < num_targets; ++t) {
        out[t] = vpd_dtw_from_seqs(q, qn, targets + t_offsets[t] * dim,
                                   t_lens[t], dim, step_pattern, normalized);
    }
}

}  // extern "C"
