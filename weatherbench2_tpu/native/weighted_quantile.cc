// Multithreaded weighted interpolated quantiles over many pencils.
//
// Host-side hot loop of the climatology pipelines (quantile and SEEPS
// wet-threshold statistics, scripts/compute_climatology.py): for each of
// n_pencils independent pools of n_pool (value, weight) pairs, sort by
// value, form normalized cumulative-weight positions
// p_k = (cumw_k - w_k/2) / W, and linearly interpolate each requested
// quantile.  Zero-weight and NaN entries are dropped, matching
// weatherbench2_tpu.utils.weighted_quantile.
//
// Exposed with a plain C ABI for ctypes binding (no pybind11 in this
// image).  Parallelism: a simple pthread pool over pencils.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Job {
  const double* values;   // [n_pencils, n_pool]
  const double* weights;  // [n_pool] (shared) or [n_pencils, n_pool]
  bool shared_weights;
  const double* quantiles;  // [n_q]
  double* out;              // [n_pencils, n_q]
  int64_t n_pencils;
  int64_t n_pool;
  int64_t n_q;
};

void process_range(const Job& job, int64_t begin, int64_t end) {
  std::vector<std::pair<double, double>> pool;  // (value, weight)
  std::vector<double> positions;
  pool.reserve(job.n_pool);
  positions.reserve(job.n_pool);

  for (int64_t p = begin; p < end; ++p) {
    const double* v = job.values + p * job.n_pool;
    const double* w =
        job.shared_weights ? job.weights : job.weights + p * job.n_pool;

    pool.clear();
    for (int64_t i = 0; i < job.n_pool; ++i) {
      if (w[i] > 0.0 && !std::isnan(v[i])) {
        pool.emplace_back(v[i], w[i]);
      }
    }
    double* out_row = job.out + p * job.n_q;
    if (pool.empty()) {
      for (int64_t q = 0; q < job.n_q; ++q) {
        out_row[q] = std::nan("");
      }
      continue;
    }
    std::sort(pool.begin(), pool.end());

    positions.clear();
    double total = 0.0;
    for (const auto& vw : pool) total += vw.second;
    double cum = 0.0;
    for (const auto& vw : pool) {
      cum += vw.second;
      positions.push_back((cum - 0.5 * vw.second) / total);
    }

    const int64_t n = static_cast<int64_t>(pool.size());
    for (int64_t q = 0; q < job.n_q; ++q) {
      const double target = job.quantiles[q];
      if (target <= positions.front()) {
        out_row[q] = pool.front().first;
        continue;
      }
      if (target >= positions.back()) {
        out_row[q] = pool.back().first;
        continue;
      }
      // first k with positions[k] >= target
      const auto it =
          std::lower_bound(positions.begin(), positions.end(), target);
      const int64_t hi = it - positions.begin();
      const int64_t lo = hi - 1;
      const double span = positions[hi] - positions[lo];
      const double frac = span > 0.0 ? (target - positions[lo]) / span : 0.0;
      out_row[q] =
          pool[lo].first + frac * (pool[hi].first - pool[lo].first);
      (void)n;
    }
  }
}

}  // namespace

extern "C" {

// Returns 0 on success.
int wb2_weighted_quantile(const double* values, const double* weights,
                          int shared_weights, const double* quantiles,
                          double* out, int64_t n_pencils, int64_t n_pool,
                          int64_t n_q, int n_threads) {
  if (n_pencils <= 0 || n_pool <= 0 || n_q <= 0) return 1;
  Job job{values,    weights,   shared_weights != 0, quantiles,
          out,       n_pencils, n_pool,              n_q};
  int threads = n_threads > 0
                    ? n_threads
                    : static_cast<int>(std::thread::hardware_concurrency());
  if (threads < 1) threads = 1;
  if (threads > n_pencils) threads = static_cast<int>(n_pencils);
  if (threads == 1) {
    process_range(job, 0, n_pencils);
    return 0;
  }
  std::vector<std::thread> workers;
  const int64_t step = (n_pencils + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    const int64_t begin = t * step;
    const int64_t end = std::min(n_pencils, begin + step);
    if (begin >= end) break;
    workers.emplace_back([&job, begin, end] { process_range(job, begin, end); });
  }
  for (auto& th : workers) th.join();
  return 0;
}

}  // extern "C"
