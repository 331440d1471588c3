// graphcore — native host runtime for ocn_tpu.
//
// The reference delegates its host/graph machinery to the torch_sparse /
// torch_scatter C++ extensions (reference environment.yml:247-248;
// SparseTensor construction ogbdataset.py:44-45).  On the TPU build the
// device-side work is Pallas/XLA; this library covers the *host* hot paths
// that NumPy handles slowly at 10^7-edge scale:
//
//   gc_csr_from_edges      CSR build (counting sort + per-row column sort)
//   gc_edge_positions      undirected edge -> nnz position map (maskinput)
//   gc_negative_sampling   uniform non-edge sampling with rejection
//
// Exposed with a plain C ABI and bound via ctypes (ocn_tpu/utils/native.py);
// every entry point has a NumPy fallback, so the library is an accelerator,
// not a dependency.
//
// Build: `make -C native` (see native/Makefile).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// edges: (2, nnz) row-major int64 (row ids then col ids).  Outputs:
// indptr (n_nodes+1) int32, col (nnz) int32 with per-row sorted columns.
void gc_csr_from_edges(const int64_t* edges, int64_t nnz, int64_t n_nodes,
                       int32_t* indptr, int32_t* col) {
  const int64_t* rows = edges;
  const int64_t* cols = edges + nnz;
  std::vector<int64_t> count(n_nodes + 1, 0);
  for (int64_t e = 0; e < nnz; ++e) count[rows[e] + 1]++;
  for (int64_t i = 0; i < n_nodes; ++i) count[i + 1] += count[i];
  for (int64_t i = 0; i <= n_nodes; ++i) indptr[i] = (int32_t)count[i];
  std::vector<int64_t> cursor(count.begin(), count.end() - 1);
  for (int64_t e = 0; e < nnz; ++e) col[cursor[rows[e]]++] = (int32_t)cols[e];

  // per-row column sort, parallel over row blocks
  unsigned nt = std::max(1u, std::thread::hardware_concurrency());
  std::vector<std::thread> ts;
  std::atomic<int64_t> next(0);
  const int64_t kBlock = 4096;
  for (unsigned t = 0; t < nt; ++t) {
    ts.emplace_back([&]() {
      for (;;) {
        int64_t r0 = next.fetch_add(kBlock);
        if (r0 >= n_nodes) return;
        int64_t r1 = std::min(r0 + kBlock, n_nodes);
        for (int64_t r = r0; r < r1; ++r)
          std::sort(col + indptr[r], col + indptr[r + 1]);
      }
    });
  }
  for (auto& th : ts) th.join();
}

// For each undirected edge (u, v): nnz positions of u->v and v->u
// (binary search in the sorted row), -1 when absent.  out: (ne, 2) int32.
void gc_edge_positions(const int32_t* indptr, const int32_t* col, int64_t nnz,
                       const int64_t* edges, int64_t ne, int32_t* out) {
  (void)nnz;
  auto find = [&](int64_t u, int64_t v) -> int32_t {
    const int32_t* lo = col + indptr[u];
    const int32_t* hi = col + indptr[u + 1];
    const int32_t* it = std::lower_bound(lo, hi, (int32_t)v);
    if (it != hi && *it == (int32_t)v) return (int32_t)(it - col);
    return -1;
  };
  const int64_t* us = edges;
  const int64_t* vs = edges + ne;
  unsigned nt = std::max(1u, std::thread::hardware_concurrency());
  std::vector<std::thread> ts;
  std::atomic<int64_t> next(0);
  const int64_t kBlock = 8192;
  for (unsigned t = 0; t < nt; ++t) {
    ts.emplace_back([&]() {
      for (;;) {
        int64_t e0 = next.fetch_add(kBlock);
        if (e0 >= ne) return;
        int64_t e1 = std::min(e0 + kBlock, ne);
        for (int64_t e = e0; e < e1; ++e) {
          out[2 * e] = find(us[e], vs[e]);
          out[2 * e + 1] = find(vs[e], us[e]);
        }
      }
    });
  }
  for (auto& th : ts) th.join();
}

// ---------------------------------------------------------------------------
// A^2 = A @ A row-capped CSR (host SpGEMM).
//
// The reference recomputes `adj2 = spadj @ spadj` with cuSPARSE once per
// training batch (NeighborOverlap_large.py:74) or via dense blocks
// (utils.py:287-329).  The TPU build instead precomputes A^2 once per graph
// here (classic row-merge SpGEMM with a dense per-thread accumulator) and
// gathers its rows on device; per-batch maskinput is corrected analytically
// on device (see ocn_tpu/ops/frame.py).
//
// Rows longer than `cap` keep their `cap` highest-count entries (hub rows of
// A^2 grow as deg^2; high-count entries are the ones that survive binary
// thresholding and dominate path counts).  cap <= 0 keeps everything.
//
// Two-call protocol: first call with col == nullptr fills out_indptr only
// (caller then allocates nnz = indptr[n]); second call fills col/val.

void gc_adj2_csr(const int32_t* indptr, const int32_t* col, int64_t n_nodes,
                 int64_t cap, int32_t* out_indptr, int32_t* out_col,
                 float* out_val) {
  unsigned nt = std::max(1u, std::thread::hardware_concurrency());
  std::vector<int64_t> rowlen(n_nodes, 0);

  auto row_pass = [&](bool emit) {
    std::vector<std::thread> ts;
    std::atomic<int64_t> next(0);
    const int64_t kBlock = 256;
    for (unsigned t = 0; t < nt; ++t) {
      ts.emplace_back([&]() {
        std::vector<int32_t> count(n_nodes, 0);
        std::vector<int32_t> touched;
        touched.reserve(4096);
        std::vector<std::pair<int32_t, int32_t>> entries;  // (-count, col)
        for (;;) {
          int64_t r0 = next.fetch_add(kBlock);
          if (r0 >= n_nodes) return;
          int64_t r1 = std::min(r0 + kBlock, n_nodes);
          for (int64_t j = r0; j < r1; ++j) {
            touched.clear();
            for (int32_t p = indptr[j]; p < indptr[j + 1]; ++p) {
              int32_t m = col[p];
              for (int32_t q = indptr[m]; q < indptr[m + 1]; ++q) {
                int32_t k = col[q];
                if (count[k] == 0) touched.push_back(k);
                count[k]++;
              }
            }
            int64_t len = (int64_t)touched.size();
            bool capped = cap > 0 && len > cap;
            if (!emit) {
              rowlen[j] = capped ? cap : len;
            } else {
              int32_t* oc = out_col + out_indptr[j];
              float* ov = out_val + out_indptr[j];
              if (!capped) {
                std::sort(touched.begin(), touched.end());
                for (int64_t i = 0; i < len; ++i) {
                  oc[i] = touched[i];
                  ov[i] = (float)count[touched[i]];
                }
              } else {
                entries.clear();
                for (int32_t k : touched) entries.push_back({-count[k], k});
                std::nth_element(entries.begin(), entries.begin() + cap,
                                 entries.end());
                entries.resize(cap);
                std::sort(entries.begin(), entries.end(),
                          [](auto& a, auto& b) { return a.second < b.second; });
                for (int64_t i = 0; i < cap; ++i) {
                  oc[i] = entries[i].second;
                  ov[i] = (float)(-entries[i].first);
                }
              }
            }
            for (int32_t k : touched) count[k] = 0;
          }
        }
      });
    }
    for (auto& th : ts) th.join();
  };

  row_pass(/*emit=*/false);
  out_indptr[0] = 0;
  for (int64_t j = 0; j < n_nodes; ++j)
    out_indptr[j + 1] = out_indptr[j] + (int32_t)rowlen[j];
  if (out_col != nullptr) row_pass(/*emit=*/true);
}

// ---------------------------------------------------------------------------
// General row-capped weighted SpGEMM: C = A @ B in CSR.
//
// val_a / val_b may be nullptr (treated as all-ones).  Rows longer than `cap`
// keep their `cap` largest-value entries (for path-count matrices the high
// counts dominate thresholding, same rationale as gc_adj2_csr).  Used for
// A^3 = A^2 @ A — the 3-hop analogue of the reference's per-batch SpGEMM
// (cn6 consumes adjoverlap(adj, adj3, ...), reference model.py:2447-2954) —
// and any chained higher-order expansion.  Same two-call protocol as
// gc_adj2_csr.
void gc_spgemm_csr(const int32_t* ip_a, const int32_t* col_a,
                   const float* val_a, const int32_t* ip_b,
                   const int32_t* col_b, const float* val_b, int64_t n_nodes,
                   int64_t cap, int32_t* out_indptr, int32_t* out_col,
                   float* out_val) {
  unsigned nt = std::max(1u, std::thread::hardware_concurrency());
  std::vector<int64_t> rowlen(n_nodes, 0);

  auto row_pass = [&](bool emit) {
    std::vector<std::thread> ts;
    std::atomic<int64_t> next(0);
    const int64_t kBlock = 256;
    for (unsigned t = 0; t < nt; ++t) {
      ts.emplace_back([&]() {
        std::vector<float> acc(n_nodes, 0.0f);
        std::vector<int32_t> touched;
        touched.reserve(4096);
        std::vector<std::pair<float, int32_t>> entries;  // (-value, col)
        for (;;) {
          int64_t r0 = next.fetch_add(kBlock);
          if (r0 >= n_nodes) return;
          int64_t r1 = std::min(r0 + kBlock, n_nodes);
          for (int64_t j = r0; j < r1; ++j) {
            touched.clear();
            for (int32_t p = ip_a[j]; p < ip_a[j + 1]; ++p) {
              int32_t m = col_a[p];
              float wa = val_a ? val_a[p] : 1.0f;
              if (wa == 0.0f) continue;
              for (int32_t q = ip_b[m]; q < ip_b[m + 1]; ++q) {
                int32_t k = col_b[q];
                float wb = val_b ? val_b[q] : 1.0f;
                if (wb == 0.0f) continue;
                if (acc[k] == 0.0f) touched.push_back(k);
                acc[k] += wa * wb;
              }
            }
            int64_t len = (int64_t)touched.size();
            bool capped = cap > 0 && len > cap;
            if (!emit) {
              rowlen[j] = capped ? cap : len;
            } else {
              int32_t* oc = out_col + out_indptr[j];
              float* ov = out_val + out_indptr[j];
              if (!capped) {
                std::sort(touched.begin(), touched.end());
                for (int64_t i = 0; i < len; ++i) {
                  oc[i] = touched[i];
                  ov[i] = acc[touched[i]];
                }
              } else {
                entries.clear();
                for (int32_t k : touched) entries.push_back({-acc[k], k});
                std::nth_element(entries.begin(), entries.begin() + cap,
                                 entries.end());
                entries.resize(cap);
                std::sort(entries.begin(), entries.end(),
                          [](auto& a, auto& b) { return a.second < b.second; });
                for (int64_t i = 0; i < cap; ++i) {
                  oc[i] = entries[i].second;
                  ov[i] = -entries[i].first;
                }
              }
            }
            for (int32_t k : touched) acc[k] = 0.0f;
          }
        }
      });
    }
    for (auto& th : ts) th.join();
  };

  row_pass(/*emit=*/false);
  out_indptr[0] = 0;
  for (int64_t j = 0; j < n_nodes; ++j)
    out_indptr[j + 1] = out_indptr[j] + (int32_t)rowlen[j];
  if (out_col != nullptr) row_pass(/*emit=*/true);
}

// splitmix64 — deterministic, seedable
static inline uint64_t splitmix64(uint64_t& s) {
  uint64_t z = (s += 0x9e3779b97f4a7c15ULL);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

// Sample `num` non-edges as packed keys u*n+v against the sorted key array.
// Returns the number filled (== num unless the graph is near-complete).
int64_t gc_negative_sampling(const int64_t* sorted_keys, int64_t n_keys,
                             int64_t n_nodes, int64_t num, uint64_t seed,
                             int64_t* out) {
  int64_t filled = 0;
  uint64_t s = seed ? seed : 1;
  int64_t attempts = 0, max_attempts = num * 64 + 1024;
  while (filled < num && attempts < max_attempts) {
    ++attempts;
    int64_t u = (int64_t)(splitmix64(s) % (uint64_t)n_nodes);
    int64_t v = (int64_t)(splitmix64(s) % (uint64_t)n_nodes);
    if (u == v) continue;
    int64_t key = u * n_nodes + v;
    const int64_t* it =
        std::lower_bound(sorted_keys, sorted_keys + n_keys, key);
    if (it != sorted_keys + n_keys && *it == key) continue;
    out[filled++] = key;
  }
  return filled;
}

}  // extern "C"
