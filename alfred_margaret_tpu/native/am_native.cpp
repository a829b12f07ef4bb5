// Native host-side engines for alfred_margaret_tpu.
//
// The reference library is pure Haskell; its benchmark harness ships native
// competitor binaries (Rust/Java) and one C FFI library
// (benchmark/rust-ffi/libacbench/src/lib.rs:24-49 — raw pointer+len slices).
// This file plays both roles for our build: a fast scalar/threaded CPU
// engine over the same dense byte-DFA tables the TPU kernels use (so
// results are bit-identical), used as
//   * the host fallback for automata exceeding TPU kernel capacity,
//   * the single-core CPU competitor baseline in bench.py,
//   * an independent implementation for byte-parity testing.
//
// Built with: g++ -O3 -std=c++17 -shared -fPIC (see build.py). Plain C ABI,
// loaded via ctypes.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Scan `data[0..n)` with the dense DFA `delta` ([n_states][256], row-major)
// starting from state 0; add match_count[state] after every byte.
// Returns the total match count.
int64_t am_scan_count(const int32_t* delta, const int32_t* match_count,
                      int32_t n_states, const uint8_t* data, int64_t n) {
  (void)n_states;
  int64_t total = 0;
  int32_t state = 0;
  for (int64_t i = 0; i < n; i++) {
    state = delta[(int64_t)state * 256 + data[i]];
    total += match_count[state];
  }
  return total;
}

// Same scan, but writes the post-byte state for every position into
// out_states (int32[n]). Returns the final state.
int32_t am_scan_states(const int32_t* delta, int32_t n_states,
                       const uint8_t* data, int64_t n, int32_t* out_states) {
  (void)n_states;
  int32_t state = 0;
  for (int64_t i = 0; i < n; i++) {
    state = delta[(int64_t)state * 256 + data[i]];
    out_states[i] = state;
  }
  return state;
}

// Multithreaded count using the same overlap-warm-up decomposition as the
// TPU engines (state depends on at most `overlap` bytes of history).
int64_t am_scan_count_mt(const int32_t* delta, const int32_t* match_count,
                         int32_t n_states, const uint8_t* data, int64_t n,
                         int64_t overlap, int32_t n_threads) {
  (void)n_states;
  if (n_threads <= 1 || n < (int64_t)n_threads * 4096) {
    return am_scan_count(delta, match_count, n_states, data, n);
  }
  int64_t chunk = (n + n_threads - 1) / n_threads;
  std::vector<int64_t> partial(n_threads, 0);
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; t++) {
    threads.emplace_back([&, t]() {
      int64_t emit_begin = (int64_t)t * chunk;
      int64_t emit_end = emit_begin + chunk;
      if (emit_end > n) emit_end = n;
      if (emit_begin >= n) return;
      int64_t start = emit_begin - overlap;
      if (start < 0) start = 0;
      int32_t state = 0;
      int64_t total = 0;
      for (int64_t i = start; i < emit_end; i++) {
        state = delta[(int64_t)state * 256 + data[i]];
        if (i >= emit_begin) total += match_count[state];
      }
      partial[t] = total;
    });
  }
  for (auto& th : threads) th.join();
  int64_t total = 0;
  for (auto p : partial) total += p;
  return total;
}

// Multithreaded per-position states (overlap decomposition).
void am_scan_states_mt(const int32_t* delta, int32_t n_states,
                       const uint8_t* data, int64_t n, int64_t overlap,
                       int32_t n_threads, int32_t* out_states) {
  (void)n_states;
  if (n_threads <= 1 || n < (int64_t)n_threads * 4096) {
    am_scan_states(delta, n_states, data, n, out_states);
    return;
  }
  int64_t chunk = (n + n_threads - 1) / n_threads;
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; t++) {
    threads.emplace_back([&, t]() {
      int64_t emit_begin = (int64_t)t * chunk;
      int64_t emit_end = emit_begin + chunk;
      if (emit_end > n) emit_end = n;
      if (emit_begin >= n) return;
      int64_t start = emit_begin - overlap;
      if (start < 0) start = 0;
      int32_t state = 0;
      for (int64_t i = start; i < emit_end; i++) {
        state = delta[(int64_t)state * 256 + data[i]];
        if (i >= emit_begin) out_states[i] = state;
      }
    });
  }
  for (auto& th : threads) th.join();
}

// memcpy-bound baseline: XOR-reduce the input (reads every byte once).
// Used by the benchmark harness to estimate the host memory roof.
int64_t am_memscan_baseline(const uint8_t* data, int64_t n) {
  uint64_t acc = 0;
  const uint64_t* p = reinterpret_cast<const uint64_t*>(data);
  int64_t words = n / 8;
  for (int64_t i = 0; i < words; i++) acc ^= p[i];
  for (int64_t i = words * 8; i < n; i++) acc ^= data[i];
  return (int64_t)acc;
}

}  // extern "C"
