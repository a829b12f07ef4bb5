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

// Hit-only scan: append (position one past the match end, state) for every
// byte whose post-byte state has match_count > 0.  Skips materializing the
// full per-position state array (matches are typically ~1% of positions) —
// the hot path of the multi-pass Replacer.  Returns the total hit count;
// writes min(total, cap) entries (caller retries with a bigger cap — the
// thread-ordered concatenation keeps positions ascending).
int64_t am_scan_hits_mt(const int32_t* delta, const int32_t* match_count,
                        int32_t n_states, const uint8_t* data, int64_t n,
                        int64_t overlap, int32_t n_threads, int64_t* out_pos,
                        int32_t* out_state, int64_t cap) {
  (void)n_states;
  if (n_threads < 1) n_threads = 1;
  if (n < (int64_t)n_threads * 4096) n_threads = 1;
  std::vector<std::vector<std::pair<int64_t, int32_t>>> hits(n_threads);
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
      auto& out = hits[t];
      for (int64_t i = start; i < emit_end; i++) {
        state = delta[(int64_t)state * 256 + data[i]];
        if (i >= emit_begin && match_count[state] > 0)
          out.emplace_back(i + 1, state);
      }
    });
  }
  for (auto& th : threads) th.join();
  int64_t total = 0, o = 0;
  for (auto& v : hits) total += (int64_t)v.size();
  for (auto& v : hits)
    for (auto& h : v) {
      if (o >= cap) return total;
      out_pos[o] = h.first;
      out_state[o] = h.second;
      o++;
    }
  return total;
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

// UTF-8 simple-lowercase transducer, bit-identical to the vectorized numpy
// path (utils/utf8.py decode_utf8_np + LOWER_TABLE + encode_utf8_np):
// every byte with a nonzero lead length starts a code point (stateless per
// position — malformed overlapping sequences decode exactly like the numpy
// fallback, reading zero past the end), each decoded cp maps through
// lower_map (int32[0x110000]) and re-encodes.
//
// Outputs: lowered bytes -> out (capacity out_cap, must include >= 8
// slack bytes); per-cp raw byte start -> raw_start; per-cp raw byte
// length -> raw_len; per-cp output byte length -> out_len.  Returns the
// cp count, or -1 if out_cap would overflow.  *out_nbytes receives the
// lowered byte count.
//
// Same branchless structure as am_lower_bytes (alternating ASCII/UTF-8
// corpora defeat the branch predictor of a switch-based decoder); the
// per-cp metadata stores are unconditional with a masked cursor advance.
int64_t am_lower_transform(const int32_t* lower_map, const uint64_t* emap,
                           const uint8_t* data, int64_t n, uint8_t* out,
                           int64_t out_cap, int32_t* raw_start,
                           int32_t* raw_len, int32_t* out_len,
                           int64_t* out_nbytes) {
  // Lead lengths match utf8._LEAD_LEN: 0x00-0x7F: 1; 0x80-0xBF: 0 (trail);
  // 0xC0-0xDF: 2; 0xE0-0xEF: 3; 0xF0-0xF8: 4; 0xF9-0xFF: 0.
  static uint8_t lead_len[256], lead_mask[256];
  static bool init_done = false;
  if (!init_done) {
    for (int b = 0; b < 256; b++) {
      int l = (b < 0x80) ? 1 : (b < 0xC0) ? 0 : (b < 0xE0) ? 2
              : (b < 0xF0) ? 3 : (b < 0xF9) ? 4 : 0;
      lead_len[b] = (uint8_t)l;
      lead_mask[b] = (l == 1) ? 0x7F : (l == 2) ? 0x1F : (l == 3) ? 0x0F : 0x07;
    }
    init_done = true;
  }
  int64_t n_cps = 0;
  int64_t o = 0;
  int64_t i = 0;
  while (i < n) {
    if (i + 64 <= n) {
      uint64_t acc = 0;
      uint64_t w[8];
      memcpy(w, data + i, 64);
      for (int t = 0; t < 8; t++) acc |= w[t];
      if (!(acc & 0x8080808080808080ull)) {
        if (o + 64 > out_cap) return -1;
        for (int t = 0; t < 64; t++) {
          uint8_t b = data[i + t];
          out[o + t] = (uint8_t)(b + (((uint8_t)(b - 'A') < 26u) ? 0x20 : 0));
          raw_start[n_cps + t] = (int32_t)(i + t);
          raw_len[n_cps + t] = 1;
          out_len[n_cps + t] = 1;
        }
        i += 64;
        o += 64;
        n_cps += 64;
        continue;
      }
      // Branchless inner over the 64-byte window (stateless per-byte
      // stepping; a 4-byte decode needs the window's last 8 bytes intact).
      uint8_t buf[64];
      memcpy(buf, data + i, 64);
      int64_t base = i, stop = i + 56;
      while (i < stop) {
        uint32_t w4;
        memcpy(&w4, buf + (i - base), 4);
        uint8_t b0 = (uint8_t)w4;
        uint32_t l = lead_len[b0];
        uint32_t cp4 = ((uint32_t)(b0 & lead_mask[b0]) << 18) |
                       ((w4 >> 8) & 0x3F) << 12 |
                       ((w4 >> 16) & 0x3F) << 6 | ((w4 >> 24) & 0x3F);
        uint32_t cp = cp4 >> (6 * (4 - (l | (l == 0))));
        uint64_t e;
        if (cp < 0x10000u) {
          e = emap[cp];
        } else {
          uint32_t lc = (cp < 0x110000u) ? (uint32_t)lower_map[cp] : cp;
          e = ((uint64_t)4 << 56) | (uint64_t)(0xF0 | (lc >> 18)) |
              ((uint64_t)(0x80 | ((lc >> 12) & 0x3F)) << 8) |
              ((uint64_t)(0x80 | ((lc >> 6) & 0x3F)) << 16) |
              ((uint64_t)(0x80 | (lc & 0x3F)) << 24);
        }
        uint64_t live = (uint64_t)0 - (uint64_t)(l != 0);
        e &= live;
        if (o + 8 > out_cap) return -1;
        memcpy(out + o, &e, 8);
        int ol = (int)(e >> 56);
        raw_start[n_cps] = (int32_t)i;
        raw_len[n_cps] = (int32_t)l;
        out_len[n_cps] = (int32_t)ol;
        n_cps += (int64_t)(live & 1);
        o += ol;
        i += 1;
      }
      continue;
    }
    // Tail (< 64 bytes left): guarded scalar path.
    uint8_t b0 = data[i];
    uint32_t l = lead_len[b0];
    if (l == 0) {
      i++;
      continue;
    }
    uint32_t b1 = (i + 1 < n) ? (data[i + 1] & 0x3F) : 0;
    uint32_t b2 = (i + 2 < n) ? (data[i + 2] & 0x3F) : 0;
    uint32_t b3 = (i + 3 < n) ? (data[i + 3] & 0x3F) : 0;
    uint32_t cp4 = ((uint32_t)(b0 & lead_mask[b0]) << 18) | (b1 << 12) |
                   (b2 << 6) | b3;
    uint32_t cp = cp4 >> (6 * (4 - l));
    uint64_t e;
    if (cp < 0x10000u) {
      e = emap[cp];
    } else {
      uint32_t lc = (cp < 0x110000u) ? (uint32_t)lower_map[cp] : cp;
      e = ((uint64_t)4 << 56) | (uint64_t)(0xF0 | (lc >> 18)) |
          ((uint64_t)(0x80 | ((lc >> 12) & 0x3F)) << 8) |
          ((uint64_t)(0x80 | ((lc >> 6) & 0x3F)) << 16) |
          ((uint64_t)(0x80 | (lc & 0x3F)) << 24);
    }
    int ol = (int)(e >> 56);
    if (o + 8 > out_cap) return -1;
    memcpy(out + o, &e, 8);
    raw_start[n_cps] = (int32_t)i;
    raw_len[n_cps] = (int32_t)l;
    out_len[n_cps] = (int32_t)ol;
    n_cps++;
    o += ol;
    i += 1;
  }
  *out_nbytes = o;
  return n_cps;
}

// Metadata-free lowercase transducer: same byte semantics as
// am_lower_transform but emits only the lowered bytes — for count /
// containsAny, which never map positions back to raw coordinates.
//
// Two fast paths: 64-byte all-ASCII blocks (vectorizable compare+blend),
// and a BRANCHLESS per-byte path for everything else — decode-as-4-bytes
// then shift (cp = cp4 >> 6*(4-len)), and emit via ``emap``, a caller-built
// BMP table of pre-encoded lowered sequences (u64: output length in the
// top byte, up to 4 UTF-8 bytes little-endian below; 8 bytes are always
// stored, the width advances the cursor).  The alternating ASCII/UTF-8
// corpora that defeat the branch predictor in am_lower_transform run
// ~10x faster here.  Returns 0, or -1 if out_cap (which must include >= 8
// slack bytes) would overflow.
int32_t am_lower_bytes(const int32_t* lower_map, const uint64_t* emap,
                       const uint8_t* data, int64_t n, uint8_t* out,
                       int64_t out_cap, int64_t* out_nbytes) {
  // Per lead byte: sequence length (0 for trail/invalid) and value mask.
  static uint8_t lead_len[256], lead_mask[256];
  static bool init_done = false;
  if (!init_done) {
    for (int b = 0; b < 256; b++) {
      int l = (b < 0x80) ? 1 : (b < 0xC0) ? 0 : (b < 0xE0) ? 2
              : (b < 0xF0) ? 3 : (b < 0xF9) ? 4 : 0;
      lead_len[b] = (uint8_t)l;
      lead_mask[b] = (l == 1) ? 0x7F : (l == 2) ? 0x1F : (l == 3) ? 0x0F : 0x07;
    }
    init_done = true;
  }
  int64_t i = 0, o = 0;
  while (i < n) {
    if (i + 64 <= n) {
      uint64_t acc = 0;
      uint64_t w[8];
      memcpy(w, data + i, 64);
      for (int t = 0; t < 8; t++) acc |= w[t];
      if (!(acc & 0x8080808080808080ull)) {
        if (o + 64 > out_cap) return -1;
        for (int t = 0; t < 64; t++) {
          uint8_t b = data[i + t];
          out[o + t] = (uint8_t)(b + (((uint8_t)(b - 'A') < 26u) ? 0x20 : 0));
        }
        i += 64;
        o += 64;
        continue;
      }
      if (o + 8 > out_cap) return -1;
      // Branchless inner: one byte position per iteration (stateless
      // per-byte stepping, exactly like am_lower_transform).
      int64_t stop = i + 56;  // 4-byte decode window stays in the 64 read
      uint8_t buf[64];
      memcpy(buf, data + i, 64);
      int64_t base = i;
      while (i < stop) {
        uint32_t w4;
        memcpy(&w4, buf + (i - base), 4);
        uint8_t b0 = (uint8_t)w4;
        uint32_t l = lead_len[b0];
        uint32_t cp4 = ((uint32_t)(b0 & lead_mask[b0]) << 18) |
                       ((w4 >> 8) & 0x3F) << 12 |
                       ((w4 >> 16) & 0x3F) << 6 | ((w4 >> 24) & 0x3F);
        uint32_t cp = cp4 >> (6 * (4 - (l | (l == 0)))) ;
        uint64_t e;
        if (cp < 0x10000u) {
          e = emap[cp];
        } else {  // rare: non-BMP (astral) code point
          uint32_t lc = (cp < 0x110000u) ? (uint32_t)lower_map[cp] : cp;
          e = ((uint64_t)4 << 56) | (uint64_t)(0xF0 | (lc >> 18)) |
              ((uint64_t)(0x80 | ((lc >> 12) & 0x3F)) << 8) |
              ((uint64_t)(0x80 | ((lc >> 6) & 0x3F)) << 16) |
              ((uint64_t)(0x80 | (lc & 0x3F)) << 24);
        }
        e &= (uint64_t)0 - (uint64_t)(l != 0);  // trail/invalid: emit nothing
        if (o + 8 > out_cap) return -1;
        memcpy(out + o, &e, 8);
        o += (int64_t)(e >> 56);
        i += 1;
      }
      continue;
    }
    // Tail (< 64 bytes left): guarded scalar path.
    uint8_t b0 = data[i];
    uint32_t l = lead_len[b0];
    if (l == 0) {
      i++;
      continue;
    }
    uint32_t b1 = (i + 1 < n) ? (data[i + 1] & 0x3F) : 0;
    uint32_t b2 = (i + 2 < n) ? (data[i + 2] & 0x3F) : 0;
    uint32_t b3 = (i + 3 < n) ? (data[i + 3] & 0x3F) : 0;
    uint32_t cp4 = ((uint32_t)(b0 & lead_mask[b0]) << 18) | (b1 << 12) |
                   (b2 << 6) | b3;
    uint32_t cp = cp4 >> (6 * (4 - l));
    uint64_t e;
    if (cp < 0x10000u) {
      e = emap[cp];
    } else {
      uint32_t lc = (cp < 0x110000u) ? (uint32_t)lower_map[cp] : cp;
      e = ((uint64_t)4 << 56) | (uint64_t)(0xF0 | (lc >> 18)) |
          ((uint64_t)(0x80 | ((lc >> 12) & 0x3F)) << 8) |
          ((uint64_t)(0x80 | ((lc >> 6) & 0x3F)) << 16) |
          ((uint64_t)(0x80 | (lc & 0x3F)) << 24);
    }
    int ol = (int)(e >> 56);
    if (o + 8 > out_cap) return -1;
    memcpy(out + o, &e, 8);
    o += ol;
    i += 1;
  }
  *out_nbytes = o;
  return 0;
}

// ASCII byte-LUT map (A-Z += 0x20) -- the pure-ASCII fast path.
void am_lower_ascii(const uint8_t* data, int64_t n, uint8_t* out) {
  for (int64_t i = 0; i < n; i++) {
    uint8_t b = data[i];
    out[i] = (b >= 'A' && b <= 'Z') ? (uint8_t)(b + 0x20) : b;
  }
}

// Returns 1 iff all bytes < 0x80.
int32_t am_is_ascii(const uint8_t* data, int64_t n) {
  int64_t i = 0;
  const uint64_t* p = reinterpret_cast<const uint64_t*>(data);
  int64_t words = n / 8;
  uint64_t acc = 0;
  for (int64_t w = 0; w < words; w++) acc |= p[w];
  if (acc & 0x8080808080808080ull) return 0;
  for (i = words * 8; i < n; i++)
    if (data[i] & 0x80) return 0;
  return 1;
}

}  // extern "C"

