// Host packed-count probe: does folding match_count into the delta entry's
// high byte (one table load per byte instead of two) move the interleaved
// DFA count rate?  Feeds on the REAL config-2/config-5 machines dumped by
// host_packed_probe.py.  Variants:
//   base   : s = delta[s*256+b]; total += mcount[s]     (current engine)
//   packed : e = pdelta[s*256+b]; s = e & 0xFFFFFF; total += e >> 24
//   packedK: packed with K=16 interleave
// Reported single-thread and 4-thread (the engine's overlap decomposition is
// orthogonal; here streams just split the corpus, counts not semantically
// exact at boundaries — this probe measures LOAD THROUGHPUT only, the engine
// integration keeps the exact overlap warm-up).
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <thread>
#include <vector>
#include <string>

static double now() { struct timespec t; clock_gettime(CLOCK_MONOTONIC, &t); return t.tv_sec + 1e-9 * t.tv_nsec; }

static std::vector<char> slurp(const std::string& p) {
  FILE* f = fopen(p.c_str(), "rb");
  if (!f) { fprintf(stderr, "missing %s\n", p.c_str()); exit(1); }
  fseek(f, 0, SEEK_END); long n = ftell(f); fseek(f, 0, SEEK_SET);
  std::vector<char> v(n);
  if (fread(v.data(), 1, n, f) != (size_t)n) exit(1);
  fclose(f); return v;
}

template <int K, bool PACKED>
static int64_t scan(const int32_t* tab, const int32_t* mcount, const uint8_t* data, int64_t n) {
  int64_t chunk = n / K;
  int64_t base[K]; int32_t st[K]; int64_t tot = 0;
  for (int k = 0; k < K; k++) { base[k] = k * chunk; st[k] = 0; }
  for (int64_t t = 0; t < chunk; t++) {
    for (int k = 0; k < K; k++) {
      int32_t e = tab[(int64_t)(PACKED ? (st[k] & 0xFFFFFF) : st[k]) * 256 + data[base[k] + t]];
      if (PACKED) { tot += (uint32_t)e >> 24; st[k] = e; }
      else { st[k] = e; tot += mcount[e]; }
    }
  }
  return tot;
}

template <int K, bool PACKED>
static double run_mt(const int32_t* tab, const int32_t* mc, const uint8_t* d, int64_t n, int nt, int64_t* out) {
  double t0 = now();
  if (nt == 1) {
    int64_t r = scan<K, PACKED>(tab, mc, d, n);
    asm volatile("" : : "r"(r) : "memory");   // keep the scan inside the timed region
    *out = r;
    return now() - t0;
  }
  std::vector<int64_t> part(nt);
  std::vector<std::thread> th;
  int64_t chunk = n / nt;
  for (int t = 0; t < nt; t++)
    th.emplace_back([&, t]() { part[t] = scan<K, PACKED>(tab, mc, d + t * chunk, chunk); });
  for (auto& x : th) x.join();
  int64_t s = 0; for (auto v : part) s += v; *out = s;
  return now() - t0;
}

int main(int argc, char** argv) {
  std::string tag = argc > 1 ? argv[1] : "c2";
  std::string dir = "/tmp/amprobe/";
  auto db = slurp(dir + tag + "_delta.i32");
  auto mb = slurp(dir + tag + "_mcount.i32");
  auto cb = slurp(dir + tag + "_corpus.u8");
  const int32_t* delta = (const int32_t*)db.data();
  const int32_t* mc = (const int32_t*)mb.data();
  const uint8_t* data = (const uint8_t*)cb.data();
  int64_t n = cb.size();
  int64_t S = mb.size() / 4;
  // packed table
  std::vector<int32_t> ptab(db.size() / 4);
  for (int64_t i = 0; i < (int64_t)ptab.size(); i++) {
    int32_t s = delta[i];
    ptab[i] = s | (mc[s] << 24);
  }
  printf("%s: states=%ld corpus=%ld MiB\n", tag.c_str(), (long)S, (long)(n >> 20));
  int64_t c0 = 0, c1 = 0;
  for (int nt : {1, 4}) {
    for (int rep = 0; rep < 3; rep++) {
      double tb = run_mt<8, false>(delta, mc, data, n, nt, &c0);
      double tp = run_mt<8, true>(ptab.data(), mc, data, n, nt, &c1);
      double tp16 = run_mt<16, true>(ptab.data(), mc, data, n, nt, &c1);
      double tp4 = run_mt<4, true>(ptab.data(), mc, data, n, nt, &c1);
      printf("nt=%d rep=%d  base8 %.2f GB/s | packed8 %.2f | packed16 %.2f | packed4 %.2f  (counts %ld/%ld)\n",
             nt, rep, n / tb / 1e9, n / tp / 1e9, n / tp16 / 1e9, n / tp4 / 1e9, (long)c0, (long)c1);
    }
  }
  return 0;
}
