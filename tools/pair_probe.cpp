// Block-pair interleaved GHI expansion probe (round 5).
//
// Hypothesis: the single-core expand loop is LATENCY-bound (each match
// copy's loads forward from the previous copy's stores; addresses
// serialize through the data-dependent w cursor), so interleaving TWO
// INDEPENDENT blocks' expansions in one thread should overlap their
// chains and lift per-core throughput. Every table-layout/batching
// probe inside one block washed (PERF.md 1-2); independence across
// blocks is the one untapped source of ILP.
//
// Method: same-process A/B on the GHI blocks of a reference-encoded
// archive. Three timed forms, all byte-compared against
// zxch_decode_block ground truth:
//   simple  — one-sequence-at-a-time expansion, one block at a time
//   pair    — the SAME simple step function, two blocks interleaved
//   prod    — the production zxch_decode_block (batched loops)
// pair/simple isolates the interleave effect at equal code shape.
//
// Build+run: tools/pair_probe.sh (single TU including zxc_host.cpp).
#include "../zxc_tpu/runtime/zxc_host.cpp"

#include <chrono>
#include <cstdio>
#include <vector>

namespace {

struct GhiState {
  const uint8_t *sec_b, *sec_ext, *lit;
  uint64_t n_seq, sz_ext, n_lit;
  uint8_t *out;
  uint64_t i = 0, w = 0, r = 0, e = 0;
  int done = 0;
};

// simplified wild copies (32 B chunks; buffers carry >= 64 B slack)
static inline void cp_lit(uint8_t *dst, const uint8_t *src, uint64_t n) {
  for (uint64_t k = 0; k < n; k += 32) {
    __m256i v = _mm256_loadu_si256((const __m256i *)(src + k));
    _mm256_storeu_si256((__m256i *)(dst + k), v);
  }
}
static inline void cp_match(uint8_t *dst, uint64_t off, uint64_t n) {
  const uint8_t *src = dst - off;
  if (off >= 32) {
    for (uint64_t k = 0; k < n; k += 32) {
      __m256i v = _mm256_loadu_si256((const __m256i *)(src + k));
      _mm256_storeu_si256((__m256i *)(dst + k), v);
    }
  } else {
    for (uint64_t k = 0; k < n; k++) dst[k] = src[k];
  }
}

// one sequence of the GHI stream; returns 0 while active
static inline int ghi_step(GhiState &s) {
  if (s.i >= s.n_seq) {
    // trailing literals
    memcpy(s.out + s.w, s.lit + s.r, s.n_lit - s.r);
    s.w += s.n_lit - s.r;
    s.r = s.n_lit;
    s.done = 1;
    return 1;
  }
  uint32_t wd;
  memcpy(&wd, s.sec_b + 4 * s.i, 4);
  uint64_t l = wd >> 24, m = (wd >> 16) & 0xFF;
  uint64_t o = (wd & 0xFFFF) + 1;
  if (__builtin_expect(l == 255, 0)) {
    uint64_t v;
    int64_t c = dec_varint(s.sec_ext + s.e, s.sz_ext - s.e, &v);
    s.e += (uint64_t)c;
    l += v;
  }
  if (__builtin_expect(m == 255, 0)) {
    uint64_t v;
    int64_t c = dec_varint(s.sec_ext + s.e, s.sz_ext - s.e, &v);
    s.e += (uint64_t)c;
    m += v;
  }
  cp_lit(s.out + s.w, s.lit + s.r, l);
  s.w += l;
  s.r += l;
  cp_match(s.out + s.w, o, m + 5);
  s.w += m + 5;
  s.i++;
  return 0;
}

struct Parsed {
  SecView v;
  std::vector<uint8_t> lit;
  uint64_t n_lit;
};

}  // namespace

int main(int argc, char **argv) {
  if (argc < 2) { fprintf(stderr, "usage: pair_probe archive.zxc\n"); return 2; }
  FILE *f = fopen(argv[1], "rb");
  if (!f) return 2;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> arc(n);
  if (fread(arc.data(), 1, n, f) != (size_t)n) return 2;
  fclose(f);

  uint64_t bs;
  int ck;
  uint32_t did;
  if (zxch_frame_info(arc.data(), n, &bs, &ck, &did)) return 2;
  std::vector<uint64_t> pos(n / 8 + 2), comp(n / 8 + 2);
  std::vector<uint8_t> typ(n / 8 + 2);
  uint64_t eof = 0;
  int64_t nb = zxch_walk_frame(arc.data(), n, ck, bs + bs / 2 + 4096, 16,
                               pos.data(), typ.data(), comp.data(),
                               n / 8 + 2, &eof);
  if (nb <= 1) { fprintf(stderr, "need >= 2 blocks\n"); return 2; }

  // parse GHI blocks (skip others) — payload starts 8 past block header
  std::vector<Parsed> P;
  std::vector<const uint8_t *> payloads;
  std::vector<uint64_t> plens;
  static thread_local PrepTL T;
  for (int64_t b = 0; b < nb; b++) {
    if (typ[b] != 2) continue;
    const uint8_t *pl = arc.data() + pos[b] + 8;
    Parsed p;
    if (parse_sections(pl, comp[b], 2, bs, &p.v)) continue;
    p.lit.resize(bs + 4096);
    int64_t need = 0;
    p.n_lit = 0;
    if (decode_block_literals(p.v, bs, nullptr, p.lit.data(), 0,
                              p.lit.size(), T, &p.n_lit, &need))
      continue;
    P.push_back(std::move(p));
    payloads.push_back(pl);
    plens.push_back(comp[b]);
  }
  if (P.size() < 2) { fprintf(stderr, "need >= 2 GHI blocks (have %zu)\n", P.size()); return 2; }
  size_t NB = P.size() & ~1ull;   // even count for pairing
  fprintf(stderr, "# %zu GHI blocks of %llu\n", NB, (unsigned long long)bs);

  std::vector<std::vector<uint8_t>> outs(NB);
  std::vector<uint64_t> outlen(NB);
  for (size_t b = 0; b < NB; b++) {
    outs[b].assign(bs + 4096, 0);
    int64_t w = zxch_decode_block(2, payloads[b], plens[b],
                                  outs[b].data(), bs, nullptr, 0, nullptr);
    if (w < 0) { fprintf(stderr, "ref decode failed %lld\n", (long long)w); return 2; }
    outlen[b] = (uint64_t)w;
  }

  std::vector<uint8_t> scratchA(bs + 4096), scratchB(bs + 4096);
  auto init_state = [&](size_t b, uint8_t *out) {
    GhiState s;
    s.sec_b = P[b].v.sec_b;
    s.sec_ext = P[b].v.sec_ext;
    s.sz_ext = P[b].v.sz_ext;
    s.lit = P[b].lit.data();
    s.n_lit = P[b].n_lit;
    s.n_seq = P[b].v.n_seq;
    s.out = out;
    return s;
  };

  auto now = []() { return std::chrono::steady_clock::now(); };
  auto ms = [](auto a, auto b) {
    return std::chrono::duration<double, std::milli>(b - a).count();
  };

  const int ROUNDS = 9;
  double t_simple = 1e30, t_pair = 1e30, t_prod = 1e30;
  for (int r = 0; r < ROUNDS; r++) {
    // simple serial
    auto t0 = now();
    for (size_t b = 0; b < NB; b++) {
      GhiState s = init_state(b, scratchA.data());
      while (!ghi_step(s)) {}
      if (s.w != outlen[b]) return 3;
    }
    auto t1 = now();
    // pair-interleaved (A even, B odd)
    for (size_t b = 0; b + 1 < NB; b += 2) {
      GhiState a = init_state(b, scratchA.data());
      GhiState c = init_state(b + 1, scratchB.data());
      while (!a.done || !c.done) {
        if (!a.done) ghi_step(a);
        if (!c.done) ghi_step(c);
      }
      if (a.w != outlen[b] || c.w != outlen[b + 1]) return 3;
    }
    auto t2 = now();
    // production decode
    for (size_t b = 0; b < NB; b++) {
      int64_t w = zxch_decode_block(2, payloads[b], plens[b],
                                    scratchA.data(), bs, nullptr, 0,
                                    nullptr);
      if (w < 0) return 3;
    }
    auto t3 = now();
    t_simple = std::min(t_simple, ms(t0, t1));
    t_pair = std::min(t_pair, ms(t1, t2));
    t_prod = std::min(t_prod, ms(t2, t3));
  }
  // correctness of the pair form, byte-exact
  for (size_t b = 0; b + 1 < NB; b += 2) {
    std::vector<uint8_t> oa(bs + 4096), ob(bs + 4096);
    GhiState a = init_state(b, oa.data());
    GhiState c = init_state(b + 1, ob.data());
    while (!a.done || !c.done) {
      if (!a.done) ghi_step(a);
      if (!c.done) ghi_step(c);
    }
    if (memcmp(oa.data(), outs[b].data(), outlen[b]) ||
        memcmp(ob.data(), outs[b + 1].data(), outlen[b + 1])) {
      fprintf(stderr, "MISMATCH at pair %zu\n", b);
      return 3;
    }
  }
  double bytes = 0;
  for (size_t b = 0; b < NB; b++) bytes += outlen[b];
  printf("simple %7.2f ms (%5.0f MB/s) | pair %7.2f ms (%5.0f MB/s) "
         "| prod %7.2f ms (%5.0f MB/s) | pair/simple %.3fx "
         "pair/prod %.3fx\n",
         t_simple, bytes / 1e3 / t_simple, t_pair, bytes / 1e3 / t_pair,
         t_prod, bytes / 1e3 / t_prod, t_simple / t_pair,
         t_prod / t_pair);
  return 0;
}
