// Sanitizer harness for the native runtime (ASan/UBSan build of
// zxc_host.cpp). The reference fuzzes its decoder under ASan+UBSan
// (tests/fuzz_decompress.c, .clusterfuzzlite/); this driver gives the
// zxc_tpu native runtime the same treatment: it links zxc_host.cpp
// directly (no Python, so the sanitizer runtime loads normally) and
// exercises the untrusted-input parsers end to end.
//
// Modes:
//   san_driver d <archive-file>          decode (verify both on and off)
//   san_driver r <data-file> <level>     compress + decompress + compare
//
// Exit 0: input handled (decoded or cleanly rejected). Any sanitizer
// report aborts with a nonzero status.
//
// Build: g++ -O1 -g -fsanitize=address,undefined -fno-sanitize-recover=all \
//            -o san_driver tools/san_driver.cpp
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "../zxc_tpu/runtime/zxc_host.cpp"

// ---------------------------------------------------------------------------
// Edge coverage (reference parity: the reference fuzzes under libFuzzer's
// coverage feedback via ClusterFuzzLite, .clusterfuzzlite/ + tests/fuzz_*.c;
// gcc has no libFuzzer, so the same feedback is built from
// -fsanitize-coverage=trace-pc): every instrumented edge calls
// __sanitizer_cov_trace_pc(); an AFL-style (prev ^ cur) hash marks a bit in
// a 64 KiB map, dumped to ZXCH_COV_OUT at exit. tools/fuzz_loop.py merges
// maps across runs and keeps inputs that light new edges (corpus
// distillation into tests/fuzz_corpus/).
// ---------------------------------------------------------------------------
static uint8_t g_cov_map[1 << 16];
static uintptr_t g_cov_prev = 0;

extern "C" __attribute__((no_sanitize_coverage, no_sanitize_address))
void __sanitizer_cov_trace_pc(void) {
  // PIE: normalize against a module anchor so edge ids are ASLR-stable
  // across runs (the fuzz loop merges maps from many processes)
  static const uintptr_t base =
      (uintptr_t)(void *)&__sanitizer_cov_trace_pc;
  uintptr_t pc = (uintptr_t)__builtin_return_address(0) - base;
  uintptr_t h = (pc >> 2) ^ (g_cov_prev << 1);
  g_cov_map[h & ((1 << 16) - 1)] = 1;
  g_cov_prev = pc >> 2;
}

__attribute__((no_sanitize_coverage))
static void cov_dump(void) {
  const char *out = getenv("ZXCH_COV_OUT");
  if (!out) return;
  FILE *f = fopen(out, "wb");
  if (!f) return;
  fwrite(g_cov_map, 1, sizeof(g_cov_map), f);
  fclose(f);
}

static std::vector<uint8_t> read_file(const char *path) {
  FILE *f = fopen(path, "rb");
  if (!f) { perror(path); exit(2); }
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(n > 0 ? n : 0);
  if (n > 0 && fread(buf.data(), 1, n, f) != (size_t)n) exit(2);
  fclose(f);
  return buf;
}

// Minimal file-header parse (mirrors format/headers.py read_file_header).
// Returns 0 on success, filling block_size/has_checksum; nonzero = reject.
static int parse_header(const uint8_t *src, size_t n, uint64_t *block_size,
                        int *has_checksum) {
  if (n < 16 + 12) return -3;
  uint32_t magic;
  memcpy(&magic, src, 4);
  if (magic != 0x9CB02EF5u) return -4;
  if (src[4] != 7) return -5;
  uint8_t tmp[16];
  memcpy(tmp, src, 16);
  tmp[14] = tmp[15] = 0;
  uint16_t stored;
  memcpy(&stored, src + 14, 2);
  if (stored != zxch_hash16(tmp) || (src[6] & 0x0F) != 0) return -6;
  uint8_t code = src[5];
  if (code < 12 || code > 21) return -14;
  *block_size = 1ull << code;
  *has_checksum = (src[6] & 0x80) != 0;
  return 0;
}

static int64_t decode(const std::vector<uint8_t> &arc, int verify,
                      std::vector<uint8_t> *out,
                      const uint8_t *dict = nullptr, uint64_t n_dict = 0,
                      const uint8_t *dict_cl = nullptr) {
  uint64_t bs;
  int ck;
  int rc = parse_header(arc.data(), arc.size(), &bs, &ck);
  if (rc) return rc;
  uint64_t max_blocks = arc.size() / 8 + 2;
  std::vector<uint64_t> pos(max_blocks), comp(max_blocks);
  std::vector<uint8_t> typ(max_blocks);
  uint64_t eof = 0;
  int64_t nb = zxch_walk_frame(arc.data(), arc.size(), ck, 8 + bs + 4, 16,
                               pos.data(), typ.data(), comp.data(),
                               max_blocks, &eof);
  if (nb < 0) return nb;
  out->assign((uint64_t)nb * bs + 64, 0);
  return zxch_decompress_frame(arc.data(), arc.size(), bs, ck, verify,
                               dict, n_dict, dict_cl, out->data(),
                               out->size());
}

int main(int argc, char **argv) {
  atexit(cov_dump);
  if (argc < 3) { fprintf(stderr, "usage: san_driver d|r file [level]\n"); return 2; }
  if (argv[1][0] == 'd') {
    std::vector<uint8_t> arc = read_file(argv[2]);
    std::vector<uint8_t> out;
    int64_t a = decode(arc, 0, &out);
    int64_t b = decode(arc, 1, &out);
    // verify=1 must never succeed where verify=0 rejected
    if (a < 0 && b >= 0) { fprintf(stderr, "verify asymmetry\n"); return 3; }
    printf("%lld %lld\n", (long long)a, (long long)b);
    return 0;
  }
  if (argv[1][0] == 'r') {
    // "r" = roundtrip; "rd" = roundtrip with a dictionary derived from
    // the input (window prefix + shared code-length table), exercising
    // the dict-path native encode/decode under the sanitizers
    int with_dict = argv[1][1] == 'd';
    std::vector<uint8_t> data = read_file(argv[2]);
    int level = argc > 3 ? atoi(argv[3]) : 3;
    std::vector<uint8_t> dict;
    uint8_t dict_cl[256] = {0};
    const uint8_t *dcl = nullptr;
    if (with_dict) {
      uint64_t dn = data.size() < 4096 ? data.size() : 4096;
      dict.assign(data.begin(), data.begin() + dn);
      uint64_t freq[256] = {0};
      for (uint64_t i = 0; i < dn; i++) freq[dict[i]]++;
      // cover every byte value so the shared-table candidate always
      // prices (missing symbols would just gate it off)
      for (int v = 0; v < 256; v++) if (!freq[v]) freq[v] = 1;
      if (zxch_code_lengths(freq, 8, dict_cl) > 1) dcl = dict_cl;
    }
    // level-param table mirror of codec/block_encode.py level_params
    struct P { int probes, lazy, suff, sb, ss, cover; } tab[6] = {
        {2, 0, 16, 1, 4, 4}, {6, 1, 24, 1, 6, 4}, {6, 1, 32, 1, 6, 4},
        {8, 1, 64, 1, 0, 2}, {64, 1, 256, 1, 0, 2}, {64, 1, 256, 1, 0, 2}};
    P p = tab[level < 1 ? 0 : (level > 5 ? 4 : level - 1)];
    uint64_t bs = 65536;
    uint64_t nb = (data.size() + bs - 1) / bs;
    uint64_t cap = 16 + 12 + data.size() + nb * 76 + data.size() / 4
                   + 4 * nb + 4104;
    std::vector<uint8_t> arc(cap);
    const uint8_t *dp = data.empty() ? (const uint8_t *)"" : data.data();
    int64_t w = zxch_compress_frame(dp, data.size(), level,
                                    p.probes, p.lazy, p.suff, p.sb, p.ss,
                                    p.cover, /*min_emit=*/5,
                                    bs, 16, 1, 1,
                                    dict.empty() ? nullptr : dict.data(),
                                    dict.size(), dcl,
                                    with_dict ? 0x1234u : 0u,
                                    arc.data(), cap);
    if (w < 0) { fprintf(stderr, "compress failed %lld\n", (long long)w); return 3; }
    arc.resize(w);
    std::vector<uint8_t> out;
    int64_t n = decode(arc, 1, &out,
                       dict.empty() ? nullptr : dict.data(), dict.size(),
                       dcl);
    if (n != (int64_t)data.size() ||
        (data.size() && memcmp(out.data(), data.data(), data.size()) != 0)) {
      fprintf(stderr, "roundtrip mismatch %lld\n", (long long)n);
      return 3;
    }
    printf("roundtrip ok %lld\n", (long long)n);
    return 0;
  }
  return 2;
}
