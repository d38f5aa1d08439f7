/* zxc_host.h — stable C ABI of the zxc-tpu native host runtime.
 *
 * This is the binding surface for non-Python languages (the reference
 * ships Rust/Node/Go/WASM wrappers around its C core; equivalents here
 * wrap this ABI around libzxchost.so, built from
 * zxc_tpu/runtime/zxc_host.cpp with `g++ -O3 -shared -fPIC`).
 *
 * Conventions: little-endian hosts; negative returns are zxc_error_t
 * codes (include/zxc_error.h semantics: -3 SRC_TOO_SMALL, -6 BAD_HEADER,
 * -8 CORRUPT_DATA, -9 BAD_OFFSET, -10 OVERFLOW/budget).
 */
#ifndef ZXC_HOST_H
#define ZXC_HOST_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* -- checksums (FORMAT.md section 7) ---------------------------------- */
uint64_t zxch_rapidhash64(const uint8_t *data, size_t len, uint64_t seed);
uint32_t zxch_rapidhash32(const uint8_t *data, size_t len, uint64_t seed);
void zxch_rapidhash32_batch(const uint8_t *base, const uint64_t *offsets,
                            const uint64_t *sizes, uint32_t *out,
                            size_t count);
uint8_t zxch_hash8(const uint8_t *data8);    /* byte 7 pre-zeroed */
uint16_t zxch_hash16(const uint8_t *data16); /* bytes 14-15 pre-zeroed */

/* -- frame walking ----------------------------------------------------- */
int64_t zxch_walk_frame(const uint8_t *src, uint64_t n, int has_checksum,
                        uint64_t block_bound, uint64_t start, uint64_t *pos,
                        uint8_t *type, uint64_t *comp, uint64_t max_blocks,
                        uint64_t *eof_pos);

/* -- section parsing --------------------------------------------------- */
int zxch_rle_decode(const uint8_t *src, uint64_t n, uint8_t *dst,
                    uint64_t out_size);
int64_t zxch_varint_chain(const uint8_t *src, uint64_t n, uint64_t count,
                          uint32_t *out);
int zxch_glo_tokens(const uint8_t *tokens, uint64_t n_seq,
                    const uint32_t *ext, uint64_t n_ext, int32_t *ll,
                    int32_t *ml);
int zxch_ghi_words(const uint8_t *words, uint64_t n_seq, const uint32_t *ext,
                   uint64_t n_ext, int32_t *ll, int32_t *ml, int32_t *off);
int zxch_pivco_decode(const uint8_t *payload, uint64_t plen,
                      const uint8_t *code_len256, uint64_t n, uint8_t *out);
int zxch_pivco_decode_s(const uint8_t *payload, uint64_t plen,
                        const uint8_t *code_len256, uint64_t n, uint8_t *out,
                        uint8_t *scratch_n /* may be NULL */);

/* -- decode ------------------------------------------------------------ */
int64_t zxch_expand(const int32_t *ll, const int32_t *ml, const int32_t *off,
                    uint64_t n_seq, const uint8_t *lit, uint64_t n_lit,
                    const uint8_t *dict, uint64_t n_dict, uint8_t *dst,
                    uint64_t cap);
int64_t zxch_resolve_pieces(const int32_t *ll, const int32_t *ml,
                            const int32_t *off, uint64_t n_seq,
                            uint8_t *lit_full, uint64_t lit_len,
                            uint64_t lit_cap, uint64_t dict_len,
                            int32_t *po, int32_t *pc, int32_t *ps,
                            int32_t *pk, uint64_t max_pieces,
                            uint64_t *lit_len_out, int device_pure,
                            int max_frag);
/* Self-referential variant (v25 device contract): matches whose source
 * completes before the destination's 16 KiB supertile emit ONE piece
 * with k == *kout_value and c/s in OUTPUT coordinates
 * (out[p] = out[c + (p - s)]); requires device_pure.                 */
int64_t zxch_resolve_pieces_sr(const int32_t *ll, const int32_t *ml,
                               const int32_t *off, uint64_t n_seq,
                               uint8_t *lit_full, uint64_t lit_len,
                               uint64_t lit_cap, uint64_t dict_len,
                               int32_t *po, int32_t *pc, int32_t *ps,
                               int32_t *pk, uint64_t max_pieces,
                               uint64_t *lit_len_out, int device_pure,
                               int max_frag, int32_t *kout_value);
int64_t zxch_window_ops(const int32_t *po, const int32_t *pc,
                        const int32_t *ps, const int32_t *pk, uint64_t n,
                        int64_t total, int32_t *ops, int32_t *wstart,
                        uint64_t max_ops);
int64_t zxch_window_ops2(const int32_t *po, const int32_t *pc,
                         const int32_t *ps, const int32_t *pk, uint64_t n,
                         int64_t total, int32_t *ops, int32_t *wstart,
                         uint64_t max_ops);

/* -- encode ------------------------------------------------------------ */
int zxch_find_matches(const uint8_t *data, uint64_t n, uint64_t start,
                      int max_probes, int32_t *lens, int32_t *offs);
int64_t zxch_find_parse(const uint8_t *data, uint64_t n, uint64_t start,
                        int max_probes, int lazy, int sufficient_len,
                        int step_base, int step_shift, int cover_base,
                        int min_emit, int32_t *out_pos, int32_t *out_len,
                        int32_t *out_off, uint64_t max_seq);
int64_t zxch_lazy_parse(const int32_t *lens, const int32_t *offs, uint64_t P,
                        int lazy, int min_emit, int32_t *out_pos,
                        int32_t *out_len, int32_t *out_off,
                        uint64_t max_seq);
int64_t zxch_optimal_parse(const int32_t *lens, const int32_t *offs,
                           uint64_t P, const uint8_t *data,
                           const uint16_t *lit_cost_bits, int token_bits,
                           int32_t *out_pos, int32_t *out_len,
                           int32_t *out_off, uint64_t max_seq);

/* -- whole-frame codec -------------------------------------------------- */
/* Decode a full archive (after the caller validated the file header).
 * dst must have n_blocks*block_size + 64 bytes (wild-copy slack).    */
int64_t zxch_decompress_frame(const uint8_t *src, uint64_t n,
                              uint64_t block_size, int has_checksum,
                              int verify, const uint8_t *dict,
                              uint64_t n_dict, const uint8_t *dict_cl256,
                              uint8_t *dst, uint64_t dst_alloc);
/* Multi-threaded frame encode: the per-block dispatch fanned over a
 * persistent worker pool, stitched in order by the calling thread.
 * Archive bytes are identical to zxch_compress_frame at every thread
 * count. threads <= 1 (or a single-block input) IS the sequential
 * encoder.
 * Concurrency contract: the process-wide pool is SINGLE-FLIGHT —
 * concurrent *_mt calls from different caller threads queue behind a
 * mutex rather than run in parallel (each call already fans out over
 * `threads` workers; embedders wanting concurrent MT frames should
 * partition cores via the threads argument). Pool threads are
 * detached, live for the process, and are sized to the largest
 * `threads` ever requested (capped at 64); their thread-local encoder
 * state persists with them.
 * Dictionary windows: dict_len + block_size must stay under 1<<24
 * (the matcher packs 24-bit positions); larger windows are rejected
 * by the parse (-10). Our .zxd format caps content at 65535 bytes.  */
int64_t zxch_compress_frame_mt(const uint8_t *data, uint64_t n, int level,
                               int max_probes, int lazy, int sufficient_len,
                               int step_base, int step_shift, int cover_base,
                               int min_emit,
                               uint64_t block_size, int block_size_code,
                               int checksum, int seekable,
                               const uint8_t *dict, uint64_t dict_len,
                               const uint8_t *dict_cl256, uint32_t dict_id,
                               uint8_t *out, uint64_t cap, int threads);
/* Multi-threaded variant: fork-join pool over contiguous block ranges
 * (blocks land at deterministic i*block_size offsets). Bit-identical
 * output and error codes to zxch_decompress_frame; any archive shape
 * that breaks the offset mapping falls back to the sequential walk.
 * threads <= 1 IS the sequential walk.                               */
int64_t zxch_decompress_frame_mt(const uint8_t *src, uint64_t n,
                                 uint64_t block_size, int has_checksum,
                                 int verify, const uint8_t *dict,
                                 uint64_t n_dict, const uint8_t *dict_cl256,
                                 uint8_t *dst, uint64_t dst_alloc,
                                 int threads);
/* Decode one data-block payload; out needs block_size + 64 bytes.    */
int64_t zxch_decode_block(int block_type, const uint8_t *payload,
                          uint64_t plen, uint8_t *out, uint64_t block_size,
                          const uint8_t *dict, uint64_t n_dict,
                          const uint8_t *dict_cl256);
/* Encode a full frame at levels 1-5 (find+parse+emit native).        */
int64_t zxch_compress_frame(const uint8_t *data, uint64_t n, int level,
                            int max_probes, int lazy, int sufficient_len,
                            int step_base, int step_shift, int cover_base,
                            int min_emit,
                            uint64_t block_size, int block_size_code,
                            int checksum, int seekable,
                            const uint8_t *dict, uint64_t dict_len,
                            const uint8_t *dict_cl256, uint32_t dict_id,
                            uint8_t *out, uint64_t cap);

/* -- simple one-call ABI (binding surface) ------------------------------ */
/* Header parse/validate; fills block_size / has_checksum / dict_id.  */
int zxch_frame_info(const uint8_t *src, uint64_t n, uint64_t *block_size,
                    int *has_checksum, uint32_t *dict_id);
int64_t zxch_get_decompressed_size(const uint8_t *src, uint64_t n);
/* dst capacity needed by zxch_simple_decompress.                     */
int64_t zxch_simple_decompress_bound(const uint8_t *src, uint64_t n);
int64_t zxch_simple_decompress(const uint8_t *src, uint64_t n, uint8_t *dst,
                               uint64_t dst_cap, const uint8_t *dict,
                               uint64_t n_dict, const uint8_t *dict_cl256,
                               int verify);
int64_t zxch_compress_bound(uint64_t n, uint64_t block_size);
/* Levels 1-5; 0 block_size selects the 512 KB default.               */
int64_t zxch_simple_compress(const uint8_t *data, uint64_t n, int level,
                             uint64_t block_size, int checksum, int seekable,
                             uint8_t *dst, uint64_t dst_cap);
/* MT variants of the one-call codec: same bytes / same error codes at
 * every thread count; threads <= 1 runs the sequential paths.        */
int64_t zxch_simple_compress_mt(const uint8_t *data, uint64_t n, int level,
                                uint64_t block_size, int checksum,
                                int seekable, uint8_t *dst,
                                uint64_t dst_cap, int threads);
int64_t zxch_simple_decompress_mt(const uint8_t *src, uint64_t n,
                                  uint8_t *dst, uint64_t dst_cap,
                                  const uint8_t *dict, uint64_t n_dict,
                                  const uint8_t *dict_cl256, int verify,
                                  int threads);
/* 32-bit id binding a (content, packed-table) pair; huf128 may be NULL. */
uint32_t zxch_dict_id(const uint8_t *content, uint64_t n,
                      const uint8_t *huf128);
/* zxch_simple_compress with a dictionary window + optional shared
 * table (256 unpacked code lengths, same convention as
 * zxch_simple_decompress; NULL for a content-only dictionary). The
 * dict id is stamped into the header automatically.                 */
int64_t zxch_simple_compress_dict(const uint8_t *data, uint64_t n, int level,
                                  uint64_t block_size, int checksum,
                                  int seekable, const uint8_t *dict,
                                  uint64_t n_dict, const uint8_t *dict_cl256,
                                  uint8_t *dst, uint64_t dst_cap);
/* -- device-dispatch prep + piece-plan hints ------------------------ */
/* Fused v19 prep: one call takes a block payload to the packed device
 * control slices (section parse + entropy literals + piece resolution +
 * lane-op packing). Returns the decoded size, or a negative error (-10
 * also means MAXQ/NG32/RLP too small: *out_nq / *out_maxrow /
 * *out_litrows then hold lower bounds for a resize-and-retry).        */
int64_t zxch_v19_prep_block(const uint8_t *payload, uint64_t plen,
                            int block_type, uint64_t block_size,
                            const uint8_t *dict, uint64_t n_dict,
                            const uint8_t *dict_cl256, int K,
                            int quad_align, int32_t *qs, int32_t *qbase,
                            int32_t *pctrl, uint8_t *tq, uint8_t *lit8,
                            int64_t MAXQ, int64_t NG32, int64_t RLP,
                            int64_t *out_nq, int64_t *out_maxrow,
                            int64_t *out_litrows);
/* zxch_v19_prep_block PLUS the lit8 replay plan: `plan` receives
 * (n_plan x 4) i32 control records {kind, dst, src_or_byte, len}
 * (kind 0 = intra-window memcpy, 1 = memset) that rebuild the
 * resolver-materialized window tail without re-running resolution —
 * the encode-time piece-plan hint payload (.zxh). Records carry no
 * data bytes. -16 = plan_cap too small (grow and retry).              */
int64_t zxch_v19_prep_block_plan(const uint8_t *payload, uint64_t plen,
                                 int block_type, uint64_t block_size,
                                 const uint8_t *dict, uint64_t n_dict,
                                 const uint8_t *dict_cl256, int K,
                                 int quad_align, int32_t *qs,
                                 int32_t *qbase, int32_t *pctrl,
                                 uint8_t *tq, uint8_t *lit8, int64_t MAXQ,
                                 int64_t NG32, int64_t RLP,
                                 int64_t *out_nq, int64_t *out_maxrow,
                                 int64_t *out_litrows, int32_t *plan,
                                 int64_t plan_cap, int64_t *out_nplan,
                                 int64_t *out_litlen);
/* Hint replay: archive literal decode + bounds-checked plan replay into
 * lit8 (every data byte comes from the archive; the hint is control
 * only). Returns litrows >= 0 or a negative error.                    */
int64_t zxch_v19_lit8_load(const uint8_t *payload, uint64_t plen,
                           int block_type, uint64_t block_size,
                           const uint8_t *dict, uint64_t n_dict,
                           const uint8_t *dict_cl256, const int32_t *plan,
                           int64_t n_plan, int64_t lit_len, uint8_t *lit8,
                           int64_t RLP);
/* Build ISA guard: 1 when the CPU supports every instruction set the
 * library was compiled with (AVX2 tier under ZXCH_PORTABLE=1;
 * -march=native otherwise), else 0 — callers must rebuild or switch
 * tiers instead of calling further symbols.                           */
int zxch_isa_supported(void);

/* -- dictionary trainer (zxc_dict_train parity) -------------------- */
/* Samples arrive flattened: `flat` = all sample bytes back to back,
 * sizes[i] their lengths. Content selection only; returns the content
 * length (<= min(target_size, 65535)) or a negative error.           */
int64_t zxch_train_dict(const uint8_t *flat, const uint64_t *sizes,
                        int n_samples, uint64_t target_size,
                        uint8_t *out, uint64_t cap);
/* Shared literal table trained on the post-LZ literal histogram of the
 * samples (level-6 parse, dictionary attached); fills out_table[128]. */
int64_t zxch_train_dict_huf(const uint8_t *flat, const uint64_t *sizes,
                            int n_samples, const uint8_t *content,
                            uint64_t content_len, uint8_t *out_table);
/* One-shot trainer emitting a complete .zxd blob (header + content +
 * table). cap of 16+65536+128 always suffices; returns the blob size. */
int64_t zxch_dict_train(const uint8_t *flat, const uint64_t *sizes,
                        int n_samples, uint64_t target_size,
                        uint8_t *out, uint64_t cap);

/* O(1) random-access range decode from a seekable archive.           */
int64_t zxch_seekable_range(const uint8_t *src, uint64_t n, uint64_t offset,
                            uint64_t length, uint8_t *dst, uint64_t dst_cap,
                            const uint8_t *dict, uint64_t n_dict,
                            const uint8_t *dict_cl256);

/* -- push streaming (zxc_pstream parity; reentrant, sticky errors) -- */
/* level 1-7, block_size 0 = 512 KiB default; NULL on bad args.       */
void *zxch_cstream_new(int level, uint64_t block_size, int checksum,
                       int seekable);
/* Push n bytes, drain up to cap produced bytes; returns produced or a
 * negative ZXC error. *consumed gets the input bytes taken.          */
int64_t zxch_cstream_compress(void *h, const uint8_t *src, uint64_t n,
                              uint8_t *dst, uint64_t cap,
                              uint64_t *consumed);
/* Flush final block + EOF + seek table + footer; call till finished. */
int64_t zxch_cstream_end(void *h, uint8_t *dst, uint64_t cap);
int zxch_cstream_finished(void *h);
uint64_t zxch_cstream_in_size(void *h);   /* recommended push size    */
uint64_t zxch_cstream_out_size(void *h);  /* recommended drain size   */
void zxch_cstream_free(void *h);

void *zxch_dstream_new(int verify);
int64_t zxch_dstream_decompress(void *h, const uint8_t *src, uint64_t n,
                                uint8_t *dst, uint64_t cap,
                                uint64_t *consumed);
int zxch_dstream_finished(void *h);
uint64_t zxch_dstream_out_size(void *h);
void zxch_dstream_free(void *h);

/* -- reusable contexts (zxc_create_cctx/dctx parity): sticky options,
 * dictionary attached once (id + table unpack amortized). ------------ */
void *zxch_cctx_new(void);

/* Static (caller-workspace) contexts — reference zxc_init_static_cctx /
 * zxc_init_static_dctx + zxc_estimate_cctx_size parity
 * (zxc_dispatch.c:1885-2010) for embedded / no-heap call sites.
 *
 * zxch_cctx_static_size(max_dict) returns the workspace bytes needed for
 * a compression context able to hold a dictionary of up to max_dict
 * bytes. zxch_cctx_init_static carves the context from the caller's
 * 8-byte-aligned buffer and returns a handle (== ws) usable with every
 * zxch_cctx_* entry point; it NEVER heap-allocates for context state,
 * and zxch_cctx_free on it is a no-op (the caller owns the memory).
 * Returns NULL when ws is too small, misaligned, or the options are
 * invalid. Attaching a dictionary larger than max_dict fails with -17.
 *
 * Scope note (documented difference from the reference): the reference
 * carves ALL encoder scratch into the workspace; here per-thread codec
 * scratch is process-wide thread_local storage grown once and reused —
 * the static context removes per-context allocations, not the runtime's
 * one-time per-thread scratch. */
uint64_t zxch_cctx_static_size(uint64_t max_dict);
uint64_t zxch_dctx_static_size(uint64_t max_dict);
void *zxch_cctx_init_static(void *ws, uint64_t ws_size, int level,
                            uint64_t block_size, int checksum,
                            int seekable, uint64_t max_dict);
void *zxch_dctx_init_static(void *ws, uint64_t ws_size, int verify,
                            uint64_t max_dict);
int zxch_cctx_set(void *h, int level, uint64_t block_size, int checksum,
                  int seekable);
int zxch_cctx_attach_dict(void *h, const uint8_t *dict, uint64_t n,
                          const uint8_t *packed128);
int64_t zxch_cctx_compress(void *h, const uint8_t *src, uint64_t n,
                           uint8_t *dst, uint64_t cap);
void zxch_cctx_free(void *h);
void *zxch_dctx_new(int verify);
int zxch_dctx_attach_dict(void *h, const uint8_t *dict, uint64_t n,
                          const uint8_t *packed128);
int64_t zxch_dctx_decompress(void *h, const uint8_t *src, uint64_t n,
                             uint8_t *dst, uint64_t cap);
void zxch_dctx_free(void *h);

#ifdef __cplusplus
}
#endif

#endif /* ZXC_HOST_H */
