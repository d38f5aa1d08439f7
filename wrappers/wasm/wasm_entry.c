/* Emscripten entry shims for the zxc-tpu simple ABI (reference parity:
 * wrappers/wasm/wasm_entry.c). All sizes flow as u32 (wasm32 memory);
 * negative i32 returns are ZXC error codes.
 *
 * Build (build.sh): emcc -O3 wasm_entry.c ../../zxc_tpu/runtime/zxc_host.cpp
 *   -I../../include -sEXPORTED_FUNCTIONS=... -sMODULARIZE -o zxc_wasm_core.js
 */
#include <stdint.h>
#include <stdlib.h>

#include "zxc_host.h"

#ifdef __EMSCRIPTEN__
#include <emscripten/emscripten.h>
#define WASM_EXPORT EMSCRIPTEN_KEEPALIVE
#else
#define WASM_EXPORT
#endif

WASM_EXPORT int32_t zxcw_compress_bound(uint32_t n, uint32_t block_size) {
  int64_t b = zxch_compress_bound(n, block_size);
  return b > 0x7FFFFFFF ? -10 : (int32_t)b;
}

WASM_EXPORT int32_t zxcw_compress(const uint8_t *data, uint32_t n,
                                  int32_t level, uint32_t block_size,
                                  int32_t checksum, int32_t seekable,
                                  uint8_t *dst, uint32_t cap) {
  int64_t w = zxch_simple_compress(data, n, level, block_size, checksum,
                                   seekable, dst, cap);
  return w > 0x7FFFFFFF ? -10 : (int32_t)w;
}

WASM_EXPORT int32_t zxcw_get_decompressed_size(const uint8_t *src,
                                               uint32_t n) {
  int64_t s = zxch_get_decompressed_size(src, n);
  return s > 0x7FFFFFFF ? -10 : (int32_t)s;
}

WASM_EXPORT int32_t zxcw_decompress_bound(const uint8_t *src, uint32_t n) {
  int64_t b = zxch_simple_decompress_bound(src, n);
  return b > 0x7FFFFFFF ? -10 : (int32_t)b;
}

WASM_EXPORT int32_t zxcw_decompress(const uint8_t *src, uint32_t n,
                                    uint8_t *dst, uint32_t cap,
                                    int32_t verify) {
  int64_t w = zxch_simple_decompress(src, n, dst, cap, 0, 0, 0, verify);
  return w > 0x7FFFFFFF ? -10 : (int32_t)w;
}

WASM_EXPORT int32_t zxcw_seekable_range(const uint8_t *src, uint32_t n,
                                        uint32_t offset, uint32_t length,
                                        uint8_t *dst) {
  int64_t w = zxch_seekable_range(src, n, offset, length, dst, length,
                                  0, 0, 0);
  return w > 0x7FFFFFFF ? -10 : (int32_t)w;
}

WASM_EXPORT int32_t zxcw_compress_dict(const uint8_t *data, uint32_t n,
                                       int32_t level, uint32_t block_size,
                                       int32_t checksum, int32_t seekable,
                                       const uint8_t *dict, uint32_t n_dict,
                                       const uint8_t *dict_cl256,
                                       uint8_t *dst, uint32_t cap) {
  int64_t w = zxch_simple_compress_dict(data, n, level, block_size,
                                        checksum, seekable, dict, n_dict,
                                        dict_cl256, dst, cap);
  return w > 0x7FFFFFFF ? -10 : (int32_t)w;
}

WASM_EXPORT int32_t zxcw_decompress_dict(const uint8_t *src, uint32_t n,
                                         uint8_t *dst, uint32_t cap,
                                         const uint8_t *dict,
                                         uint32_t n_dict,
                                         const uint8_t *dict_cl256,
                                         int32_t verify) {
  int64_t w = zxch_simple_decompress(src, n, dst, cap, dict, n_dict,
                                     dict_cl256, verify);
  return w > 0x7FFFFFFF ? -10 : (int32_t)w;
}

/* dictionary trainer: samples flattened by the JS loader; emits a
 * complete .zxd blob (16B header + content + 128B table) */
WASM_EXPORT int32_t zxcw_dict_train(const uint8_t *flat,
                                    const uint32_t *sizes32,
                                    int32_t n_samples, uint32_t target_size,
                                    uint8_t *dst, uint32_t cap) {
  uint64_t sizes[256];
  if (n_samples <= 0 || n_samples > 256) return -12;
  for (int32_t i = 0; i < n_samples; i++) sizes[i] = sizes32[i];
  int64_t w = zxch_dict_train(flat, sizes, n_samples, target_size, dst, cap);
  return w > 0x7FFFFFFF ? -10 : (int32_t)w;
}

/* magic sniff for detectZxc() in the JS loader */
WASM_EXPORT int32_t zxcw_detect(const uint8_t *src, uint32_t n) {
  uint64_t bs;
  int ck;
  uint32_t did;
  return zxch_frame_info(src, n, &bs, &ck, &did) == 0;
}
