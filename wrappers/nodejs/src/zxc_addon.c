/* Node.js N-API addon over the zxc-tpu simple C ABI (libzxchost.so).
 *
 * Mirrors the reference's wrappers/nodejs/src/zxc_addon.cc surface at the
 * frame level: compress / decompress / getDecompressedSize / frameInfo /
 * seekableRange. Plain N-API C (no node-addon-api dependency) so the only
 * build requirement is node-gyp + the shared library.
 */
#include <node_api.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#include <stdio.h>
#include "zxc_host.h"

static napi_value throw_code(napi_env env, int64_t code) {
  char msg[64];
  snprintf(msg, sizeof(msg), "zxc error %lld", (long long)code);
  napi_throw_error(env, NULL, msg);
  return NULL;
}

static int get_buffer(napi_env env, napi_value v, uint8_t **data,
                      size_t *len) {
  bool is;
  if (napi_is_buffer(env, v, &is) != napi_ok || !is) {
    napi_throw_type_error(env, NULL, "expected Buffer");
    return 0;
  }
  void *p;
  napi_get_buffer_info(env, v, &p, len);
  *data = (uint8_t *)p;
  return 1;
}

static int64_t get_int(napi_env env, napi_value v, int64_t dflt) {
  napi_valuetype t;
  napi_typeof(env, v, &t);
  if (t != napi_number) return dflt;
  int64_t out;
  napi_get_value_int64(env, v, &out);
  return out;
}

/* compress(data: Buffer, level=3, blockSize=0, checksum=false,
 *          seekable=false, threads=1) -> Buffer
 * threads > 1 rides the native MT frame encoder; archive bytes are
 * identical at every thread count. */
static napi_value Compress(napi_env env, napi_callback_info info) {
  size_t argc = 6;
  napi_value args[6];
  napi_get_cb_info(env, info, &argc, args, NULL, NULL);
  uint8_t *data;
  size_t n;
  if (!get_buffer(env, args[0], &data, &n)) return NULL;
  int64_t level = argc > 1 ? get_int(env, args[1], 3) : 3;
  int64_t bs = argc > 2 ? get_int(env, args[2], 0) : 0;
  bool checksum = false, seekable = false;
  if (argc > 3) napi_get_value_bool(env, args[3], &checksum);
  if (argc > 4) napi_get_value_bool(env, args[4], &seekable);
  int64_t threads = argc > 5 ? get_int(env, args[5], 1) : 1;
  int64_t cap = zxch_compress_bound(n, bs ? bs : 512 * 1024);
  uint8_t *dst = (uint8_t *)malloc(cap);
  if (!dst) return throw_code(env, -1);
  int64_t w = threads > 1
      ? zxch_simple_compress_mt(data, n, (int)level, bs, checksum,
                                seekable, dst, cap, (int)threads)
      : zxch_simple_compress(data, n, (int)level, bs, checksum,
                             seekable, dst, cap);
  if (w < 0) {
    free(dst);
    return throw_code(env, w);
  }
  napi_value out;
  napi_create_buffer_copy(env, (size_t)w, dst, NULL, &out);
  free(dst);
  return out;
}

/* decompress(archive: Buffer, verify=true, threads=1) -> Buffer
 * threads > 1 rides the native MT frame decoder (identical output and
 * error codes at every thread count). */
static napi_value Decompress(napi_env env, napi_callback_info info) {
  size_t argc = 3;
  napi_value args[3];
  napi_get_cb_info(env, info, &argc, args, NULL, NULL);
  uint8_t *arc;
  size_t n;
  if (!get_buffer(env, args[0], &arc, &n)) return NULL;
  bool verify = true;
  if (argc > 1) napi_get_value_bool(env, args[1], &verify);
  int64_t threads = argc > 2 ? get_int(env, args[2], 1) : 1;
  int64_t bound = zxch_simple_decompress_bound(arc, n);
  if (bound < 0) return throw_code(env, bound);
  uint8_t *dst = (uint8_t *)malloc((size_t)bound + 1);
  if (!dst) return throw_code(env, -1);
  int64_t w = threads > 1
      ? zxch_simple_decompress_mt(arc, n, dst, (uint64_t)bound, NULL, 0,
                                  NULL, verify, (int)threads)
      : zxch_simple_decompress(arc, n, dst, (uint64_t)bound, NULL, 0,
                               NULL, verify);
  if (w < 0) {
    free(dst);
    return throw_code(env, w);
  }
  napi_value out;
  napi_create_buffer_copy(env, (size_t)w, dst, NULL, &out);
  free(dst);
  return out;
}

/* compressDict(data, dictContent, dictCodeLen256|null, level=3,
 * blockSize=0, checksum=false, seekable=false) -> Buffer */
static napi_value CompressDict(napi_env env, napi_callback_info info) {
  size_t argc = 7;
  napi_value args[7];
  napi_get_cb_info(env, info, &argc, args, NULL, NULL);
  uint8_t *data;
  size_t n;
  if (!get_buffer(env, args[0], &data, &n)) return NULL;
  uint8_t *dict = NULL;
  size_t n_dict = 0;
  if (argc > 1 && !get_buffer(env, args[1], &dict, &n_dict)) return NULL;
  uint8_t *cl = NULL;
  size_t n_cl = 0;
  napi_valuetype t = napi_undefined;
  if (argc > 2) napi_typeof(env, args[2], &t);
  if (t != napi_undefined && t != napi_null) {
    if (!get_buffer(env, args[2], &cl, &n_cl) || n_cl != 256) {
      napi_throw_error(env, "EINVAL", "dictCodeLen must be 256 bytes");
      return NULL;
    }
  }
  int64_t level = argc > 3 ? get_int(env, args[3], 3) : 3;
  int64_t bs = argc > 4 ? get_int(env, args[4], 0) : 0;
  bool checksum = false, seekable = false;
  if (argc > 5) napi_get_value_bool(env, args[5], &checksum);
  if (argc > 6) napi_get_value_bool(env, args[6], &seekable);
  int64_t cap = zxch_compress_bound(n, bs ? bs : 512 * 1024);
  uint8_t *dst = (uint8_t *)malloc(cap);
  if (!dst) return throw_code(env, -1);
  int64_t w = zxch_simple_compress_dict(data, n, (int)level, bs, checksum,
                                        seekable, dict, n_dict, cl, dst,
                                        cap);
  if (w < 0) {
    free(dst);
    return throw_code(env, w);
  }
  napi_value out;
  napi_create_buffer_copy(env, (size_t)w, dst, NULL, &out);
  free(dst);
  return out;
}

/* decompressDict(archive, dictContent, dictCodeLen256|null, verify=true)
 * -> Buffer */
static napi_value DecompressDict(napi_env env, napi_callback_info info) {
  size_t argc = 4;
  napi_value args[4];
  napi_get_cb_info(env, info, &argc, args, NULL, NULL);
  uint8_t *arc;
  size_t n;
  if (!get_buffer(env, args[0], &arc, &n)) return NULL;
  uint8_t *dict = NULL;
  size_t n_dict = 0;
  if (argc > 1 && !get_buffer(env, args[1], &dict, &n_dict)) return NULL;
  uint8_t *cl = NULL;
  size_t n_cl = 0;
  napi_valuetype t = napi_undefined;
  if (argc > 2) napi_typeof(env, args[2], &t);
  if (t != napi_undefined && t != napi_null) {
    if (!get_buffer(env, args[2], &cl, &n_cl) || n_cl != 256) {
      napi_throw_error(env, "EINVAL", "dictCodeLen must be 256 bytes");
      return NULL;
    }
  }
  bool verify = true;
  if (argc > 3) napi_get_value_bool(env, args[3], &verify);
  int64_t bound = zxch_simple_decompress_bound(arc, n);
  if (bound < 0) return throw_code(env, bound);
  uint8_t *dst = (uint8_t *)malloc((size_t)bound + 1);
  if (!dst) return throw_code(env, -1);
  int64_t w = zxch_simple_decompress(arc, n, dst, (uint64_t)bound, dict,
                                     n_dict, cl, verify);
  if (w < 0) {
    free(dst);
    return throw_code(env, w);
  }
  napi_value out;
  napi_create_buffer_copy(env, (size_t)w, dst, NULL, &out);
  free(dst);
  return out;
}

/* getDecompressedSize(archive: Buffer) -> number */
static napi_value GetDecompressedSize(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value args[1];
  napi_get_cb_info(env, info, &argc, args, NULL, NULL);
  uint8_t *arc;
  size_t n;
  if (!get_buffer(env, args[0], &arc, &n)) return NULL;
  int64_t s = zxch_get_decompressed_size(arc, n);
  if (s < 0) return throw_code(env, s);
  napi_value out;
  napi_create_int64(env, s, &out);
  return out;
}

/* frameInfo(archive: Buffer) -> {blockSize, hasChecksum, dictId} */
static napi_value FrameInfo(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value args[1];
  napi_get_cb_info(env, info, &argc, args, NULL, NULL);
  uint8_t *arc;
  size_t n;
  if (!get_buffer(env, args[0], &arc, &n)) return NULL;
  uint64_t bs;
  int ck;
  uint32_t did;
  int rc = zxch_frame_info(arc, n, &bs, &ck, &did);
  if (rc) return throw_code(env, rc);
  napi_value out, v;
  napi_create_object(env, &out);
  napi_create_int64(env, (int64_t)bs, &v);
  napi_set_named_property(env, out, "blockSize", v);
  napi_get_boolean(env, ck != 0, &v);
  napi_set_named_property(env, out, "hasChecksum", v);
  napi_create_uint32(env, did, &v);
  napi_set_named_property(env, out, "dictId", v);
  return out;
}

/* seekableRange(archive: Buffer, offset, length) -> Buffer */
static napi_value SeekableRange(napi_env env, napi_callback_info info) {
  size_t argc = 3;
  napi_value args[3];
  napi_get_cb_info(env, info, &argc, args, NULL, NULL);
  uint8_t *arc;
  size_t n;
  if (!get_buffer(env, args[0], &arc, &n)) return NULL;
  int64_t off = get_int(env, args[1], 0);
  int64_t len = get_int(env, args[2], 0);
  if (off < 0 || len < 0) return throw_code(env, -12);
  uint8_t *dst = (uint8_t *)malloc(len ? (size_t)len : 1);
  if (!dst) return throw_code(env, -1);
  int64_t w = zxch_seekable_range(arc, n, (uint64_t)off, (uint64_t)len, dst,
                                  (uint64_t)len, NULL, 0, NULL);
  if (w < 0) {
    free(dst);
    return throw_code(env, w);
  }
  napi_value out;
  napi_create_buffer_copy(env, (size_t)w, dst, NULL, &out);
  free(dst);
  return out;
}

/* seekableRangeDict(archive, offset, length, dictContent,
 * dictCodeLen256|null) -> Buffer */
static napi_value SeekableRangeDict(napi_env env, napi_callback_info info) {
  size_t argc = 5;
  napi_value args[5];
  napi_get_cb_info(env, info, &argc, args, NULL, NULL);
  uint8_t *arc;
  size_t n;
  if (!get_buffer(env, args[0], &arc, &n)) return NULL;
  int64_t off = get_int(env, args[1], 0);
  int64_t len = get_int(env, args[2], 0);
  uint8_t *dict = NULL;
  size_t n_dict = 0;
  if (argc > 3 && !get_buffer(env, args[3], &dict, &n_dict)) return NULL;
  uint8_t *cl = NULL;
  size_t n_cl = 0;
  napi_valuetype t = napi_undefined;
  if (argc > 4) napi_typeof(env, args[4], &t);
  if (t != napi_undefined && t != napi_null) {
    if (!get_buffer(env, args[4], &cl, &n_cl) || n_cl != 256) {
      napi_throw_error(env, "EINVAL", "dictCodeLen must be 256 bytes");
      return NULL;
    }
  }
  uint8_t *dst = (uint8_t *)malloc((size_t)len ? (size_t)len : 1);
  if (!dst) return throw_code(env, -1);
  int64_t w = zxch_seekable_range(arc, n, (uint64_t)off, (uint64_t)len, dst,
                                  (uint64_t)len, dict, n_dict, cl);
  if (w < 0) {
    free(dst);
    return throw_code(env, w);
  }
  napi_value out;
  napi_create_buffer_copy(env, (size_t)w, dst, NULL, &out);
  free(dst);
  return out;
}


/* -- push streaming (zxc_pstream parity): thin handle-based surface.
   Handles are pointer bits in a JS number (< 2^53, exact). The JS
   facade (index.js) loops the drains. */

static napi_value CstreamNew(napi_env env, napi_callback_info info) {
  size_t argc = 4;
  napi_value argv[4];
  napi_get_cb_info(env, info, &argc, argv, NULL, NULL);
  int64_t level = 3, bs = 0;
  bool checksum = false, seekable = false;
  if (argc > 0) napi_get_value_int64(env, argv[0], &level);
  if (argc > 1) napi_get_value_int64(env, argv[1], &bs);
  if (argc > 2) napi_get_value_bool(env, argv[2], &checksum);
  if (argc > 3) napi_get_value_bool(env, argv[3], &seekable);
  void *h = zxch_cstream_new((int)level, (uint64_t)bs, checksum, seekable);
  if (!h) {
    napi_throw_error(env, NULL, "zxc: bad stream parameters");
    return NULL;
  }
  napi_value out;
  napi_create_int64(env, (int64_t)(intptr_t)h, &out);
  return out;
}

static napi_value CstreamCompress(napi_env env, napi_callback_info info) {
  size_t argc = 2;
  napi_value argv[2];
  napi_get_cb_info(env, info, &argc, argv, NULL, NULL);
  int64_t hh = 0;
  napi_get_value_int64(env, argv[0], &hh);
  void *h = (void *)(intptr_t)hh;
  void *src = NULL;
  size_t n = 0;
  napi_get_buffer_info(env, argv[1], &src, &n);
  uint64_t cap = zxch_cstream_out_size(h);
  uint8_t *tmp = malloc(cap ? cap : 1);
  uint64_t consumed = 0;
  int64_t w = zxch_cstream_compress(h, src, n, tmp, cap, &consumed);
  if (w < 0) {
    free(tmp);
    return throw_code(env, w);
  }
  void *dst;
  napi_value out;
  napi_create_buffer_copy(env, (size_t)w, tmp, &dst, &out);
  free(tmp);
  return out;
}

static napi_value CstreamEnd(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1];
  napi_get_cb_info(env, info, &argc, argv, NULL, NULL);
  int64_t hh = 0;
  napi_get_value_int64(env, argv[0], &hh);
  void *h = (void *)(intptr_t)hh;
  uint64_t cap = zxch_cstream_out_size(h);
  uint8_t *tmp = malloc(cap ? cap : 1);
  int64_t w = zxch_cstream_end(h, tmp, cap);
  if (w < 0) {
    free(tmp);
    return throw_code(env, w);
  }
  void *dst;
  napi_value out;
  napi_create_buffer_copy(env, (size_t)w, tmp, &dst, &out);
  free(tmp);
  return out;
}

static napi_value CstreamFinished(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1];
  napi_get_cb_info(env, info, &argc, argv, NULL, NULL);
  int64_t hh = 0;
  napi_get_value_int64(env, argv[0], &hh);
  napi_value out;
  napi_get_boolean(env, zxch_cstream_finished((void *)(intptr_t)hh) != 0,
                   &out);
  return out;
}

static napi_value CstreamFree(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1];
  napi_get_cb_info(env, info, &argc, argv, NULL, NULL);
  int64_t hh = 0;
  napi_get_value_int64(env, argv[0], &hh);
  zxch_cstream_free((void *)(intptr_t)hh);
  return NULL;
}

static napi_value DstreamNew(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1];
  napi_get_cb_info(env, info, &argc, argv, NULL, NULL);
  bool verify = false;
  if (argc > 0) napi_get_value_bool(env, argv[0], &verify);
  napi_value out;
  napi_create_int64(env, (int64_t)(intptr_t)zxch_dstream_new(verify), &out);
  return out;
}

static napi_value DstreamDecompress(napi_env env, napi_callback_info info) {
  size_t argc = 2;
  napi_value argv[2];
  napi_get_cb_info(env, info, &argc, argv, NULL, NULL);
  int64_t hh = 0;
  napi_get_value_int64(env, argv[0], &hh);
  void *h = (void *)(intptr_t)hh;
  void *src = NULL;
  size_t n = 0;
  napi_get_buffer_info(env, argv[1], &src, &n);
  uint64_t cap = zxch_dstream_out_size(h);
  uint8_t *tmp = malloc(cap ? cap : 1);
  uint64_t consumed = 0;
  int64_t w = zxch_dstream_decompress(h, src, n, tmp, cap, &consumed);
  if (w < 0) {
    free(tmp);
    return throw_code(env, w);
  }
  void *dst;
  napi_value out;
  napi_create_buffer_copy(env, (size_t)w, tmp, &dst, &out);
  free(tmp);
  return out;
}

static napi_value DstreamFinished(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1];
  napi_get_cb_info(env, info, &argc, argv, NULL, NULL);
  int64_t hh = 0;
  napi_get_value_int64(env, argv[0], &hh);
  napi_value out;
  napi_get_boolean(env, zxch_dstream_finished((void *)(intptr_t)hh) != 0,
                   &out);
  return out;
}

static napi_value DstreamFree(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1];
  napi_get_cb_info(env, info, &argc, argv, NULL, NULL);
  int64_t hh = 0;
  napi_get_value_int64(env, argv[0], &hh);
  zxch_dstream_free((void *)(intptr_t)hh);
  return NULL;
}

/* trainDict(samples: Buffer[], targetSize=16384) -> Buffer (.zxd blob)
 * (reference zxc_dict_train; the JS facade unpacks content + table) */
static napi_value TrainDict(napi_env env, napi_callback_info info) {
  size_t argc = 2;
  napi_value args[2];
  napi_get_cb_info(env, info, &argc, args, NULL, NULL);
  bool is_array = false;
  napi_is_array(env, args[0], &is_array);
  if (!is_array) return throw_code(env, -12);
  uint32_t n_samples = 0;
  napi_get_array_length(env, args[0], &n_samples);
  if (n_samples == 0) return throw_code(env, -12);
  uint64_t *sizes = (uint64_t *)malloc(n_samples * sizeof(uint64_t));
  uint8_t **ptrs = (uint8_t **)malloc(n_samples * sizeof(uint8_t *));
  if (!sizes || !ptrs) { free(sizes); free(ptrs); return throw_code(env, -1); }
  uint64_t total = 0;
  for (uint32_t i = 0; i < n_samples; i++) {
    napi_value el;
    napi_get_element(env, args[0], i, &el);
    size_t len;
    if (!get_buffer(env, el, &ptrs[i], &len)) { free(sizes); free(ptrs); return NULL; }
    sizes[i] = len;
    total += len;
  }
  uint8_t *flat = (uint8_t *)malloc(total ? total : 1);
  if (!flat) { free(sizes); free(ptrs); return throw_code(env, -1); }
  uint64_t off = 0;
  for (uint32_t i = 0; i < n_samples; i++) {
    memcpy(flat + off, ptrs[i], sizes[i]);
    off += sizes[i];
  }
  int64_t target = argc > 1 ? get_int(env, args[1], 16384) : 16384;
  uint64_t cap = 16 + 65536 + 128;
  uint8_t *dst = (uint8_t *)malloc(cap);
  int64_t w = dst ? zxch_dict_train(flat, sizes, (int)n_samples,
                                    (uint64_t)target, dst, cap)
                  : -1;
  free(flat); free(sizes); free(ptrs);
  if (w < 0) {
    free(dst);
    return throw_code(env, w);
  }
  napi_value out;
  napi_create_buffer_copy(env, (size_t)w, dst, NULL, &out);
  free(dst);
  return out;
}

static napi_value Init(napi_env env, napi_value exports) {
  napi_value fn;
#define EXPORT(name, f)                                    \
  napi_create_function(env, name, NAPI_AUTO_LENGTH, f, NULL, &fn); \
  napi_set_named_property(env, exports, name, fn)
  EXPORT("compress", Compress);
  EXPORT("decompress", Decompress);
  EXPORT("compressDict", CompressDict);
  EXPORT("trainDict", TrainDict);
  EXPORT("decompressDict", DecompressDict);
  EXPORT("getDecompressedSize", GetDecompressedSize);
  EXPORT("frameInfo", FrameInfo);
  EXPORT("seekableRange", SeekableRange);
  EXPORT("seekableRangeDict", SeekableRangeDict);
  EXPORT("cstreamNew", CstreamNew);
  EXPORT("cstreamCompress", CstreamCompress);
  EXPORT("cstreamEnd", CstreamEnd);
  EXPORT("cstreamFinished", CstreamFinished);
  EXPORT("cstreamFree", CstreamFree);
  EXPORT("dstreamNew", DstreamNew);
  EXPORT("dstreamDecompress", DstreamDecompress);
  EXPORT("dstreamFinished", DstreamFinished);
  EXPORT("dstreamFree", DstreamFree);
#undef EXPORT
  return exports;
}

NAPI_MODULE(NODE_GYP_MODULE_NAME, Init)
