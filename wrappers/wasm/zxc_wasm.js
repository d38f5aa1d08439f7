/** ESM loader for the zxc-tpu WASM build (reference parity:
 * wrappers/wasm/zxc_wasm.js).
 *
 *   import { loadZxc, detectZxc } from './zxc_wasm.js';
 *   const zxc = await loadZxc();
 *   const out = zxc.decompress(archiveBytes);
 */
'use strict';

const MAGIC = [0xf5, 0x2e, 0xb0, 0x9c];

export function detectZxc(bytes) {
  if (bytes.length < 28) return false;
  return MAGIC.every((b, i) => bytes[i] === b);
}

export async function loadZxc(moduleFactory) {
  // moduleFactory: the emcc -sMODULARIZE factory (zxc_wasm_core.js).
  const factory = moduleFactory ||
      (await import('./zxc_wasm_core.js')).default;
  const m = await factory();
  const call = (name, ...a) => m[`_${name}`](...a);

  const withBuf = (bytes, fn) => {
    const p = m._malloc(bytes.length || 1);
    m.HEAPU8.set(bytes, p);
    try {
      return fn(p);
    } finally {
      m._free(p);
    }
  };

  const take = (p, n) => m.HEAPU8.slice(p, p + n);

  const check = (rc) => {
    if (rc < 0) throw new Error(`zxc error ${rc}`);
    return rc;
  };

  return {
    compress(data, { level = 3, blockSize = 0, checksum = false,
                     seekable = false } = {}) {
      return withBuf(data, (src) => {
        const cap = check(call('zxcw_compress_bound', data.length,
                               blockSize || 524288));
        const dst = m._malloc(cap);
        try {
          const w = check(call('zxcw_compress', src, data.length, level,
                               blockSize, checksum ? 1 : 0,
                               seekable ? 1 : 0, dst, cap));
          return take(dst, w);
        } finally {
          m._free(dst);
        }
      });
    },
    decompress(archive, { verify = true } = {}) {
      return withBuf(archive, (src) => {
        const bound = check(call('zxcw_decompress_bound', src,
                                 archive.length));
        const dst = m._malloc(bound || 1);
        try {
          const w = check(call('zxcw_decompress', src, archive.length, dst,
                               bound, verify ? 1 : 0));
          return take(dst, w);
        } finally {
          m._free(dst);
        }
      });
    },
    getDecompressedSize(archive) {
      return withBuf(archive, (src) =>
          check(call('zxcw_get_decompressed_size', src, archive.length)));
    },
    seekableRange(archive, offset, length) {
      return withBuf(archive, (src) => {
        const dst = m._malloc(length || 1);
        try {
          const w = check(call('zxcw_seekable_range', src, archive.length,
                               offset, length, dst));
          return take(dst, w);
        } finally {
          m._free(dst);
        }
      });
    },
  };
}
