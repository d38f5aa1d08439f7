/** zxc-tpu Node.js facade (reference parity: wrappers/nodejs).
 *
 * const zxc = require('zxc-tpu');
 * const arc = zxc.compress(Buffer.from('hello'), {level: 3});
 * const out = zxc.decompress(arc);
 */
'use strict';

const addon = require('./build/Release/zxc_addon.node');

function compress(data, opts = {}) {
  const { level = 3, blockSize = 0, checksum = false, seekable = false,
          threads = 1 } = opts;
  return addon.compress(Buffer.from(data), level, blockSize, checksum,
                        seekable, threads);
}

function decompress(archive, opts = {}) {
  const { verify = true, threads = 1 } = opts;
  return addon.decompress(Buffer.from(archive), verify, threads);
}

/** Shared-dictionary encode/decode: dict = {content, codeLen?} where
 * codeLen is 256 unpacked per-symbol lengths (optional shared table). */
function compressDict(data, dict, opts = {}) {
  const { level = 3, blockSize = 0, checksum = false, seekable = false } =
      opts;
  return addon.compressDict(Buffer.from(data), Buffer.from(dict.content),
                            dict.codeLen ? Buffer.from(dict.codeLen) : null,
                            level, blockSize, checksum, seekable);
}

function decompressDict(archive, dict, opts = {}) {
  const { verify = true } = opts;
  return addon.decompressDict(Buffer.from(archive),
                              Buffer.from(dict.content),
                              dict.codeLen ? Buffer.from(dict.codeLen)
                                           : null,
                              verify);
}


/** Train a dictionary from sample documents (reference zxc_dict_train).
 * Returns {content, codeLen} usable with compressDict/decompressDict. */
function trainDict(samples, targetSize = 16384) {
  const blob = addon.trainDict(samples.map((s) => Buffer.from(s)),
                               targetSize);
  // .zxd layout: 16-byte header (content size LE at 6..8), content,
  // 128-byte nibble-packed shared table
  const csz = blob.readUInt16LE(6);
  const content = blob.subarray(16, 16 + csz);
  const packed = blob.subarray(16 + csz, 16 + csz + 128);
  const codeLen = Buffer.alloc(256);
  for (let i = 0; i < 128; i++) {
    codeLen[2 * i] = packed[i] & 0x0f;
    codeLen[2 * i + 1] = packed[i] >> 4;
  }
  return { content, codeLen };
}

/** Push streaming compressor (zxc_cstream parity). */
class CStream {
  constructor(opts = {}) {
    const { level = 3, blockSize = 0, checksum = false,
            seekable = false } = opts;
    this.h = addon.cstreamNew(level, blockSize, checksum, seekable);
    this.done = false;
  }
  /** Consumes all of data; returns produced archive bytes (Buffer). */
  compress(data) {
    const parts = [];
    let out = addon.cstreamCompress(this.h, Buffer.from(data));
    parts.push(out);
    while (out.length > 0) {                   // drain the backlog
      out = addon.cstreamCompress(this.h, Buffer.alloc(0));
      parts.push(out);
    }
    return Buffer.concat(parts);
  }
  /** Flushes the final block, EOF, seek table and footer. */
  end() {
    const parts = [];
    while (!addon.cstreamFinished(this.h)) {
      const out = addon.cstreamEnd(this.h);
      parts.push(out);
      if (out.length === 0) break;
    }
    this.done = true;
    return Buffer.concat(parts);
  }
  close() { addon.cstreamFree(this.h); this.h = 0; }
}

/** Push streaming decompressor (zxc_dstream parity). */
class DStream {
  constructor(opts = {}) {
    const { verify = false } = opts;
    this.h = addon.dstreamNew(verify);
  }
  /** Consumes all of data; returns decoded bytes (Buffer). */
  decompress(data) {
    const parts = [];
    let out = addon.dstreamDecompress(this.h, Buffer.from(data));
    parts.push(out);
    while (out.length > 0) {
      out = addon.dstreamDecompress(this.h, Buffer.alloc(0));
      parts.push(out);
    }
    return Buffer.concat(parts);
  }
  finished() { return addon.dstreamFinished(this.h); }
  close() { addon.dstreamFree(this.h); this.h = 0; }
}

module.exports = {
  compress,
  CStream,
  DStream,
  decompress,
  compressDict,
  trainDict,
  decompressDict,
  getDecompressedSize: (a) => addon.getDecompressedSize(Buffer.from(a)),
  frameInfo: (a) => addon.frameInfo(Buffer.from(a)),
  seekableRange: (a, off, len) =>
      addon.seekableRange(Buffer.from(a), off, len),
  seekableRangeDict: (a, off, len, dict) =>
      addon.seekableRangeDict(Buffer.from(a), off, len,
                              Buffer.from(dict.content),
                              dict.codeLen ? Buffer.from(dict.codeLen)
                                           : null),
};
