/** zxc-tpu Node.js facade (reference parity: wrappers/nodejs).
 *
 * const zxc = require('zxc-tpu');
 * const arc = zxc.compress(Buffer.from('hello'), {level: 3});
 * const out = zxc.decompress(arc);
 */
'use strict';

const addon = require('./build/Release/zxc_addon.node');

function compress(data, opts = {}) {
  const { level = 3, blockSize = 0, checksum = false, seekable = false } =
      opts;
  return addon.compress(Buffer.from(data), level, blockSize, checksum,
                        seekable);
}

function decompress(archive, opts = {}) {
  const { verify = true } = opts;
  return addon.decompress(Buffer.from(archive), verify);
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

module.exports = {
  compress,
  decompress,
  compressDict,
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
