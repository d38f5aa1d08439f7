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

module.exports = {
  compress,
  decompress,
  getDecompressedSize: (a) => addon.getDecompressedSize(Buffer.from(a)),
  frameInfo: (a) => addon.frameInfo(Buffer.from(a)),
  seekableRange: (a, off, len) =>
      addon.seekableRange(Buffer.from(a), off, len),
};
