'use strict';
const assert = require('assert');
const zxc = require('..');

// roundtrip at several levels
const data = Buffer.concat([
  Buffer.from('the quick brown fox '.repeat(4000)),
  Buffer.from(Array.from({ length: 50000 }, (_, i) => (i * 7) % 251)),
]);
for (const level of [1, 2, 3, 5]) {
  const arc = zxc.compress(data, { level, checksum: true, seekable: true });
  assert(arc.length < data.length, `level ${level} did not compress`);
  assert.strictEqual(zxc.getDecompressedSize(arc), data.length);
  const out = zxc.decompress(arc);
  assert(out.equals(data), `level ${level} roundtrip mismatch`);
  // seekable range
  const slice = zxc.seekableRange(arc, 60000, 5000);
  assert(slice.equals(data.subarray(60000, 65000)),
         `level ${level} range mismatch`);
  const info = zxc.frameInfo(arc);
  assert.strictEqual(info.hasChecksum, true);
}

// corrupt archives must throw, never crash
const arc = zxc.compress(data, { level: 3, checksum: true });
for (const mut of [arc.subarray(0, 40), Buffer.from([1, 2, 3])]) {
  assert.throws(() => zxc.decompress(mut));
}
const bad = Buffer.from(arc);
bad[100] ^= 0xff;
assert.throws(() => zxc.decompress(bad));

// shared-dictionary roundtrip (header carries the dict id; decoding
// without the dictionary must fail)
const dict = { content: Buffer.alloc(2048, 'json rows with common keys ') };
const small = Buffer.alloc(4096, 'json rows with common keys and vals ');
const darc = zxc.compressDict(small, dict, { level: 3, checksum: true });
assert(zxc.frameInfo(darc).dictId !== 0);
assert(zxc.decompressDict(darc, dict).equals(small));
assert.throws(() => zxc.decompress(darc));

console.log('zxc-tpu node binding: all tests passed');

// dictionary trainer (reference zxc_dict_train parity)
{
  const samples = [];
  for (let i = 0; i < 12; i++) {
    samples.push(Buffer.alloc(800 + 40 * i,
                              'json rows with common keys and payload '));
  }
  const trained = zxc.trainDict(samples, 4096);
  assert(trained.content.length > 0 && trained.codeLen.length === 256);
  const doc = samples[0];
  const plain = zxc.compress(doc, { level: 3, blockSize: 4096 });
  const witness = zxc.compressDict(doc, trained, { level: 3, blockSize: 4096 });
  assert(witness.length < plain.length, 'trained dict must improve ratio');
  assert(zxc.decompressDict(witness, trained).equals(doc));
}
