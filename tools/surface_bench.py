#!/usr/bin/env python
"""Measured numbers for the BASELINE.json surface configs that the
level ladders don't cover: dictionary compression over many small
files, seekable random access, and pstream streaming decode.

All deterministic (pinned corpus slices), interleaved where a
reference comparison exists. Prints a markdown-ish block for PERF.md.

Usage: JAX_PLATFORMS=cpu python tools/surface_bench.py
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import numpy as np
from gen_corpus import gen_corpus
from zxc_tpu.codec import frame, dict_train, seekable, pstream
from zxc_tpu.codec.frame import EncodeOpts, DecodeOpts
import ref_oracle


def bench_dict():
    """Many-small-files with a trained dictionary (BASELINE config 3)."""
    raw = gen_corpus(4 << 20)
    # 1000 "files" of ~2-6 KB with shared structure (corpus slices with a
    # common header glued on — the classic dict-compression shape)
    rng = np.random.default_rng(7)
    files = []
    hdr = b'{"schema":"zxc-bench-v1","fields":["ts","lvl","msg"],"row":'
    pos = 0
    for i in range(1000):
        n = int(rng.integers(2000, 6000))
        files.append(hdr + raw[pos:pos + n])
        pos = (pos + n) % (len(raw) - 8000)
    total = sum(len(f) for f in files)
    d = dict_train.dict_train(files[:200], target_size=16384)
    opts = EncodeOpts(level=3, block_size=64 * 1024,
                      dict_content=d.content, dict_huf=d.huf_lengths)
    nodict = EncodeOpts(level=3, block_size=64 * 1024)
    t0 = time.time()
    sz_d = sum(len(frame.compress(f, opts)) for f in files)
    t_d = time.time() - t0
    sz_n = sum(len(frame.compress(f, nodict)) for f in files)
    # cross-impl: the reference encoder with the SAME trained dictionary
    import ctypes
    L = ref_oracle.lib()
    dc = ctypes.create_string_buffer(d.content, len(d.content))
    dh = ctypes.create_string_buffer(d.huf_lengths, len(d.huf_lengths))
    ropts = ref_oracle.CompressOpts(
        level=3, block_size=64 * 1024,
        dict=ctypes.cast(dc, ctypes.c_void_p),
        dict_size=len(d.content),
        dict_huf=ctypes.cast(dh, ctypes.c_void_p))
    sz_r = 0
    t0 = time.time()
    for f in files:
        bound = L.zxc_compress_bound(len(f)) + 64 * 1024 + 4096
        dst = ctypes.create_string_buffer(bound)
        n = L.zxc_compress(f, len(f), dst, bound, ctypes.byref(ropts))
        assert n > 0, n
        sz_r += n
    t_r = time.time() - t0
    # decode-with-dict throughput
    arcs = [frame.compress(f, opts) for f in files]
    dopts = DecodeOpts(dict_content=d.content, dict_huf=d.huf_lengths)
    for a, f in zip(arcs[:10], files[:10]):
        assert frame.decompress(a, dopts) == f
    t0 = time.time()
    for a in arcs:
        frame.decompress(a, dopts)
    t_dec = time.time() - t0
    print(f"dict over 1000 small files ({total/1e6:.1f} MB): "
          f"no-dict {sz_n/total:.1%}, dict {sz_d/total:.1%} "
          f"({(sz_d-sz_n)/sz_n:+.1%} vs no-dict); ref+same-dict "
          f"{sz_r/total:.1%} (ours {(sz_d-sz_r)/sz_r:+.1%} vs ref); "
          f"encode {total/1e6/t_d:.0f} (ref {total/1e6/t_r:.0f}) MB/s, "
          f"decode {total/1e6/t_dec:.0f} MB/s")


def bench_seekable():
    """O(1) random access into a seekable archive (BASELINE config 4)."""
    raw = gen_corpus(32 << 20)
    arc = frame.compress(raw, EncodeOpts(level=3, block_size=256 * 1024,
                                         seekable=True))
    sk = seekable.Seekable.open_bytes(arc)
    rng = np.random.default_rng(11)
    offs = rng.integers(0, len(raw) - 4096, 200)
    for o in offs[:5]:
        assert sk.decompress_range(int(o), 4096) == raw[o:o + 4096]
    t0 = time.time()
    for o in offs:
        sk.decompress_range(int(o), 4096)
    t_r = (time.time() - t0) / len(offs)
    t0 = time.time()
    frame.decompress(arc)
    t_full = time.time() - t0
    print(f"seekable ({len(raw)>>20} MiB archive, 256 KiB blocks): "
          f"4 KiB random read {t_r*1e6:.0f} us vs full decode "
          f"{t_full*1e3:.0f} ms ({t_full/t_r:.0f}x; one-block work per read)")


def bench_pstream():
    """Push-streaming decode throughput (BASELINE config 4)."""
    raw = gen_corpus(16 << 20)
    arc = frame.compress(raw, EncodeOpts(level=3, block_size=256 * 1024))
    CH = 64 * 1024
    def run():
        return pstream.stream_decompress(arc, chunk=CH)
    assert run() == raw
    ts = []
    for _ in range(5):
        t0 = time.time()
        run()
        ts.append(time.time() - t0)
    t = statistics.median(ts)
    print(f"pstream decode ({len(raw)>>20} MiB, 64 KiB pushes): "
          f"{len(raw)/1e6/t:.0f} MB/s")


if __name__ == "__main__":
    bench_dict()
    bench_seekable()
    bench_pstream()
