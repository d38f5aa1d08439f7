#!/usr/bin/env python
"""Same-process decode A/B: two libzxchost.so builds, interleaved.

Loads two .so files with separate ctypes handles (RTLD_LOCAL keeps the
symbol sets apart) and times zxch_decompress_frame on reference-encoded
archives of the pinned corpus, A/B/B/A interleaved, medians. This is the
honest harness for decode-loop changes on this drifting VM — cross-run
ladder comparisons mix in machine state.

Usage: AB_OLD=/tmp/zxch_base.so [AB_NEW=zxc_tpu/runtime/libzxchost.so]
       [AB_MB=8] [AB_ROUNDS=9] [AB_LEVELS=1,2,3,5] python tools/decode_ab.py
"""
import ctypes
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import numpy as np
from gen_corpus import gen_corpus
from zxc_tpu.format import headers
import ref_oracle

MB = int(os.environ.get("AB_MB", "8"))
ROUNDS = int(os.environ.get("AB_ROUNDS", "9"))
BS = 512 * 1024
LEVELS = [int(x) for x in os.environ.get("AB_LEVELS", "1,2,3,5").split(",")]
OLD = os.environ.get("AB_OLD", "/tmp/zxch_base.so")
NEW = os.environ.get("AB_NEW", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..",
    "zxc_tpu", "runtime", "libzxchost.so"))


def bind(path):
    L = ctypes.CDLL(path)
    fn = L.zxch_decompress_frame
    fn.restype = ctypes.c_int64
    fn.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
                   ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
                   ctypes.c_uint64, ctypes.c_void_p,
                   ctypes.c_void_p, ctypes.c_uint64]
    return fn


def main():
    raw = gen_corpus(MB << 20)
    fo = bind(OLD)
    fn = bind(NEW)
    scratch = np.empty((MB << 20) + (1 << 21), np.uint8)
    scratch[:] = 0
    d8 = np.zeros(1, np.uint8)
    vp = ctypes.c_void_p
    for lvl in LEVELS:
        arc = ref_oracle.ref_compress(raw, level=lvl, block_size=BS)
        ck = 1 if headers.read_file_header(arc).has_checksum else 0
        src = np.frombuffer(arc, np.uint8)

        def run(f):
            w = f(src.ctypes.data_as(vp), len(src), BS, ck, 0,
                  d8.ctypes.data_as(vp), 0, None,
                  scratch.ctypes.data_as(vp), len(scratch))
            assert w == len(raw), w

        run(fo)
        assert bytes(scratch[:len(raw)]) == raw
        scratch[:len(raw)] = 0
        run(fn)
        assert bytes(scratch[:len(raw)]) == raw, "NEW build output mismatch"
        t = {"old": [], "new": []}
        for r in range(ROUNDS):
            for k in (("old", "new") if r % 2 == 0 else ("new", "old")):
                t0 = time.time()
                run(fo if k == "old" else fn)
                t[k].append(time.time() - t0)
        mo = statistics.median(t["old"])
        mn = statistics.median(t["new"])
        print(f"L{lvl}: old {MB/mo:6.0f} MB/s  new {MB/mn:6.0f} MB/s  "
              f"new/old {mo/mn:.3f}x", flush=True)


if __name__ == "__main__":
    main()
