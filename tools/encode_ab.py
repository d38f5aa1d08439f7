#!/usr/bin/env python
"""Same-process encode A/B: two libzxchost.so builds, interleaved.

The encode twin of decode_ab.py — the honest harness for matcher/emitter
changes on this drifting VM. Loads OLD and NEW builds with separate
ctypes handles, times zxch_simple_compress on the pinned corpus
(A/B/B/A interleaved, medians), prints exact sizes from BOTH builds and
cross-decodes the NEW archive through the reference C library so a
speed win can never hide an invalid bitstream.

Usage: AB_OLD=/tmp/zxch_base.so [AB_NEW=zxc_tpu/runtime/libzxchost.so]
       [AB_MB=8] [AB_ROUNDS=9] [AB_LEVELS=1,2,3] python tools/encode_ab.py
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
import ref_oracle

MB = int(os.environ.get("AB_MB", "8"))
ROUNDS = int(os.environ.get("AB_ROUNDS", "9"))
BS = int(os.environ.get("AB_BLOCK", str(512 * 1024)))
LEVELS = [int(x) for x in os.environ.get("AB_LEVELS", "1,2,3").split(",")]
OLD = os.environ.get("AB_OLD", "/tmp/zxch_base.so")
NEW = os.environ.get("AB_NEW", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..",
    "zxc_tpu", "runtime", "libzxchost.so"))


def bind(path):
    L = ctypes.CDLL(path)
    fn = L.zxch_simple_compress
    fn.restype = ctypes.c_int64
    fn.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int,
                   ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
                   ctypes.c_void_p, ctypes.c_uint64]
    return fn


def main():
    raw = gen_corpus(MB << 20)
    fo = bind(OLD)
    fn = bind(NEW)
    src = np.frombuffer(raw, np.uint8)
    dst = np.empty((MB << 20) + (MB << 18) + (1 << 20), np.uint8)
    vp = ctypes.c_void_p
    for lvl in LEVELS:
        def run(f):
            w = f(src.ctypes.data_as(vp), len(raw), lvl, BS, 0, 0,
                  dst.ctypes.data_as(vp), len(dst))
            assert w > 0, w
            return int(w)

        sz_old = run(fo)
        sz_new = run(fn)
        # validity: the NEW build's archive must decode bit-exactly
        # through the reference C implementation
        back = ref_oracle.ref_decompress(bytes(dst[:sz_new]), len(raw))
        assert back == raw, "NEW archive fails reference cross-decode"
        t = {"old": [], "new": []}
        for r in range(ROUNDS):
            for k in (("old", "new") if r % 2 == 0 else ("new", "old")):
                t0 = time.time()
                run(fo if k == "old" else fn)
                t[k].append(time.time() - t0)
        mo = statistics.median(t["old"])
        mn = statistics.median(t["new"])
        print(f"L{lvl}: old {MB/mo:6.1f} MB/s {sz_old:8d} B | "
              f"new {MB/mn:6.1f} MB/s {sz_new:8d} B | "
              f"new/old {mo/mn:.3f}x size {100*(sz_new-sz_old)/sz_old:+.2f}%",
              flush=True)


if __name__ == "__main__":
    main()
