#!/usr/bin/env python
"""Decode cost attribution by stubbed-copy timing variants.

Builds of libzxchost with the literal / match copies replaced by a
single blind 32 B store (timing-only: output bytes are WRONG, the walk
and the section decode are unchanged) are timed same-process and
interleaved on reference-encoded archives. The deltas attribute the
per-sequence wall between the three components the loop actually runs:
the section walk (token/word loads, checks, bookkeeping), the literal
copy, and the match copy. This is the sanity instrument for "where do
8 cycles/seq go" claims — stubs keep the loads/stores' ADDRESS pattern
partially intact, so the split is indicative, not exact.

Usage: python tools/decode_cost_split.py  (expects /tmp/zxch_{base,
match,lit,both}.so built from tools-generated variant source)
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

MB = int(os.environ.get("SPLIT_MB", "8"))
ROUNDS = int(os.environ.get("SPLIT_ROUNDS", "9"))
BS = 512 * 1024
LEVELS = [int(x) for x in os.environ.get("SPLIT_LEVELS", "1,3").split(",")]
VARIANTS = os.environ.get("SPLIT_VARIANTS",
                          "base,match,lit,both").split(",")


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
    from zxc_tpu.format import headers
    raw = gen_corpus(MB << 20)
    fns = {v: bind(f"/tmp/zxch_{v}.so") for v in VARIANTS}
    scratch = np.zeros((MB << 20) + (1 << 21), np.uint8)
    d8 = np.zeros(1, np.uint8)
    vp = ctypes.c_void_p
    for lvl in LEVELS:
        arc = ref_oracle.ref_compress(raw, level=lvl, block_size=BS)
        ck = 1 if headers.read_file_header(arc).has_checksum else 0
        src = np.frombuffer(arc, np.uint8)
        t = {v: [] for v in VARIANTS}
        for r in range(ROUNDS):
            order = VARIANTS if r % 2 == 0 else VARIANTS[::-1]
            for v in order:
                t0 = time.perf_counter()
                rc = fns[v](src.ctypes.data_as(vp), len(src), BS, ck, 0,
                            d8.ctypes.data_as(vp), 0, None,
                            scratch.ctypes.data_as(vp), len(scratch))
                dt = time.perf_counter() - t0
                if v == "base":
                    assert rc == len(raw), rc
                t[v].append(dt)
        med = {v: statistics.median(t[v]) for v in VARIANTS}
        base = med["base"]
        parts = [f"L{lvl}: base {MB/base:6.0f} MB/s"]
        for v in VARIANTS[1:]:
            parts.append(f"{v} {MB/med[v]:6.0f} MB/s "
                         f"(saves {100*(base-med[v])/base:+.1f}%)")
        print(" | ".join(parts), flush=True)


if __name__ == "__main__":
    main()
