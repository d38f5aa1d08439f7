#!/usr/bin/env python
"""Host decode ladder: ours-API vs reference-core, interleaved.

ours-API = full `frame.decompress` (returns fresh bytes).
ref-core = the local .refbuild C library's `zxc_decompress` into a
PREALLOCATED reused buffer (its core with zero wrapper cost — the
conservative comparison). Archives are reference-encoded (cross-impl).
Rounds alternate A/B/B/A; medians reported (this VM drifts 15-40%).

Usage: [LADDER_MB=8] [LADDER_ROUNDS=9] python tools/host_ladder.py
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
from zxc_tpu.codec import frame
from zxc_tpu import runtime
from zxc_tpu.format import headers
import ref_oracle

MB = int(os.environ.get("LADDER_MB", "8"))
ROUNDS = int(os.environ.get("LADDER_ROUNDS", "9"))
BS = int(os.environ.get("LADDER_BLOCK", str(512 * 1024)))
LEVELS = [int(x) for x in os.environ.get("LADDER_LEVELS", "1,2,3,5,6,7").split(",")]


def main():
    raw = gen_corpus(MB << 20)
    L = ref_oracle.lib()
    dst = ctypes.create_string_buffer(len(raw) + 64)
    opts = ref_oracle.DecompressOpts(checksum_enabled=0)

    def ref_core(src):
        w = L.zxc_decompress(src, len(src), dst, len(raw),
                             ctypes.byref(opts))
        assert w == len(raw), w
        return dst.raw[:w]

    NL = runtime.lib()
    scratch = np.empty((MB << 20) + (1 << 21), np.uint8)
    scratch[:] = 0          # touch once: the reused-buffer core path
    vp = ctypes.c_void_p
    d8 = np.zeros(1, np.uint8)

    def ours_core(src_np, ck):
        return NL.zxch_decompress_frame(
            src_np.ctypes.data_as(vp), len(src_np), BS, ck, 0,
            d8.ctypes.data_as(vp), 0, None,
            scratch.ctypes.data_as(vp), len(scratch))

    NCPU = os.cpu_count() or 1

    def ours_mt(src_np, ck):
        return NL.zxch_decompress_frame_mt(
            src_np.ctypes.data_as(vp), len(src_np), BS, ck, 0,
            d8.ctypes.data_as(vp), 0, None,
            scratch.ctypes.data_as(vp), len(scratch), NCPU)

    # ours-out: the FULL Python API decoding into a warm caller-owned
    # buffer (frame.decompress(..., out=) — reference contract:
    # zxc_decompress into caller dst, include/zxc_buffer.h:98-210).
    # The delta between ours-API and ours-out is fresh-PyBytes page
    # faults, which dominate at >= 32 MiB.
    outbuf = np.empty((MB << 20) + 64, np.uint8)
    outbuf[:] = 0  # touch once

    print(f"# {MB} MiB pinned corpus, {BS//1024} KiB blocks, "
          f"{ROUNDS} interleaved rounds (medians). ours-API returns fresh"
          f" bytes; ours-out is the same API with out=<warm buffer>; "
          f"both -core columns reuse a preallocated buffer.")
    for lvl in LEVELS:
        arc = ref_oracle.ref_compress(raw, level=lvl, block_size=BS)
        ck = 1 if headers.read_file_header(arc).has_checksum else 0
        src_np = np.frombuffer(arc, np.uint8)
        assert frame.decompress(arc) == raw
        assert frame.decompress(arc, out=outbuf) == len(raw) \
            and outbuf[:len(raw)].tobytes() == raw
        assert ref_core(arc) == raw
        assert ours_core(src_np, ck) == len(raw)             and bytes(scratch[:len(raw)]) == raw
        t = {"ours": [], "out": [], "core": [], "mt": [], "ref": []}
        for r in range(ROUNDS):
            ks = ("ours", "out", "core", "mt", "ref")
            for k in (ks if r % 2 == 0 else ks[::-1]):
                t0 = time.time()
                if k == "ours":
                    frame.decompress(arc)
                elif k == "out":
                    frame.decompress(arc, out=outbuf)
                elif k == "core":
                    ours_core(src_np, ck)
                elif k == "mt":
                    ours_mt(src_np, ck)
                else:
                    L.zxc_decompress(arc, len(arc), dst, len(raw),
                                     ctypes.byref(opts))
                t[k].append(time.time() - t0)
        mo = statistics.median(t["ours"])
        mu = statistics.median(t["out"])
        mc = statistics.median(t["core"])
        mm = statistics.median(t["mt"])
        mr = statistics.median(t["ref"])
        print(f"L{lvl}: ours-API {MB/mo:6.0f}  ours-out {MB/mu:6.0f}  "
              f"ours-core {MB/mc:6.0f}  ours-mt{NCPU} {MB/mm:6.0f}  "
              f"ref-core {MB/mr:6.0f} MB/s  API/ref {mr/mo:.2f}x  "
              f"out/ref {mr/mu:.2f}x  out/core {mc/mu:.2f}x  "
              f"core/core {mr/mc:.2f}x  mt/ref {mr/mm:.2f}x")


if __name__ == "__main__":
    main()
