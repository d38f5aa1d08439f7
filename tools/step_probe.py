#!/usr/bin/env python
"""Miss-path step economics probe (fast tier L1-L3).

The reference's fast levels start the miss-path skip at step_base=4 (L1)
/ 3 with shift 6 (L2) (zxc_get_lz77_params, zxc_internal.h:951-965) —
every miss advances multiple positions, trading match opportunities
(size) for a large cut in searches+inserts on miss-heavy regions. Ours
uses step_base=1 everywhere. We hold a -14.5..-23.6% size margin on
every gate corpus, so this probe measures what that margin buys:
interleaved same-process A/B of step variants vs the current ladder vs
the reference, speed + exact sizes.

Usage: [PROBE_MB=8] [PROBE_ROUNDS=7] python tools/step_probe.py
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

from gen_corpus import gen_corpus
from zxc_tpu.codec import block_encode, frame
from zxc_tpu.codec.frame import EncodeOpts
import ref_oracle

MB = int(os.environ.get("PROBE_MB", "8"))
ROUNDS = int(os.environ.get("PROBE_ROUNDS", "7"))
BS = 512 * 1024

LP = block_encode.LevelParams
BASE = block_encode.level_params

# variant tables: level -> LevelParams override
VARIANTS = {
    "cur": {},
    "sb4": {1: LP(2, False, 8, 16, 4, 4, 4),
            2: LP(3, False, 8, 24, 3, 6, 4),
            3: LP(5, True, 8, 32, 2, 5, 4)},
    "sb2": {1: LP(2, False, 8, 16, 2, 4, 4),
            2: LP(3, False, 8, 24, 2, 5, 4),
            3: LP(5, True, 8, 32, 1, 4, 4)},
}


def with_params(table):
    def lp(level):
        return table.get(level, BASE(level))
    return lp


def main():
    raw = gen_corpus(MB << 20)
    names = list(VARIANTS)
    for lvl in (1, 2, 3):
        opts = EncodeOpts(level=lvl, block_size=BS)
        sizes = {}
        for name, table in VARIANTS.items():
            block_encode_level_params = block_encode.level_params
            block_encode.level_params = with_params(table)
            try:
                sizes[name] = len(frame.compress(raw, opts))
            finally:
                block_encode.level_params = block_encode_level_params
        ref_sz = len(ref_oracle.ref_compress(raw, level=lvl, block_size=BS))
        t = {n: [] for n in names + ["ref"]}
        for r in range(ROUNDS):
            order = names + ["ref"]
            if r % 2:
                order = order[::-1]
            for name in order:
                if name == "ref":
                    t0 = time.time()
                    ref_oracle.ref_compress(raw, level=lvl, block_size=BS)
                    t[name].append(time.time() - t0)
                    continue
                saved = block_encode.level_params
                block_encode.level_params = with_params(VARIANTS[name])
                try:
                    t0 = time.time()
                    frame.compress(raw, opts)
                    t[name].append(time.time() - t0)
                finally:
                    block_encode.level_params = saved
        mref = statistics.median(t["ref"])
        line = [f"L{lvl}: ref {MB/mref:6.1f} MB/s {ref_sz:8d} B"]
        for name in names:
            m = statistics.median(t[name])
            line.append(f"{name} {MB/m:6.1f} MB/s ({(mref and (MB/m)/(MB/mref)):.2f}x) "
                        f"{sizes[name]:8d} B ({100*(sizes[name]-ref_sz)/ref_sz:+.1f}%)")
        print(" | ".join(line), flush=True)


if __name__ == "__main__":
    main()
