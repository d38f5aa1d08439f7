#!/usr/bin/env python
"""Encode ladder: ours vs reference, interleaved, sizes + speeds.

Both sides do the FULL frame encode (ours `frame.compress`, reference
`zxc_compress` through ctypes) on the pinned corpus. Rounds alternate
A/B/B/A; medians reported. Sizes are exact (printed once).

Usage: [LADDER_MB=8] [LADDER_ROUNDS=7] python tools/encode_ladder.py
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

from gen_corpus import gen_corpus
from zxc_tpu.codec import frame
from zxc_tpu.codec.frame import EncodeOpts
import ref_oracle

MB = int(os.environ.get("LADDER_MB", "8"))
ROUNDS = int(os.environ.get("LADDER_ROUNDS", "7"))
BS = int(os.environ.get("LADDER_BLOCK", str(512 * 1024)))
LEVELS = [int(x) for x in os.environ.get("LADDER_LEVELS", "1,2,3,5,6,7").split(",")]


def main():
    raw = gen_corpus(MB << 20)
    print(f"# {MB} MiB pinned corpus, {BS//1024} KiB blocks, "
          f"{ROUNDS} interleaved rounds (medians)")
    for lvl in LEVELS:
        opts = EncodeOpts(level=lvl, block_size=BS)
        ours_sz = len(frame.compress(raw, opts))
        ref_sz = len(ref_oracle.ref_compress(raw, level=lvl, block_size=BS))
        t = {"ours": [], "ref": []}
        for r in range(ROUNDS):
            for k in (("ours", "ref") if r % 2 == 0 else ("ref", "ours")):
                t0 = time.time()
                if k == "ours":
                    frame.compress(raw, opts)
                else:
                    ref_oracle.ref_compress(raw, level=lvl, block_size=BS)
                t[k].append(time.time() - t0)
        mo = statistics.median(t["ours"])
        mr = statistics.median(t["ref"])
        print(f"L{lvl}: ours {MB/mo:6.1f} MB/s {ours_sz:8d} B | "
              f"ref {MB/mr:6.1f} MB/s {ref_sz:8d} B | "
              f"speed {mr/mo:.2f}x size {100*(ours_sz-ref_sz)/ref_sz:+.1f}%")


if __name__ == "__main__":
    main()
