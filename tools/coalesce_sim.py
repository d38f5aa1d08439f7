#!/usr/bin/env python
"""Simulate host-side piece coalescing policies on the pinned corpus.

The v15 kernel is issue-bound per quad (~292 ns for up to 128 lane-ops),
so device time ~ ops/128. Merging a run of n consecutive short pieces
into ONE materialized piece saves (n-1) ops for T bytes of host memcpy
and T bytes of lit_full growth. This sweeps the (S=max piece len in a
run, C=bytes-copied-per-op-saved cap) policy space and reports predicted
op counts + lit growth, then cross-checks real quad counts via the
actual v15 packer for the best point.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

from gen_corpus import gen_corpus
from zxc_tpu import runtime
from zxc_tpu.ops import batch as OB

MB = int(os.environ.get("SIM_MB", "8"))
LEVEL = int(os.environ.get("SIM_LEVEL", "3"))
BLOCK = int(os.environ.get("SIM_BLOCK", str(64 * 1024)))

data = gen_corpus(MB << 20)
try:
    import ref_oracle
    arc = ref_oracle.ref_compress(data, level=LEVEL, block_size=BLOCK)
    src = "ref"
except Exception:
    from zxc_tpu.codec import frame
    from zxc_tpu.codec.frame import EncodeOpts
    arc = frame.compress(data, EncodeOpts(level=LEVEL, block_size=BLOCK))
    src = "own"
plan = OB.plan_frame(arc)
print(f"corpus {len(data)} B, {src} archive {len(arc)} B, "
      f"{plan.n_blocks} blocks of {BLOCK}")

pieces, lits = [], []
for i in range(plan.n_blocks):
    r = runtime.resolve_pieces(plan.ll[i], plan.ml[i], plan.off[i],
                               plan.lit[i], plan.dict_buf,
                               device_pure=True, max_frag=1)
    assert r is not None
    pieces.append(r[:4])
    lits.append(r[4])


def ops_count(po, total):
    """lane ops = pieces split at 128-byte output boundaries."""
    ends = np.append(po[1:], total).astype(np.int64)
    starts = po.astype(np.int64)
    # number of 128-boundaries strictly inside (start, end)
    return int(np.sum((ends - 1) // 128 - starts // 128 + 1))


def simulate(po, pk, total, S, C):
    """Greedy: accumulate runs of consecutive pieces with len < S; merge
    a run (materialize) if T <= C*(n-1). Returns (new piece starts, lit
    growth)."""
    ends = np.append(po[1:], total).astype(np.int64)
    lens = ends - po
    short = lens < S
    new_po = []
    grow = 0
    i = 0
    n = len(po)
    while i < n:
        if not short[i]:
            new_po.append(po[i])
            i += 1
            continue
        j = i
        while j < n and short[j]:
            j += 1
        cnt = j - i
        T = int(ends[j - 1] - po[i])
        if cnt >= 2 and T <= C * (cnt - 1):
            new_po.append(po[i])
            grow += T
        else:
            new_po.extend(po[i:j])
        i = j
    return np.array(new_po, np.int64), grow


tot_ops0 = sum(ops_count(p[0], t) for p, t in zip(pieces, plan.totals))
tot_pieces0 = sum(len(p[0]) for p in pieces)
tot_lit0 = sum(len(l) for l in lits)
print(f"baseline: {tot_pieces0} pieces, {tot_ops0} ops, "
      f"lit_full {tot_lit0} B ({tot_lit0/len(data):.2%} of out), "
      f"{len(data)/tot_ops0:.1f} B/op")

# piece length histogram
all_lens = np.concatenate([
    np.append(p[0][1:], t) - p[0] for p, t in zip(pieces, plan.totals)])
for edge in [4, 8, 16, 32, 64, 128, 1 << 30]:
    lo = 0 if edge == 4 else prev
    cnt = int(((all_lens >= lo) & (all_lens < edge)).sum())
    byt = int(all_lens[(all_lens >= lo) & (all_lens < edge)].sum())
    print(f"  len [{lo:4d},{edge:4d}): {cnt:8d} pieces ({cnt/len(all_lens):5.1%}) "
          f"{byt:9d} B ({byt/len(data):5.1%})")
    prev = edge

for S in [16, 32, 64, 128, 1 << 30]:
    for C in [32, 64, 128, 256]:
        ops = 0
        grow = 0
        for p, t in zip(pieces, plan.totals):
            npo, g = simulate(p[0], p[3], t, S, C)
            ops += ops_count(npo, t)
            grow += g
        print(f"S={S:>10} C={C:3d}: ops {ops:8d} ({ops/tot_ops0:5.1%}) "
              f"lit +{grow/1e6:6.2f} MB (+{grow/tot_lit0:5.1%}) "
              f"pred speedup {tot_ops0/ops:.2f}x")
