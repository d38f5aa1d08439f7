#!/usr/bin/env python
"""Simulate v19 packing: ops sharing (src_row, tgt_row) share a slot.

A v15 slot carries ONE op = (src row, rotate, lane range). Ops with the
same source row AND same target row can share a slot if the kernel
applies K rotate+mask passes over the gathered rows (VPU work) instead
of 1. Literal pieces cluster: consecutive literal ops of one output row
read the same lit_full row. This measures the slot-collapse factor on
the real pinned-corpus piece tables for K=1,2,3,4,8.
"""
import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

from gen_corpus import gen_corpus
from zxc_tpu import runtime
from zxc_tpu.ops import batch as OB
from zxc_tpu.ops import pallas_decode as PD

MB = int(os.environ.get("SIM_MB", "8"))
LEVEL = int(os.environ.get("SIM_LEVEL", "3"))
BLOCK = int(os.environ.get("SIM_BLOCK", str(64 * 1024)))

data = gen_corpus(MB << 20)
try:
    import ref_oracle
    arc = ref_oracle.ref_compress(data, level=LEVEL, block_size=BLOCK)
except Exception:
    from zxc_tpu.codec import frame
    from zxc_tpu.codec.frame import EncodeOpts
    arc = frame.compress(data, EncodeOpts(level=LEVEL, block_size=BLOCK))
plan = OB.plan_frame(arc)
pieces, lits = [], []
for i in range(plan.n_blocks):
    r = runtime.resolve_pieces(plan.ll[i], plan.ml[i], plan.off[i],
                               plan.lit[i], plan.dict_buf,
                               device_pure=True, max_frag=1)
    pieces.append(r[:4])
    lits.append(r[4])

per = PD.lane_ops_blocks(pieces, list(plan.totals))

GRP = 4
NST = BLOCK // 16384
tot_ops = 0
v15_quads = 0
slot_tot = {k: 0 for k in (1, 2, 3, 4, 8)}
quads_k = {k: 0 for k in (1, 2, 3, 4, 8)}
group_hist = Counter()
for (rows, rl, s, e, tile_start) in per:
    nts = len(tile_start) - 1
    for st in range(NST):
        ers, tgts = [], []
        for g in range(GRP):
            t = st * GRP + g
            if t >= nts:
                break
            b0, b1 = tile_start[t], tile_start[t + 1]
            if b1 <= b0:
                continue
            er = rows[b0:b1].reshape(-1)
            ee = e[b0:b1].reshape(-1)
            es = s[b0:b1].reshape(-1)
            live = np.nonzero(ee > es)[0]
            if not len(live):
                continue
            ers.append(er[live])
            tgts.append((live & 31) + 32 * g)
        if not ers:
            v15_quads += 2
            for k in quads_k:
                quads_k[k] += 2
            continue
        er = np.concatenate(ers)
        tg = np.concatenate(tgts)
        n = len(er)
        tot_ops += n

        # group sizes by (src,tgt)
        key = er.astype(np.int64) * 128 + tg
        _, counts = np.unique(key, return_counts=True)
        for c in counts:
            group_hist[min(int(c), 16)] += 1

        # v15 quads: sorted by src, 128-op chunks, pad even
        order = np.argsort(er, kind="stable")
        ers_s = er[order]
        i = 0
        q15 = 0
        while i < n:
            base = int(ers_s[i]) & ~15
            j = min(i + 128, n)
            while ers_s[j - 1] - base > 127:
                j -= 1
            q15 += 1
            i = j
        q15 += q15 & 1
        v15_quads += q15

        for K in slot_tot:
            ns = int(np.ceil(counts / K).sum())
            slot_tot[K] += ns
            # quad estimate: slots sorted by src row, 128-slot window chunks
            # build slot src list
            srcs = np.repeat(np.unique(key) // 128,
                             np.ceil(counts / K).astype(int))
            srcs = np.sort(srcs)
            i = 0
            q = 0
            m = len(srcs)
            while i < m:
                base = int(srcs[i]) & ~15
                j = min(i + 128, m)
                while srcs[j - 1] - base > 127:
                    j -= 1
                q += 1
                i = j
            q += q & 1
            quads_k[K] += q

print(f"ops {tot_ops}, v15 quads {v15_quads} -> {2*v15_quads} matmuls, "
      f"t_mxu = {2*v15_quads*146e-9*1e3:.2f} ms")
print("group-size histogram (ops per (src,tgt) group):")
tot_g = sum(group_hist.values())
for sz in sorted(group_hist):
    print(f"  {sz:3d}{'+' if sz == 16 else ' '}: {group_hist[sz]:8d} "
          f"({group_hist[sz]/tot_g:5.1%})")
for K in sorted(slot_tot):
    q = quads_k[K]
    mm = 2 * q
    # VPU adds ~(K-1) rotate+mask passes per quad; rough 60ns each
    t_mxu = mm * 146e-9
    print(f"K={K}: slots {slot_tot[K]:8d} ({slot_tot[K]/tot_ops:5.2f}x ops) "
          f"quads {q:6d} matmuls {mm:6d} t_mxu {t_mxu*1e3:.2f} ms "
          f"(v15 ratio {mm/(2*v15_quads):.2f})")
