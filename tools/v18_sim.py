#!/usr/bin/env python
"""Simulate v18 packing: slot index == target row, one MXU matmul/quad.

v15 quads do 2 dependent (128,128) matmuls (source gather + target
permute) and sit at the MXU issue floor. If each quad holds at most ONE
op per target row, slots can be laid out so slot i IS target row i and
the permute matmul disappears. Cost: quads per source-window group =
max target-row multiplicity in the group (vs ceil(n/128)), so packing
utilization drops. This measures, on the real pinned-corpus piece
tables, whether matmul count actually halves.
"""
import os
import sys

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
v18_quads = 0
v18_quads_nowin = 0     # ignore window constraint (upper bound)
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
            v18_quads += 1
            v18_quads_nowin += 1
            continue
        er = np.concatenate(ers)
        tg = np.concatenate(tgts)
        order = np.argsort(er, kind="stable")
        er = er[order]
        tg = tg[order]
        n = len(er)
        tot_ops += n

        # v15: 128-op window chunks, pad to even
        i = 0
        q15 = 0
        while i < n:
            base = int(er[i]) & ~15
            j = min(i + 128, n)
            while er[j - 1] - base > 127:
                j -= 1
            q15 += 1
            i = j
        q15 += q15 & 1
        v15_quads += q15

        # v18: maximal window spans (no op cap), quads = max tgt mult
        i = 0
        q18 = 0
        while i < n:
            base = int(er[i]) & ~15
            j = n
            # er sorted: find first op beyond window
            j = i + int(np.searchsorted(er[i:], base + 128))
            mult = np.bincount(tg[i:j], minlength=128).max()
            q18 += int(mult)
            i = j
        v18_quads += q18
        v18_quads_nowin += int(np.bincount(tg, minlength=128).max())

print(f"ops {tot_ops}: v15 quads {v15_quads} (2 mm) = {2*v15_quads} matmuls, "
      f"util {tot_ops/(128*v15_quads):.2f}")
print(f"v18 quads {v18_quads} (1 mm) = {v18_quads} matmuls, "
      f"util {tot_ops/(128*v18_quads):.2f}; "
      f"matmul ratio {v18_quads/(2*v15_quads):.2f}")
print(f"v18 no-window bound: {v18_quads_nowin} matmuls "
      f"(ratio {v18_quads_nowin/(2*v15_quads):.2f})")
