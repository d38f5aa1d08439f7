#!/usr/bin/env python
"""Quad-count simulation for gather-window widths beyond 128 rows.

v19 chunks each supertile's slot list into quads of <= 128 slots whose
source rows fit a 128-row window (pack_blocks_v19's inner while). The
v12 ablation measured the gather matmul's cost ~flat in the contraction
dim (K=128 vs K=528 — issue/drain-bound), so a (128, W) one-hot against
a (W, 128) window could serve W-row spans at the same MXU issue cost,
trading VPU one-hot-compare width for fewer quads. This measures the
ONLY quantity that decides it: how many quads the span break actually
costs at W=128 vs 256/512/1024 on real piece tables.

Usage: [SIM_MB=8] [SIM_LEVEL=3] python tools/v24_window_sim.py
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
K = 2

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
WINS = (128, 256, 512, 1024, 1 << 30)
quads = Counter()          # window -> quad count (incl. align padding)
span_breaks = Counter()    # window -> quads ended by the span test
for (rows, rl, s, e, tile_start) in per:
    nts = len(tile_start) - 1
    for st in range(NST):
        parts = []
        for g in range(GRP):
            t = st * GRP + g
            if t >= nts:
                break
            b0, b1 = tile_start[t], tile_start[t + 1]
            if b1 <= b0:
                continue
            er = rows[b0:b1].reshape(-1)
            es = s[b0:b1].reshape(-1)
            ee = e[b0:b1].reshape(-1)
            live = np.nonzero(ee > es)[0]
            if not len(live):
                continue
            tgt = (live & 31) + 32 * g
            parts.append(np.stack([er[live], tgt], axis=1))
        if not parts:
            for W in WINS:
                quads[W] += 2   # empty quad + align pad, as the packer does
            continue
        ops = np.concatenate(parts, axis=0)
        key = ops[:, 0] * 128 + ops[:, 1]
        order = np.argsort(key, kind="stable")
        ops = ops[order]
        ks = key[order]
        new = np.r_[True, ks[1:] != ks[:-1]]
        gid = np.cumsum(new) - 1
        gstart = np.flatnonzero(new)
        within = np.arange(len(ks)) - gstart[gid]
        gsizes = np.diff(np.r_[gstart, len(ks)])
        spg = -(-gsizes // K)
        sbase = np.r_[0, np.cumsum(spg)[:-1]]
        n_slots = int(spg.sum())
        ssrc = np.zeros(n_slots, np.int64)
        slot_of = sbase[gid] + within // K
        ssrc[slot_of] = ops[:, 0]
        for W in WINS:
            i = 0
            nq = 0
            while i < n_slots:
                base = int(ssrc[i]) & ~15
                j = min(i + 128, n_slots)
                spanned = False
                while ssrc[j - 1] - base > W - 1:
                    j -= 1
                    spanned = True
                if spanned:
                    span_breaks[W] += 1
                nq += 1
                i = j
            nq += nq % 2   # quad_align=2
            quads[W] += nq

base = quads[128]
print(f"{MB} MiB L{LEVEL}: slots chunked at K={K}")
for W in WINS:
    wname = "inf" if W == (1 << 30) else str(W)
    print(f"  W={wname:>4}: quads {quads[W]:6d} ({quads[W]/base:.3f}x of"
          f" W=128), span-breaks {span_breaks[W]}")
