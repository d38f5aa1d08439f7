#!/usr/bin/env python
"""Interleaved A/B probe of two decode kernel variants on hardware.

Cross-run device timings drift 30-60% on this shared/tunneled chip, so
single-variant probes mis-rank (observed: v15 measured 3.30 then 2.10
GB/s in adjacent sessions). This compiles BOTH variants in one process
and alternates marginal (K-rep slope) measurements A,B,A,B,... taking
the best-of per variant from interleaved samples.

Usage: PROBE_A=15 PROBE_B=19 [PROBE_KSUB=2] python tools/tpu_ab_probe.py
"""
import functools
import os
import sys
import time

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
sys.path[:0] = [os.path.join(sys.path[0], "tests"), os.path.join(sys.path[0], "tools")]

import numpy as np
import jax
import jax.numpy as jnp

from zxc_tpu.ops import plan_frame
import kernel_attic as PD  # superset view: live kernels + rejected generations
from zxc_tpu import runtime

MB = int(os.environ.get("PROBE_MB", "8"))
LEVEL = int(os.environ.get("PROBE_LEVEL", "3"))
BLOCK = 64 * 1024
B12 = int(os.environ.get("PROBE_B12", "16"))
ROUNDS = int(os.environ.get("PROBE_ROUNDS", "5"))
K = int(os.environ.get("PROBE_K", "8"))
KSUB = int(os.environ.get("PROBE_KSUB", "2"))
KLO = int(os.environ.get("PROBE_KLO", "3"))   # reps in the low-K program
VA = os.environ.get("PROBE_A", "15")
VB = os.environ.get("PROBE_B", "19")


def parse_variant(variant):
    """"19k2m3" -> ("19", ksub=2, max_frag=3)."""
    ksub, mf = KSUB, 1
    if "m" in variant[2:]:
        variant, mtail = variant.split("m", 1)
        mf = int(mtail)
    if len(variant) > 2 and variant[2] == "k":
        ksub = int(variant[3:])
        variant = variant[:2]
    return variant, ksub, mf


def get_pack_kern(variant):
    variant, ksub, _ = parse_variant(variant)
    qa = {"13": 2, "15": 2, "16": 4, "17": 2, "19": 2, "20": 2,
          "21": 2, "22": 2, "23": 2, "24": 2}.get(variant, 1)
    if variant == "24":
        pack = functools.partial(PD.pack_blocks_v19, K=ksub)
        kern = lambda b, q, r: PD.v24_kernel(b, q, r, ksub)
    elif variant == "23":
        pack = functools.partial(PD.pack_blocks_v23, K=ksub)
        kern = lambda b, q, r: PD.v23_kernel(b, q, r, ksub)
    elif variant == "22":
        pack = functools.partial(PD.pack_blocks_v22, K=ksub)
        kern = lambda b, q, r: PD.v20_kernel(b, q, r, ksub)
    elif variant == "21":
        pack = functools.partial(PD.pack_blocks_v19, K=ksub)
        kern = lambda b, q, r: PD.v21_kernel(b, q, r, ksub)
    elif variant == "20":
        pack = functools.partial(PD.pack_blocks_v20, K=ksub)
        kern = lambda b, q, r: PD.v20_kernel(b, q, r, ksub)
    elif variant == "19":
        pack = functools.partial(PD.pack_blocks_v19, K=ksub)
        kern = lambda b, q, r: PD.v19_kernel(b, q, r, ksub)
    elif variant in ("15", "16", "17"):
        pack = PD.pack_blocks_v15
        if variant == "17":
            pack = functools.partial(pack, base_align=32)
        kern = {"15": PD.v15_kernel, "16": PD.v16_kernel,
                "17": PD.v17_kernel}[variant]
    elif variant in ("13", "14"):
        pack = PD.pack_blocks_v12
        kern = {"13": PD.v13_kernel, "14": PD.v14_kernel}[variant]
    else:
        pack = PD.pack_blocks_v12
        kern = PD.v12_kernel
    return pack, kern, qa


def build(variant, pieces, lits, totals, data, dev):
    pack, kfn, qa = get_pack_kern(variant)
    nb = len(totals)
    nd = -(-nb // B12)
    pad = nd * B12 - nb
    p = pieces + [pieces[-1]] * pad
    l = lits + [lits[-1]] * pad
    t = list(totals) + [0] * pad
    raw = []
    MAXQ = 1
    RL = 1
    for d in range(nd):
        sl = slice(d * B12, (d + 1) * B12)
        s = pack(p[sl], l[sl], t[sl], BLOCK, quad_align=qa)
        raw.append(s)
        MAXQ = max(MAXQ, s[1].shape[1])
        RL = max(RL, s[4].shape[1])
    sets = []
    for d in range(nd):
        sl = slice(d * B12, (d + 1) * B12)
        sets.append(pack(p[sl], l[sl], t[sl], BLOCK,
                         MAXQ=MAXQ, RL=RL, quad_align=qa))
    n_quads = sum(int(s[0][:, -1].sum()) for s in sets)
    print(f"# v{variant}: MAXQ={MAXQ} RLP={sets[0][4].shape[1]} "
          f"quads={n_quads} ({len(data)/max(n_quads,1):.0f} B/quad)",
          file=sys.stderr)
    dsets = [tuple(jax.device_put(a, dev) for a in s) for s in sets]
    jax.block_until_ready(dsets)
    kern = kfn(BLOCK, MAXQ, sets[0][4].shape[1])
    NR = BLOCK // 128
    flatpos = jnp.arange(NR * 128, dtype=jnp.uint32)
    w = (flatpos % 8191).astype(jnp.uint32)
    tot_sets = [jnp.asarray(t[d * B12:(d + 1) * B12], jnp.uint32)
                for d in range(nd)]

    def body(f1, f2, ds, tots):
        for s, tt in zip(ds, tots):
            out = kern(*s)
            flat = out.reshape(B12, NR * 128).astype(jnp.uint32)
            mask = flatpos[None, :] < tt[:, None]
            f1 = f1 + jnp.sum(jnp.where(mask, flat, 0))
            f2 = f2 + jnp.sum(jnp.where(mask, flat * w[None, :], 0))
        return f1, f2

    def make(k):
        @jax.jit
        def krep(ds, tots):
            f1 = jnp.uint32(0)
            f2 = jnp.uint32(0)
            for _ in range(k):
                ds = jax.lax.optimization_barrier(ds)
                f1, f2 = body(f1, f2, ds, tots)
            return f1, f2
        return krep

    return make(KLO), make(KLO + K), dsets, tot_sets


def main():
    from gen_corpus import gen_corpus
    import ref_oracle
    data = gen_corpus(MB * 1024 * 1024)
    arc = ref_oracle.ref_compress(data, level=LEVEL, block_size=BLOCK)
    plan = plan_frame(arc)
    by_mf = {}

    def resolve(mf):
        if mf in by_mf:
            return by_mf[mf]
        pieces, lits = [], []
        for i in range(plan.n_blocks):
            r = runtime.resolve_pieces(plan.ll[i], plan.ml[i], plan.off[i],
                                       plan.lit[i], plan.dict_buf,
                                       device_pure=True, max_frag=mf)
            pieces.append(r[:4])
            lits.append(r[4])
        by_mf[mf] = (pieces, lits)
        return by_mf[mf]

    dev = jax.devices()[0]

    exp1 = np.uint32(0)
    exp2 = np.uint32(0)
    wn = np.arange(BLOCK, dtype=np.uint32) % 8191
    pos = 0
    with np.errstate(over="ignore"):
        for i in range(plan.n_blocks):
            blk = np.frombuffer(data[pos:pos + plan.totals[i]], np.uint8)
            exp1 += blk.astype(np.uint32).sum(dtype=np.uint32)
            exp2 += (blk.astype(np.uint32) * wn[:len(blk)]).sum(dtype=np.uint32)
            pos += plan.totals[i]
    fp1 = (int(exp1), int(exp2))
    mask32 = (1 << 32) - 1
    fp = ((KLO * fp1[0]) & mask32, (KLO * fp1[1]) & mask32)
    fp_hi = (((KLO + K) * fp1[0]) & mask32, ((KLO + K) * fp1[1]) & mask32)

    vs = {}
    for v in (VA, VB):
        t0 = time.time()
        pieces, lits = resolve(parse_variant(v)[2])
        lo, hi, ds, ts = build(v, pieces, lits, list(plan.totals), data, dev)
        assert tuple(map(int, lo(ds, ts))) == fp, f"v{v} FP mismatch"
        assert tuple(map(int, hi(ds, ts))) == fp_hi
        print(f"# v{v} compile+verify {time.time()-t0:.0f}s (bit-exact)",
              file=sys.stderr)
        vs[v] = (lo, hi, ds, ts, [], [])

    for r in range(ROUNDS):
        # A-B-B-A within a round cancels linear drift
        order = (VA, VB) if r % 2 == 0 else (VB, VA)
        for v in order:
            lo, hi, ds, ts, t_lo, t_hi = vs[v]
            t0 = time.time()
            assert tuple(map(int, lo(ds, ts))) == fp
            t_lo.append(time.time() - t0)
            t0 = time.time()
            assert tuple(map(int, hi(ds, ts))) == fp_hi
            t_hi.append(time.time() - t0)
        # per-round marginal so drift shows
        msg = []
        for v in (VA, VB):
            _, _, _, _, t_lo, t_hi = vs[v]
            dt = (t_hi[-1] - t_lo[-1]) / K
            msg.append(f"v{v} {len(data)/1e9/dt:.2f}")
        print(f"# round {r}: " + "  ".join(msg) + " GB/s", file=sys.stderr)

    for v in (VA, VB):
        _, _, _, _, t_lo, t_hi = vs[v]
        per = sorted((h - l) / K for h, l in zip(t_hi, t_lo))
        med = per[len(per) // 2]
        dt = (min(t_hi) - min(t_lo)) / K
        print(f"v{v}: median-round {med*1e3:.2f} ms = "
              f"{len(data)/1e9/med:.3f} GB/s   "
              f"(best-slope {len(data)/1e9/dt:.3f})", flush=True)


if __name__ == "__main__":
    main()
