#!/usr/bin/env python
"""v25 self-referential-window kernel prototype: A/B vs v19.

The round-4 verdict's structural ask (PERF.md 3.6 floor (a)): a kernel
contract where in-window match sources are read from the block's OWN
decoded output instead of host-materialized lit8 rows. The native
resolver's self_ref mode emits KOUT pieces for matches whose source
completes before the destination's 16 KiB supertile; the v25 kernel
serves them from out_ref rows written by earlier supertile iterations.

Measures, in ONE process (chip state drifts across runs):
  - piece/quad counts and lit8 geometry (H2D volume) for both contracts
  - marginal kernel rates, A-B-B-A alternated slope cycles
  - bit-exactness of both via device-side fingerprints vs plaintext

Usage: [V25_MB=8] [V25_LEVEL=3] [V25_REPS=3] python tools/tpu_v25_selfref.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import numpy as np

MB = int(os.environ.get("V25_MB", "8"))
LEVEL = int(os.environ.get("V25_LEVEL", "3"))
REPS = int(os.environ.get("V25_REPS", "3"))
KD = int(os.environ.get("V25_KREP", "4"))
B = int(os.environ.get("V25_DISPATCH", "16"))
BS = 64 * 1024
INTERPRET = os.environ.get("V25_INTERPRET", "0") == "1"


def main():
    import jax
    import jax.numpy as jnp
    from gen_corpus import gen_corpus
    import ref_oracle
    from zxc_tpu import runtime
    from zxc_tpu.ops import plan_frame
    from zxc_tpu.ops import pallas_decode as PD

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    if INTERPRET:
        jax.config.update("jax_platforms", "cpu")

    data = gen_corpus(MB << 20)
    arc = ref_oracle.ref_compress(data, level=LEVEL, block_size=BS)
    plan = plan_frame(arc)
    nb = plan.n_blocks
    print(f"# corpus {MB} MiB L{LEVEL}, {nb} blocks of {BS >> 10} KiB, "
          f"ratio {len(arc)/len(data)*100:.1f}%", file=sys.stderr)

    names = os.environ.get("V25_VARIANTS", "v19,v25,v26").split(",")
    variants = {}
    for name, self_ref in (("v19", False), ("v25", True), ("v26", True)):
        if name not in names:
            continue
        pieces, lits = [], []
        t0 = time.time()
        for i in range(nb):
            r = runtime.resolve_pieces(plan.ll[i], plan.ml[i], plan.off[i],
                                       plan.lit[i], plan.dict_buf,
                                       device_pure=True, max_frag=1,
                                       self_ref=self_ref)
            assert r is not None
            pieces.append(r[:4])
            lits.append(r[4])
        t_res = time.time() - t0
        kout = sum(int((p[3] == runtime.KOUT).sum()) for p in pieces)
        lit_bytes = sum(len(l) for l in lits)
        variants[name] = dict(pieces=pieces, lits=lits, t_res=t_res,
                              kout=kout, lit_bytes=lit_bytes)
        print(f"# {name}: resolve {t_res:.3f}s, "
              f"pieces {sum(len(p[0]) for p in pieces)}, KOUT {kout}, "
              f"lit_full {lit_bytes/1e6:.2f} MB "
              f"({lit_bytes/len(data):.3f}x out)", file=sys.stderr)

    # pack both, per dispatch group
    nd = -(-nb // B)
    pad = nd * B - nb
    totals = list(plan.totals) + [0] * pad
    dev = jax.devices()[0]
    NR = BS // 128
    flatpos = jnp.arange(NR * 128, dtype=jnp.uint32)
    w = (flatpos % 8191).astype(jnp.uint32)

    staged = {}
    for name in variants:
        V = variants[name if name in variants else "v25"]
        p = V["pieces"] + [V["pieces"][-1]] * pad
        l = V["lits"] + [V["lits"][-1]] * pad
        t0 = time.time()
        if name == "v26":
            # RLP pinned from lit rows (the unified-window scratch is
            # RLP + NR rows; OUT sources translate to RLP + out_row)
            RLP26 = -(-(max(-(-len(x) // 128) for x in l) + 1) // 16) * 16
            raw = [PD.pack_blocks_v26(p[d * B:(d + 1) * B],
                                      l[d * B:(d + 1) * B],
                                      totals[d * B:(d + 1) * B], BS,
                                      RLP26, quad_align=2)
                   for d in range(nd)]
        else:
            packfn = PD.pack_blocks_v25 if name == "v25" else \
                functools.partial(PD.pack_blocks_v19, K=2)
            raw = [packfn(p[d * B:(d + 1) * B], l[d * B:(d + 1) * B],
                          totals[d * B:(d + 1) * B], BS, quad_align=2)
                   for d in range(nd)]
        MAXQ = max(s[1].shape[1] for s in raw)
        RLP = max(s[4].shape[1] for s in raw)
        sets = [PD.pad_v19_set(s, MAXQ, RLP) for s in raw]
        quads = sum(int(s[0][:, -1].sum()) for s in raw)
        h2d = sum(sum(a.nbytes for a in s) for s in sets)
        lit_h2d = sum(s[4].nbytes for s in sets)
        print(f"# {name} pack: {time.time()-t0:.2f}s, MAXQ={MAXQ} RLP={RLP} "
              f"quads={quads} H2D={h2d/1e6:.1f} MB (lit8 {lit_h2d/1e6:.1f} "
              f"MB = {lit_h2d/len(data):.2f}x out)", file=sys.stderr)
        kern = {"v25": PD.v25_kernel, "v26": PD.v26_kernel,
                "v19": PD.v19_kernel}[name](BS, MAXQ, RLP, 2, INTERPRET)
        dsets = [tuple(jax.device_put(a, dev) for a in s) for s in sets]
        jax.block_until_ready(dsets)
        tot_sets = [jnp.asarray(totals[d * B:(d + 1) * B], jnp.uint32)
                    for d in range(nd)]
        staged[name] = (kern, dsets, tot_sets)

    # expected fingerprints
    exp1 = np.uint32(0)
    exp2 = np.uint32(0)
    wn = (np.arange(BS, dtype=np.uint32) % 8191).astype(np.uint32)
    pos = 0
    with np.errstate(over="ignore"):
        for i in range(nb):
            blk = np.frombuffer(data[pos:pos + plan.totals[i]], np.uint8)
            exp1 += blk.astype(np.uint32).sum(dtype=np.uint32)
            exp2 += (blk.astype(np.uint32) * wn[:len(blk)]).sum(
                dtype=np.uint32)
            pos += plan.totals[i]
    exp = (int(exp1), int(exp2))

    def make_step(kern, k):
        @jax.jit
        def step(sets_in, tots):
            f1 = jnp.uint32(0)
            f2 = jnp.uint32(0)
            for _ in range(k):
                sets_in = jax.lax.optimization_barrier(sets_in)
                for s, t in zip(sets_in, tots):
                    out = kern(*s)
                    flat = out.reshape(B, NR * 128).astype(jnp.uint32)
                    mask = flatpos[None, :] < t[:, None]
                    f1 = f1 + jnp.sum(jnp.where(mask, flat, 0))
                    f2 = f2 + jnp.sum(jnp.where(mask, flat * w[None, :], 0))
            return f1, f2
        return step

    mask32 = (1 << 32) - 1
    steps = {}
    for name, (kern, dsets, tot_sets) in staged.items():
        lo = make_step(kern, 1)
        hi = make_step(kern, 1 + KD)
        t0 = time.time()
        r = tuple(int(x) & mask32 for x in lo(dsets, tot_sets))
        print(f"# {name} compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
        assert r == exp, f"{name} fingerprint mismatch: {r} vs {exp}"
        r = tuple(int(x) & mask32
                  for x in hi(dsets, tot_sets))
        assert r == tuple(((1 + KD) * e) & mask32 for e in exp), \
            f"{name} K-rep fingerprint mismatch"
        print(f"# {name} BIT-EXACT on {jax.devices()[0].platform}",
              file=sys.stderr)
        steps[name] = (lo, hi, dsets, tot_sets)

    if INTERPRET:
        print("# interpret mode: skipping timing", file=sys.stderr)
        return

    # A-B-B-A alternated marginal slopes. Timing forces a SCALAR PULL on
    # both arms (block_until_ready returns early through this tunnel —
    # PERF.md honest-metrics).
    exp_hi = tuple(((1 + KD) * e) & mask32 for e in exp)
    vnames = list(staged)
    slopes = {nm: [] for nm in vnames}
    order = vnames + vnames[::-1]
    for cy in range(REPS):
        for name in (order if cy % 2 == 0 else order[::-1]):
            lo, hi, dsets, tot_sets = steps[name]
            t_lo = []
            t_hi = []
            for _ in range(3):
                t0 = time.time()
                r = tuple(int(x) & mask32 for x in lo(dsets, tot_sets))
                t_lo.append(time.time() - t0)
                assert r == exp
                t0 = time.time()
                r = tuple(int(x) & mask32 for x in hi(dsets, tot_sets))
                t_hi.append(time.time() - t0)
                assert r == exp_hi
            slopes[name].append((min(t_hi) - min(t_lo)) / KD)
    for name in vnames:
        ss = sorted(slopes[name])
        med = ss[len(ss) // 2]
        best = ss[0]
        print(f"# {name}: marginal median {med*1e3:.2f} ms best "
              f"{best*1e3:.2f} ms = {len(data)/1e9/med:.3f} GB/s median "
              f"({len(data)/1e9/best:.3f} best)", file=sys.stderr)
    import json
    med = {nm: sorted(slopes[nm])[len(slopes[nm]) // 2] for nm in vnames}
    out = {f"{nm}_gbps": round(len(data) / 1e9 / med[nm], 3)
           for nm in vnames}
    if "v19" in med:
        for nm in vnames:
            if nm != "v19":
                out[f"{nm}_over_v19"] = round(med["v19"] / med[nm], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
