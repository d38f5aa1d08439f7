"""v12 hardware check: bit-exactness + honest slope throughput vs v10.

Run: PYTHONPATH=/root/repo:/root/.axon_site PALLAS_AXON_REMOTE_COMPILE=1 \
       python tools/tpu_v12_hw.py
"""
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
B12 = int(os.environ.get("PROBE_B", "16"))
REPS = 5
K = int(os.environ.get("PROBE_K", "8"))
VARIANT = os.environ.get("PROBE_VARIANT", "12")
QA = {"13": 2, "15": 2, "16": 4, "17": 2, "19": 2}.get(VARIANT, 1)
KSUB = int(os.environ.get("PROBE_KSUB", "2"))   # v19 sub-ops per slot


def main():
    from gen_corpus import gen_corpus
    import ref_oracle
    data = gen_corpus(MB * 1024 * 1024)
    arc = ref_oracle.ref_compress(data, level=LEVEL, block_size=BLOCK)
    plan = plan_frame(arc)
    pieces, lits = [], []
    for i in range(plan.n_blocks):
        r = runtime.resolve_pieces(plan.ll[i], plan.ml[i], plan.off[i],
                                   plan.lit[i], plan.dict_buf,
                                   device_pure=True,
                                   max_frag=int(os.environ.get(
                                       "PROBE_MF", "1")))
        pieces.append(r[:4])
        lits.append(r[4])
    nb = plan.n_blocks
    nd = -(-nb // B12)
    pad = nd * B12 - nb
    p = pieces + [pieces[-1]] * pad
    l = lits + [lits[-1]] * pad
    t = list(plan.totals) + [0] * pad
    t0 = time.time()
    pack = (PD.pack_blocks_v15 if VARIANT in ("15", "16", "17")
            else PD.pack_blocks_v12)
    import functools
    if VARIANT == "17":
        pack = functools.partial(pack, base_align=32)
    if VARIANT == "19":
        pack = functools.partial(PD.pack_blocks_v19, K=KSUB)
    raw = []
    MAXQ = 1
    RL = 1
    for d in range(nd):
        sl = slice(d * B12, (d + 1) * B12)
        s = pack(p[sl], l[sl], t[sl], BLOCK, quad_align=QA)
        raw.append(s)
        MAXQ = max(MAXQ, s[1].shape[1])
        RL = max(RL, s[4].shape[1])
    # repack to the common shape so one kernel serves all dispatches
    sets = []
    for d in range(nd):
        sl = slice(d * B12, (d + 1) * B12)
        sets.append(pack(p[sl], l[sl], t[sl], BLOCK,
                         MAXQ=MAXQ, RL=RL, quad_align=QA))
    n_quads = sum(int(s[0][:, -1].sum()) for s in sets)
    print(f"# pack {time.time()-t0:.2f}s MAXQ={MAXQ} RLP={sets[0][4].shape[1]} "
          f"quads={n_quads} ({len(data)/max(n_quads,1):.0f} B/quad)",
          file=sys.stderr)
    dev = jax.devices()[0]
    dsets = [tuple(jax.device_put(a, dev) for a in s) for s in sets]
    jax.block_until_ready(dsets)
    kfn = {"13": PD.v13_kernel, "14": PD.v14_kernel,
           "15": PD.v15_kernel, "16": PD.v16_kernel,
           "17": PD.v17_kernel,
           "19": lambda b, q, r: PD.v19_kernel(b, q, r, KSUB)}.get(
               VARIANT, PD.v12_kernel)
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

    lo, hi = make(1), make(1 + K)
    t0 = time.time()
    fp = tuple(map(int, lo(dsets, tot_sets)))
    print(f"# compile+first {time.time()-t0:.0f}s", file=sys.stderr)

    # verify fingerprint against host truth
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
    assert fp == (int(exp1), int(exp2)), f"FP mismatch {fp}"
    print("# fingerprint MATCH (bit-exact on hardware)", file=sys.stderr)

    mask32 = (1 << 32) - 1
    exp_hi = (((1 + K) * fp[0]) & mask32, ((1 + K) * fp[1]) & mask32)
    t0 = time.time()
    assert tuple(map(int, hi(dsets, tot_sets))) == exp_hi
    print(f"# compile hi {time.time()-t0:.0f}s", file=sys.stderr)
    t_lo, t_hi = [], []
    for _ in range(REPS):
        t0 = time.time()
        assert tuple(map(int, lo(dsets, tot_sets))) == fp
        t_lo.append(time.time() - t0)
        t0 = time.time()
        assert tuple(map(int, hi(dsets, tot_sets))) == exp_hi
        t_hi.append(time.time() - t0)
    dt = (min(t_hi) - min(t_lo)) / K
    print(f"v{VARIANT}: single {min(t_lo)*1e3:.1f} ms, marginal {dt*1e3:.2f} ms = "
          f"{len(data)/1e9/dt:.3f} GB/s", flush=True)


if __name__ == "__main__":
    main()
