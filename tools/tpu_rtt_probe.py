"""Measure the fixed measurement overhead of the axon tunnel.

Times (a) a trivial jitted scalar readback, (b) the v10 decode kernel
single-shot, (c) the v10 decode kernel looped K times device-side in one
jitted program (amortizes any fixed per-call/readback cost).  If (a) is
tens of ms, every single-shot GB/s number this repo has measured is
understated by that fixed cost, and bench.py must amortize.

Run: PYTHONPATH=/root/repo:/root/.axon_site PALLAS_AXON_REMOTE_COMPILE=1 \
       python tools/tpu_rtt_probe.py
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
LEVEL = 3
BLOCK = 64 * 1024
B10 = 16
REPS = 7
K = int(os.environ.get("PROBE_K", "16"))


def timeit(fn, *args):
    r0 = fn(*args)
    r0 = tuple(int(x) for x in r0) if isinstance(r0, tuple) else int(r0)
    times = []
    for _ in range(REPS):
        t0 = time.time()
        r = fn(*args)
        r = tuple(int(x) for x in r) if isinstance(r, tuple) else int(r)
        times.append(time.time() - t0)
        assert r == r0
    return min(times), sorted(times)[len(times) // 2]


def main():
    dev = jax.devices()[0]
    x = jax.device_put(jnp.ones((8, 128), jnp.float32), dev)
    jax.block_until_ready(x)

    @jax.jit
    def trivial(v):
        return jnp.sum(v).astype(jnp.int32)

    tmin, tmed = timeit(trivial, x)
    print(f"RTT trivial jit+readback: min {tmin*1e3:.2f} ms  med {tmed*1e3:.2f} ms",
          flush=True)

    # --- v10 kernel inputs -------------------------------------------------
    from gen_corpus import gen_corpus
    import ref_oracle
    data = gen_corpus(MB * 1024 * 1024)
    arc = ref_oracle.ref_compress(data, level=LEVEL, block_size=BLOCK)
    plan = plan_frame(arc)
    pieces, lits = [], []
    for i in range(plan.n_blocks):
        r = runtime.resolve_pieces(plan.ll[i], plan.ml[i], plan.off[i],
                                   plan.lit[i], plan.dict_buf,
                                   device_pure=True)
        pieces.append(r[:4])
        lits.append(r[4])
    per = PD.lane_ops_blocks(pieces, list(plan.totals))
    MAXB = -(-max(max(len(r[0]), 1) for r in per) // 8) * 8
    RL = max(-(-len(lit) // 128) for lit in lits) + 1
    nb = plan.n_blocks
    nd = -(-nb // B10)
    pad = nd * B10 - nb
    p = pieces + [pieces[-1]] * pad
    l = lits + [lits[-1]] * pad
    t = list(plan.totals) + [0] * pad
    per = per + [per[-1]] * pad
    sets = []
    for d in range(nd):
        sl = slice(d * B10, (d + 1) * B10)
        sets.append(PD.pack_blocks_v10(p[sl], l[sl], t[sl], BLOCK,
                                       per=per[sl], MAXB=MAXB, RL=RL))
    RLP = sets[0][3].shape[1]
    kern = PD.v10_kernel(BLOCK, (sets[0][2].shape[1] // 32) * 128, RLP)
    dsets = [tuple(jax.device_put(a, dev) for a in s) for s in sets]
    jax.block_until_ready(dsets)

    @jax.jit
    def single(ds):
        f = jnp.uint32(0)
        for s in ds:
            f = f + jnp.sum(kern(*s).astype(jnp.uint32))
        return f

    t0 = time.time()
    tmin, tmed = timeit(single, dsets)
    print(f"v10 single-shot ({MB} MiB): min {tmin*1e3:.2f} ms "
          f"({MB/1024/tmin:.3f} GB/s)  med {tmed*1e3:.2f} ms  "
          f"[first+compile {time.time()-t0:.0f}s]", flush=True)

    def make_krep(K):
        @jax.jit
        def krep(ds):
            # K full decodes; optimization_barrier between iterations so
            # XLA cannot CSE identical decodes; one readback at the end.
            f = jnp.uint32(0)
            for _ in range(K):
                ds = jax.lax.optimization_barrier(ds)
                for s in ds:
                    f = f ^ jnp.sum(kern(*s).astype(jnp.uint32))
            return f
        return krep

    results = {}
    for k in (4, K):
        t0 = time.time()
        tmin, tmed = timeit(make_krep(k), dsets)
        results[k] = tmin
        print(f"v10 K={k}-amortized: total min {tmin*1e3:.2f} ms -> "
              f"{tmin/k*1e3:.2f} ms/decode ({MB/1024*k/tmin:.3f} GB/s)  "
              f"[first+compile {time.time()-t0:.0f}s]", flush=True)
    ks = sorted(results)
    if len(ks) == 2:
        dt = (results[ks[1]] - results[ks[0]]) / (ks[1] - ks[0])
        print(f"marginal per-decode (slope): {dt*1e3:.2f} ms "
              f"({MB/1024/dt:.3f} GB/s); implied fixed overhead "
              f"{(results[ks[0]] - ks[0]*dt)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
