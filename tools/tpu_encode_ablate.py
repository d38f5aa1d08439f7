#!/usr/bin/env python
"""Ablate the device-encode stages to find the 14.5 s/4 MiB cost.

Times (marginal, K-rep slope) each stage in isolation on real hardware:
  A. hash + argsort only
  B. + candidate check/extension loop (find_matches_device full)
  C. + parse_device (pointer doubling)
  D. + compaction (parse_compact_device)
"""
import os
import sys
import time

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
sys.path[:0] = [os.path.join(sys.path[0], "tests"), os.path.join(sys.path[0], "tools")]

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from gen_corpus import gen_corpus
from zxc_tpu.ops import encode as OE
from zxc_tpu.codec import block_encode
from zxc_tpu import constants as C

MB = int(os.environ.get("PROBE_MB", "2"))
BLOCK = 64 * 1024
K = int(os.environ.get("PROBE_K", "2"))
LEVEL = 3


def marginal(fn, arg, label):
    def make(k):
        @jax.jit
        def krep(d):
            f = jnp.uint32(0)
            for _ in range(k):
                d = lax.optimization_barrier(d)
                f = f + fn(d)
            return f
        return krep
    lo, hi = make(1), make(1 + K)
    t0 = time.time()
    f0 = int(lo(arg))
    print(f"#   compile {time.time()-t0:.0f}s", file=sys.stderr)
    int(hi(arg))
    t_lo, t_hi = [], []
    for _ in range(3):
        t0 = time.time(); int(lo(arg)); t_lo.append(time.time() - t0)
        t0 = time.time(); int(hi(arg)); t_hi.append(time.time() - t0)
    dt = (min(t_hi) - min(t_lo)) / K
    n = arg.shape[0] * arg.shape[1]
    print(f"{label}: {dt*1e3:8.1f} ms marginal = {n/1e9/dt:.4f} GB/s",
          flush=True)


def main():
    data = gen_corpus(MB << 20)
    params = block_encode.level_params(LEVEL)
    nb = len(data) // BLOCK
    blocks = jax.device_put(
        np.frombuffer(data[:nb * BLOCK], np.uint8).reshape(nb, BLOCK),
        jax.devices()[0])

    def stage_a(d):
        def one(blk):
            n = blk.shape[0]
            pad = jnp.concatenate([blk, jnp.zeros(4, jnp.uint8)])
            w32 = OE._le32(pad)
            nh = n - (C.MIN_MATCH - 1)
            lo = w32[:nh]
            b5 = blk[C.MIN_MATCH - 1:C.MIN_MATCH - 1 + nh].astype(jnp.uint32)
            h = ((lo * OE._M1) ^ (b5 * OE._M2)) >> np.uint32(32 - OE._HASH_BITS)
            order = jnp.argsort(h, stable=True)
            return jnp.sum(order.astype(jnp.uint32))
        return jnp.sum(jax.vmap(one)(d))

    def stage_b(d):
        def one(blk):
            lens, offs = OE.find_matches_device(blk, params.n_candidates)
            return jnp.sum(lens.astype(jnp.uint32) + offs.astype(jnp.uint32))
        return jnp.sum(jax.vmap(one)(d))

    def stage_c(d):
        def one(blk):
            lens, offs = OE.find_matches_device(blk, params.n_candidates)
            keep = OE.parse_device(lens, offs, params.lazy, params.min_emit)
            return jnp.sum(keep.astype(jnp.uint32))
        return jnp.sum(jax.vmap(one)(d))

    def stage_d(d):
        def one(blk):
            lens, offs = OE.find_matches_device(blk, params.n_candidates)
            n_seq, p, l, o = OE.parse_compact_device(lens, offs, params.lazy,
                                                     params.min_emit)
            return (n_seq.astype(jnp.uint32) + jnp.sum(p.astype(jnp.uint32))
                    + jnp.sum(l.astype(jnp.uint32)))
        return jnp.sum(jax.vmap(one)(d))

    marginal(stage_a, blocks, "A hash+sort        ")
    marginal(stage_b, blocks, "B + find_matches   ")
    marginal(stage_c, blocks, "C + parse          ")
    marginal(stage_d, blocks, "D + compact        ")


if __name__ == "__main__":
    main()
