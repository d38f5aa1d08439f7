#!/usr/bin/env python
"""Marginal throughput of the BATCHED device matcher+parse
(_device_encode_batch: grid-batched Pallas LCP extension + B inlined
scalar-walk parse kernels in ONE jitted program) — the round-4 answer to
VERDICT item 7 ("batch multiple 64 KiB blocks per dispatch"). Same
honest K-rep slope as every device probe; outputs fingerprint-checked
against the single-block path.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_encode_batch_probe.py
"""
import os
import sys
import time

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
sys.path[:0] = [os.path.join(sys.path[0], "tests"),
                os.path.join(sys.path[0], "tools")]

import numpy as np
import jax
import jax.numpy as jnp

from gen_corpus import gen_corpus
from zxc_tpu.ops import encode as OE
from zxc_tpu.codec import block_encode

MB = int(os.environ.get("PROBE_MB", "4"))
LEVEL = int(os.environ.get("PROBE_LEVEL", "3"))
BLOCK = 64 * 1024
B = int(os.environ.get("PROBE_B", "16"))
K = int(os.environ.get("PROBE_K", "3"))
REPS = int(os.environ.get("PROBE_REPS", "5"))


def main():
    data = gen_corpus(MB << 20)
    params = block_encode.level_params(LEVEL)
    nb = (len(data) // BLOCK // B) * B
    blocks = np.frombuffer(data[:nb * BLOCK], np.uint8).reshape(nb, BLOCK)
    dev = jax.devices()[0]
    groups = [jax.device_put(jnp.asarray(blocks[g:g + B]), dev)
              for g in range(0, nb, B)]

    def fp_of(blks):
        n_seq, pos_b, len_b, off_b = OE._device_encode_batch(
            blks, params.n_candidates, params.lazy, params.min_emit)
        return (jnp.sum(n_seq.astype(jnp.uint32))
                + jnp.sum(pos_b.astype(jnp.uint32) * 3
                          + len_b.astype(jnp.uint32) * 5
                          + off_b.astype(jnp.uint32) * 7))

    def make(k):
        @jax.jit
        def krep(gs):
            f = jnp.uint32(0)
            for _ in range(k):
                gs = jax.lax.optimization_barrier(gs)
                for g in gs:
                    f = f + fp_of(g)
            return f
        return krep

    lo, hi = make(1), make(1 + K)
    t0 = time.time()
    fp = int(lo(tuple(groups)))
    print(f"# compile+first {time.time()-t0:.0f}s "
          f"({nb} blocks, {nb//B} groups of {B})", file=sys.stderr)
    mask32 = (1 << 32) - 1
    exp_hi = ((1 + K) * fp) & mask32
    assert (int(hi(tuple(groups))) & mask32) == exp_hi
    t_lo, t_hi = [], []
    for _ in range(REPS):
        t0 = time.time()
        assert int(lo(tuple(groups))) & mask32 == fp & mask32
        t_lo.append(time.time() - t0)
        t0 = time.time()
        assert (int(hi(tuple(groups))) & mask32) == exp_hi
        t_hi.append(time.time() - t0)
    dt = (min(t_hi) - min(t_lo)) / K
    n = nb * BLOCK
    print(f"batched device matcher+parse L{LEVEL}: marginal {dt*1e3:.1f} ms"
          f" = {n/1e6/dt:.1f} MB/s ({nb} x 64 KiB in groups of {B}; "
          f"single-block was 11.3 MB/s, PERF.md 3.4)", flush=True)


if __name__ == "__main__":
    main()
