#!/usr/bin/env python
"""Marginal throughput of the DEVICE side of the encoder.

Measures `find_matches_device` + `parse_compact_device` (the parts of
the encode pipeline that run on the TPU; byte emission stays on host)
over the pinned corpus with the same honest K-rep slope methodology as
the decode probes. The result buffers are reduced to a fingerprint on
device, and the fingerprint is checked against per-block host calls.

Usage: PYTHONPATH=/root/repo:/root/.axon_site PALLAS_AXON_REMOTE_COMPILE=1 \
       python tools/tpu_encode_probe.py
"""
import os
import sys
import time

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
sys.path[:0] = [os.path.join(sys.path[0], "tests"), os.path.join(sys.path[0], "tools")]

import numpy as np
import jax
import jax.numpy as jnp

from gen_corpus import gen_corpus
from zxc_tpu.ops import encode as OE
from zxc_tpu.codec import block_encode

MB = int(os.environ.get("PROBE_MB", "8"))
LEVEL = int(os.environ.get("PROBE_LEVEL", "3"))
BLOCK = int(os.environ.get("PROBE_BLOCK", str(64 * 1024)))
K = int(os.environ.get("PROBE_K", "4"))
REPS = int(os.environ.get("PROBE_REPS", "5"))


def main():
    data = gen_corpus(MB << 20)
    params = block_encode.level_params(LEVEL)
    nb = len(data) // BLOCK
    blocks = np.frombuffer(data[:nb * BLOCK], np.uint8).reshape(nb, BLOCK)
    dev = jax.devices()[0]
    dblocks = jax.device_put(blocks, dev)

    def one(blk):
        lens, offs = OE.find_matches_device(blk, params.n_candidates)
        n_seq, pos_b, len_b, off_b = OE.parse_compact_device(
            lens, offs, params.lazy, params.min_emit)
        f = (n_seq.astype(jnp.uint32)
             + jnp.sum(pos_b.astype(jnp.uint32) * 3
                       + len_b.astype(jnp.uint32) * 5
                       + off_b.astype(jnp.uint32) * 7))
        return f

    def make(k):
        @jax.jit
        def krep(d):
            f = jnp.uint32(0)
            for _ in range(k):
                d = jax.lax.optimization_barrier(d)
                f = f + jnp.sum(jax.vmap(one)(d))
            return f
        return krep

    lo, hi = make(1), make(1 + K)
    t0 = time.time()
    fp = int(lo(dblocks))
    print(f"# compile+first {time.time()-t0:.0f}s", file=sys.stderr)

    # host truth: same fingerprint from per-block single calls on device
    # (one block at a time — validates the vmap didn't cross blocks)
    exp = np.uint32(0)
    with np.errstate(over="ignore"):
        for i in range(nb):
            f = one(jax.device_put(jnp.asarray(blocks[i]), dev))
            exp += np.uint32(int(f) & 0xFFFFFFFF)
    assert fp == int(exp), (fp, int(exp))
    print("# fingerprint MATCH (vmap == per-block)", file=sys.stderr)

    mask32 = (1 << 32) - 1
    exp_hi = ((1 + K) * fp) & mask32
    assert (int(hi(dblocks)) & mask32) == exp_hi
    t_lo, t_hi = [], []
    for _ in range(REPS):
        t0 = time.time()
        assert int(lo(dblocks)) == fp
        t_lo.append(time.time() - t0)
        t0 = time.time()
        assert (int(hi(dblocks)) & mask32) == exp_hi
        t_hi.append(time.time() - t0)
    dt = (min(t_hi) - min(t_lo)) / K
    n = nb * BLOCK
    print(f"device encode (match+parse) L{LEVEL}: marginal {dt*1e3:.1f} ms "
          f"= {n/1e9/dt:.3f} GB/s ({nb} blocks of {BLOCK})", flush=True)


if __name__ == "__main__":
    main()
