#!/usr/bin/env python
"""Stage-by-stage timing of the expansion kernel on the real chip, using a
realistic plan (bench corpus, level 3)."""
import sys
import os
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
import jax
import jax.numpy as jnp

import bench as B
from zxc_tpu.ops import plan_frame
from zxc_tpu.ops.batch import _pad_batch, _pow2

MB = int(os.environ.get("MB", "16"))


def timeit(name, fn, args, reps=3, denom_bytes=None):
    r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t = time.time()
        r = fn(*args)
        jax.block_until_ready(r)
        ts.append(time.time() - t)
    t = min(ts)
    extra = f"   {denom_bytes/t/1e9:8.3f} GB/s" if denom_bytes else ""
    print(f"{name:40s} {t*1e3:9.2f} ms{extra}", flush=True)


def main():
    data = B.build_corpus(MB * 1024 * 1024)
    archive = B.encode(data, 3)
    plan = plan_frame(archive)
    S = _pow2(plan.max_seq)
    L = _pow2(plan.max_lit)
    nb = plan.n_blocks
    block = plan.block_size
    print(f"blocks={nb} S={S} L={L} block={block}", flush=True)
    host = _pad_batch(plan, range(nb), S, L)
    dev = jax.devices()[0]
    args = tuple(jax.device_put(a, dev) for a in host)
    jax.block_until_ready(args)
    nbytes = len(data)

    def stage_node(ll, ml, off, lit, n_seq, lit_len):
        """Everything before the chase loop; returns node."""
        Ssz = ll.shape[0]
        sidx = jnp.arange(Ssz, dtype=jnp.int32)
        valid = sidx < n_seq
        ll = jnp.where(valid, ll, 0)
        ml = jnp.where(valid, ml, 0)
        off = jnp.where(valid, jnp.maximum(off, 1), 1)
        seq_out = ll + ml
        out_start = jnp.cumsum(seq_out) - seq_out
        match_start = out_start + ll
        cum_ll = jnp.cumsum(ll) - ll
        total_seq = jnp.sum(seq_out)
        lit_used = jnp.sum(ll)
        trailing = jnp.maximum(lit_len - lit_used, 0)
        total = total_seq + trailing
        starts = jnp.where(valid, out_start, block)
        seg = jnp.zeros(block + 1, jnp.int32).at[starts].add(1, mode="drop")
        sid = jnp.cumsum(seg[:block]) - 1
        sid = jnp.clip(sid, 0, jnp.maximum(n_seq - 1, 0))
        p = jnp.arange(block, dtype=jnp.int32)
        in_seq = (p < total_seq) & (n_seq > 0)
        ms = match_start[sid]
        osr = out_start[sid]
        is_match = in_seq & (p >= ms)
        lit_idx = jnp.where(in_seq, cum_ll[sid] + (p - osr),
                            lit_used + (p - total_seq))
        lit_byte = lit[jnp.clip(lit_idx, 0, L - 1)]
        offv = off[sid]
        rel = p - ms
        collapsed = jnp.where(rel >= offv, rel % offv, rel) - offv
        q_target = jnp.maximum(ms + collapsed, 0)
        node = jnp.where(is_match, q_target, -(lit_byte.astype(jnp.int32) + 1))
        return node, total

    vnode = jax.jit(jax.vmap(stage_node))
    timeit("stage A: node construction", vnode, args, denom_bytes=nbytes)

    node0, total0 = vnode(*args)
    node0 = jax.block_until_ready(node0)

    def rounds_fixed(k):
        def f(nd):
            def body(_, n):
                return jnp.where(n >= 0, jnp.take_along_axis(
                    n, jnp.maximum(n, 0), axis=1), n)
            return jax.lax.fori_loop(0, k, body, nd)
        return jax.jit(f)

    for k in (1, 2, 4, 8, 13):
        timeit(f"stage B: {k} fixed chase rounds", rounds_fixed(k), (node0,),
               denom_bytes=nbytes)

    def chase_while(nd):
        def cond(st):
            i, n = st
            return (i < 20) & jnp.any(n >= 0)

        def body(st):
            i, n = st
            return i + 1, jnp.where(n >= 0, jnp.take_along_axis(
                n, jnp.maximum(n, 0), axis=1), n)
        return jax.lax.while_loop(cond, body, (jnp.int32(0), nd))[1]

    timeit("stage C: while_loop chase (global)", jax.jit(chase_while), (node0,),
           denom_bytes=nbytes)

    # how many rounds does the data actually need?
    nd = np.asarray(jnp.asarray(node0)[:, :1])  # cheap probe, avoid big D2H
    k = 0
    ndj = node0
    f1 = rounds_fixed(1)
    while k < 20:
        if not bool(jnp.any(ndj >= 0)):
            break
        ndj = f1(ndj)
        k += 1
    print(f"rounds actually needed: {k}", flush=True)

    # per-op suspects inside stage A
    ll, ml, off, lit, n_seq, lit_len = args

    def scat(ll, n_seq):
        Ssz = ll.shape[0]
        valid = jnp.arange(Ssz, dtype=jnp.int32) < n_seq
        llz = jnp.where(valid, ll, 0)
        out_start = jnp.cumsum(llz) - llz
        starts = jnp.where(valid, out_start, block)
        return jnp.zeros(block + 1, jnp.int32).at[starts].add(1, mode="drop")
    timeit("suspect: scatter (B,S)->(B,block)", jax.jit(jax.vmap(scat)),
           (ll, n_seq), denom_bytes=nbytes)

    sid_full = jax.jit(jax.vmap(lambda s: jnp.cumsum(s[:block]) - 1))
    seg0 = jax.jit(jax.vmap(scat))(ll, n_seq)
    timeit("suspect: cumsum sid", sid_full, (seg0,), denom_bytes=nbytes)

    p1 = jnp.tile(jnp.arange(block, dtype=jnp.int32)[None], (nb, 1))
    o1 = jax.jit(jax.vmap(lambda o, s: o[jnp.clip(s[:block], 0, S - 1)]))
    sidc = jax.jit(jax.vmap(lambda s: jnp.clip(jnp.cumsum(s[:block]) - 1, 0, S - 1)))(seg0)
    timeit("suspect: table gather off[sid]", o1, (off, sidc), denom_bytes=nbytes)

    def modop(a, b):
        return jnp.where(a >= b, a % b, a)
    timeit("suspect: modulo (B,block)", jax.jit(modop), (p1, jnp.maximum(sidc, 1)),
           denom_bytes=nbytes)
    timeit("suspect: u8 gather lit[idx]",
           jax.jit(jax.vmap(lambda l, i: l[jnp.clip(i, 0, L - 1)])),
           (lit, sidc), denom_bytes=nbytes)


if __name__ == "__main__":
    main()
