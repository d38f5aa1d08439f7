#!/usr/bin/env python
"""Measure the primitives the decode kernel could be built from, on the real
chip. Decides the kernel architecture: gather-chase vs scan/sort-based.

All inputs device-resident; times are min over reps of full dispatch.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

REPS = 3
N = 1 << 24  # 16M elements


def timeit(name, fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(REPS):
        t = time.time()
        r = fn(*args)
        jax.block_until_ready(r)
        ts.append(time.time() - t)
    t = min(ts)
    print(f"{name:44s} {t*1e3:9.2f} ms   {N/t/1e9:8.3f} Gelem/s", flush=True)
    return t


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    rng = np.random.default_rng(0)

    x32 = jax.device_put(rng.integers(0, N, N).astype(np.int32), dev)
    x8 = jax.device_put(rng.integers(0, 256, N).astype(np.uint8), dev)
    idx = jax.device_put(rng.integers(0, N, N).astype(np.int32), dev)
    idx_local = jax.device_put(
        (np.arange(N) - rng.integers(1, 65536, N)).clip(0).astype(np.int32), dev)
    idx_sorted = jax.device_put(np.sort(rng.integers(0, N, N)).astype(np.int32), dev)
    small_tab = jax.device_put(rng.integers(0, N, 1 << 16).astype(np.int32), dev)
    idx_small = jax.device_put(rng.integers(0, 1 << 16, N).astype(np.int32), dev)

    timeit("gather i32[16M] random", jax.jit(lambda a, i: a[i]), x32, idx)
    timeit("gather i32[16M] local<=64K back", jax.jit(lambda a, i: a[i]), x32, idx_local)
    timeit("gather i32[16M] sorted idx", jax.jit(lambda a, i: a[i]), x32, idx_sorted)
    timeit("gather u8[16M] random", jax.jit(lambda a, i: a[i]), x8, idx)
    timeit("gather small-table[64K] i32", jax.jit(lambda a, i: a[i]), small_tab, idx_small)

    # batched 2D take_along_axis (the vmap form the kernel uses)
    B = 32
    M = N // B
    x2 = x32.reshape(B, M)
    i2 = jax.device_put((rng.integers(0, M, N)).astype(np.int32).reshape(B, M), dev)
    timeit("take_along_axis (32,512K)",
           jax.jit(lambda a, i: jnp.take_along_axis(a, i, axis=1)), x2, i2)

    timeit("elementwise a*3+b i32", jax.jit(lambda a, b: a * 3 + b), x32, idx)
    timeit("cumsum i32[16M]", jax.jit(lambda a: jnp.cumsum(a)), x32)
    timeit("cumsum i32 (32,512K) axis1",
           jax.jit(lambda a: jnp.cumsum(a, axis=1)), x2)

    # associative scan forward-fill (pair: valid, value)
    def ff_combine(a, b):
        av, ax = a
        bv, bx = b
        return bv | av, jnp.where(bv, bx, ax)

    flags = jax.device_put((rng.random(N) < 0.01).astype(np.bool_), dev)
    timeit("assoc_scan fwd-fill[16M]",
           jax.jit(lambda v, f: jax.lax.associative_scan(ff_combine, (f, v))[1]),
           x32, flags)

    timeit("sort i32[16M]", jax.jit(lambda a: jnp.sort(a)), idx)
    timeit("argsort i32[16M]", jax.jit(lambda a: jnp.argsort(a)), idx)
    k2 = jax.device_put(rng.integers(0, M, N).astype(np.int32).reshape(B, M), dev)
    timeit("sort i32 (32,512K) axis1", jax.jit(lambda a: jnp.sort(a, axis=1)), k2)

    timeit("scatter-add ones[16M]",
           jax.jit(lambda i: jnp.zeros(N, jnp.int32).at[i].add(1, mode="drop")), idx)
    sc_small = jax.device_put(rng.integers(0, N, 1 << 16).astype(np.int32), dev)
    timeit("scatter-add 64K into 16M",
           jax.jit(lambda i: jnp.zeros(N, jnp.int32).at[i].add(1, mode="drop")),
           sc_small)

    # chase loop: 8 fixed rounds of nd = nd[nd]
    def chase(nd):
        def body(_, n):
            return n[n]
        return jax.lax.fori_loop(0, 8, body, nd)
    timeit("8x chase nd[nd] i32[16M] (per-round /8)", jax.jit(chase), idx)

    # one-hot small gather via matmul (bf16): table 256 -> is it viable for
    # byte-level LUTs?
    tab = jax.device_put(rng.integers(0, 256, 256).astype(np.float32), dev)
    ib = jax.device_put(rng.integers(0, 256, N).astype(np.int32), dev)

    def onehot_gather(t, i):
        oh = jax.nn.one_hot(i.reshape(-1, 256), 256, dtype=jnp.bfloat16)
        return jnp.einsum("bk,k->b", oh.reshape(-1, 256),
                          t.astype(jnp.bfloat16))
    timeit("one-hot LUT256 matmul", jax.jit(onehot_gather), tab, ib)


if __name__ == "__main__":
    main()
