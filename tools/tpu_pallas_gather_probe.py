#!/usr/bin/env python
"""Does Mosaic's tpu.dynamic_gather give us a fast VMEM gather?

Timing forces completion by summing the result on device and pulling the
scalar to host inside the timed region (block_until_ready alone has been
observed to return early through the axon relay).
"""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 3


def timeit(name, fn, *args, elems=None):
    try:
        r = fn(*args)
        s0 = float(jnp.sum(r))
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
        return
    ts = []
    for _ in range(REPS):
        t = time.time()
        r = fn(*args)
        s = float(jnp.sum(r))
        ts.append(time.time() - t)
    t = min(ts)
    rate = f"   {elems/t/1e9:9.3f} Gelem/s" if elems else ""
    print(f"{name:46s} {t*1e3:9.2f} ms{rate}   (sum={s:.3e})", flush=True)


def pallas_gather_axis1(x, idx):
    """out[i, j] = x[i, idx[i, j]] via one VMEM-resident kernel."""
    def kern(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1,
                                       mode="promise_in_bounds")
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(idx.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


def pallas_gather_grid(x, idx, tile):
    """Grid over index tiles; full table resident per step."""
    M, N = idx.shape
    def kern(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1,
                                       mode="promise_in_bounds")
    return pl.pallas_call(
        kern,
        grid=(N // tile,),
        in_specs=[pl.BlockSpec((M, x.shape[1]), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((M, tile), lambda k: (0, k),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M, tile), lambda k: (0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(idx.shape, x.dtype),
    )(x, idx)


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    rng = np.random.default_rng(0)

    # XLA baseline with honest timing
    for N in (1 << 16, 1 << 19):
        x = jax.device_put(rng.integers(0, 100, (8, N)).astype(np.int32), dev)
        idx = jax.device_put(rng.integers(0, N, (8, N)).astype(np.int32), dev)
        timeit(f"XLA take_along_axis (8,{N>>10}K) i32",
               jax.jit(lambda a, i: jnp.take_along_axis(a, i, axis=1)),
               x, idx, elems=8 * N)

    for N in (1 << 13, 1 << 16, 1 << 19):
        x = jax.device_put(rng.integers(0, 100, (8, N)).astype(np.int32), dev)
        idx = jax.device_put(rng.integers(0, N, (8, N)).astype(np.int32), dev)
        timeit(f"pallas dyngather (8,{N>>10}K) i32 full",
               jax.jit(functools.partial(pallas_gather_axis1)), x, idx,
               elems=8 * N)

    # wide row count
    for M, N in ((64, 1 << 16), (256, 1 << 13)):
        x = jax.device_put(rng.integers(0, 100, (M, N)).astype(np.int32), dev)
        idx = jax.device_put(rng.integers(0, N, (M, N)).astype(np.int32), dev)
        timeit(f"pallas dyngather ({M},{N>>10}K) i32",
               jax.jit(functools.partial(pallas_gather_axis1)), x, idx,
               elems=M * N)

    # u8 table
    N = 1 << 16
    x8 = jax.device_put(rng.integers(0, 256, (8, N)).astype(np.uint8), dev)
    idx = jax.device_put(rng.integers(0, N, (8, N)).astype(np.int32), dev)
    timeit("pallas dyngather (8,64K) u8",
           jax.jit(functools.partial(pallas_gather_axis1)), x8, idx, elems=8 * N)

    # grid variant: 512K indices over 64K-wide table
    M, N, T = 8, 1 << 16, 1 << 13
    x = jax.device_put(rng.integers(0, 100, (M, N)).astype(np.int32), dev)
    bigidx = jax.device_put(rng.integers(0, N, (M, 1 << 19)).astype(np.int32), dev)
    timeit("pallas grid gather 512K idx from 64K tab",
           jax.jit(functools.partial(pallas_gather_grid, tile=T)), x, bigidx,
           elems=M * (1 << 19))

    # honest XLA chase-round for comparison (sum-forced)
    N = 1 << 19
    nd = jax.device_put(rng.integers(0, N, (32, N)).astype(np.int32), dev)
    timeit("XLA 1 chase round (32,512K)",
           jax.jit(lambda n: jnp.take_along_axis(n, n, axis=1)), nd,
           elems=32 * N)


if __name__ == "__main__":
    main()
