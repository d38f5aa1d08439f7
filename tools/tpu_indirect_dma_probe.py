#!/usr/bin/env python
"""Probe: is indirect (gather) DMA available from Pallas on this stack?

Tries the dynamic-slice-per-row DMA ladder and the `.at[idx_vector]`
indirect form on both HBM->VMEM and VMEM->VMEM paths. Each form is
compiled in isolation so one verifier rejection doesn't kill the rest.
Status log (ROADMAP item 1): rejected by the client MLIR verifier on
jax 0.9 / current libtpu as of round 2; retry on every stack bump.
"""
import sys
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 4096, 128          # table rows
G = 1024                  # rows gathered


def attempt(name, build):
    try:
        fn = build()
        out = np.asarray(fn())
        print(f"{name:40s} OK  sum={out.sum()}", flush=True)
        return True
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:300]
        print(f"{name:40s} FAIL {type(e).__name__}: {msg}", flush=True)
        return False


def main():
    dev = jax.devices()[0]
    print("device:", dev, "jax", jax.__version__, flush=True)
    rng = np.random.default_rng(0)
    table = jax.device_put(
        rng.integers(0, 256, (R, C)).astype(np.int32), dev)
    idx = jax.device_put(rng.integers(0, R, (G,)).astype(np.int32), dev)

    # form A: per-row dynamic-slice DMA loop, table in ANY (HBM)
    def build_a():
        def kern(idx_ref, tab_ref, out_ref, sem):
            def body(i, _):
                r = idx_ref[i]
                cp = pltpu.make_async_copy(tab_ref.at[pl.ds(r, 1)],
                                           out_ref.at[pl.ds(i, 1)], sem)
                cp.start()
                cp.wait()
                return 0
            jax.lax.fori_loop(0, G, body, 0)

        f = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.SemaphoreType.DMA],
            ),
            out_shape=jax.ShapeDtypeStruct((G, C), jnp.int32),
        )
        return lambda: jax.jit(f)(idx, table)

    # form B: vector indirect DMA — gather all rows in ONE enqueue
    def build_b():
        def kern(tab_ref, idx_ref, out_ref, sem):
            cp = pltpu.make_async_copy(tab_ref.at[idx_ref[:]], out_ref, sem)
            cp.start()
            cp.wait()

        f = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
            out_shape=jax.ShapeDtypeStruct((G, C), jnp.int32),
        )
        return lambda: jax.jit(f)(table, idx)

    # form C: double-buffered row DMA pipeline (start i+1 before wait i)
    def build_c():
        def kern(idx_ref, tab_ref, out_ref, sems):
            def start(i, slot):
                cp = pltpu.make_async_copy(
                    tab_ref.at[pl.ds(idx_ref[i], 1)],
                    out_ref.at[pl.ds(i, 1)], sems.at[slot])
                cp.start()

            def wait(i, slot):
                cp = pltpu.make_async_copy(
                    tab_ref.at[pl.ds(idx_ref[i], 1)],
                    out_ref.at[pl.ds(i, 1)], sems.at[slot])
                cp.wait()

            start(0, 0)

            def body(i, _):
                @pl.when(i + 1 < G)
                def _():
                    start(i + 1, (i + 1) % 2)
                wait(i, i % 2)
                return 0
            jax.lax.fori_loop(0, G, body, 0)

        f = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
            ),
            out_shape=jax.ShapeDtypeStruct((G, C), jnp.int32),
        )
        return lambda: jax.jit(f)(idx, table)

    ok = {}
    ok["A rowloop HBM->VMEM"] = attempt("A rowloop HBM->VMEM", build_a)
    ok["B vector indirect"] = attempt("B vector indirect .at[vec]", build_b)
    ok["C dbuf rowloop"] = attempt("C double-buffered rowloop", build_c)

    # time whichever worked (marginal, K-rep slope)
    exp = np.asarray(table)[np.asarray(idx)]
    for name, build in (("A", build_a), ("C", build_c)):
        if not ok.get(f"{name} rowloop HBM->VMEM",
                      ok.get("C dbuf rowloop") if name == "C" else False):
            continue
        try:
            fn = build()
            out = np.asarray(fn())
            if not (out == exp).all():
                print(f"{name}: WRONG RESULT", flush=True)
                continue
            ts = []
            for _ in range(5):
                t0 = time.time()
                jax.block_until_ready(fn())
                ts.append(time.time() - t0)
            t = min(ts)
            print(f"{name}: {t*1e3:.2f} ms for {G} row-DMAs "
                  f"({G*C*4/t/1e9:.3f} GB/s incl ~30ms RTT)", flush=True)
        except Exception:
            traceback.print_exc()


if __name__ == "__main__":
    main()
