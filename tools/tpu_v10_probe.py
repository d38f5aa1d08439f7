"""Marginal-cost probe for the v10 decode kernel.

Compiles ablated variants of the v10 kernel (full, no-matmul, no-onehot,
no-bcast, no-rotate) on real hardware and times each on identical bench
inputs, so the dominant per-quad cost is measured, not guessed.

Run: PYTHONPATH=/root/repo:/root/.axon_site PALLAS_AXON_REMOTE_COMPILE=1 \
       python tools/tpu_v10_probe.py
"""
import functools
import os
import sys
import time

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
sys.path[:0] = [os.path.join(sys.path[0], "tests"), os.path.join(sys.path[0], "tools")]

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zxc_tpu.ops import plan_frame
import kernel_attic as PD  # superset view: live kernels + rejected generations
from zxc_tpu import runtime

MB = int(os.environ.get("PROBE_MB", "8"))
LEVEL = 3
BLOCK = 64 * 1024
B10 = 16
REPS = 5


def make_kernel_body(mode):
    V9_UNROLL = PD.V9_UNROLL

    def _kernel(ts_ref, pctrl_ref, litb_ref, out_ref):
        b = pl.program_id(0)
        NT = out_ref.shape[1] // 32
        RLP = litb_ref.shape[1]
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        rowiota = jax.lax.broadcasted_iota(jnp.int32, (128, RLP), 1)
        litb = litb_ref[0]

        def contrib4(bat):
            if mode == "nobcast":
                bc = jnp.full((128, 128), (3 << 14) | (200 << 21), jnp.int32)
            else:
                bcs = []
                for u in range(V9_UNROLL):
                    grp = pctrl_ref[0, pl.ds(((bat + u) >> 7) * 32, 32), :]
                    bcs.append(jnp.take_along_axis(
                        grp, jnp.full((32, 128), (bat + u) & 127, jnp.int32),
                        axis=1))
                bc = jnp.concatenate(bcs, axis=0)
            rl = bc & 127
            sv = (bc >> 7) & 127
            e1 = (bc >> 14) & 127
            row = jax.lax.shift_right_logical(bc, 21)
            if mode == "nomatmul":
                gath = litb[:128, :].astype(jnp.int32) + row
            else:
                if mode == "noonehot":
                    onehot = jnp.where(
                        rowiota == jax.lax.broadcasted_iota(
                            jnp.int32, (128, RLP), 0),
                        jnp.float32(1), jnp.float32(0)) + \
                        (row[:, :1] * 0).astype(jnp.float32)
                else:
                    onehot = jnp.where(rowiota == row[:, :1],
                                       jnp.float32(1), jnp.float32(0))
                gath = jax.lax.dot_general(
                    onehot.astype(jnp.bfloat16), litb,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(jnp.int32)
            if mode == "norotate":
                sh = gath
            else:
                sh = jnp.take_along_axis(gath, (lane128 + rl) & 127, axis=1)
            m = (lane128 >= sv) & (lane128 <= e1)
            return jnp.where(m, sh, 0)

        for t in range(NT):
            b0 = ts_ref[b, t]
            b1 = ts_ref[b, t + 1]

            def quad_body(g, acc):
                c = contrib4(b0 + V9_UNROLL * g)
                return acc + c[0:32] + c[32:64] + c[64:96] + c[96:128]

            tile = jax.lax.fori_loop(0, (b1 - b0) // V9_UNROLL, quad_body,
                                     jnp.zeros((32, 128), jnp.int32))
            out_ref[0, t * 32:(t + 1) * 32, :] = tile

    return _kernel


def build_kernel(mode, MAXB, RLP, block):
    NR = block // 128
    G32 = 32 * (-(-MAXB // 128))
    body = make_kernel_body(mode)

    def call(ts, pctrl, lit8):
        litb = lit8.astype(jnp.bfloat16)
        B = pctrl.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, G32, 128), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RLP, 128), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, NR, 128), lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            body, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, NR, 128), jnp.int32),
        )(ts, pctrl, litb)

    return jax.jit(call)


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
    n_ops = sum(len(r[0]) for r in per[:nb]) * 32
    n_batches = sum(len(r[0]) for r in per[:nb])
    print(f"# {MB} MiB, {nb} blocks, MAXB={MAXB} RLP={RLP} "
          f"batches={n_batches} ({len(data)/n_batches:.1f} B/batch)",
          file=sys.stderr)
    dev = jax.devices()[0]
    dsets = [tuple(jax.device_put(a, dev) for a in s[1:]) for s in sets]
    jax.block_until_ready(dsets)

    for mode in ("full", "norotate", "nobcast", "noonehot", "nomatmul"):
        kern = build_kernel(mode, (sets[0][2].shape[1] // 32) * 128, RLP,
                            BLOCK)

        @jax.jit
        def step(ds):
            f = jnp.uint32(0)
            for s in ds:
                f = f + jnp.sum(kern(*s).astype(jnp.uint32))
            return f

        t0 = time.time()
        r0 = int(step(dsets))
        tc = time.time() - t0
        times = []
        for _ in range(REPS):
            t0 = time.time()
            r = int(step(dsets))
            times.append(time.time() - t0)
        dt = min(times)
        print(f"{mode:10s} {dt*1e3:8.2f} ms  {len(data)/1e9/dt:7.3f} GB/s "
              f"(compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
