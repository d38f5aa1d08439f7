"""Slope-timed ablation of the v12 kernel: where did the K=128 savings go?

Variants:
  full      as shipped
  nopt      skip the Pt permute matmul (adds c rows directly — wrong
            output, timing only)
  statwin   static window (litb[:128]) instead of the dynamic pl.ds slice
  nomm      replace onehot+matmul with a flat read (timing only)
  mmonly    matmul kept, rotate+mask+Pt dropped (timing only)

Run: PYTHONPATH=/root/repo:/root/.axon_site PALLAS_AXON_REMOTE_COMPILE=1 \
       python tools/tpu_v12_ablate2.py
"""
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
B12 = 16
REPS = 5
K = int(os.environ.get("PROBE_K", "8"))


def make_body(mode):
    def _kernel(qs_ref, qbase_ref, pctrl_ref, tq_ref, litb_ref, out_ref):
        b = pl.program_id(0)
        NT = out_ref.shape[1] // 32
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        rowiota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        row32 = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0)

        def contrib_quad(q):
            if mode == "statwin":
                win = litb_ref[0, :128, :]
            else:
                base = pl.multiple_of(qbase_ref[b, q], 16)
                win = litb_ref[0, pl.ds(base, 128), :]
            bcs = []
            for u in range(4):
                bat = 4 * q + u
                grp = pctrl_ref[0, pl.ds((bat >> 7) * 32, 32), :]
                bcs.append(jnp.take_along_axis(
                    grp, jnp.full((32, 128), bat & 127, jnp.int32), axis=1))
            bc = jnp.concatenate(bcs, axis=0)
            rl = bc & 127
            sv = (bc >> 7) & 127
            e1 = (bc >> 14) & 127
            rowrel = jax.lax.shift_right_logical(bc, 21)
            if mode == "nomm":
                gath = win[:128, :].astype(jnp.int32) + rowrel
            else:
                onehot = jnp.where(rowiota == rowrel[:, :1],
                                   jnp.float32(1), jnp.float32(0))
                gath = jax.lax.dot_general(
                    onehot.astype(jnp.bfloat16), win,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(jnp.int32)
            if mode == "mmonly":
                return gath[:32] + gath[32:64] + gath[64:96] + gath[96:128]
            sh = jnp.take_along_axis(gath, (lane128 + rl) & 127, axis=1)
            m = (lane128 >= sv) & (lane128 <= e1)
            c = jnp.where(m, sh, 0)
            if mode == "nopt":
                return c[:32] + c[32:64] + c[64:96] + c[96:128]
            tgt = tq_ref[0, q, :][None, :]
            pt = jnp.where(row32 == tgt, jnp.float32(1), jnp.float32(0))
            return jax.lax.dot_general(
                pt.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)

        for t in range(NT):
            q0 = qs_ref[b, t]
            q1 = qs_ref[b, t + 1]

            def qbody(q, acc):
                return acc + contrib_quad(q)

            tile = jax.lax.fori_loop(q0, q1, qbody,
                                     jnp.zeros((32, 128), jnp.int32))
            out_ref[0, t * 32:(t + 1) * 32, :] = tile

    return _kernel


def build(mode, MAXQ, RLP, block):
    NR = block // 128
    NB = MAXQ * 4
    G32 = 32 * (-(-NB // 128))
    body = make_body(mode)

    def call(qs, qbase, pctrl, tq, lit8):
        litb = lit8.astype(jnp.bfloat16)
        B = pctrl.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, G32, 128), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, MAXQ, 128), lambda b, *_: (b, 0, 0),
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
        )(qs, qbase, pctrl, tq, litb)

    return jax.jit(call)


def slope_time(kern, dsets):
    def make(k):
        @jax.jit
        def krep(ds):
            f = jnp.uint32(0)
            for _ in range(k):
                ds = jax.lax.optimization_barrier(ds)
                for s in ds:
                    f = f + jnp.sum(kern(*s).astype(jnp.uint32))
            return f
        return krep

    lo, hi = make(1), make(1 + K)
    r0 = int(lo(dsets))
    int(hi(dsets))
    t_lo, t_hi = [], []
    for _ in range(REPS):
        t0 = time.time()
        assert int(lo(dsets)) == r0
        t_lo.append(time.time() - t0)
        t0 = time.time()
        int(hi(dsets))
        t_hi.append(time.time() - t0)
    return (min(t_hi) - min(t_lo)) / K


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
    nb = plan.n_blocks
    nd = -(-nb // B12)
    pad = nd * B12 - nb
    p = pieces + [pieces[-1]] * pad
    l = lits + [lits[-1]] * pad
    t = list(plan.totals) + [0] * pad
    raw = [PD.pack_blocks_v12(p[d * B12:(d + 1) * B12],
                              l[d * B12:(d + 1) * B12],
                              t[d * B12:(d + 1) * B12], BLOCK)
           for d in range(nd)]
    MAXQ = max(s[1].shape[1] for s in raw)
    RL = max(s[4].shape[1] for s in raw)
    sets = [PD.pack_blocks_v12(p[d * B12:(d + 1) * B12],
                               l[d * B12:(d + 1) * B12],
                               t[d * B12:(d + 1) * B12], BLOCK,
                               MAXQ=MAXQ, RL=RL)
            for d in range(nd)]
    n_quads = sum(int(s[0][:, -1].sum()) for s in sets)
    print(f"# {MB} MiB MAXQ={MAXQ} RLP={sets[0][4].shape[1]} quads={n_quads}",
          file=sys.stderr)
    dev = jax.devices()[0]
    dsets = [tuple(jax.device_put(a, dev) for a in s) for s in sets]
    jax.block_until_ready(dsets)
    for mode in ("full", "nopt", "statwin", "nomm", "mmonly"):
        kern = build(mode, MAXQ, sets[0][4].shape[1], BLOCK)
        t0 = time.time()
        dt = slope_time(kern, dsets)
        print(f"{mode:9s} {dt*1e3:8.2f} ms  {len(data)/1e9/dt:7.3f} GB/s  "
              f"{dt/n_quads*1e9:6.0f} ns/quad (wall {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
