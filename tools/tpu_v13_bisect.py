"""Bisect the v13 hardware miscompare: shifted-iota compares vs
pair-unrolled loop. Builds two hybrid kernels on the v12 packing and
checks the fingerprint of each on hardware.

Run: PYTHONPATH=/root/repo:/root/.axon_site PALLAS_AXON_REMOTE_COMPILE=1 \
       python tools/tpu_v13_bisect.py
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

MB = 2
BLOCK = 64 * 1024
B12 = 16


def make_body(shifted, paired):
    def _kernel(qs_ref, qbase_ref, pctrl_ref, tq_ref, litb_ref, out_ref):
        b = pl.program_id(0)
        NT = out_ref.shape[1] // 32
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        rowiota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        row32 = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0)

        def contrib_quad(q):
            base = pl.multiple_of(qbase_ref[b, q], 16)
            win = litb_ref[0, pl.ds(base, 128), :]
            bcs = []
            for u in range(4):
                bat = 4 * q + u
                grp = pctrl_ref[0, pl.ds((bat >> 7) * 32, 32), :]
                bcs.append(jnp.take_along_axis(
                    grp, jnp.full((32, 128), bat & 127, jnp.int32), axis=1))
            bc = jnp.concatenate(bcs, axis=0)
            if shifted:
                onehot = jnp.where((rowiota << 21) == (bc[:, :1] & ~0x1FFFFF),
                                   jnp.float32(1), jnp.float32(0))
            else:
                rowrel = jax.lax.shift_right_logical(bc, 21)
                onehot = jnp.where(rowiota == rowrel[:, :1],
                                   jnp.float32(1), jnp.float32(0))
            gath = jax.lax.dot_general(
                onehot.astype(jnp.bfloat16), win, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            if shifted:
                sh = jnp.take_along_axis(gath, (lane128 + bc) & 127, axis=1)
                m = ((bc & 0x3F80) <= (lane128 << 7)) & \
                    ((bc & 0x1FC000) >= (lane128 << 14))
            else:
                rl = bc & 127
                sv = (bc >> 7) & 127
                e1 = (bc >> 14) & 127
                sh = jnp.take_along_axis(gath, (lane128 + rl) & 127, axis=1)
                m = (lane128 >= sv) & (lane128 <= e1)
            c = jnp.where(m, sh, 0)
            tgt = tq_ref[0, q, :][None, :]
            pt = jnp.where(row32 == tgt, jnp.float32(1), jnp.float32(0))
            return jax.lax.dot_general(
                pt.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)

        for t in range(NT):
            q0 = qs_ref[b, t]
            q1 = qs_ref[b, t + 1]
            if paired:
                def qbody(g, acc):
                    q = q0 + 2 * g
                    return acc + contrib_quad(q) + contrib_quad(q + 1)
                tile = jax.lax.fori_loop(0, (q1 - q0) >> 1, qbody,
                                         jnp.zeros((32, 128), jnp.int32))
            else:
                def qbody(q, acc):
                    return acc + contrib_quad(q)
                tile = jax.lax.fori_loop(q0, q1, qbody,
                                         jnp.zeros((32, 128), jnp.int32))
            out_ref[0, t * 32:(t + 1) * 32, :] = tile

    return _kernel


def build(shifted, paired, MAXQ, RLP, block):
    NR = block // 128
    NB = MAXQ * 4
    G32 = 32 * (-(-NB // 128))
    body = make_body(shifted, paired)

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


def main():
    from gen_corpus import gen_corpus
    import ref_oracle
    data = gen_corpus(MB * 1024 * 1024)
    arc = ref_oracle.ref_compress(data, level=3, block_size=BLOCK)
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
    raw = [PD.pack_blocks_v12(p[d*B12:(d+1)*B12], l[d*B12:(d+1)*B12],
                              t[d*B12:(d+1)*B12], BLOCK, quad_align=2)
           for d in range(nd)]
    MAXQ = max(s[1].shape[1] for s in raw)
    RL = max(s[4].shape[1] for s in raw)
    sets = [PD.pack_blocks_v12(p[d*B12:(d+1)*B12], l[d*B12:(d+1)*B12],
                               t[d*B12:(d+1)*B12], BLOCK,
                               MAXQ=MAXQ, RL=RL, quad_align=2)
            for d in range(nd)]
    dev = jax.devices()[0]
    dsets = [tuple(jax.device_put(a, dev) for a in s) for s in sets]
    jax.block_until_ready(dsets)
    NR = BLOCK // 128
    flatpos = jnp.arange(NR * 128, dtype=jnp.uint32)
    tot_sets = [jnp.asarray(t[d*B12:(d+1)*B12], jnp.uint32)
                for d in range(nd)]
    exp = np.uint32(0)
    pos = 0
    with np.errstate(over="ignore"):
        for i in range(plan.n_blocks):
            blk = np.frombuffer(data[pos:pos+plan.totals[i]], np.uint8)
            exp += blk.astype(np.uint32).sum(dtype=np.uint32)
            pos += plan.totals[i]

    for shifted, paired in ((True, False), (False, True), (True, True)):
        kern = build(shifted, paired, MAXQ, sets[0][4].shape[1], BLOCK)

        @jax.jit
        def step(ds, tots):
            f = jnp.uint32(0)
            for s, tt in zip(ds, tots):
                out = kern(*s)
                flat = out.reshape(B12, NR * 128).astype(jnp.uint32)
                mask = flatpos[None, :] < tt[:, None]
                f = f + jnp.sum(jnp.where(mask, flat, 0))
            return f

        t0 = time.time()
        got = int(step(dsets, tot_sets))
        print(f"shifted={shifted} paired={paired}: "
              f"{'MATCH' if got == int(exp) else 'MISMATCH'} "
              f"(compile {time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
