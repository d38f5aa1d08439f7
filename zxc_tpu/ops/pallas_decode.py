"""Pallas serial copy-engine decoder: the flagship device kernel.

One grid cell = one block. The host resolver (device_pure mode) reduces the
block to a flat list of PURE pieces — ``out[p] = lit_full[c + (p - s) % k]``
where every periodic piece (k <= 1024) points at a 2048-byte materialized
repeating pattern — so the kernel is nothing but windowed copies:

  per piece, per 1024-byte chunk:
     src0  = c + (p0 - s) % k                (scalar core)
     take 2048-element aligned window of lit, flat-roll by src0 % 1024
     flat-roll into place at the destination window, masked RMW store

Byte values ride one-per-i32-lane (the TPU's natural (8,128) tile), so all
"byte" addressing is element addressing and the only alignment unit is the
1024-element row-granule. Rolls are `tpu.dynamic_rotate` (dynamic shifts),
stores are read-modify-write selects — every op is a dense VPU op; there
are no gathers anywhere.

This is the TPU reformulation of the reference's hot decode loop
(zxc_decompress.c:890-1034): the wild-copy ladder becomes flat-rolls, the
off==1/pattern fills become cached pattern windows, and the SAFE/FAST
bounds games disappear because the host resolver already validated
everything.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 1024          # elements per copy chunk (8 rows x 128 lanes)
ROWS = CHUNK // 128   # 8
WIN = 2 * ROWS        # 16-row (2048-element) working window


def _flat_roll(v, s, R: int, C: int = 128):
    """out flat[f] = v flat[(f + s) mod R*C] — dynamic left roll."""
    q = s // C
    m = s % C
    a = pltpu.roll(v, (R - q) % R, axis=0)
    b = pltpu.roll(v, (R - q - 1) % R, axis=0)
    al = pltpu.roll(a, (C - m) % C, axis=1)
    bl = pltpu.roll(b, (C - m) % C, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    return jnp.where(lane < C - m, al, bl)


def _flat_roll_right(v, s, R: int, C: int = 128):
    return _flat_roll(v, (R * C - s) % (R * C), R, C)



# Rejected kernel generations v1-v12, v14-v18, v20-v21 live in
# tools/kernel_attic.py with their PERF.md cross-references; this module
# keeps only the production kernels: v19 (flagship), v13 (the maintained
# fallback for blocks < 16 KiB), and their packers.

def lane_ops_blocks(pieces_list, totals):
    """Per-block native lane-op emission (zxch_lane_ops) for the v9 kernel.
    Returns a list of (rows, roll, s, e, tile_start) tuples."""
    from .. import runtime

    per = []
    for (po, pc, ps, pk), total in zip(pieces_list, totals):
        r = runtime.lane_ops(po, pc, ps, pk, int(total))
        assert r is not None, "lane_ops budget exceeded"
        per.append(r)
    return per

# ---------------------------------------------------------------------------
# v12: row-sorted windowed gather.
#
# Honest (RTT-cancelling) ablation of v10 (tools/tpu_v12_ablate.py) puts
# ~43% of kernel time in the one-hot matmul, whose cost scales with the
# full literal height RLP (~528 rows at level 3). v12 shrinks the gather
# window to 128 rows: per 4 KiB output tile, ops are sorted by source row
# and chunked into 128-op quads whose rows fit a 128-row (8-aligned)
# window of lit_full, so the gather matmul is (128,128)@(128,128) — 4x
# fewer MACs — and the one-hot compare runs over 128 instead of RLP
# columns. Because sorted ops lose the slot==target-row invariant, each
# slot carries an explicit 5-bit target row, applied by a cheap
# (32,128)@(128,128) permute matmul fed from a lane-major target plane.
# Row-sorting also removes the per-row layer-skew padding of the v9/v10
# packer (~25% fewer batches at level 3).
#
# TPU reformulation of the reference hot loop zxc_decompress.c:890-1034.
# ---------------------------------------------------------------------------


def pack_blocks_v12(pieces_list, lit_list, totals, block: int,
                    per=None, MAXQ=None, RL=None, quad_align: int = 1):
    """Pack the v12 dispatch batch.

    Returns (qs, qbase, pctrl, tq, lit8):
      qs    (B, NT+1)      int32  per-tile quad prefix      (scalar prefetch)
      qbase (B, MAXQ)      int32  8-aligned lit row base per quad (prefetch)
      pctrl (B, G32, 128)  int32  pre-transposed packed control for slot
                                  i = 32*u + k of quad q (bat = 4q + u):
                                  pctrl[b, 32*(bat>>7)+k, bat&127] =
                                      roll | s<<7 | (e-1)<<14 | rowrel<<21
                                  (empty slots: s=1, e-1=0)
      tq    (B, MAXQ, 128) int32  lane-major target row per slot
      lit8  (B, RLP, 128)  uint8  lit_full bytes, RLP >= max qbase + 128
    """
    B = len(pieces_list)
    if per is None:
        per = lane_ops_blocks(pieces_list, totals)
    NT = block // 4096
    # pass 1: recover raw ops per (block, tile) from the layered layout and
    # chunk row-sorted ops into window-constrained quads
    blocks = []
    maxq = 1
    maxrow = 0
    for (rows, rl, s, e, tile_start) in per:
        nb = len(rows)
        quads = []          # per tile: list of (base, ops[(rowrel,rl,s,e1,tgt)])
        qs_t = [0]
        for t in range(len(tile_start) - 1):
            b0, b1 = tile_start[t], tile_start[t + 1]
            er = rows[b0:b1].reshape(-1)
            es = s[b0:b1].reshape(-1)
            ee = e[b0:b1].reshape(-1)
            erl = rl[b0:b1].reshape(-1)
            live = np.nonzero(ee > es)[0] if b1 > b0 else np.zeros(0, int)
            tgt = live & 31
            order = np.argsort(er[live], kind="stable")
            lr = er[live][order]
            lops = np.stack([lr, erl[live][order], es[live][order],
                             ee[live][order] - 1, tgt[order]], axis=1) \
                if len(live) else np.zeros((0, 5), np.int64)
            i = 0
            n = len(lops)
            while i < n:
                # 16-aligned base: bf16 sublane tiling requires the dynamic
                # window start be a provable multiple of 16 (pl.multiple_of)
                base = int(lops[i, 0]) & ~15
                j = min(i + 128, n)
                # shrink until the window fits (rows are sorted)
                while lops[j - 1, 0] - base > 127:
                    j -= 1
                quads.append((base, lops[i:j]))
                if len(quads[-1][1]):
                    maxrow = max(maxrow, base + 128)
                i = j
            if n == 0:
                quads.append((0, lops))
                maxrow = max(maxrow, 128)
            while (len(quads) - qs_t[-1]) % quad_align:
                quads.append((0, np.zeros((0, 5), np.int64)))
                maxrow = max(maxrow, 128)
            qs_t.append(len(quads))
        blocks.append((qs_t, quads))
        maxq = max(maxq, len(quads))
    if MAXQ is None:
        MAXQ = maxq
    assert maxq <= MAXQ, "MAXQ below a block's quad count"
    if RL is None:
        RL = max(maxrow, max(-(-len(lit) // 128) for lit in lit_list) + 1)
    RLP = max(-(-RL // 16) * 16, -(-maxrow // 16) * 16)
    NB = MAXQ * 4
    NG = -(-NB // 128)
    qs = np.zeros((B, NT + 1), np.int32)
    qbase = np.zeros((B, MAXQ), np.int32)
    pctrl = np.full((B, NG * 32, 128), 1 << 7, np.int32)
    tq = np.zeros((B, MAXQ, 128), np.int32)
    lit8 = np.zeros((B, RLP, 128), np.uint8)
    for j, ((qs_t, quads), lit) in enumerate(zip(blocks, lit_list)):
        qs[j, :len(qs_t)] = qs_t
        qs[j, len(qs_t):] = qs_t[-1]
        for q, (base, lops) in enumerate(quads):
            qbase[j, q] = base
            if not len(lops):
                continue
            i = np.arange(len(lops))
            bat = 4 * q + (i >> 5)
            sub = i & 31
            packed = (lops[:, 1] | (lops[:, 2] << 7) | (lops[:, 3] << 14)
                      | ((lops[:, 0] - base) << 21))
            pctrl[j, 32 * (bat >> 7) + sub, bat & 127] = packed
            tq[j, q, i] = lops[:, 4]
        flat = np.frombuffer(bytes(lit), np.uint8)
        lit8[j].reshape(-1)[:len(flat)] = flat
    return qs, qbase, pctrl, tq, lit8

# ---------------------------------------------------------------------------
# v13: v12 with a pair-unrolled quad loop.
#
# Honest ablation of v12 (tools/tpu_v12_ablate2.py): the windowed gather
# matmul costs almost the same at K=128 as v10's at K=528 — per-call MXU
# issue/drain latency dominates, not MACs. The loop body processes TWO
# quads with independent data flows, so the scheduler can overlap one
# quad's VPU glue with the other's MXU matmuls (quads per tile are padded
# to even by the packer). NOTE a shifted-iota compare formulation (no
# field extracts) was bit-exact in interpret mode but MISCOMPILED on
# hardware (tools/tpu_v13_bisect.py) — plain extracts are kept.
# ---------------------------------------------------------------------------


def _kernel_v13(qs_ref, qbase_ref, pctrl_ref, tq_ref, litb_ref, out_ref):
    b = pl.program_id(0)
    NT = out_ref.shape[1] // 32
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    rowiota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    row32 = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0)

    def contrib_quad(q):
        base = pl.multiple_of(qbase_ref[b, q], 16)
        win = litb_ref[0, pl.ds(base, 128), :]   # (128,128) bf16
        bcs = []
        for u in range(4):
            bat = 4 * q + u
            grp = pctrl_ref[0, pl.ds((bat >> 7) * 32, 32), :]
            bcs.append(jnp.take_along_axis(
                grp, jnp.full((32, 128), bat & 127, jnp.int32), axis=1))
        bc = jnp.concatenate(bcs, axis=0)        # (128,128) slot-major
        rl = bc & 127
        sv = (bc >> 7) & 127
        e1 = (bc >> 14) & 127
        rowrel = jax.lax.shift_right_logical(bc, 21)
        onehot = jnp.where(rowiota == rowrel[:, :1],
                           jnp.float32(1), jnp.float32(0))
        gath = jax.lax.dot_general(
            onehot.astype(jnp.bfloat16), win, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        sh = jnp.take_along_axis(gath, (lane128 + rl) & 127, axis=1)
        m = (lane128 >= sv) & (lane128 <= e1)
        c = jnp.where(m, sh, 0)
        tgt = tq_ref[0, q, :][None, :]           # (1,128) lane-major
        pt = jnp.where(row32 == tgt, jnp.float32(1), jnp.float32(0))
        return jax.lax.dot_general(
            pt.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)

    for t in range(NT):
        q0 = qs_ref[b, t]
        q1 = qs_ref[b, t + 1]

        def qbody(g, acc):
            q = q0 + 2 * g
            return acc + contrib_quad(q) + contrib_quad(q + 1)

        tile = jax.lax.fori_loop(0, (q1 - q0) >> 1, qbody,
                                 jnp.zeros((32, 128), jnp.int32))
        out_ref[0, t * 32:(t + 1) * 32, :] = tile


@functools.lru_cache(maxsize=32)
def v13_kernel(block: int, MAXQ: int, RLP: int, interpret: bool = False):
    NR = block // 128
    NB = MAXQ * 4
    G32 = 32 * (-(-NB // 128))

    def call(qs, qbase, pctrl, tq, lit8):
        litb = lit8.astype(jnp.bfloat16)
        # tq may ship as u8 (tgt < 128: quarters its H2D) and widens to
        # i32 in XLA before the kernel — Mosaic's i8 sublane packing
        # cannot prove dynamic row alignment, and the lowering is fragile
        tq = tq.astype(jnp.int32)
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
            _kernel_v13,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, NR, 128), jnp.int32),
            interpret=interpret,
        )(qs, qbase, pctrl, tq, litb)

    return jax.jit(call)


def pad_v12_set(s, MAXQ: int, RLP: int):
    """Pad one pack_blocks_v12 result to a common (MAXQ, RLP) shape.

    Padded quads never execute (the qs tile prefix never reaches them)
    and pctrl's filler value 1<<7 encodes an empty slot (s=1 > e-1=0),
    so padding is equivalent to repacking with explicit MAXQ/RL.
    """
    qs, qb, pc, tq, l8 = s
    NG32 = 32 * (-(-(MAXQ * 4) // 128))
    qb = np.pad(qb, ((0, 0), (0, MAXQ - qb.shape[1])))
    tq = np.pad(tq, ((0, 0), (0, MAXQ - tq.shape[1]), (0, 0)))
    pc = np.pad(pc, ((0, 0), (0, NG32 - pc.shape[1]), (0, 0)),
                constant_values=1 << 7)
    l8 = np.pad(l8, ((0, 0), (0, RLP - l8.shape[1]), (0, 0)))
    return (qs, qb, pc, tq, l8)


def decode_blocks_v13(pieces_list, lit_list, totals, block: int,
                      interpret: bool = False, device=None,
                      dispatch: int = 16):
    """Production v13 decode: fixed-width dispatch groups + bucketed
    shapes so repeated calls reuse compiled kernels (Mosaic remote
    compiles are minutes; lru-cached `v13_kernel` keys on the bucket)."""
    nb = len(pieces_list)
    if nb == 0:
        return []
    B = min(dispatch, nb)
    nd = -(-nb // B)
    pad = nd * B - nb
    p = list(pieces_list) + [pieces_list[-1]] * pad
    l = list(lit_list) + [lit_list[-1]] * pad
    t = list(totals) + [0] * pad
    raw = [pack_blocks_v12(p[d * B:(d + 1) * B], l[d * B:(d + 1) * B],
                           t[d * B:(d + 1) * B], block, quad_align=2)
           for d in range(nd)]
    # bucket to multiples of (32 quads, 128 lit rows) to bound the number
    # of distinct compiled shapes across archives
    MAXQ = -(-max(s[1].shape[1] for s in raw) // 32) * 32
    RLP = -(-max(s[4].shape[1] for s in raw) // 128) * 128
    kern = v13_kernel(block, MAXQ, RLP, interpret)
    outs = []
    for s in raw:
        args = pad_v12_set(s, MAXQ, RLP)
        if device is not None:
            args = tuple(jax.device_put(a, device) for a in args)
        outs.append(np.asarray(kern(*args)))
    res = []
    for j in range(nb):
        out = outs[j // B][j % B]
        res.append(out.reshape(-1)[:totals[j]].astype(np.uint8).tobytes())
    return res


# ---------------------------------------------------------------------------
# v19: multi-op slots — ops sharing (source row, target row) share a slot.
#
# v15 sits at the MXU issue floor (~146 ns per 128^3 bf16 matmul, 2
# dependent matmuls per quad), so the only lever left in this
# formulation is fewer QUADS per byte. A v15 slot carries ONE lane op;
# but after the gather matmul the slot row holds the WHOLE 128-byte
# source row, so any number of ops reading that row toward the same
# target row can be served by re-applying the (rotate, mask) pair —
# pure VPU work that the pair-unrolled loop hides under the other
# quad's matmuls. Literal pieces cluster hard (consecutive literal ops
# of one output row read the same lit_full row), so K sub-ops per slot
# cuts slots to 0.70x (K=2) / 0.60x (K=3) of ops on the pinned corpus
# (tools/v19_sim.py), shrinking the matmul count by the same factor.
#
# Control: plane j of pctrl packs sub-op j's (roll | s<<7 | e-1<<14);
# plane 0 additionally carries the slot's window-relative source row at
# bit 21. Planes are stacked along rows: plane j occupies rows
# [j*G32, (j+1)*G32). Sub-ops of a slot cover disjoint lane ranges of
# the same output row, so their masked contributions add.
#
# TPU reformulation of the reference hot loop zxc_decompress.c:890-1034.
# ---------------------------------------------------------------------------


def pack_blocks_v19(pieces_list, lit_list, totals, block: int,
                    per=None, MAXQ=None, RL=None, quad_align: int = 2,
                    K: int = 2):
    """Pack the v19 dispatch batch: (src,tgt)-grouped multi-op slots.

    Returns (qs, qbase, pctrl, tq, lit8) shaped as pack_blocks_v15's
    output except pctrl is (B, K*NG32, 128) with one plane per sub-op."""
    B = len(pieces_list)
    if per is None:
        per = lane_ops_blocks(pieces_list, totals)
    NR = block // 128
    assert NR % 128 == 0, "v19 needs block >= 16384"
    GRP = 4
    NST = NR // 128
    blocks = []
    maxq = 1
    maxrow = 0
    for (rows, rl, s, e, tile_start) in per:
        quads = []          # (base, src[], tgt[], ctl[n,K,3])
        qs_t = [0]
        nts = len(tile_start) - 1
        for st in range(NST):
            parts = []
            for g in range(GRP):
                t = st * GRP + g
                if t >= nts:
                    break
                b0, b1 = tile_start[t], tile_start[t + 1]
                if b1 <= b0:
                    continue
                er = rows[b0:b1].reshape(-1)
                es = s[b0:b1].reshape(-1)
                ee = e[b0:b1].reshape(-1)
                erl = rl[b0:b1].reshape(-1)
                live = np.nonzero(ee > es)[0]
                if not len(live):
                    continue
                tgt = (live & 31) + 32 * g
                parts.append(np.stack(
                    [er[live], tgt, erl[live], es[live], ee[live] - 1],
                    axis=1))
            if parts:
                ops = np.concatenate(parts, axis=0)
                key = ops[:, 0] * 128 + ops[:, 1]
                order = np.argsort(key, kind="stable")
                ops = ops[order]
                ks = key[order]
                new = np.r_[True, ks[1:] != ks[:-1]]
                gid = np.cumsum(new) - 1
                gstart = np.flatnonzero(new)
                within = np.arange(len(ks)) - gstart[gid]
                gsizes = np.diff(np.r_[gstart, len(ks)])
                spg = -(-gsizes // K)
                sbase = np.r_[0, np.cumsum(spg)[:-1]]
                slot_of = sbase[gid] + within // K
                sub_of = within % K
                n_slots = int(spg.sum())
                ssrc = np.zeros(n_slots, np.int64)
                stgt = np.zeros(n_slots, np.int64)
                sctl = np.zeros((n_slots, K, 3), np.int64)
                sctl[:, :, 1] = 1          # empty sub-op: s=1 > e-1=0
                ssrc[slot_of] = ops[:, 0]
                stgt[slot_of] = ops[:, 1]
                sctl[slot_of, sub_of, 0] = ops[:, 2]
                sctl[slot_of, sub_of, 1] = ops[:, 3]
                sctl[slot_of, sub_of, 2] = ops[:, 4]
            else:
                n_slots = 0
                ssrc = np.zeros(0, np.int64)
                stgt = np.zeros(0, np.int64)
                sctl = np.zeros((0, K, 3), np.int64)
            i = 0
            n = n_slots
            while i < n:
                base = int(ssrc[i]) & ~15
                j = min(i + 128, n)
                while ssrc[j - 1] - base > 127:
                    j -= 1
                quads.append((base, ssrc[i:j], stgt[i:j], sctl[i:j]))
                maxrow = max(maxrow, base + 128)
                i = j
            if n == 0:
                quads.append((0, ssrc, stgt, sctl))
                maxrow = max(maxrow, 128)
            while (len(quads) - qs_t[-1]) % quad_align:
                quads.append((0, np.zeros(0, np.int64),
                              np.zeros(0, np.int64),
                              np.zeros((0, K, 3), np.int64)))
                maxrow = max(maxrow, 128)
            qs_t.append(len(quads))
        blocks.append((qs_t, quads))
        maxq = max(maxq, len(quads))
    if MAXQ is None:
        MAXQ = maxq
    assert maxq <= MAXQ, "MAXQ below a block's quad count"
    if RL is None:
        RL = max(maxrow, max(-(-len(lit) // 128) for lit in lit_list) + 1)
    RLP = max(-(-RL // 16) * 16, -(-maxrow // 16) * 16)
    NB = MAXQ * 4
    NG32 = 32 * (-(-NB // 128))
    qs = np.zeros((B, NST + 1), np.int32)
    qbase = np.zeros((B, MAXQ), np.int32)
    pctrl = np.full((B, K * NG32, 128), 1 << 7, np.int32)
    tq = np.zeros((B, MAXQ, 128), np.uint8)   # tgt < 128: u8 quarters H2D
    lit8 = np.zeros((B, RLP, 128), np.uint8)
    for j, ((qs_t, quads), lit) in enumerate(zip(blocks, lit_list)):
        qs[j, :len(qs_t)] = qs_t
        qs[j, len(qs_t):] = qs_t[-1]
        for q, (base, ssrc, stgt, sctl) in enumerate(quads):
            qbase[j, q] = base
            n = len(ssrc)
            if not n:
                continue
            i = np.arange(n)
            bat = 4 * q + (i >> 5)
            sub = i & 31
            p0 = (sctl[:, 0, 0] | (sctl[:, 0, 1] << 7)
                  | (sctl[:, 0, 2] << 14) | ((ssrc - base) << 21))
            pctrl[j, 32 * (bat >> 7) + sub, bat & 127] = p0
            for kk in range(1, K):
                pk_ = (sctl[:, kk, 0] | (sctl[:, kk, 1] << 7)
                       | (sctl[:, kk, 2] << 14))
                pctrl[j, kk * NG32 + 32 * (bat >> 7) + sub, bat & 127] = pk_
            tq[j, q, i] = stgt
        flat = np.frombuffer(bytes(lit), np.uint8)
        lit8[j].reshape(-1)[:len(flat)] = flat
    return qs, qbase, pctrl, tq, lit8


# ---------------------------------------------------------------------------
# v25: self-referential window — v19 whose quads may read the block's OWN
# decoded output instead of the shipped lit8 window.
#
# The native resolver's self_ref mode (zxch_resolve_pieces_sr) emits
# KOUT pieces (out[p] = out[c + (p - s)]) for matches whose source
# completes before the destination's 16 KiB supertile. By the time the
# kernel's sequential supertile loop processes tile t, tiles < t are in
# out_ref (VMEM), so a quad whose source rows lie there can one-hot
# gather from out_ref exactly as lit quads gather from lit8 — no host
# materialization, no H2D for those bytes. lit8 shrinks toward the
# literal-section floor (measured 0.58x -> 0.47x of output at L3).
#
# Packing: KOUT pieces ride the same native lane-op emission with their
# source offset moved into a sentinel row space (OUT_SENT_ROWS); sorting
# by source row then naturally clusters OUT slots apart from lit slots
# (the >127-row gap means the window chunker never mixes planes in one
# quad). OUT quads carry qbase = out_row_base + OUT_QB_FLAG; the kernel
# selects the window source per quad on that flag.
# ---------------------------------------------------------------------------

OUT_SENT_ROWS = 1 << 15          # sentinel row base for OUT-plane sources
OUT_SENT_BYTES = OUT_SENT_ROWS * 128
OUT_QB_FLAG = 1 << 24            # qbase flag: window reads out_ref


def lane_ops_blocks_v25(pieces_list, totals):
    """lane_ops over piece tables that may contain KOUT pieces: their
    OUT-coordinate sources are shifted into the sentinel row space and
    the kind rewritten to pure, so the native splitter needs no change."""
    from .. import runtime

    per = []
    for (po, pc, ps, pk), total in zip(pieces_list, totals):
        kout = pk == np.int32(runtime.KOUT)
        if kout.any():
            pc = np.where(kout, pc + np.int32(OUT_SENT_BYTES), pc)
            pk = np.where(kout, np.int32(1 << 30), pk)
        r = runtime.lane_ops(po, pc, ps, pk, int(total))
        assert r is not None, "lane_ops budget exceeded"
        per.append(r)
    return per


def pack_blocks_v25(pieces_list, lit_list, totals, block: int,
                    per=None, MAXQ=None, RL=None, quad_align: int = 2,
                    K: int = 2):
    """Pack the v25 dispatch batch (v19 layout + OUT-plane quads)."""
    B = len(pieces_list)
    if per is None:
        per = lane_ops_blocks_v25(pieces_list, totals)
    NR = block // 128
    assert NR % 128 == 0, "v25 needs block >= 16384"
    GRP = 4
    NST = NR // 128
    out_base_max = OUT_SENT_ROWS + NR - 128  # clamp: window must fit NR
    blocks = []
    maxq = 1
    maxrow = 0
    for (rows, rl, s, e, tile_start) in per:
        quads = []          # (base, src[], tgt[], ctl[n,K,3])
        qs_t = [0]
        nts = len(tile_start) - 1
        for st in range(NST):
            parts = []
            for g in range(GRP):
                t = st * GRP + g
                if t >= nts:
                    break
                b0, b1 = tile_start[t], tile_start[t + 1]
                if b1 <= b0:
                    continue
                er = rows[b0:b1].reshape(-1)
                es = s[b0:b1].reshape(-1)
                ee = e[b0:b1].reshape(-1)
                erl = rl[b0:b1].reshape(-1)
                live = np.nonzero(ee > es)[0]
                if not len(live):
                    continue
                tgt = (live & 31) + 32 * g
                parts.append(np.stack(
                    [er[live], tgt, erl[live], es[live], ee[live] - 1],
                    axis=1))
            if parts:
                ops = np.concatenate(parts, axis=0)
                key = ops[:, 0] * 128 + ops[:, 1]
                order = np.argsort(key, kind="stable")
                ops = ops[order]
                ks = key[order]
                new = np.r_[True, ks[1:] != ks[:-1]]
                gid = np.cumsum(new) - 1
                gstart = np.flatnonzero(new)
                within = np.arange(len(ks)) - gstart[gid]
                gsizes = np.diff(np.r_[gstart, len(ks)])
                spg = -(-gsizes // K)
                sbase = np.r_[0, np.cumsum(spg)[:-1]]
                slot_of = sbase[gid] + within // K
                sub_of = within % K
                n_slots = int(spg.sum())
                ssrc = np.zeros(n_slots, np.int64)
                stgt = np.zeros(n_slots, np.int64)
                sctl = np.zeros((n_slots, K, 3), np.int64)
                sctl[:, :, 1] = 1          # empty sub-op: s=1 > e-1=0
                ssrc[slot_of] = ops[:, 0]
                stgt[slot_of] = ops[:, 1]
                sctl[slot_of, sub_of, 0] = ops[:, 2]
                sctl[slot_of, sub_of, 1] = ops[:, 3]
                sctl[slot_of, sub_of, 2] = ops[:, 4]
            else:
                n_slots = 0
                ssrc = np.zeros(0, np.int64)
                stgt = np.zeros(0, np.int64)
                sctl = np.zeros((0, K, 3), np.int64)
            i = 0
            n = n_slots
            while i < n:
                r0 = int(ssrc[i])
                if r0 >= OUT_SENT_ROWS:    # OUT plane: clamp into NR rows
                    base = min(r0 & ~15, out_base_max)
                else:
                    base = r0 & ~15
                j = min(i + 128, n)
                while ssrc[j - 1] - base > 127:
                    j -= 1
                quads.append((base, ssrc[i:j], stgt[i:j], sctl[i:j]))
                if base < OUT_SENT_ROWS:   # lit windows size RLP; OUT don't
                    maxrow = max(maxrow, base + 128)
                i = j
            if n == 0:
                quads.append((0, ssrc, stgt, sctl))
                maxrow = max(maxrow, 128)
            while (len(quads) - qs_t[-1]) % quad_align:
                quads.append((0, np.zeros(0, np.int64),
                              np.zeros(0, np.int64),
                              np.zeros((0, K, 3), np.int64)))
                maxrow = max(maxrow, 128)
            qs_t.append(len(quads))
        blocks.append((qs_t, quads))
        maxq = max(maxq, len(quads))
    if MAXQ is None:
        MAXQ = maxq
    assert maxq <= MAXQ, "MAXQ below a block's quad count"
    if RL is None:
        RL = max(maxrow, max(-(-len(lit) // 128) for lit in lit_list) + 1)
    RLP = max(-(-RL // 16) * 16, -(-maxrow // 16) * 16)
    NB = MAXQ * 4
    NG32 = 32 * (-(-NB // 128))
    qs = np.zeros((B, NST + 1), np.int32)
    qbase = np.zeros((B, MAXQ), np.int32)
    pctrl = np.full((B, K * NG32, 128), 1 << 7, np.int32)
    tq = np.zeros((B, MAXQ, 128), np.uint8)
    lit8 = np.zeros((B, RLP, 128), np.uint8)
    for j, ((qs_t, quads), lit) in enumerate(zip(blocks, lit_list)):
        qs[j, :len(qs_t)] = qs_t
        qs[j, len(qs_t):] = qs_t[-1]
        for q, (base, ssrc, stgt, sctl) in enumerate(quads):
            if base >= OUT_SENT_ROWS:
                qbase[j, q] = (base - OUT_SENT_ROWS) + OUT_QB_FLAG
            else:
                qbase[j, q] = base
            n = len(ssrc)
            if not n:
                continue
            i = np.arange(n)
            bat = 4 * q + (i >> 5)
            sub = i & 31
            p0 = (sctl[:, 0, 0] | (sctl[:, 0, 1] << 7)
                  | (sctl[:, 0, 2] << 14) | ((ssrc - base) << 21))
            pctrl[j, 32 * (bat >> 7) + sub, bat & 127] = p0
            for kk in range(1, K):
                pk_ = (sctl[:, kk, 0] | (sctl[:, kk, 1] << 7)
                       | (sctl[:, kk, 2] << 14))
                pctrl[j, kk * NG32 + 32 * (bat >> 7) + sub, bat & 127] = pk_
            tq[j, q, i] = stgt
        flat = np.frombuffer(bytes(lit), np.uint8)
        lit8[j].reshape(-1)[:len(flat)] = flat
    return qs, qbase, pctrl, tq, lit8


def _make_kernel_v25(K: int):
    def _kernel_v25(qs_ref, qbase_ref, pctrl_ref, tq_ref, litb_ref,
                    out_ref):
        b = pl.program_id(0)
        NST = out_ref.shape[1] // 128
        G32 = pctrl_ref.shape[1] // K
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        rowiota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        row128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)

        def contrib_quad(q):
            qb = qbase_ref[b, q]
            # window source select: OUT quads read the block's own decoded
            # rows (earlier supertiles, already stored); lit quads read
            # the shipped window. Branch-free: both windows load (VMEM),
            # a scalar-broadcast select picks one — a lax.cond form
            # compiled but FAULTED the TPU worker at execution (kernel
            # fault, round-5 probe); dynamic-offset ref reads under
            # scf.if are not safe in this Mosaic.
            isout = qb >= OUT_QB_FLAG
            ob = jnp.where(isout, qb - OUT_QB_FLAG, 0)
            lb = jnp.where(isout, 0, qb)
            win_lit = litb_ref[0, pl.ds(pl.multiple_of(lb, 16), 128), :]
            win_out = out_ref[0, pl.ds(pl.multiple_of(ob, 16), 128),
                              :].astype(jnp.bfloat16)
            win = jnp.where(isout, win_out, win_lit)

            def plane_bc(j):
                bcs = []
                for u in range(4):
                    bat = 4 * q + u
                    grp = pctrl_ref[0, pl.ds(j * G32 + (bat >> 7) * 32, 32),
                                    :]
                    bcs.append(jnp.take_along_axis(
                        grp, jnp.full((32, 128), bat & 127, jnp.int32),
                        axis=1))
                return jnp.concatenate(bcs, axis=0)   # (128,128) slot-major

            bc0 = plane_bc(0)
            rowrel = jax.lax.shift_right_logical(bc0, 21)
            onehot = jnp.where(rowiota == rowrel[:, :1],
                               jnp.float32(1), jnp.float32(0))
            gath = jax.lax.dot_general(
                onehot.astype(jnp.bfloat16), win, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            m = ((lane128 >= ((bc0 >> 7) & 127))
                 & (lane128 <= ((bc0 >> 14) & 127)))
            bsel = bc0
            for j in range(1, K):
                bcj = plane_bc(j)
                mj = ((lane128 >= ((bcj >> 7) & 127))
                      & (lane128 <= ((bcj >> 14) & 127)))
                bsel = jnp.where(mj, bcj, bsel)
                m = m | mj
            sh = jnp.take_along_axis(gath, (lane128 + (bsel & 127)) & 127,
                                     axis=1)
            c = jnp.where(m, sh, 0)
            tgt = tq_ref[0, q, :][None, :]
            pt = jnp.where(row128 == tgt, jnp.float32(1), jnp.float32(0))
            return jax.lax.dot_general(
                pt.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)

        for t in range(NST):
            q0 = qs_ref[b, t]
            q1 = qs_ref[b, t + 1]

            def qbody(g, acc):
                q = q0 + 2 * g
                return acc + contrib_quad(q) + contrib_quad(q + 1)

            tile = jax.lax.fori_loop(0, (q1 - q0) >> 1, qbody,
                                     jnp.zeros((128, 128), jnp.int32))
            out_ref[0, t * 128:(t + 1) * 128, :] = tile

    return _kernel_v25


@functools.lru_cache(maxsize=32)
def v25_kernel(block: int, MAXQ: int, RLP: int, K: int = 2,
               interpret: bool = False):
    NR = block // 128
    NB = MAXQ * 4
    G32 = 32 * (-(-NB // 128))
    body = _make_kernel_v25(K)

    def call(qs, qbase, pctrl, tq, lit8):
        litb = lit8.astype(jnp.bfloat16)
        tq = tq.astype(jnp.int32)
        B = pctrl.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, K * G32, 128), lambda b, *_: (b, 0, 0),
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
            body,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, NR, 128), jnp.int32),
            interpret=interpret,
        )(qs, qbase, pctrl, tq, litb)

    return jax.jit(call)


# ---------------------------------------------------------------------------
# v26: unified self-referential window — the production form of v25.
#
# v25's per-quad window select measured 0.85x v19 (plane-segregated
# chunking cost +10% quads; dual window reads + select cost the rest).
# v26 removes both: a VMEM scratch holds [lit rows ++ decoded-output rows]
# in ONE row coordinate space — the lit window is copied in at block
# start, and every decoded supertile is appended (one i32->bf16 cast per
# tile) right after its out_ref store. Slots carry plain scratch rows
# (OUT sources at RLP + out_row), so the quad chunker mixes planes
# freely and the kernel body is byte-for-byte v19's, reading scratch.
# ---------------------------------------------------------------------------


def pack_blocks_v26(pieces_list, lit_list, totals, block: int, RLP: int,
                    per=None, MAXQ=None, quad_align: int = 2, K: int = 2):
    """Pack the v26 dispatch batch: KOUT sources translated to scratch
    rows RLP + out_row before the tile sort (RLP must be pinned by the
    caller — scratch height is RLP + NR)."""
    B = len(pieces_list)
    if per is None:
        per = lane_ops_blocks_v25(pieces_list, totals)
    NR = block // 128
    assert NR % 128 == 0, "v26 needs block >= 16384"
    GRP = 4
    NST = NR // 128
    shift = RLP - OUT_SENT_ROWS      # sentinel row -> scratch row
    base_cap = RLP + NR - 128        # window must fit the scratch
    blocks = []
    maxq = 1
    for (rows, rl, s, e, tile_start) in per:
        quads = []
        qs_t = [0]
        nts = len(tile_start) - 1
        for st in range(NST):
            parts = []
            for g in range(GRP):
                t = st * GRP + g
                if t >= nts:
                    break
                b0, b1 = tile_start[t], tile_start[t + 1]
                if b1 <= b0:
                    continue
                er = rows[b0:b1].reshape(-1)
                es = s[b0:b1].reshape(-1)
                ee = e[b0:b1].reshape(-1)
                erl = rl[b0:b1].reshape(-1)
                live = np.nonzero(ee > es)[0]
                if not len(live):
                    continue
                erl_ = er[live]
                erl_ = np.where(erl_ >= OUT_SENT_ROWS, erl_ + shift, erl_)
                tgt = (live & 31) + 32 * g
                parts.append(np.stack(
                    [erl_, tgt, erl[live], es[live], ee[live] - 1],
                    axis=1))
            if parts:
                ops = np.concatenate(parts, axis=0)
                key = ops[:, 0] * 128 + ops[:, 1]
                order = np.argsort(key, kind="stable")
                ops = ops[order]
                ks = key[order]
                new = np.r_[True, ks[1:] != ks[:-1]]
                gid = np.cumsum(new) - 1
                gstart = np.flatnonzero(new)
                within = np.arange(len(ks)) - gstart[gid]
                gsizes = np.diff(np.r_[gstart, len(ks)])
                spg = -(-gsizes // K)
                sbase = np.r_[0, np.cumsum(spg)[:-1]]
                slot_of = sbase[gid] + within // K
                sub_of = within % K
                n_slots = int(spg.sum())
                ssrc = np.zeros(n_slots, np.int64)
                stgt = np.zeros(n_slots, np.int64)
                sctl = np.zeros((n_slots, K, 3), np.int64)
                sctl[:, :, 1] = 1
                ssrc[slot_of] = ops[:, 0]
                stgt[slot_of] = ops[:, 1]
                sctl[slot_of, sub_of, 0] = ops[:, 2]
                sctl[slot_of, sub_of, 1] = ops[:, 3]
                sctl[slot_of, sub_of, 2] = ops[:, 4]
            else:
                n_slots = 0
                ssrc = np.zeros(0, np.int64)
                stgt = np.zeros(0, np.int64)
                sctl = np.zeros((0, K, 3), np.int64)
            i = 0
            n = n_slots
            while i < n:
                base = min(int(ssrc[i]) & ~15, base_cap)
                j = min(i + 128, n)
                while ssrc[j - 1] - base > 127:
                    j -= 1
                quads.append((base, ssrc[i:j], stgt[i:j], sctl[i:j]))
                i = j
            if n == 0:
                quads.append((0, ssrc, stgt, sctl))
            while (len(quads) - qs_t[-1]) % quad_align:
                quads.append((0, np.zeros(0, np.int64),
                              np.zeros(0, np.int64),
                              np.zeros((0, K, 3), np.int64)))
            qs_t.append(len(quads))
        blocks.append((qs_t, quads))
        maxq = max(maxq, len(quads))
    if MAXQ is None:
        MAXQ = maxq
    assert maxq <= MAXQ, "MAXQ below a block's quad count"
    for lit in lit_list:
        assert -(-len(lit) // 128) <= RLP, "RLP below a block's lit rows"
    NB = MAXQ * 4
    NG32 = 32 * (-(-NB // 128))
    qs = np.zeros((B, NST + 1), np.int32)
    qbase = np.zeros((B, MAXQ), np.int32)
    pctrl = np.full((B, K * NG32, 128), 1 << 7, np.int32)
    tq = np.zeros((B, MAXQ, 128), np.uint8)
    lit8 = np.zeros((B, RLP, 128), np.uint8)
    for j, ((qs_t, quads), lit) in enumerate(zip(blocks, lit_list)):
        qs[j, :len(qs_t)] = qs_t
        qs[j, len(qs_t):] = qs_t[-1]
        for q, (base, ssrc, stgt, sctl) in enumerate(quads):
            qbase[j, q] = base
            n = len(ssrc)
            if not n:
                continue
            i = np.arange(n)
            bat = 4 * q + (i >> 5)
            sub = i & 31
            p0 = (sctl[:, 0, 0] | (sctl[:, 0, 1] << 7)
                  | (sctl[:, 0, 2] << 14) | ((ssrc - base) << 21))
            pctrl[j, 32 * (bat >> 7) + sub, bat & 127] = p0
            for kk in range(1, K):
                pk_ = (sctl[:, kk, 0] | (sctl[:, kk, 1] << 7)
                       | (sctl[:, kk, 2] << 14))
                pctrl[j, kk * NG32 + 32 * (bat >> 7) + sub, bat & 127] = pk_
            tq[j, q, i] = stgt
        flat = np.frombuffer(bytes(lit), np.uint8)
        lit8[j].reshape(-1)[:len(flat)] = flat
    return qs, qbase, pctrl, tq, lit8


def _make_kernel_v26(K: int, RLP: int):
    def _kernel_v26(qs_ref, qbase_ref, pctrl_ref, tq_ref, litb_ref,
                    out_ref, win_ref):
        b = pl.program_id(0)
        NST = out_ref.shape[1] // 128
        G32 = pctrl_ref.shape[1] // K
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        rowiota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        row128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)

        # unified window: [lit rows 0..RLP) ‖ decoded tiles RLP..RLP+NR)
        win_ref[0:RLP, :] = litb_ref[0]
        # zero the output region: windows near the write frontier span
        # not-yet-appended rows, and the gather matmul multiplies the
        # WHOLE window by the one-hot — uninitialized bf16 can be NaN,
        # and NaN * 0 = NaN poisons the sum (found the hard way: block 0
        # of every dispatch failed, later blocks "passed" off stale
        # finite values from the previous grid cell)
        NRv = out_ref.shape[1]
        win_ref[RLP:RLP + NRv, :] = jnp.zeros((NRv, 128), jnp.bfloat16)

        def contrib_quad(q):
            base = pl.multiple_of(qbase_ref[b, q], 16)
            win = win_ref[pl.ds(base, 128), :]       # (128,128) bf16

            def plane_bc(j):
                bcs = []
                for u in range(4):
                    bat = 4 * q + u
                    grp = pctrl_ref[0, pl.ds(j * G32 + (bat >> 7) * 32, 32),
                                    :]
                    bcs.append(jnp.take_along_axis(
                        grp, jnp.full((32, 128), bat & 127, jnp.int32),
                        axis=1))
                return jnp.concatenate(bcs, axis=0)

            bc0 = plane_bc(0)
            rowrel = jax.lax.shift_right_logical(bc0, 21)
            onehot = jnp.where(rowiota == rowrel[:, :1],
                               jnp.float32(1), jnp.float32(0))
            gath = jax.lax.dot_general(
                onehot.astype(jnp.bfloat16), win, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            m = ((lane128 >= ((bc0 >> 7) & 127))
                 & (lane128 <= ((bc0 >> 14) & 127)))
            bsel = bc0
            for j in range(1, K):
                bcj = plane_bc(j)
                mj = ((lane128 >= ((bcj >> 7) & 127))
                      & (lane128 <= ((bcj >> 14) & 127)))
                bsel = jnp.where(mj, bcj, bsel)
                m = m | mj
            sh = jnp.take_along_axis(gath, (lane128 + (bsel & 127)) & 127,
                                     axis=1)
            c = jnp.where(m, sh, 0)
            tgt = tq_ref[0, q, :][None, :]
            pt = jnp.where(row128 == tgt, jnp.float32(1), jnp.float32(0))
            return jax.lax.dot_general(
                pt.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)

        for t in range(NST):
            q0 = qs_ref[b, t]
            q1 = qs_ref[b, t + 1]

            def qbody(g, acc):
                q = q0 + 2 * g
                return acc + contrib_quad(q) + contrib_quad(q + 1)

            tile = jax.lax.fori_loop(0, (q1 - q0) >> 1, qbody,
                                     jnp.zeros((128, 128), jnp.int32))
            out_ref[0, t * 128:(t + 1) * 128, :] = tile
            # append the decoded tile to the unified window so later
            # supertiles' quads can source from it
            win_ref[RLP + t * 128:RLP + (t + 1) * 128, :] = \
                tile.astype(jnp.bfloat16)

    return _kernel_v26


@functools.lru_cache(maxsize=32)
def v26_kernel(block: int, MAXQ: int, RLP: int, K: int = 2,
               interpret: bool = False):
    NR = block // 128
    NB = MAXQ * 4
    G32 = 32 * (-(-NB // 128))
    body = _make_kernel_v26(K, RLP)

    def call(qs, qbase, pctrl, tq, lit8):
        litb = lit8.astype(jnp.bfloat16)
        tq = tq.astype(jnp.int32)
        B = pctrl.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, K * G32, 128), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, MAXQ, 128), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RLP, 128), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, NR, 128), lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((RLP + NR, 128), jnp.bfloat16)],
        )
        return pl.pallas_call(
            body,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, NR, 128), jnp.int32),
            interpret=interpret,
        )(qs, qbase, pctrl, tq, litb)

    return jax.jit(call)


# ---------------------------------------------------------------------------
# v27: v26 with a RAGGED lit8 shipping layout — the decode-server H2D form.
#
# v26 ships lit8 as (B, RLP, 128) where RLP is the batch max: at L3 the
# mean block uses ~50% of it, so ~half the H2D volume is padding (and
# through the tunnel's client zlib, H2D cost scales with INPUT bytes
# regardless of content). v27 ships one flat (ROWS_TOT, 128) u8 buffer
# holding each block's rows back to back (32-row aligned) plus a per-
# block row offset; the kernel DMAs its RLP-row window from HBM into a
# VMEM stage, casts to bf16 into the unified window, and proceeds
# exactly as v26. Control (qbase etc.) is UNCHANGED — offsets live only
# in the shipping layout, so a v26 hint drives v27 directly.
# ---------------------------------------------------------------------------


def v27_flat_layout(litrows, RLP: int):
    """Per-block 32-row-aligned offsets + total rows for the flat lit
    buffer (plus an RLP-row tail so the fixed-size window DMA of the
    last block stays in bounds)."""
    lr32 = [-(-max(int(r), 1) // 32) * 32 for r in litrows]
    loff = np.zeros(len(lr32) + 1, np.int32)
    loff[1:] = np.cumsum(lr32)
    return loff, int(loff[-1]) + RLP


def _make_kernel_v27(K: int, RLP: int):
    def _kernel_v27(qs_ref, qbase_ref, loff_ref, pctrl_ref, tq_ref,
                    flat_ref, out_ref, stage_ref, win_ref, sem):
        b = pl.program_id(0)
        NST = out_ref.shape[1] // 128
        G32 = pctrl_ref.shape[1] // K
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        rowiota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        row128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)

        # DMA this block's lit rows from the flat HBM buffer (fixed
        # RLP-row window from a 32-aligned dynamic offset; the flat
        # buffer carries an RLP-row tail so the read stays in bounds)
        off = pl.multiple_of(loff_ref[b], 32)
        cp = pltpu.make_async_copy(flat_ref.at[pl.ds(off, RLP)],
                                   stage_ref, sem)
        cp.start()
        cp.wait()
        # Mosaic has no direct u8 -> bf16 cast; bounce through i32
        win_ref[0:RLP, :] = \
            stage_ref[...].astype(jnp.int32).astype(jnp.bfloat16)
        NRv = out_ref.shape[1]
        win_ref[RLP:RLP + NRv, :] = jnp.zeros((NRv, 128), jnp.bfloat16)

        def contrib_quad(q):
            base = pl.multiple_of(qbase_ref[b, q], 16)
            win = win_ref[pl.ds(base, 128), :]

            def plane_bc(j):
                bcs = []
                for u in range(4):
                    bat = 4 * q + u
                    grp = pctrl_ref[0, pl.ds(j * G32 + (bat >> 7) * 32, 32),
                                    :]
                    bcs.append(jnp.take_along_axis(
                        grp, jnp.full((32, 128), bat & 127, jnp.int32),
                        axis=1))
                return jnp.concatenate(bcs, axis=0)

            bc0 = plane_bc(0)
            rowrel = jax.lax.shift_right_logical(bc0, 21)
            onehot = jnp.where(rowiota == rowrel[:, :1],
                               jnp.float32(1), jnp.float32(0))
            gath = jax.lax.dot_general(
                onehot.astype(jnp.bfloat16), win, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            m = ((lane128 >= ((bc0 >> 7) & 127))
                 & (lane128 <= ((bc0 >> 14) & 127)))
            bsel = bc0
            for j in range(1, K):
                bcj = plane_bc(j)
                mj = ((lane128 >= ((bcj >> 7) & 127))
                      & (lane128 <= ((bcj >> 14) & 127)))
                bsel = jnp.where(mj, bcj, bsel)
                m = m | mj
            sh = jnp.take_along_axis(gath, (lane128 + (bsel & 127)) & 127,
                                     axis=1)
            c = jnp.where(m, sh, 0)
            tgt = tq_ref[0, q, :][None, :]
            pt = jnp.where(row128 == tgt, jnp.float32(1), jnp.float32(0))
            return jax.lax.dot_general(
                pt.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)

        for t in range(NST):
            q0 = qs_ref[b, t]
            q1 = qs_ref[b, t + 1]

            def qbody(g, acc):
                q = q0 + 2 * g
                return acc + contrib_quad(q) + contrib_quad(q + 1)

            tile = jax.lax.fori_loop(0, (q1 - q0) >> 1, qbody,
                                     jnp.zeros((128, 128), jnp.int32))
            out_ref[0, t * 128:(t + 1) * 128, :] = tile
            win_ref[RLP + t * 128:RLP + (t + 1) * 128, :] = \
                tile.astype(jnp.bfloat16)

    return _kernel_v27


@functools.lru_cache(maxsize=32)
def v27_kernel(block: int, MAXQ: int, RLP: int, ROWS_TOT: int, K: int = 2,
               interpret: bool = False):
    NR = block // 128
    NB = MAXQ * 4
    G32 = 32 * (-(-NB // 128))
    # control (OUT qbase = RLP + out_row) is packed against RLP, so the
    # window coordinate space cannot shift: v27 requires 32-aligned RLP
    # (the u8 DMA stage tiles at 32 rows)
    assert RLP % 32 == 0, "v27 needs RLP % 32 == 0"
    body = _make_kernel_v27(K, RLP)

    def call(qs, qbase, loff, pctrl, tq, flat):
        tq = tq.astype(jnp.int32)
        B = pctrl.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, K * G32, 128), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, MAXQ, 128), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),   # flat lit (HBM)
            ],
            out_specs=pl.BlockSpec((1, NR, 128), lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((RLP, 128), jnp.uint8),         # DMA stage
                pltpu.VMEM((RLP + NR, 128), jnp.bfloat16),
                pltpu.SemaphoreType.DMA,
            ],
        )
        return pl.pallas_call(
            body,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, NR, 128), jnp.int32),
            interpret=interpret,
        )(qs, qbase, loff, pctrl, tq, flat)

    return jax.jit(call)


def _make_kernel_v19(K: int):
    def _kernel_v19(qs_ref, qbase_ref, pctrl_ref, tq_ref, litb_ref,
                    out_ref):
        b = pl.program_id(0)
        NST = out_ref.shape[1] // 128
        G32 = pctrl_ref.shape[1] // K
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        lane7 = lane128 << 7          # pre-shifted iotas: range masks
        lane14 = lane128 << 14        # compare against masked controls
        rowiota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        row128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)

        def contrib_quad(q):
            base = pl.multiple_of(qbase_ref[b, q], 16)
            win = litb_ref[0, pl.ds(base, 128), :]   # (128,128) bf16

            def plane_bc(j):
                bcs = []
                for u in range(4):
                    bat = 4 * q + u
                    grp = pctrl_ref[0, pl.ds(j * G32 + (bat >> 7) * 32, 32),
                                    :]
                    bcs.append(jnp.take_along_axis(
                        grp, jnp.full((32, 128), bat & 127, jnp.int32),
                        axis=1))
                return jnp.concatenate(bcs, axis=0)   # (128,128) slot-major

            bc0 = plane_bc(0)
            rowrel = jax.lax.shift_right_logical(bc0, 21)
            onehot = jnp.where(rowiota == rowrel[:, :1],
                               jnp.float32(1), jnp.float32(0))
            gath = jax.lax.dot_general(
                onehot.astype(jnp.bfloat16), win, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)

            # merge the K sub-ops into ONE per-lane rotate: sub-ops of a
            # slot cover disjoint lane ranges, so a per-lane select of
            # the roll value + a union mask replaces K rotate+mask
            # passes (the rotate gather is the expensive VPU op; selects
            # are cheap). NOTE two "leaner" forms were probed on hardware
            # and were SLOWER (this loop's lowering is fragile, same
            # lesson as the v13 shifted-iota bisect): pre-shifted-iota
            # masked compares (no extract shifts) measured 2.40 GB/s vs
            # 3.11, and bf16 gather data is rejected by Mosaic outright
            # ("gather indices and result have different bitwidths").
            m = ((lane128 >= ((bc0 >> 7) & 127))
                 & (lane128 <= ((bc0 >> 14) & 127)))
            bsel = bc0
            for j in range(1, K):
                bcj = plane_bc(j)
                mj = ((lane128 >= ((bcj >> 7) & 127))
                      & (lane128 <= ((bcj >> 14) & 127)))
                bsel = jnp.where(mj, bcj, bsel)
                m = m | mj
            sh = jnp.take_along_axis(gath, (lane128 + (bsel & 127)) & 127,
                                     axis=1)
            c = jnp.where(m, sh, 0)
            tgt = tq_ref[0, q, :][None, :]
            pt = jnp.where(row128 == tgt, jnp.float32(1), jnp.float32(0))
            return jax.lax.dot_general(
                pt.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)

        for t in range(NST):
            q0 = qs_ref[b, t]
            q1 = qs_ref[b, t + 1]

            def qbody(g, acc):
                q = q0 + 2 * g
                return acc + contrib_quad(q) + contrib_quad(q + 1)

            tile = jax.lax.fori_loop(0, (q1 - q0) >> 1, qbody,
                                     jnp.zeros((128, 128), jnp.int32))
            out_ref[0, t * 128:(t + 1) * 128, :] = tile

    return _kernel_v19


@functools.lru_cache(maxsize=32)
def v19_kernel(block: int, MAXQ: int, RLP: int, K: int = 2,
               interpret: bool = False):
    NR = block // 128
    NB = MAXQ * 4
    G32 = 32 * (-(-NB // 128))
    body = _make_kernel_v19(K)

    def call(qs, qbase, pctrl, tq, lit8):
        litb = lit8.astype(jnp.bfloat16)
        # tq may ship as u8 (tgt < 128: quarters its H2D) and widens to
        # i32 in XLA before the kernel — Mosaic's i8 sublane packing
        # cannot prove dynamic row alignment, and the lowering is fragile
        tq = tq.astype(jnp.int32)
        B = pctrl.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, K * G32, 128), lambda b, *_: (b, 0, 0),
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
            body,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, NR, 128), jnp.int32),
            interpret=interpret,
        )(qs, qbase, pctrl, tq, litb)

    return jax.jit(call)


def pad_v19_set(s, MAXQ: int, RLP: int, K: int = 2):
    """Pad one pack_blocks_v19 result to a common (MAXQ, RLP) shape."""
    qs, qb, pc, tq, l8 = s
    NG32 = 32 * (-(-(MAXQ * 4) // 128))
    B = pc.shape[0]
    old_g = pc.shape[1] // K
    qb = np.pad(qb, ((0, 0), (0, MAXQ - qb.shape[1])))
    tq = np.pad(tq, ((0, 0), (0, MAXQ - tq.shape[1]), (0, 0)))
    pc = pc.reshape(B, K, old_g, 128)
    pc = np.pad(pc, ((0, 0), (0, 0), (0, NG32 - old_g), (0, 0)),
                constant_values=1 << 7).reshape(B, K * NG32, 128)
    l8 = np.pad(l8, ((0, 0), (0, RLP - l8.shape[1]), (0, 0)))
    return (qs, qb, pc, tq, l8)


def decode_blocks_v19(pieces_list, lit_list, totals, block: int,
                      interpret: bool = False, device=None,
                      dispatch: int = 16, K: int = 2):
    """v19 decode: multi-op slots, pair-unrolled quads, bucketed shapes."""
    nb = len(pieces_list)
    if nb == 0:
        return []
    if block < 16384:
        return decode_blocks_v13(pieces_list, lit_list, totals, block,
                                 interpret=interpret, device=device,
                                 dispatch=dispatch)
    B = min(dispatch, nb)
    nd = -(-nb // B)
    pad = nd * B - nb
    p = list(pieces_list) + [pieces_list[-1]] * pad
    l = list(lit_list) + [lit_list[-1]] * pad
    t = list(totals) + [0] * pad
    raw = [pack_blocks_v19(p[d * B:(d + 1) * B], l[d * B:(d + 1) * B],
                           t[d * B:(d + 1) * B], block, K=K)
           for d in range(nd)]
    MAXQ = -(-max(s[1].shape[1] for s in raw) // 32) * 32
    RLP = -(-max(s[4].shape[1] for s in raw) // 128) * 128
    kern = v19_kernel(block, MAXQ, RLP, K, interpret)
    outs = []
    for s in raw:
        args = pad_v19_set(s, MAXQ, RLP, K)
        if device is not None:
            args = tuple(jax.device_put(a, device) for a in args)
        outs.append(np.asarray(kern(*args)))
    res = []
    for j in range(nb):
        out = outs[j // B][j % B]
        res.append(out.reshape(-1)[:totals[j]].astype(np.uint8).tobytes())
    return res


