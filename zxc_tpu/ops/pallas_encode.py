"""Pallas LCP kernel for device-side match extension (encoder).

The XLA device matcher (ops/encode.py) generates candidates at 1.6 GB/s
but its extension loop is gather-priced: every 4-byte round is two HLO
gathers over all positions (~85 ms/round, PERF.md 3.4), and the vmapped
while_loop runs until the longest match in the batch finishes. This
kernel replaces the extension with the formulation that fixed decode
(pallas_decode.py v10-v19): source rows arrive as MXU one-hot matmuls,
per-pair alignment is a lane roll (take_along_axis), and the compare +
first-mismatch reduction rides the VPU. No gathers, no data-dependent
trip counts.

Shape of the computation, per 128-pair "quad":
  * pairs are (p, c) byte positions in one block, 0 < p - c <= 64K;
    pairs are packed in ascending-p order (all K candidates of a
    position adjacent), so a quad's p's span at most 128 bytes — the
    p-side fetch is a tiny one-hot matmul over a P_WIN-row window whose
    16-aligned base rides the scalar-prefetch operand. The c side is
    unconstrained: full-table one-hot (128, R) @ (R, 128) matmuls
    (documented road: rowc-sorted 128-row windows, the v13 trick,
    would cut the MXU cost ~4x).
  * ROUNDS fixed compare rounds of 128 bytes each -> LCP capped at
    128*ROUNDS (256 default — the same sufficient-length economics the
    host finder uses: zxch_find_matches stops probing at 256).
  * the block is padded with 16 zero rows so row fetches beyond the
    data never clamp onto real rows: padding can only extend an
    equality run past the data end, and the caller clamps lcp to
    n - p, so claimed lengths are always <= the true match length.
  * the per-row LCP scalar leaves the kernel by diagonal extraction
    (row-select accumulate into a (32,128) tile) so the output is
    lane-major without a relayout.

Reference parity: this implements the extension half of
zxc_lz77_find_best_match (zxc_compress.c:316-429, the SIMD match-length
ladder) as a batched TPU primitive.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROUNDS = 2          # 128 bytes per round; cap = 128 * ROUNDS
P_WIN = 32          # p-side window rows: quad p-span (<=2 rows) +
                    # 16-align slack (<=15) + ROUNDS look-ahead
PAD_ROWS = 16       # zero rows appended so row+ROUNDS fetches stay in range


def _make_lcp_body(R: int):
    """ctl (1, 32, 128) i32 [one quad-tile group], blk (1, R, 128) bf16,
    out (1, 32, 128) i32. ctl packs c | (p << 16); pair k of local quad
    q sits at ctl[k % 32, 4*q + (k // 32)] (the v12 column layout)."""

    def body(pbase_ref, ctl_ref, blk_ref, out_ref):
        b = pl.program_id(0)
        t = pl.program_id(1)
        blk = blk_ref[0]                                   # (R,128) bf16
        lane = lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        rowiota_c = lax.broadcasted_iota(jnp.int32, (128, R), 1)
        rowiota_p = lax.broadcasted_iota(jnp.int32, (128, P_WIN), 1)
        row32 = lax.broadcasted_iota(jnp.int32, (32, 128), 0)
        grp = ctl_ref[0, 0]                                # (32,128) i32

        def fetch_c(rows):
            onehot = jnp.where(rowiota_c == rows[:, :1],
                               jnp.float32(1), jnp.float32(0))
            return lax.dot_general(
                onehot.astype(jnp.bfloat16), blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)

        def quad(q, acc):
            bcs = []
            for u in range(4):
                col = jnp.full((32, 128), 4 * q + u, jnp.int32)
                bcs.append(jnp.take_along_axis(grp, col, axis=1))
            bc = jnp.concatenate(bcs, axis=0)              # (128,128)
            cpos = bc & 0xFFFF
            ppos = lax.shift_right_logical(bc, 16)
            rowc = lax.shift_right_logical(cpos, 7)
            shc = cpos & 127
            rowp = lax.shift_right_logical(ppos, 7)
            shp = ppos & 127
            base = pl.multiple_of(pbase_ref[b, 32 * t + q], 16)
            winp = blk_ref[0, pl.ds(base, P_WIN), :]       # (P_WIN,128)
            rowp_rel = rowp - base

            def fetch_p(rows_rel):
                onehot = jnp.where(rowiota_p == rows_rel[:, :1],
                                   jnp.float32(1), jnp.float32(0))
                return lax.dot_general(
                    onehot.astype(jnp.bfloat16), winp,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(jnp.int32)

            idx_c = (lane + shc) & 127
            idx_p = (lane + shp) & 127
            hi_c = (lane + shc) >= 128                     # second row
            hi_p = (lane + shp) >= 128

            def compare(ca, pa, cb, pb):
                al_c = jnp.where(hi_c,
                                 jnp.take_along_axis(cb, idx_c, axis=1),
                                 jnp.take_along_axis(ca, idx_c, axis=1))
                al_p = jnp.where(hi_p,
                                 jnp.take_along_axis(pb, idx_p, axis=1),
                                 jnp.take_along_axis(pa, idx_p, axis=1))
                return jnp.min(jnp.where(al_c == al_p, 128, lane),
                               axis=1, keepdims=True)      # (128,1)

            ca = fetch_c(rowc)
            pa = fetch_p(rowp_rel)
            cb = fetch_c(rowc + 1)
            pb = fetch_p(rowp_rel + 1)
            mis1 = compare(ca, pa, cb, pb)
            lcp = mis1
            if ROUNDS > 1:
                # later rounds only run when some pair in the quad is
                # still fully equal — most quads stop in round 1, saving
                # their fetch matmuls (scf.if around the MXU work)
                def more_rounds(args):
                    lcp, ca, pa, cb, pb = args
                    done = lcp < 128 * 1  # round-1 mismatch
                    for r in range(1, ROUNDS):
                        ca, pa = cb, pb
                        cb = fetch_c(rowc + (r + 1))
                        pb = fetch_p(rowp_rel + (r + 1))
                        mis = compare(ca, pa, cb, pb)
                        lcp = jnp.where(done, lcp, lcp + mis)
                        done = done | (mis < 128)
                    return lcp

                lcp = lax.cond(jnp.any(mis1 >= 128), more_rounds,
                               lambda args: args[0],
                               (lcp, ca, pa, cb, pb))
            # diagonal extract: row k's scalar -> lane k of tile row q
            lcp_lane = jnp.min(
                jnp.where(row_eq_lane, jnp.broadcast_to(lcp, (128, 128)),
                          jnp.int32(1 << 20)),
                axis=0, keepdims=True)                     # (1,128)
            return acc + jnp.where(row32 == q, lcp_lane, 0)

        row_eq_lane = (lax.broadcasted_iota(jnp.int32, (128, 128), 0)
                       == lane)
        tile = lax.fori_loop(0, 32, quad,
                             jnp.zeros((32, 128), jnp.int32),
                             unroll=False)
        out_ref[0] = tile

    return body


def pack_pairs(p: np.ndarray, c: np.ndarray, npair_pad: int):
    """Pack ascending-p (p, c) pairs: ctl (NT, 32, 128) int32 and the
    per-quad 16-aligned p-window bases pbase (NQ,) int32.

    Padding pairs replicate the last real pair (keeps the p-window
    invariant); callers slice the first len(p) results."""
    npairs = len(p)
    nq = npair_pad // 128
    nt = -(-nq // 32)
    val = np.zeros(nt * 32 * 128, np.uint32)
    val[:npairs] = c.astype(np.uint32) | (p.astype(np.uint32) << 16)
    if npairs:
        val[npairs:] = val[npairs - 1]
    # pair k of global quad Q -> ctl[Q//32, k%32, 4*(Q%32) + k//32]
    v = val.reshape(nt, 32, 128)                  # [t, qlocal, k]
    ctl = np.zeros((nt, 32, 128), np.int32)
    k = np.arange(128)
    cols = (4 * np.arange(32)[:, None] + (k[None, :] // 32))  # (32,128)
    rows = np.broadcast_to(k % 32, (32, 128))
    ctl[:, rows, cols] = v.astype(np.int32)
    pfirst = (val.reshape(-1, 128)[:, 0] >> 16).astype(np.int64)
    pbase = ((pfirst >> 7) // 16 * 16).astype(np.int32)
    return ctl, pbase[:nt * 32]


def lcp_kernel(R: int, NT: int, interpret: bool = False):
    """Jitted call: (pbase (B, NT*32) i32, ctl (B, NT, 32, 128) i32,
    blk8 (B, R, 128) u8) -> lcp (B, NT*32, 128) i32, pair k of quad q
    at [b, q, k]. R includes PAD_ROWS zero rows."""
    body = _make_lcp_body(R)

    def call(pbase, ctl, blk8):
        blkb = blk8.astype(jnp.bfloat16)
        B = ctl.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, NT),
            in_specs=[
                pl.BlockSpec((1, 1, 32, 128), lambda b, t, *_: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, 128), lambda b, t, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 32, 128), lambda b, t, *_: (b, t, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            body,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, NT * 32, 128), jnp.int32),
            interpret=interpret,
        )(pbase, ctl.reshape(B, NT, 32, 128), blkb)
        return out

    return jax.jit(call)


def parse_walk_kernel(P: int, CAP: int, interpret: bool = False):
    """Serial greedy-tiling walk as a scalar SMEM loop.

    The XLA parse (ops/encode.py parse_device) pointer-doubles a jump
    table: log2(P)+1 rounds of a 64K-element gather + scatter (~45 ms
    of the 34 ms... the dominant cost of the device matcher phase once
    extension went to the LCP kernel). The walk is inherently serial
    but TRIVIALLY serial: p += step[p], record p when step[p] > 1
    (emit positions always step by lens >= min_emit >= 5 > 1, misses
    step 1 — identical semantics to parse_device's mark & emit). A
    scalar while over an SMEM-resident step array does ~P dependent
    scalar loads: sub-ms where the doubling pass pays tens of ms.

    step: (P,) int32 scalar-prefetch. Outputs (SMEM): nseq (1,) i32 and
    pos (CAP,) i32 (kept start positions; entries >= nseq are junk).
    Reference analog: the cursor walk of zxc_encode_block_glo
    (zxc_compress.c:1229-1316).
    """
    def body(step_ref, nseq_ref, pos_ref):
        def loop(st):
            p, j = st
            s = step_ref[p]
            emit = s > 1

            @pl.when(emit)
            def _():
                pos_ref[jnp.minimum(j, CAP - 1)] = p

            return (p + s, j + jnp.where(emit, 1, 0))

        _, j = lax.while_loop(lambda st: st[0] < P, loop,
                              (jnp.int32(0), jnp.int32(0)))
        nseq_ref[0] = j

    def call(step):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
        )
        return pl.pallas_call(
            body,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((1,), jnp.int32),
                       jax.ShapeDtypeStruct((CAP,), jnp.int32)],
            interpret=interpret,
        )(step)

    return jax.jit(call)


def lcp_pairs(data: np.ndarray, p: np.ndarray, c: np.ndarray,
              interpret: bool = False, device=None) -> np.ndarray:
    """One-block convenience entry: LCP (capped at 128*ROUNDS) for each
    ascending-p pair, clamped to n - p. NumPy in/out."""
    n = len(data)
    nrows = max(-(-n // 128), P_WIN)
    R = nrows + PAD_ROWS
    blk8 = np.zeros((1, R, 128), np.uint8)
    blk8[0].reshape(-1)[:n] = data
    npairs = len(p)
    npad = max(-(-npairs // 128) * 128, 128)
    ctl, pbase = pack_pairs(np.asarray(p, np.int64), np.asarray(c, np.int64),
                            npad)
    nt = ctl.shape[0]
    pbase = np.minimum(pbase, max(R - P_WIN, 0))
    kern = lcp_kernel(R, nt, interpret=interpret)
    args = (jnp.asarray(pbase[None]), jnp.asarray(ctl[None]),
            jnp.asarray(blk8))
    if device is not None:
        args = tuple(jax.device_put(a, device) for a in args)
    out = np.asarray(kern(*args)).reshape(-1)[:npairs]
    return np.minimum(out, n - np.asarray(p))
