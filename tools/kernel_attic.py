"""Kernel attic: rejected device-decode kernel generations (v1-v18, v20, v21).

Every kernel here RAN and was measured on real TPU hardware; each was
REJECTED on an interleaved A/B or resource-model ablation recorded in
PERF.md section 3.2 (the kernel-history table) - see that table for the
numbers and the post-mortems. They are kept importable (and covered by
tests/test_pallas_serial.py's history suite) because the evolution
v1 -> v19 is the documented ablation chain behind the flagship kernel in
zxc_tpu/ops/pallas_decode.py, and future probes (e.g. a SparseCore DMA
retry) start from these formulations.

Rates (marginal GB/s on the 33.6 MB L3 bench, PERF.md 3.2):
v1 0.004 / v2 0.018 / v4 0.075 / v6 0.101 / v9 0.38 / v10 1.08 /
v12 1.08 / v13 2.52 (KEPT as the <16 KiB fallback, lives in the main
module) / v14 1.98 / v15 3.30-probe / v16 2.65 / v17 2.21 /
v19 3.2-3.5 (FLAGSHIP, main module) / v20 wash / v21 wash.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zxc_tpu.ops.pallas_decode import (  # noqa: F401 - superset view
    CHUNK, ROWS, WIN, _flat_roll, _flat_roll_right, lane_ops_blocks,
    pack_blocks_v12, pad_v12_set, pack_blocks_v19, pad_v19_set,
    decode_blocks_v13, decode_blocks_v19, v13_kernel, v19_kernel,
    _kernel_v13, _make_kernel_v19,
)

STAGE = 512           # pieces staged into SMEM scratch per DMA round
STAGE_ROWS = 16       # = STAGE * 4 // 128 rows of piece fields per group
STAGE_LOAD = 24       # rows DMA'd (covers STAGE + 1 pieces, 8-row aligned)


def _kernel(np_ref, total_ref, pcs_ref, lit_ref, out_ref, stage_ref, sem):
    """pcs_ref: (R, 128) i32 — pieces packed flat as 4 fields
    [out, c, s, k] per piece, 32 pieces per row; stage_ref: SMEM scratch
    (STAGE_LOAD, 128); sem: DMA semaphore."""
    b = pl.program_id(0)
    n = np_ref[b]
    total = total_ref[b]
    pos = (jax.lax.broadcasted_iota(jnp.int32, (WIN, 128), 0) * 128
           + jax.lax.broadcasted_iota(jnp.int32, (WIN, 128), 1))

    def piece_body(o, e, c, s, k):
        nch = (e - o + (CHUNK - 1) + (o % CHUNK)) // CHUNK

        def chunk_body(t, _):
            p0 = jnp.where(t == 0, o, (o // CHUNK + t) * CHUNK)
            lc = jnp.minimum(e - p0, CHUNK - p0 % CHUNK)
            phase = jax.lax.rem(p0 - s, k)
            src0 = c + phase
            srow = (src0 // CHUNK) * ROWS
            v = lit_ref[pl.ds(pl.multiple_of(srow, ROWS), WIN), :]
            chunkv = _flat_roll(v, src0 % CHUNK, WIN)
            drow = (p0 // CHUNK) * ROWS
            dmis = p0 % CHUNK
            placed = _flat_roll_right(chunkv, dmis, WIN)
            valid = (pos >= dmis) & (pos < dmis + lc)
            cur = out_ref[pl.ds(pl.multiple_of(drow, ROWS), WIN), :]
            out_ref[pl.ds(pl.multiple_of(drow, ROWS), WIN), :] = \
                jnp.where(valid, placed, cur)
            return 0

        jax.lax.fori_loop(0, nch, chunk_body, 0, unroll=False)

    def stage_body(g, _):
        i0 = g * STAGE
        # stage this group's piece fields (+1 piece for the next out_start;
        # pcs is padded so the fixed-size copy never reads out of bounds)
        row0 = g * STAGE_ROWS
        dma = pltpu.make_async_copy(
            pcs_ref.at[pl.ds(pl.multiple_of(row0, 8), STAGE_LOAD), :],
            stage_ref, sem)
        dma.start()
        dma.wait()
        m = jnp.minimum(n - i0, STAGE)

        def field(j, f):
            idx = 4 * j + f
            return stage_ref[idx // 128, idx % 128]

        def piece_i(j, _):
            o = field(j, 0)
            e = jnp.where(i0 + j + 1 < n, field(j + 1, 0), total)
            piece_body(o, e, field(j, 1), field(j, 2), field(j, 3))
            return 0

        jax.lax.fori_loop(0, m, piece_i, 0, unroll=False)
        return 0

    n_groups = (n + STAGE - 1) // STAGE
    jax.lax.fori_loop(0, n_groups, stage_body, 0, unroll=False)


# Scalars (n_pieces, totals) ride scalar-prefetch; the packed piece table
# stays in HBM (ANY) and is DMA-staged into SMEM scratch in 1K groups;
# lit/out are per-block VMEM tiles.
def _kernel_wrapped(np_ref, total_ref, pcs_ref, lit_ref, out_ref,
                    stage_ref, sem):
    b = pl.program_id(0)
    _kernel(np_ref, total_ref, pcs_ref.at[b], lit_ref.at[0], out_ref.at[0],
            stage_ref, sem)


def pack_blocks(pieces, lit_fulls, totals, block: int):
    """Pack device_pure piece plans into the serial kernel's input arrays.

    Returns (args, (PR, RL)) where args = (npieces, totals, pcs, lit32).
    """
    B = len(pieces)
    P = max(2, 1 << int(np.ceil(np.log2(max(max(len(p[0]) for p in pieces), 2)))))
    Lmax = max(len(lf) for lf in lit_fulls)
    RL = -(-Lmax // CHUNK) * ROWS + 2 * WIN

    # pieces packed flat: 4 i32 fields per piece, 32 pieces per 128-lane
    # row; rows padded so every fixed-size stage DMA stays in bounds
    PR = -(-((P + STAGE + 2) * 4) // 128)
    PR = -(-PR // STAGE_LOAD) * STAGE_LOAD
    pcs = np.zeros((B, PR, 128), np.int32)
    lit8 = np.zeros((B, RL, 128), np.uint8)   # device converts to i32
    npieces = np.zeros(B, np.int32)
    tot = np.asarray(totals, np.int32).reshape(B)
    for j, ((p_o, p_c, p_s, p_k), lf) in enumerate(zip(pieces, lit_fulls)):
        n = len(p_o)
        flatp = pcs[j].reshape(-1)
        flatp[0:4 * n:4] = p_o
        flatp[1:4 * n:4] = p_c
        flatp[2:4 * n:4] = p_s
        flatp[3:4 * n:4] = np.maximum(p_k, 1)
        npieces[j] = n
        flat = lit8[j].reshape(-1)
        flat[:len(lf)] = lf
    return (npieces, tot, pcs, lit8), (PR, RL)


def decode_blocks(pieces, lit_fulls, totals, block: int,
                  interpret: bool = False, device=None, variant: int = 2):
    """Decode a list of device_pure piece plans on the device.

    pieces: list of (po, pc, ps, pk) int32 arrays; lit_fulls: list of uint8
    lit buffers; totals: decoded sizes. Returns list of bytes.
    """
    args, (PR, RL) = pack_blocks(pieces, lit_fulls, totals, block)
    kern = serial_kernel_wrapped(block, PR, RL, interpret, variant)
    if device is not None:
        args = tuple(jax.device_put(a, device) for a in args)
    out = np.asarray(kern(*args))
    res = []
    for j in range(len(pieces)):
        flat = out[j].reshape(-1)[:totals[j]]
        res.append(flat.astype(np.uint8).tobytes())
    return res


def _kernel_v2(np_ref, total_ref, pcs_ref, lit_ref, out_ref, stage_ref, sem):
    """Window-centric variant: iterate 1024-element DESTINATION windows,
    merge every overlapping piece into a register accumulator, store once.

    Removes the per-piece read-modify-write of v1 (the dominant latency
    chain) and lets independent source loads/rolls pipeline. Fill pieces
    (k == 1) splat the byte carried in the `s` field — no memory traffic.
    """
    b = pl.program_id(0)
    n = np_ref[b]
    total = total_ref[b]
    pos = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 0) * 128
           + jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1))
    n_windows = (total + CHUNK - 1) // CHUNK

    def field(lj, f):
        idx = 4 * lj + f
        return stage_ref[idx // 128, idx % 128]

    def stage_group(jj):
        @pl.when(jj % STAGE == 0)
        def _():
            row0 = (jj // STAGE) * STAGE_ROWS
            dma = pltpu.make_async_copy(
                pcs_ref.at[pl.ds(pl.multiple_of(row0, 8), STAGE_LOAD), :],
                stage_ref, sem)
            dma.start()
            dma.wait()

    def window_body(wi, j):
        """j = index of the first piece overlapping this window."""
        w0 = wi * CHUNK
        acc0 = jnp.zeros((ROWS, 128), jnp.int32)

        def cond(state):
            jj, _, done = state
            return jnp.logical_not(done)

        def body(state):
            jj, acc, _ = state
            stage_group(jj)
            lj = jj % STAGE
            o = field(lj, 0)
            e = jnp.where(jj + 1 < n, field(lj + 1, 0), total)
            c = field(lj, 1)
            s = field(lj, 2)
            k = field(lj, 3)
            starts_beyond = o >= w0 + CHUNK

            lo = jnp.maximum(o, w0)
            hi = jnp.minimum(e, w0 + CHUNK)
            dmis = lo - w0
            is_fill = k == 1
            phase = jax.lax.rem(lo - jnp.where(is_fill, lo, s),
                                jnp.maximum(k, 1))
            src0 = c + phase
            srow = (src0 // CHUNK) * ROWS
            v = lit_ref[pl.ds(pl.multiple_of(srow, ROWS), WIN), :]
            # single net roll: out[dmis+t] = v[src0%CHUNK + t]
            net = (src0 % CHUNK - dmis) % (2 * CHUNK)
            shifted = _flat_roll(v, net, WIN)[:ROWS, :]
            val = jnp.where(is_fill, s, shifted)
            valid = ((pos >= dmis) & (pos < dmis + (hi - lo))
                     & jnp.logical_not(starts_beyond))
            acc = jnp.where(valid, val, acc)

            ends_here = (e <= w0 + CHUNK) & jnp.logical_not(starts_beyond)
            jj2 = jnp.where(ends_here, jj + 1, jj)
            done = starts_beyond | jnp.logical_not(ends_here) | (jj2 >= n)
            return jj2, acc, done

        jj, acc, _ = jax.lax.while_loop(cond, body, (j, acc0, j >= n))
        out_ref[pl.ds(pl.multiple_of(wi * ROWS, ROWS), ROWS), :] = acc
        return jj

    jax.lax.fori_loop(0, n_windows, window_body, 0, unroll=False)


def _kernel_v2_wrapped(np_ref, total_ref, pcs_ref, lit_ref, out_ref,
                       stage_ref, sem):
    b = pl.program_id(0)
    _kernel_v2(np_ref, total_ref, pcs_ref.at[b], lit_ref.at[0],
               out_ref.at[0], stage_ref, sem)


@functools.lru_cache(maxsize=None)
def serial_kernel_wrapped(block: int, PR: int, RL: int,
                          interpret: bool = False, variant: int = 2):
    RO = block // 128 + WIN
    body = {1: _kernel_wrapped, 2: _kernel_v2_wrapped,
            3: _kernel_v3_wrapped}[variant]

    def call(npieces, totals, pcs, lit8):
        # literals ship as u8 (4x less H2D) and widen on device
        lit32 = lit8.astype(jnp.int32)
        B = pcs.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),   # packed pieces, HBM
                pl.BlockSpec((1, RL, 128), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, RO, 128), lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.SMEM((STAGE_LOAD, 128), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        return pl.pallas_call(
            body,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, RO, 128), jnp.int32),
            interpret=interpret,
        )(npieces, totals, pcs, lit32)

    return jax.jit(call)


def _kernel_v3(np_ref, total_ref, pcs_ref, lit_ref, out_ref, stage_ref, sem):
    """v2 + 2-piece unroll: each while iteration merges up to two pieces;
    the second piece's load/roll is independent of the first's, so the
    scheduler overlaps the expensive halves of both."""
    b = pl.program_id(0)
    n = np_ref[b]
    total = total_ref[b]
    pos = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 0) * 128
           + jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1))
    n_windows = (total + CHUNK - 1) // CHUNK

    def field(lj, f):
        idx = 4 * lj + f
        return stage_ref[idx // 128, idx % 128]

    def stage_group(jj):
        @pl.when(jj % STAGE == 0)
        def _():
            row0 = (jj // STAGE) * STAGE_ROWS
            dma = pltpu.make_async_copy(
                pcs_ref.at[pl.ds(pl.multiple_of(row0, 8), STAGE_LOAD), :],
                stage_ref, sem)
            dma.start()
            dma.wait()

    def merge_one(jj, w0, acc, active):
        """Merge piece jj into acc (no-op when not active); returns
        (next_jj, acc, ends_in_window, starts_beyond)."""
        lj = jj % STAGE
        o = field(lj, 0)
        e = jnp.where(jj + 1 < n, field(lj + 1, 0), total)
        c = field(lj, 1)
        s = field(lj, 2)
        k = field(lj, 3)
        beyond = (o >= w0 + CHUNK) | jnp.logical_not(active)
        lo = jnp.maximum(o, w0)
        hi = jnp.minimum(e, w0 + CHUNK)
        dmis = lo - w0
        is_fill = k == 1
        phase = jax.lax.rem(lo - jnp.where(is_fill, lo, s),
                            jnp.maximum(k, 1))
        src0 = c + phase
        srow = (src0 // CHUNK) * ROWS
        v = lit_ref[pl.ds(pl.multiple_of(srow, ROWS), WIN), :]
        net = (src0 % CHUNK - dmis) % (2 * CHUNK)
        shifted = _flat_roll(v, net, WIN)[:ROWS, :]
        val = jnp.where(is_fill, s, shifted)
        valid = (pos >= dmis) & (pos < dmis + (hi - lo)) & \
            jnp.logical_not(beyond)
        acc = jnp.where(valid, val, acc)
        ends = (e <= w0 + CHUNK) & jnp.logical_not(beyond)
        return jnp.where(ends, jj + 1, jj), acc, ends, beyond

    def window_body(wi, j):
        w0 = wi * CHUNK
        acc0 = jnp.zeros((ROWS, 128), jnp.int32)

        def cond(state):
            _, _, done = state
            return jnp.logical_not(done)

        def body(state):
            jj, acc, _ = state
            stage_group(jj)
            jj2, acc, endsA, beyondA = merge_one(jj, w0, acc, True)
            doneA = beyondA | jnp.logical_not(endsA) | (jj2 >= n)
            # second piece in the same iteration when it is already staged
            activeB = jnp.logical_not(doneA) & (jj2 % STAGE != 0)
            jj3, acc, endsB, beyondB = merge_one(jj2, w0, acc, activeB)
            doneB = beyondB | jnp.logical_not(endsB) | (jj3 >= n)
            done = jnp.where(activeB, doneB, doneA)
            return jj3, acc, done

        jj, acc, _ = jax.lax.while_loop(cond, body, (j, acc0, j >= n))
        out_ref[pl.ds(pl.multiple_of(wi * ROWS, ROWS), ROWS), :] = acc
        return jj

    jax.lax.fori_loop(0, n_windows, window_body, 0, unroll=False)


def _kernel_v3_wrapped(np_ref, total_ref, pcs_ref, lit_ref, out_ref,
                       stage_ref, sem):
    b = pl.program_id(0)
    _kernel_v3(np_ref, total_ref, pcs_ref.at[b], lit_ref.at[0],
               out_ref.at[0], stage_ref, sem)


def _kernel_v4(ws_ref, ops_ref, lit_ref, out_ref, stage_ref, sem):
    """All control precomputed on host (zxch_window_ops): the op stream
    carries (src row, net roll, dst bounds, fill byte) per 1024-byte-window
    merge; the kernel is a dense scalar-light streaming loop."""
    b = pl.program_id(0)
    NW = ws_ref.shape[1] - 1
    pos = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 0) * 128
           + jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1))

    def field(lt, f):
        idx = 4 * lt + f
        return stage_ref[idx // 128, idx % 128]

    def window_body(wi, _):
        t0 = ws_ref[b, wi]
        t1 = ws_ref[b, wi + 1]

        def op_body(t, acc):
            @pl.when(t % STAGE == 0)
            def _():
                row0 = (t // STAGE) * STAGE_ROWS
                dma = pltpu.make_async_copy(
                    ops_ref.at[pl.ds(pl.multiple_of(row0, 8), STAGE_LOAD), :],
                    stage_ref, sem)
                dma.start()
                dma.wait()
            lt = t % STAGE
            srow = field(lt, 0)
            net = field(lt, 1)
            f2 = field(lt, 2)
            f3 = field(lt, 3)
            dlo = f2 & 0xFFFF
            dhi = jax.lax.shift_right_logical(f2, 16)
            v = lit_ref[pl.ds(pl.multiple_of(srow, ROWS), WIN), :]
            rolled = _flat_roll(v, net, WIN)[:ROWS, :]
            val = jnp.where(f3 > 0, f3 - 1, rolled)
            return jnp.where((pos >= dlo) & (pos < dhi), val, acc)

        acc = jax.lax.fori_loop(t0, t1, op_body,
                                jnp.zeros((ROWS, 128), jnp.int32),
                                unroll=False)
        out_ref[pl.ds(pl.multiple_of(wi * ROWS, ROWS), ROWS), :] = acc
        return 0

    jax.lax.fori_loop(0, NW, window_body, 0, unroll=False)


def _kernel_v4_wrapped(ws_ref, ops_ref, lit_ref, out_ref, stage_ref, sem):
    b = pl.program_id(0)
    _kernel_v4(ws_ref, ops_ref.at[b], lit_ref.at[0], out_ref.at[0],
               stage_ref, sem)


def pack_blocks_v4(pieces, lit_fulls, totals, block: int,
                   split_src: bool = False, pad_unroll: bool = False):
    """Pack window-op plans for kernel v4.

    Returns (args, (OR, RL, NW)) with args = (wstart (B,NW+1), ops
    (B,OR,128), lit8 (B,RL,128))."""
    from zxc_tpu import runtime
    B = len(pieces)
    NW = block // CHUNK
    Lmax = max(len(lf) for lf in lit_fulls)
    RL = -(-Lmax // CHUNK) * ROWS + 2 * WIN
    plans = []
    max_ops = 2
    for (p_o, p_c, p_s, p_k), total in zip(pieces, totals):
        r = runtime.window_ops(p_o, p_c, p_s, p_k, int(total), split_src)
        assert r is not None, "window op emission failed"
        if pad_unroll:
            r = _pad_ops_to_unroll(*r, unroll=pad_unroll)
        plans.append(r)
        max_ops = max(max_ops, len(r[0]) // 4)
    OPS = 1 << int(np.ceil(np.log2(max_ops + 1)))
    OR = -(-((OPS + STAGE + 2) * 4) // 128)
    OR = -(-OR // STAGE_LOAD) * STAGE_LOAD
    ops = np.zeros((B, OR, 128), np.int32)
    wstart = np.zeros((B, NW + 1), np.int32)
    lit8 = np.zeros((B, RL, 128), np.uint8)
    for j, ((opsf, ws), lf) in enumerate(zip(plans, lit_fulls)):
        flat = ops[j].reshape(-1)
        flat[:len(opsf)] = opsf
        wstart[j, :len(ws)] = ws
        wstart[j, len(ws):] = ws[-1]
        lflat = lit8[j].reshape(-1)
        lflat[:len(lf)] = lf
    return (wstart, ops, lit8), (OR, RL, NW)


@functools.lru_cache(maxsize=None)
def v4_kernel(block: int, OR: int, RL: int, interpret: bool = False,
              variant: int = 4):
    RO = block // 128 + WIN
    body = {4: _kernel_v4_wrapped, 5: _kernel_v5_wrapped,
            6: _kernel_v6_wrapped, 7: _kernel_v7_wrapped}[variant]

    def call(wstart, ops, lit8):
        lit32 = lit8.astype(jnp.int32)
        B = ops.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, RL, 128), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, RO, 128), lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.SMEM((STAGE_LOAD, 128), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        return pl.pallas_call(
            body,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, RO, 128), jnp.int32),
            interpret=interpret,
        )(wstart, ops, lit32)

    return jax.jit(call)


def decode_blocks_v4(pieces, lit_fulls, totals, block: int,
                     interpret: bool = False, device=None,
                     variant: int = 4):
    args, (OR, RL, NW) = pack_blocks_v4(
        pieces, lit_fulls, totals, block, split_src=(variant >= 5),
        pad_unroll={6: UNROLL, 7: UNROLL7}.get(variant, 0))
    kern = v4_kernel(block, OR, RL, interpret, variant)
    if device is not None:
        args = tuple(jax.device_put(a, device) for a in args)
    out = np.asarray(kern(*args))
    return [out[j].reshape(-1)[:totals[j]].astype(np.uint8).tobytes()
            for j in range(len(pieces))]


def _kernel_v5(ws_ref, ops_ref, lit_ref, out_ref, stage_ref, sem):
    """v4 with source-granule-confined ops: single-vreg (8,128) loads and
    rolls (host splits ops at source 1024-boundaries too)."""
    b = pl.program_id(0)
    NW = ws_ref.shape[1] - 1
    pos = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 0) * 128
           + jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1))

    def field(lt, f):
        idx = 4 * lt + f
        return stage_ref[idx // 128, idx % 128]

    def window_body(wi, _):
        t0 = ws_ref[b, wi]
        t1 = ws_ref[b, wi + 1]

        def op_body(t, acc):
            @pl.when(t % STAGE == 0)
            def _():
                row0 = (t // STAGE) * STAGE_ROWS
                dma = pltpu.make_async_copy(
                    ops_ref.at[pl.ds(pl.multiple_of(row0, 8), STAGE_LOAD), :],
                    stage_ref, sem)
                dma.start()
                dma.wait()
            lt = t % STAGE
            srow = field(lt, 0)
            net = field(lt, 1)
            f2 = field(lt, 2)
            f3 = field(lt, 3)
            dlo = f2 & 0xFFFF
            dhi = jax.lax.shift_right_logical(f2, 16)
            v = lit_ref[pl.ds(pl.multiple_of(srow, ROWS), ROWS), :]
            rolled = _flat_roll(v, net, ROWS)
            val = jnp.where(f3 > 0, f3 - 1, rolled)
            return jnp.where((pos >= dlo) & (pos < dhi), val, acc)

        acc = jax.lax.fori_loop(t0, t1, op_body,
                                jnp.zeros((ROWS, 128), jnp.int32),
                                unroll=False)
        out_ref[pl.ds(pl.multiple_of(wi * ROWS, ROWS), ROWS), :] = acc
        return 0

    jax.lax.fori_loop(0, NW, window_body, 0, unroll=False)


def _kernel_v5_wrapped(ws_ref, ops_ref, lit_ref, out_ref, stage_ref, sem):
    b = pl.program_id(0)
    _kernel_v5(ws_ref, ops_ref.at[b], lit_ref.at[0], out_ref.at[0],
               stage_ref, sem)



UNROLL = 8   # ops per v6 loop iteration (windows padded to a multiple)
UNROLL7 = 16  # v7 variant


def _kernel_v6(ws_ref, ops_ref, lit_ref, out_ref, stage_ref, sem):
    """v5 + 8-op unrolled batches: one loop iteration issues 8 independent
    load+roll+select merges (disjoint masks), amortizing loop/DMA checks."""
    b = pl.program_id(0)
    NW = ws_ref.shape[1] - 1
    pos = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 0) * 128
           + jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1))

    def field(lt, f):
        idx = 4 * lt + f
        return stage_ref[idx // 128, idx % 128]

    def window_body(wi, _):
        t0 = ws_ref[b, wi]
        t1 = ws_ref[b, wi + 1]

        def group_body(g, acc):
            base = g * UNROLL

            @pl.when(base % STAGE == 0)
            def _():
                row0 = (base // STAGE) * STAGE_ROWS
                dma = pltpu.make_async_copy(
                    ops_ref.at[pl.ds(pl.multiple_of(row0, 8), STAGE_LOAD), :],
                    stage_ref, sem)
                dma.start()
                dma.wait()

            for u in range(UNROLL):
                lt = (base + u) % STAGE
                srow = field(lt, 0)
                net = field(lt, 1)
                f2 = field(lt, 2)
                f3 = field(lt, 3)
                dlo = f2 & 0xFFFF
                dhi = jax.lax.shift_right_logical(f2, 16)
                v = lit_ref[pl.ds(pl.multiple_of(srow, ROWS), ROWS), :]
                rolled = _flat_roll(v, net, ROWS)
                val = jnp.where(f3 > 0, f3 - 1, rolled)
                acc = jnp.where((pos >= dlo) & (pos < dhi), val, acc)
            return acc

        acc = jax.lax.fori_loop(t0 // UNROLL, t1 // UNROLL, group_body,
                                jnp.zeros((ROWS, 128), jnp.int32),
                                unroll=False)
        out_ref[pl.ds(pl.multiple_of(wi * ROWS, ROWS), ROWS), :] = acc
        return 0

    jax.lax.fori_loop(0, NW, window_body, 0, unroll=False)


def _kernel_v7(ws_ref, ops_ref, lit_ref, out_ref, stage_ref, sem):
    """v6 with 16-op batches: one loop iteration issues 8 independent
    load+roll+select merges (disjoint masks), amortizing loop/DMA checks."""
    b = pl.program_id(0)
    NW = ws_ref.shape[1] - 1
    pos = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 0) * 128
           + jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1))

    def field(lt, f):
        idx = 4 * lt + f
        return stage_ref[idx // 128, idx % 128]

    def window_body(wi, _):
        t0 = ws_ref[b, wi]
        t1 = ws_ref[b, wi + 1]

        def group_body(g, acc):
            base = g * UNROLL7

            @pl.when(base % STAGE == 0)
            def _():
                row0 = (base // STAGE) * STAGE_ROWS
                dma = pltpu.make_async_copy(
                    ops_ref.at[pl.ds(pl.multiple_of(row0, 8), STAGE_LOAD), :],
                    stage_ref, sem)
                dma.start()
                dma.wait()

            for u in range(UNROLL7):
                lt = (base + u) % STAGE
                srow = field(lt, 0)
                net = field(lt, 1)
                f2 = field(lt, 2)
                f3 = field(lt, 3)
                dlo = f2 & 0xFFFF
                dhi = jax.lax.shift_right_logical(f2, 16)
                v = lit_ref[pl.ds(pl.multiple_of(srow, ROWS), ROWS), :]
                rolled = _flat_roll(v, net, ROWS)
                val = jnp.where(f3 > 0, f3 - 1, rolled)
                acc = jnp.where((pos >= dlo) & (pos < dhi), val, acc)
            return acc

        acc = jax.lax.fori_loop(t0 // UNROLL7, t1 // UNROLL7, group_body,
                                jnp.zeros((ROWS, 128), jnp.int32),
                                unroll=False)
        out_ref[pl.ds(pl.multiple_of(wi * ROWS, ROWS), ROWS), :] = acc
        return 0

    jax.lax.fori_loop(0, NW, window_body, 0, unroll=False)


def _kernel_v7_wrapped(ws_ref, ops_ref, lit_ref, out_ref, stage_ref, sem):
    b = pl.program_id(0)
    _kernel_v7(ws_ref, ops_ref.at[b], lit_ref.at[0], out_ref.at[0],
               stage_ref, sem)



def _kernel_v6_wrapped(ws_ref, ops_ref, lit_ref, out_ref, stage_ref, sem):
    b = pl.program_id(0)
    _kernel_v6(ws_ref, ops_ref.at[b], lit_ref.at[0], out_ref.at[0],
               stage_ref, sem)


def _pad_ops_to_unroll(opsf, ws, unroll=UNROLL):
    """Pad each window's op list to a multiple of `unroll` with no-ops
    (dlo == dhi == 0 -> empty mask)."""
    counts = np.diff(ws)
    padded = -(-counts // unroll) * unroll
    new_ws = np.concatenate([[0], np.cumsum(padded)]).astype(np.int32)
    out = np.zeros(int(new_ws[-1]) * 4, np.int32)
    ops2 = opsf.reshape(-1, 4)
    for wi, cnt in enumerate(counts):
        src0 = ws[wi]
        dst0 = new_ws[wi]
        out.reshape(-1, 4)[dst0:dst0 + cnt] = ops2[src0:src0 + cnt]
    return out, new_ws



# ---------------------------------------------------------------------------
# v9: per-sublane lane-op kernel.
#
# The host (zxch_lane_ops) splits device_pure pieces at 128-byte output AND
# source row boundaries, so every op covers lanes [s, e) of one output row
# reading one lit_full row at a fixed lane offset. Ops are batched 32 at a
# time — op k of a batch owns sublane k of the batch's (32,128) output
# tile — which turns the per-piece variable byte-rotate into ONE
# `take_along_axis` along lanes (tpu.dynamic_gather, <= 1 vreg along the
# gather dim) and the mask into dense compares. The only scalar-issued
# work left is the 32 source-row fetches, whose row ids are staged from
# VMEM into SMEM scratch in groups (the v4-style staging DMA).
# ---------------------------------------------------------------------------

V9_GROUP = 8          # batches staged (and unrolled) per DMA group
V9_CTRL = 128         # i32 lanes per batch control row (tile-aligned):
                      # [tile, row0..row31, pad...]




def pack_blocks_v9(pieces_list, lit_list, totals, block: int,
                   per=None, MAXB=None, RL=None):
    """Build the v9 dispatch batch from per-block pieces + lit_full.

    Returns (nb, ts, rows, pctrl, lit32) where
      nb    (B,)            int32  batches per block        (scalar prefetch)
      ts    (B, NT+1)       int32  per-tile batch prefix    (scalar prefetch)
      rows  (B, MAXB*32)    int32  src row per (batch,sub)  (scalar prefetch)
      pctrl (B, G32, 128)   int32  pre-transposed packed control: for batch
                                   bat = 128*g + j, sublane k,
                                   pctrl[b, 32*g + k, j] = rl | s<<8 | (e-1)<<16
                                   (empty ops packed as s=1, e-1=0), so the
                                   kernel broadcasts a batch's 32 controls
                                   with ONE lane-gather instead of a transpose
      lit32 (B, RL, 128)    int32  lit_full bytes, row-padded

    `per`/`MAXB`/`RL` let a caller precompute lane ops once and pack many
    same-shape dispatch sets (bench.py's single-program pipeline).
    """
    B = len(pieces_list)
    if per is None:
        per = lane_ops_blocks(pieces_list, totals)
    if MAXB is None:
        MAXB = max(max(len(r[0]), 1) for r in per)
        MAXB = -(-MAXB // V9_GROUP) * V9_GROUP
    if RL is None:
        RL = max(-(-len(lit) // 128) for lit in lit_list) + 1
    NT = block // 4096
    NG = -(-MAXB // 128)
    nb = np.array([len(r[0]) for r in per], np.int32)
    ts = np.zeros((B, NT + 1), np.int32)
    rows_f = np.zeros((B, MAXB * 32), np.int32)
    pctrl = np.full((B, NG * 32, 128), 1 << 8, np.int32)
    lit32 = np.zeros((B, RL, 128), np.int32)
    for j, ((rows, rl, s, e, tile_start), lit) in enumerate(
            zip(per, lit_list)):
        k = len(rows)
        nts = len(tile_start) - 1
        ts[j, :nts + 1] = tile_start
        ts[j, nts + 1:] = tile_start[-1]
        rows_f[j, :k * 32] = rows.reshape(-1)
        packed = np.where(e > 0, rl | (s << 8) | ((e - 1) << 16), 1 << 8)
        # scatter batch bat's sublane-k control to [32*(bat>>7)+k, bat&127]
        bat = np.arange(k)[:, None]
        sub = np.arange(32)[None, :]
        pctrl[j, 32 * (bat >> 7) + sub, bat & 127] = packed
        flat = np.frombuffer(bytes(lit), np.uint8)
        lit32[j].reshape(-1)[:len(flat)] = flat
    return nb, ts, rows_f, pctrl, lit32


V9_UNROLL = 4         # batches per tile-loop iteration (lane_ops pads to it)


def _kernel_v9(nb_ref, ts_ref, rows_ref, pctrl_ref, lit_ref, out_ref):
    """v9.3: scalar control via scalar-prefetch SMEM; per-batch (rl, s, e)
    broadcast by ONE lane-gather from the pre-transposed packed control
    (no in-kernel transpose); static tile loop with a register accumulator
    stored once per tile; 4x-unrolled batch loop."""
    b = pl.program_id(0)
    NT = out_ref.shape[1] // 32
    lane = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1)

    def contrib(bat):
        # every output lane of a tile is covered by EXACTLY one op, so
        # batch contributions are disjoint and combine by SUM — no
        # ordering, which lets the unrolled ops run as independent chains
        base = bat * 32
        gath = jnp.concatenate(
            [lit_ref[0, pl.ds(rows_ref[b, base + k], 1), :]
             for k in range(32)], axis=0)              # (32,128)
        grp = pctrl_ref[0, pl.ds((bat >> 7) * 32, 32), :]
        bc = jnp.take_along_axis(
            grp, jnp.full((32, 128), bat & 127, jnp.int32), axis=1)
        rl = bc & 255
        sv = (bc >> 8) & 255
        e1 = (bc >> 16) & 255
        idx = (lane + rl) & 127
        sh = jnp.take_along_axis(gath, idx, axis=1)
        m = (lane >= sv) & (lane <= e1)
        return jnp.where(m, sh, 0)

    for t in range(NT):
        b0 = ts_ref[b, t]
        b1 = ts_ref[b, t + 1]      # b1 - b0 is padded to a multiple of 4

        def quad_body(g, acc):
            bat = b0 + V9_UNROLL * g
            for u in range(V9_UNROLL):
                acc = acc + contrib(bat + u)
            return acc

        tile = jax.lax.fori_loop(0, (b1 - b0) // V9_UNROLL, quad_body,
                                 jnp.zeros((32, 128), jnp.int32))
        out_ref[0, t * 32:(t + 1) * 32, :] = tile


def v9_kernel(block: int, MAXB: int, RL: int, interpret: bool = False):
    NR = block // 128
    G32 = 32 * (-(-MAXB // 128))

    def call(nb, ts, rows, pctrl, lit32):
        B = pctrl.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,          # nb, tile_start, rows
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, G32, 128), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RL, 128), lambda b, *_: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, NR, 128), lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            _kernel_v9,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, NR, 128), jnp.int32),
            interpret=interpret,
        )(nb, ts, rows, pctrl, lit32)

    return jax.jit(call)


def decode_blocks_v9(pieces_list, lit_list, totals, block: int,
                     interpret: bool = False, device=None):
    nb, ts, rows, pctrl, lit32 = pack_blocks_v9(pieces_list, lit_list,
                                                totals, block)
    kern = v9_kernel(block, rows.shape[1] // 32, lit32.shape[1], interpret)
    args = (nb, ts, rows, pctrl, lit32)
    if device is not None:
        args = tuple(jax.device_put(a, device) for a in args)
    out = np.asarray(kern(*args))
    return [out[j].reshape(-1)[:totals[j]].astype(np.uint8).tobytes()
            for j in range(len(pieces_list))]


# ---------------------------------------------------------------------------
# v10: MXU one-hot row-gather.
#
# v9.3's wall is the 32 serial scalar-addressed source-row loads per batch
# (~85% of kernel time). v10 removes every scalar load from the hot loop:
#
#   * ALL per-op control packs into ONE i32 — roll:7 | s:7 | (e-1):7 |
#     src_row:11 — so one lane-gather per batch broadcasts the whole
#     control set to its (32,128) tile;
#   * the 128 source-row fetches of a 4-batch quad become ONE bf16 matmul
#     on the MXU: onehot(128, RLP) @ lit_bf16(RLP, 128), where onehot is
#     built by a dense iota-compare (bytes 0..255 are exact in bf16, and
#     each one-hot row has at most a single 1, so the f32 accumulation is
#     exact);
#   * the per-op variable rotate and mask run once on the whole (128,128)
#     quad (`take_along_axis` along lanes lowers to tpu.dynamic_gather).
#
# TPU reformulation of the reference hot loop zxc_decompress.c:890-1034.
# ---------------------------------------------------------------------------

V10_ROWBITS = 11      # src_row field width -> lit_full <= 2048 rows (256 KiB)


def pack_blocks_v10(pieces_list, lit_list, totals, block: int,
                    per=None, MAXB=None, RL=None):
    """Build the v10 dispatch batch.

    Returns (nb, ts, pctrl, lit8) where
      nb    (B,)          int32  batches per block          (host-side info)
      ts    (B, NT+1)     int32  per-tile batch prefix      (scalar prefetch)
      pctrl (B, G32, 128) int32  pre-transposed packed control: for batch
                                 bat = 128*g + j, sublane k,
                                 pctrl[b, 32*g + k, j] =
                                     roll | s<<7 | (e-1)<<14 | src_row<<21
                                 (empty ops packed as s=1, e-1=0)
      lit8  (B, RLP, 128) uint8  lit_full bytes (device converts to bf16)
    """
    B = len(pieces_list)
    if per is None:
        per = lane_ops_blocks(pieces_list, totals)
    if MAXB is None:
        MAXB = max(max(len(r[0]), 1) for r in per)
        MAXB = -(-MAXB // V9_GROUP) * V9_GROUP
    if RL is None:
        RL = max(-(-len(lit) // 128) for lit in lit_list) + 1
    RLP = -(-RL // 16) * 16          # bf16 sublane tile
    assert RLP <= (1 << V10_ROWBITS), \
        f"lit_full too large for v10 row field ({RLP} rows)"
    NT = block // 4096
    NG = -(-MAXB // 128)
    nb = np.array([len(r[0]) for r in per], np.int32)
    ts = np.zeros((B, NT + 1), np.int32)
    pctrl = np.full((B, NG * 32, 128), 1 << 7, np.int32)
    lit8 = np.zeros((B, RLP, 128), np.uint8)
    for j, ((rows, rl, s, e, tile_start), lit) in enumerate(
            zip(per, lit_list)):
        k = len(rows)
        nts = len(tile_start) - 1
        ts[j, :nts + 1] = tile_start
        ts[j, nts + 1:] = tile_start[-1]
        packed = np.where(e > 0,
                          rl | (s << 7) | ((e - 1) << 14) | (rows << 21),
                          1 << 7)
        bat = np.arange(k)[:, None]
        sub = np.arange(32)[None, :]
        pctrl[j, 32 * (bat >> 7) + sub, bat & 127] = packed
        flat = np.frombuffer(bytes(lit), np.uint8)
        lit8[j].reshape(-1)[:len(flat)] = flat
    return nb, ts, pctrl, lit8


def _kernel_v10(ts_ref, pctrl_ref, litb_ref, out_ref):
    b = pl.program_id(0)
    NT = out_ref.shape[1] // 32
    RLP = litb_ref.shape[1]
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    rowiota = jax.lax.broadcasted_iota(jnp.int32, (128, RLP), 1)
    litb = litb_ref[0]               # (RLP, 128) bf16

    def contrib4(bat):
        bcs = []
        for u in range(V9_UNROLL):
            grp = pctrl_ref[0, pl.ds(((bat + u) >> 7) * 32, 32), :]
            bcs.append(jnp.take_along_axis(
                grp, jnp.full((32, 128), (bat + u) & 127, jnp.int32),
                axis=1))
        bc = jnp.concatenate(bcs, axis=0)          # (128,128)
        rl = bc & 127
        sv = (bc >> 7) & 127
        e1 = (bc >> 14) & 127
        row = jax.lax.shift_right_logical(bc, 21)
        # select into f32 (the i32 compare's native 32-bit tiling), then a
        # plain truncation to bf16 — Mosaic can't relayout the i1 mask
        # straight into a 16-bit select
        onehot = jnp.where(rowiota == row[:, :1],
                           jnp.float32(1), jnp.float32(0))
        gath = jax.lax.dot_general(
            onehot.astype(jnp.bfloat16), litb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        sh = jnp.take_along_axis(gath, (lane128 + rl) & 127, axis=1)
        m = (lane128 >= sv) & (lane128 <= e1)
        return jnp.where(m, sh, 0)

    for t in range(NT):
        b0 = ts_ref[b, t]
        b1 = ts_ref[b, t + 1]        # b1 - b0 is padded to a multiple of 4

        def quad_body(g, acc):
            c = contrib4(b0 + V9_UNROLL * g)
            return acc + c[0:32] + c[32:64] + c[64:96] + c[96:128]

        tile = jax.lax.fori_loop(0, (b1 - b0) // V9_UNROLL, quad_body,
                                 jnp.zeros((32, 128), jnp.int32))
        out_ref[0, t * 32:(t + 1) * 32, :] = tile


def v10_kernel(block: int, MAXB: int, RLP: int, interpret: bool = False):
    NR = block // 128
    G32 = 32 * (-(-MAXB // 128))

    def call(nb, ts, pctrl, lit8):
        litb = lit8.astype(jnp.bfloat16)
        B = pctrl.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,          # ts
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
            _kernel_v10,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, NR, 128), jnp.int32),
            interpret=interpret,
        )(ts, pctrl, litb)

    return jax.jit(call)


# ---------------------------------------------------------------------------
# v11: v10's MXU one-hot row-gather with a FULLY STATIC control structure.
#
# v10 measured ~20x below its op-count roofline: the per-tile fori_loops
# have data-dependent trip counts (ts[t+1]-ts[t]), which defeats Mosaic's
# software pipelining, and every batch index is dynamic. v11 pads every
# tile of a dispatch to one shape-static LAYERS count, so batch index
# bat = t*LAYERS + j is an affine function of static/loop indices: the
# kernel is two statically-bounded loops of straight-line vector/MXU code
# with no scalar-prefetch operands at all. The padding factor (~1.4-1.8x)
# is bought back many times over by pipelining.
# ---------------------------------------------------------------------------


def pack_blocks_v11(pieces_list, lit_list, totals, block: int,
                    per=None, LAYERS=None, RL=None):
    """Pack the v11 static-layers dispatch batch.

    Returns (pctrl, lit8): pctrl (B, G32, 128) i32 as in v10 but with
    batch index bat = tile*LAYERS + layer; lit8 (B, RLP, 128) uint8.
    """
    B = len(pieces_list)
    if per is None:
        per = lane_ops_blocks(pieces_list, totals)
    if LAYERS is None:
        LAYERS = max(int(np.diff(r[4]).max(initial=1)) for r in per)
        LAYERS = -(-LAYERS // V9_UNROLL) * V9_UNROLL
    if RL is None:
        RL = max(-(-len(lit) // 128) for lit in lit_list) + 1
    RLP = -(-RL // 16) * 16
    assert RLP <= (1 << V10_ROWBITS), \
        f"lit_full too large for v11 row field ({RLP} rows)"
    NT = block // 4096
    NB = NT * LAYERS
    NG = -(-NB // 128)
    pctrl = np.full((B, NG * 32, 128), 1 << 7, np.int32)
    lit8 = np.zeros((B, RLP, 128), np.uint8)
    for j, ((rows, rl, s, e, tile_start), lit) in enumerate(
            zip(per, lit_list)):
        k = len(rows)
        if k:
            # original batch index -> (tile, layer) -> static-stride index
            tl = np.searchsorted(tile_start, np.arange(k), side='right') - 1
            layer = np.arange(k) - tile_start[tl]
            assert (layer < LAYERS).all(), "LAYERS below a tile's layer count"
            bat = (tl * LAYERS + layer)[:, None]
            packed = np.where(e > 0,
                              rl | (s << 7) | ((e - 1) << 14) | (rows << 21),
                              1 << 7)
            sub = np.arange(32)[None, :]
            pctrl[j, 32 * (bat >> 7) + sub, bat & 127] = packed
        flat = np.frombuffer(bytes(lit), np.uint8)
        lit8[j].reshape(-1)[:len(flat)] = flat
    return pctrl, lit8


def _kernel_v11(pctrl_ref, litb_ref, out_ref, *, LAYERS):
    NT = out_ref.shape[1] // 32
    RLP = litb_ref.shape[1]
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    rowiota = jax.lax.broadcasted_iota(jnp.int32, (128, RLP), 1)
    litb = litb_ref[0]               # (RLP, 128) bf16

    def contrib4(bat):
        bcs = []
        for u in range(V9_UNROLL):
            grp = pctrl_ref[0, pl.ds(((bat + u) >> 7) * 32, 32), :]
            bcs.append(jnp.take_along_axis(
                grp, jnp.full((32, 128), (bat + u) & 127, jnp.int32),
                axis=1))
        bc = jnp.concatenate(bcs, axis=0)          # (128,128)
        rl = bc & 127
        sv = (bc >> 7) & 127
        e1 = (bc >> 14) & 127
        row = jax.lax.shift_right_logical(bc, 21)
        onehot = jnp.where(rowiota == row[:, :1],
                           jnp.float32(1), jnp.float32(0))
        gath = jax.lax.dot_general(
            onehot.astype(jnp.bfloat16), litb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        sh = jnp.take_along_axis(gath, (lane128 + rl) & 127, axis=1)
        m = (lane128 >= sv) & (lane128 <= e1)
        return jnp.where(m, sh, 0)

    for t in range(NT):
        def quad_body(g, acc):
            c = contrib4(t * LAYERS + V9_UNROLL * g)
            return acc + c[0:32] + c[32:64] + c[64:96] + c[96:128]

        tile = jax.lax.fori_loop(0, LAYERS // V9_UNROLL, quad_body,
                                 jnp.zeros((32, 128), jnp.int32))
        out_ref[0, t * 32:(t + 1) * 32, :] = tile


def v11_kernel(block: int, LAYERS: int, RLP: int, interpret: bool = False):
    NR = block // 128
    NT = block // 4096
    NB = NT * LAYERS
    G32 = 32 * (-(-NB // 128))

    def call(pctrl, lit8):
        litb = lit8.astype(jnp.bfloat16)
        B = pctrl.shape[0]
        return pl.pallas_call(
            functools.partial(_kernel_v11, LAYERS=LAYERS),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, G32, 128), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RLP, 128), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, NR, 128), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, NR, 128), jnp.int32),
            interpret=interpret,
        )(pctrl, litb)

    return jax.jit(call)


def decode_blocks_v11(pieces_list, lit_list, totals, block: int,
                      interpret: bool = False, device=None):
    per = lane_ops_blocks(pieces_list, totals)
    LAYERS = max(int(np.diff(r[4]).max(initial=1)) for r in per)
    LAYERS = -(-LAYERS // V9_UNROLL) * V9_UNROLL
    pctrl, lit8 = pack_blocks_v11(pieces_list, lit_list, totals, block,
                                  per=per, LAYERS=LAYERS)
    kern = v11_kernel(block, LAYERS, lit8.shape[1], interpret)
    args = (pctrl, lit8)
    if device is not None:
        args = tuple(jax.device_put(a, device) for a in args)
    out = np.asarray(kern(*args))
    return [out[j].reshape(-1)[:totals[j]].astype(np.uint8).tobytes()
            for j in range(len(pieces_list))]


def decode_blocks_v10(pieces_list, lit_list, totals, block: int,
                      interpret: bool = False, device=None):
    nb, ts, pctrl, lit8 = pack_blocks_v10(pieces_list, lit_list,
                                          totals, block)
    kern = v10_kernel(block, (pctrl.shape[1] // 32) * 128, lit8.shape[1],
                      interpret)
    args = (nb, ts, pctrl, lit8)
    if device is not None:
        args = tuple(jax.device_put(a, device) for a in args)
    out = np.asarray(kern(*args))
    return [out[j].reshape(-1)[:totals[j]].astype(np.uint8).tobytes()
            for j in range(len(pieces_list))]




def _kernel_v12(qs_ref, qbase_ref, pctrl_ref, tq_ref, litb_ref, out_ref):
    b = pl.program_id(0)
    NT = out_ref.shape[1] // 32
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    rowiota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    row32 = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0)

    def contrib_quad(q):
        base = pl.multiple_of(qbase_ref[b, q], 16)
        win = litb_ref[0, pl.ds(base, 128), :]       # (128,128) bf16
        bcs = []
        for u in range(4):
            bat = 4 * q + u
            grp = pctrl_ref[0, pl.ds((bat >> 7) * 32, 32), :]
            bcs.append(jnp.take_along_axis(
                grp, jnp.full((32, 128), bat & 127, jnp.int32), axis=1))
        bc = jnp.concatenate(bcs, axis=0)            # (128,128) slot-major
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
        # slot -> target row permute: Pt[r, i] = (tq[q, i] == r)
        tgt = tq_ref[0, q, :][None, :]               # (1,128) lane-major
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


def v12_kernel(block: int, MAXQ: int, RLP: int, interpret: bool = False):
    NR = block // 128
    NB = MAXQ * 4
    G32 = 32 * (-(-NB // 128))

    def call(qs, qbase, pctrl, tq, lit8):
        litb = lit8.astype(jnp.bfloat16)
        tq = tq.astype(jnp.int32)
        B = pctrl.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,          # qs, qbase
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
            _kernel_v12,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, NR, 128), jnp.int32),
            interpret=interpret,
        )(qs, qbase, pctrl, tq, litb)

    return jax.jit(call)


def decode_blocks_v12(pieces_list, lit_list, totals, block: int,
                      interpret: bool = False, device=None):
    qs, qbase, pctrl, tq, lit8 = pack_blocks_v12(pieces_list, lit_list,
                                                 totals, block)
    kern = v12_kernel(block, qbase.shape[1], lit8.shape[1], interpret)
    args = (qs, qbase, pctrl, tq, lit8)
    if device is not None:
        args = tuple(jax.device_put(a, device) for a in args)
    out = np.asarray(kern(*args))
    return [out[j].reshape(-1)[:totals[j]].astype(np.uint8).tobytes()
            for j in range(len(pieces_list))]



# ---------------------------------------------------------------------------
# v14: v13 with a FOUR-way unrolled quad loop + in-kernel remainder.
#
# The v5e TensorCore has four MXUs; the v13 pair-unroll (1.08 -> 1.73
# GB/s) showed per-quad cost is MXU issue-bound with independent quads
# overlapping, so a 4-deep unroll exposes more matmul-level parallelism.
# Remainder quads (n % 4) run through a single-quad epilogue loop with
# dynamic bounds instead of packer padding (quad_align stays 1 — the
# v13 packer padding would cost ~30% extra quads at avg 4.6 quads/tile).
# ---------------------------------------------------------------------------


def _kernel_v14(qs_ref, qbase_ref, pctrl_ref, tq_ref, litb_ref, out_ref):
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
        n4 = (q1 - q0) >> 2

        def qbody4(g, acc):
            q = q0 + 4 * g
            return (acc + contrib_quad(q) + contrib_quad(q + 1)
                    + contrib_quad(q + 2) + contrib_quad(q + 3))

        tile = jax.lax.fori_loop(0, n4, qbody4,
                                 jnp.zeros((32, 128), jnp.int32))

        def qbody1(q, acc):
            return acc + contrib_quad(q)

        tile = jax.lax.fori_loop(q0 + 4 * n4, q1, qbody1, tile)
        out_ref[0, t * 32:(t + 1) * 32, :] = tile


@functools.lru_cache(maxsize=32)
def v14_kernel(block: int, MAXQ: int, RLP: int, interpret: bool = False):
    NR = block // 128
    NB = MAXQ * 4
    G32 = 32 * (-(-NB // 128))

    def call(qs, qbase, pctrl, tq, lit8):
        litb = lit8.astype(jnp.bfloat16)
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
            _kernel_v14,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, NR, 128), jnp.int32),
            interpret=interpret,
        )(qs, qbase, pctrl, tq, litb)

    return jax.jit(call)


def decode_blocks_v14(pieces_list, lit_list, totals, block: int,
                      interpret: bool = False, device=None,
                      dispatch: int = 16):
    """v14 decode: 4-way unrolled quads, no packer padding."""
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
                           t[d * B:(d + 1) * B], block)
           for d in range(nd)]
    MAXQ = -(-max(s[1].shape[1] for s in raw) // 32) * 32
    RLP = -(-max(s[4].shape[1] for s in raw) // 128) * 128
    kern = v14_kernel(block, MAXQ, RLP, interpret)
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
# v15: 128-row target supertiles (4 subtiles fused per accumulator).
#
# The v13 ablation chain showed per-quad cost is MXU issue/drain latency,
# and its target-permute matmul is (32,128)@(128,128) — a quarter of the
# systolic array's rows do useful work. Widening the target tile to 128
# rows makes that matmul full-size at the SAME issue cost, and (the real
# win) amortizes tile-boundary quad fragmentation 4x: the packer emits
# one partial quad per 16 KiB of output instead of per 4 KiB, and the
# quad_align=2 padding drops from ~+11% to ~+3% of quads. Window
# constraint is unchanged (all of a quad's sources within one 128-row
# span of lit_full); at L3 ratios a 16 KiB output slab consumes ~7 KiB
# of lit rows, so supertile grouping rarely forces window splits.
# TPU reformulation of the reference hot loop zxc_decompress.c:890-1034.
# ---------------------------------------------------------------------------


def pack_blocks_v15(pieces_list, lit_list, totals, block: int,
                    per=None, MAXQ=None, RL=None, quad_align: int = 2,
                    base_align: int = 16):
    """Pack the v15 dispatch batch: same arrays as pack_blocks_v12 but
    quads grouped per 128-row supertile (qs has block//16384 + 1 cols)
    and tq carries 7-bit target rows."""
    B = len(pieces_list)
    if per is None:
        per = lane_ops_blocks(pieces_list, totals)
    NR = block // 128
    assert NR % 128 == 0, "v15 needs block >= 16384"
    GRP = 4                      # 32-row subtiles per supertile
    NST = NR // 128
    blocks = []
    maxq = 1
    maxrow = 0
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
                tgt = (live & 31) + 32 * g
                parts.append(np.stack(
                    [er[live], erl[live], es[live], ee[live] - 1, tgt],
                    axis=1))
            lops = (np.concatenate(parts, axis=0) if parts
                    else np.zeros((0, 5), np.int64))
            lops = lops[np.argsort(lops[:, 0], kind="stable")]
            i = 0
            n = len(lops)
            while i < n:
                base = int(lops[i, 0]) & ~(base_align - 1)
                j = min(i + 128, n)
                while lops[j - 1, 0] - base > 127:
                    j -= 1
                quads.append((base, lops[i:j]))
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
    qs = np.zeros((B, NST + 1), np.int32)
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


def _kernel_v15(qs_ref, qbase_ref, pctrl_ref, tq_ref, litb_ref, out_ref):
    b = pl.program_id(0)
    NST = out_ref.shape[1] // 128
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    rowiota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    row128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)

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


@functools.lru_cache(maxsize=32)
def v15_kernel(block: int, MAXQ: int, RLP: int, interpret: bool = False):
    NR = block // 128
    NB = MAXQ * 4
    G32 = 32 * (-(-NB // 128))

    def call(qs, qbase, pctrl, tq, lit8):
        litb = lit8.astype(jnp.bfloat16)
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
            _kernel_v15,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, NR, 128), jnp.int32),
            interpret=interpret,
        )(qs, qbase, pctrl, tq, litb)

    return jax.jit(call)


def decode_blocks_v15(pieces_list, lit_list, totals, block: int,
                      interpret: bool = False, device=None,
                      dispatch: int = 16):
    """v15 decode: 128-row supertiles, pair-unrolled quads, bucketed
    shapes (same dispatch scheme as decode_blocks_v13)."""
    nb = len(pieces_list)
    if nb == 0:
        return []
    if block < 16384:            # too small for a 128-row supertile
        return decode_blocks_v13(pieces_list, lit_list, totals, block,
                                 interpret=interpret, device=device,
                                 dispatch=dispatch)
    B = min(dispatch, nb)
    nd = -(-nb // B)
    pad = nd * B - nb
    p = list(pieces_list) + [pieces_list[-1]] * pad
    l = list(lit_list) + [lit_list[-1]] * pad
    t = list(totals) + [0] * pad
    raw = [pack_blocks_v15(p[d * B:(d + 1) * B], l[d * B:(d + 1) * B],
                           t[d * B:(d + 1) * B], block)
           for d in range(nd)]
    MAXQ = -(-max(s[1].shape[1] for s in raw) // 32) * 32
    RLP = -(-max(s[4].shape[1] for s in raw) // 128) * 128
    kern = v15_kernel(block, MAXQ, RLP, interpret)
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
# v16: v15 with a FOUR-way unrolled quad loop (quad_align=4, NO epilogue).
#
# v15's marginal rate puts each 128^3 bf16 matmul at ~146 ns — the
# single-MXU issue floor — but the v5e TensorCore has four MXUs and a
# pair-unroll only exposes two independent chains (the two matmuls
# within a quad are dependent). v14 showed a dynamic epilogue poisons a
# deeper unroll at 4.6 quads/tile; with 128-row supertiles (~17
# quads/tile) quad_align=4 padding costs ~6%, so the unroll can be
# epilogue-free.
# ---------------------------------------------------------------------------


def _kernel_v16(qs_ref, qbase_ref, pctrl_ref, tq_ref, litb_ref, out_ref):
    b = pl.program_id(0)
    NST = out_ref.shape[1] // 128
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    rowiota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    row128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)

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
        pt = jnp.where(row128 == tgt, jnp.float32(1), jnp.float32(0))
        return jax.lax.dot_general(
            pt.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)

    for t in range(NST):
        q0 = qs_ref[b, t]
        q1 = qs_ref[b, t + 1]

        def qbody(g, acc):
            q = q0 + 4 * g
            return (acc + contrib_quad(q) + contrib_quad(q + 1)
                    + contrib_quad(q + 2) + contrib_quad(q + 3))

        tile = jax.lax.fori_loop(0, (q1 - q0) >> 2, qbody,
                                 jnp.zeros((128, 128), jnp.int32))
        out_ref[0, t * 128:(t + 1) * 128, :] = tile


@functools.lru_cache(maxsize=32)
def v16_kernel(block: int, MAXQ: int, RLP: int, interpret: bool = False):
    NR = block // 128
    NB = MAXQ * 4
    G32 = 32 * (-(-NB // 128))

    def call(qs, qbase, pctrl, tq, lit8):
        litb = lit8.astype(jnp.bfloat16)
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
            _kernel_v16,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, NR, 128), jnp.int32),
            interpret=interpret,
        )(qs, qbase, pctrl, tq, litb)

    return jax.jit(call)


def decode_blocks_v16(pieces_list, lit_list, totals, block: int,
                      interpret: bool = False, device=None,
                      dispatch: int = 16):
    """v16 decode: 128-row supertiles, 4-way unrolled quads (align=4)."""
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
    raw = [pack_blocks_v15(p[d * B:(d + 1) * B], l[d * B:(d + 1) * B],
                           t[d * B:(d + 1) * B], block, quad_align=4)
           for d in range(nd)]
    MAXQ = -(-max(s[1].shape[1] for s in raw) // 32) * 32
    RLP = -(-max(s[4].shape[1] for s in raw) // 128) * 128
    kern = v16_kernel(block, MAXQ, RLP, interpret)
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
# v17: v15 with int8 MXU matmuls.
#
# v15 sits at the bf16 matmul issue floor (~146 ns per 128^3). The v5e
# MXU's int8 path is rated at 2x the bf16 MACs; both of the kernel's
# matmuls are exact in int8: the one-hot operands are 0/1 and each
# output byte receives exactly ONE contribution (pieces are disjoint),
# so window bytes ride as signed int8 (wrapping) through int32
# accumulation, and a final `& 255` restores byte values.
# ---------------------------------------------------------------------------


def _kernel_v17(qs_ref, qbase_ref, pctrl_ref, tq_ref, lit8_ref, out_ref):
    b = pl.program_id(0)
    NST = out_ref.shape[1] // 128
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    rowiota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    row128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)

    def contrib_quad(q):
        base = pl.multiple_of(qbase_ref[b, q], 32)
        win = lit8_ref[0, pl.ds(base, 128), :]   # (128,128) int8
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
        onehot = jnp.where(rowiota == rowrel[:, :1], 1, 0).astype(jnp.int8)
        gath = jax.lax.dot_general(
            onehot, win, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        sh = jnp.take_along_axis(gath, (lane128 + rl) & 127, axis=1)
        m = (lane128 >= sv) & (lane128 <= e1)
        c = jnp.where(m, sh, 0).astype(jnp.int8)  # signed bytes, exact
        tgt = tq_ref[0, q, :][None, :]           # (1,128) lane-major
        pt = jnp.where(row128 == tgt, 1, 0).astype(jnp.int8)
        return jax.lax.dot_general(
            pt, c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    for t in range(NST):
        q0 = qs_ref[b, t]
        q1 = qs_ref[b, t + 1]

        def qbody(g, acc):
            q = q0 + 2 * g
            return acc + contrib_quad(q) + contrib_quad(q + 1)

        tile = jax.lax.fori_loop(0, (q1 - q0) >> 1, qbody,
                                 jnp.zeros((128, 128), jnp.int32))
        out_ref[0, t * 128:(t + 1) * 128, :] = tile & 255


@functools.lru_cache(maxsize=32)
def v17_kernel(block: int, MAXQ: int, RLP: int, interpret: bool = False):
    NR = block // 128
    NB = MAXQ * 4
    G32 = 32 * (-(-NB // 128))

    def call(qs, qbase, pctrl, tq, lit8):
        lit_i8 = lit8.astype(jnp.int8)           # reinterpret bytes signed
        B = pctrl.shape[0]
        # int8 sublane tile is 32: qbase is 16-aligned by the packer, so
        # round window starts down to 32 and fold the parity into rowrel?
        # No — keep 16-alignment by widening the guarantee at pack time.
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
            _kernel_v17,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, NR, 128), jnp.int32),
            interpret=interpret,
        )(qs, qbase, pctrl, tq, lit_i8)

    return jax.jit(call)


def decode_blocks_v17(pieces_list, lit_list, totals, block: int,
                      interpret: bool = False, device=None,
                      dispatch: int = 16):
    """v17 decode: v15 supertiles with int8 MXU matmuls (32-aligned
    window bases)."""
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
    raw = [pack_blocks_v15(p[d * B:(d + 1) * B], l[d * B:(d + 1) * B],
                           t[d * B:(d + 1) * B], block, quad_align=2,
                           base_align=32)
           for d in range(nd)]
    MAXQ = -(-max(s[1].shape[1] for s in raw) // 32) * 32
    RLP = -(-max(s[4].shape[1] for s in raw) // 128) * 128
    kern = v17_kernel(block, MAXQ, RLP, interpret)
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
# v20: v19 with plane segregation.
#
# At K=2 only ~26% of slots carry a second sub-op, but every v19 quad
# pays the second control plane's VPU work (fetch, extracts, compares,
# select) — and v19 is VPU-bound (PERF.md: the K=2 quad's glue sits at
# or above the 2x146 ns MXU floor). Quad order within a supertile is
# free (contributions accumulate), so the packer places single-op
# slots in their own quads first and multi-op slots after, recording a
# per-tile midpoint; the kernel runs a 1-plane loop to the midpoint
# and the 2-plane loop after it. qs doubles in width:
# qs[2t]=start, qs[2t+1]=midpoint, qs[2t+2]=end of supertile t.
# TPU reformulation of the reference hot loop zxc_decompress.c:890-1034.
# ---------------------------------------------------------------------------


def pack_blocks_v20(pieces_list, lit_list, totals, block: int,
                    per=None, MAXQ=None, RL=None, quad_align: int = 2,
                    K: int = 2):
    """Pack the v20 dispatch batch (v19 arrays, segregated quads,
    double-width qs)."""
    B = len(pieces_list)
    if per is None:
        per = lane_ops_blocks(pieces_list, totals)
    NR = block // 128
    assert NR % 128 == 0, "v20 needs block >= 16384"
    GRP = 4
    NST = NR // 128
    blocks = []
    maxq = 1
    maxrow = 0
    empty = (0, np.zeros(0, np.int64), np.zeros(0, np.int64),
             np.zeros((0, K, 3), np.int64))
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
                sctl[:, :, 1] = 1
                ssrc[slot_of] = ops[:, 0]
                stgt[slot_of] = ops[:, 1]
                sctl[slot_of, sub_of, 0] = ops[:, 2]
                sctl[slot_of, sub_of, 1] = ops[:, 3]
                sctl[slot_of, sub_of, 2] = ops[:, 4]
                n_subs = np.bincount(slot_of, minlength=n_slots)
            else:
                n_slots = 0
                ssrc = stgt = np.zeros(0, np.int64)
                sctl = np.zeros((0, K, 3), np.int64)
                n_subs = np.zeros(0, np.int64)

            # chunk each class separately (the window check needs src
            # monotone within a chunk — a mixed-order boundary quad can
            # pack a NEGATIVE rowrel, which the kernel's logical shift
            # turns into garbage; learned the hard way). Parity of the
            # single-side loop is fixed by SHIFTING its last quad to the
            # multi side (1-plane slots are correct under the K-plane
            # loop; their extra planes are empty fillers), so at most
            # one trailing empty quad pads the multi side.
            def chunk(sel):
                src_c, tgt_c, ctl_c = ssrc[sel], stgt[sel], sctl[sel]
                i = 0
                n = len(src_c)
                out = []
                while i < n:
                    base = int(src_c[i]) & ~15
                    j = min(i + 128, n)
                    while src_c[j - 1] - base > 127:
                        j -= 1
                    out.append((base, src_c[i:j], tgt_c[i:j], ctl_c[i:j]))
                    i = j
                return out

            order = np.argsort(ssrc, kind="stable")
            mul_o = (n_subs > 1)[order]
            singles = chunk(order[~mul_o])
            multis = chunk(order[mul_o])
            st_quads = singles + multis
            nq = len(st_quads)
            qm = len(singles)
            if qm & 1:
                qm -= 1                       # shift one single to multi side
            if (nq - qm) & 1:                 # boundary shifts can't change
                st_quads.append(empty)        # total parity: pad one quad
                nq += 1
            quads.extend(st_quads)
            qs_t.append(qs_t[-1] + qm)        # midpoint (singles end)
            qs_t.append(qs_t[-2] + nq)        # supertile end
            maxrow = max(maxrow,
                         max((b + 128 for b, *_ in st_quads), default=128))
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
    qs = np.zeros((B, 2 * NST + 1), np.int32)
    qbase = np.zeros((B, MAXQ), np.int32)
    pctrl = np.full((B, K * NG32, 128), 1 << 7, np.int32)
    tq = np.zeros((B, MAXQ, 128), np.int32)
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


def pack_blocks_v22(pieces_list, lit_list, totals, block: int,
                    per=None, MAXQ=None, RL=None, quad_align: int = 2,
                    K: int = 2):
    """v22: v20's plane segregation WITHOUT the per-class chunk tails.

    v20 chunked singles and multis separately, paying +7.6% quads in
    per-class tail fragments — which cancelled its ~10% per-quad win
    (PERF.md 3.2). Here the concatenated [singles-by-src, multis-by-src]
    list is chunked with a running min/max source window (a quad is valid
    iff max(src) - (min(src) & ~15) <= 127), so ONE quad may span the
    class boundary; it simply runs under the 2-plane loop (single-op
    slots are correct there — their extra planes are empty fillers).
    rowrel = src - (min & ~15) is non-negative by construction, which is
    the src-monotone-chunking requirement the v20 post-mortem named.
    Parity: an odd single-side count shifts its last quad to the multi
    side (free); only an odd multi side pads one empty quad — the same
    expected padding as v19's quad_align. Kernel: v20's (double-width qs,
    1-plane loop to the midpoint)."""
    B = len(pieces_list)
    if per is None:
        per = lane_ops_blocks(pieces_list, totals)
    NR = block // 128
    assert NR % 128 == 0, "v22 needs block >= 16384"
    GRP = 4
    NST = NR // 128
    blocks = []
    maxq = 1
    maxrow = 0
    empty = (0, np.zeros(0, np.int64), np.zeros(0, np.int64),
             np.zeros((0, K, 3), np.int64))
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
                sctl[:, :, 1] = 1
                ssrc[slot_of] = ops[:, 0]
                stgt[slot_of] = ops[:, 1]
                sctl[slot_of, sub_of, 0] = ops[:, 2]
                sctl[slot_of, sub_of, 1] = ops[:, 3]
                sctl[slot_of, sub_of, 2] = ops[:, 4]
                n_subs = np.bincount(slot_of, minlength=n_slots)
            else:
                n_slots = 0
                ssrc = stgt = np.zeros(0, np.int64)
                sctl = np.zeros((0, K, 3), np.int64)
                n_subs = np.zeros(0, np.int64)

            # multis first, window-chunked; each under-filled multi quad
            # ABSORBS singles whose src falls inside its window (they run
            # correctly under the 2-plane loop; empty plane-1 fillers) —
            # this keeps the total quad count at v19's density instead of
            # paying half-filled multi quads (the sparse-multi window
            # problem that made plain segregation a wash)
            order = np.argsort(ssrc, kind="stable")
            mul_o = (n_subs > 1)[order]
            mult_i = order[mul_o]
            sing_i = order[~mul_o]
            sing_src = ssrc[sing_i]
            sing_used = np.zeros(len(sing_i), bool)
            multi_quads = []
            i = 0
            n = len(mult_i)
            msrc = ssrc[mult_i]
            while i < n:
                lo = int(msrc[i])
                base = lo & ~15
                j = i + 1
                while j < n and j - i < 128 and msrc[j] - base <= 127:
                    j += 1
                sel = list(mult_i[i:j])
                cap = 128 - (j - i)
                if cap > 0:
                    a = np.searchsorted(sing_src, base)
                    b = np.searchsorted(sing_src, base + 128)
                    avail = np.nonzero(~sing_used[a:b])[0][:cap] + a
                    if len(avail):
                        sing_used[avail] = True
                        sel.extend(sing_i[avail])
                sel = np.asarray(sel, np.int64)
                multi_quads.append((base, ssrc[sel], stgt[sel], sctl[sel]))
                i = j
            rest = sing_i[~sing_used]
            rsrc = ssrc[rest]
            ro = np.argsort(rsrc, kind="stable")
            rest = rest[ro]
            rsrc = rsrc[ro]
            single_quads = []
            i = 0
            n = len(rest)
            while i < n:
                base = int(rsrc[i]) & ~15
                j = i + 1
                while j < n and j - i < 128 and rsrc[j] - base <= 127:
                    j += 1
                sel = rest[i:j]
                single_quads.append((base, ssrc[sel], stgt[sel], sctl[sel]))
                i = j
            st_quads = single_quads + multi_quads
            qm = len(single_quads)
            nq = len(st_quads)
            if qm & 1:
                qm -= 1              # shift one single quad to the 2-plane side
            if (nq - qm) & 1:        # pad the multi side to even
                st_quads.append(empty)
                nq += 1
            quads.extend(st_quads)
            qs_t.append(qs_t[-1] + qm)
            qs_t.append(qs_t[-2] + nq)
            maxrow = max(maxrow,
                         max((b + 128 for b, *_ in st_quads), default=128))
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
    qs = np.zeros((B, 2 * NST + 1), np.int32)
    qbase = np.zeros((B, MAXQ), np.int32)
    pctrl = np.full((B, K * NG32, 128), 1 << 7, np.int32)
    tq = np.zeros((B, MAXQ, 128), np.int32)
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
            assert (ssrc >= base).all()
            pctrl[j, 32 * (bat >> 7) + sub, bat & 127] = p0
            for kk in range(1, K):
                pk_ = (sctl[:, kk, 0] | (sctl[:, kk, 1] << 7)
                       | (sctl[:, kk, 2] << 14))
                pctrl[j, kk * NG32 + 32 * (bat >> 7) + sub, bat & 127] = pk_
            tq[j, q, i] = stgt
        flat = np.frombuffer(bytes(lit), np.uint8)
        lit8[j].reshape(-1)[:len(flat)] = flat
    return qs, qbase, pctrl, tq, lit8


def pack_blocks_v23(pieces_list, lit_list, totals, block: int,
                    per=None, MAXQ=None, RL=None, quad_align: int = 2,
                    K: int = 2):
    """v23: v19 slots/quads with PLANE-INTERLEAVED control layout.

    v19 fetches control with 8 take_along issues per quad (4 batches x
    K=2 planes). Interleaving the planes per 32-row group — row index
    (bat>>7)*32K + j*32 + sub instead of j*G32 + (bat>>7)*32 + sub —
    lets one (32K,128) take_along fetch ALL planes of a batch: 4 issues
    per quad. Same bytes, half the op issues; the kernel slices the
    fetch into per-plane halves statically."""
    qs, qbase, pctrl, tq, lit8 = pack_blocks_v19(
        pieces_list, lit_list, totals, block, per=per, MAXQ=MAXQ, RL=RL,
        quad_align=quad_align, K=K)
    B, KG, _ = pctrl.shape
    G32 = KG // K
    NGRP = G32 // 32
    # reorder rows: new[(g*K + j)*32 + sub] = old[j*G32 + g*32 + sub]
    old = pctrl.reshape(B, K, NGRP, 32, 128)
    newp = np.ascontiguousarray(old.transpose(0, 2, 1, 3, 4)).reshape(
        B, KG, 128)
    return qs, qbase, newp, tq, lit8


def _make_kernel_v23(K: int):
    def _kernel_v23(qs_ref, qbase_ref, pctrl_ref, tq_ref, litb_ref,
                    out_ref):
        b = pl.program_id(0)
        NST = out_ref.shape[1] // 128
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        rowiota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        row128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)

        def contrib_quad(q):
            base = pl.multiple_of(qbase_ref[b, q], 16)
            win = litb_ref[0, pl.ds(base, 128), :]

            # one fetch per batch covers ALL K planes (32K rows)
            fet = []
            for u in range(4):
                bat = 4 * q + u
                grp = pctrl_ref[0, pl.ds((bat >> 7) * 32 * K, 32 * K), :]
                fet.append(jnp.take_along_axis(
                    grp, jnp.full((32 * K, 128), bat & 127, jnp.int32),
                    axis=1))

            def plane(j):
                return jnp.concatenate(
                    [f[32 * j:32 * (j + 1)] for f in fet], axis=0)

            bc0 = plane(0)
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
                bcj = plane(j)
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

    return _kernel_v23


@functools.lru_cache(maxsize=32)
def v23_kernel(block: int, MAXQ: int, RLP: int, K: int = 2,
               interpret: bool = False):
    NR = block // 128
    NB = MAXQ * 4
    G32 = 32 * (-(-NB // 128))
    body = _make_kernel_v23(K)

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


def _make_kernel_v20(K: int):
    def _kernel_v20(qs_ref, qbase_ref, pctrl_ref, tq_ref, litb_ref,
                    out_ref):
        b = pl.program_id(0)
        NST = out_ref.shape[1] // 128
        G32 = pctrl_ref.shape[1] // K
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        rowiota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        row128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)

        def contrib_quad(q, nk):
            base = pl.multiple_of(qbase_ref[b, q], 16)
            win = litb_ref[0, pl.ds(base, 128), :]

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
            for j in range(1, nk):
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
            q0 = qs_ref[b, 2 * t]
            qm = qs_ref[b, 2 * t + 1]
            q1 = qs_ref[b, 2 * t + 2]

            def sbody(g, acc):
                q = q0 + 2 * g
                return acc + contrib_quad(q, 1) + contrib_quad(q + 1, 1)

            def mbody(g, acc):
                q = qm + 2 * g
                return acc + contrib_quad(q, K) + contrib_quad(q + 1, K)

            tile = jax.lax.fori_loop(0, (qm - q0) >> 1, sbody,
                                     jnp.zeros((128, 128), jnp.int32))
            tile = jax.lax.fori_loop(0, (q1 - qm) >> 1, mbody, tile)
            out_ref[0, t * 128:(t + 1) * 128, :] = tile

    return _kernel_v20


@functools.lru_cache(maxsize=32)
def v20_kernel(block: int, MAXQ: int, RLP: int, K: int = 2,
               interpret: bool = False):
    NR = block // 128
    NB = MAXQ * 4
    G32 = 32 * (-(-NB // 128))
    body = _make_kernel_v20(K)

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


def decode_blocks_v20(pieces_list, lit_list, totals, block: int,
                      interpret: bool = False, device=None,
                      dispatch: int = 16, K: int = 2):
    """v20 decode: segregated multi-op slots, pair-unrolled quads."""
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
    raw = [pack_blocks_v20(p[d * B:(d + 1) * B], l[d * B:(d + 1) * B],
                           t[d * B:(d + 1) * B], block, K=K)
           for d in range(nd)]
    MAXQ = -(-max(s[1].shape[1] for s in raw) // 32) * 32
    RLP = -(-max(s[4].shape[1] for s in raw) // 128) * 128
    kern = v20_kernel(block, MAXQ, RLP, K, interpret)
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



# ---------------------------------------------------------------------------
# v21: v19 with the quad pair's two target-permute matmuls MERGED into
# one (128,256)@(256,128) matmul. The v12 ablation showed the MXU
# contraction dim streams nearly free up to ~528 (K=528 gather cost ~=
# K=128), so ptA@cA + ptB@cB = [ptA|ptB]@[cA;cB] trades one full issue
# for ~128 streamed cycles: 3 matmul issues per pair instead of 4.
# ---------------------------------------------------------------------------


def _make_kernel_v21(K: int):
    def _kernel_v21(qs_ref, qbase_ref, pctrl_ref, tq_ref, litb_ref,
                    out_ref):
        b = pl.program_id(0)
        NST = out_ref.shape[1] // 128
        G32 = pctrl_ref.shape[1] // K
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        rowiota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        row128q = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)

        def quad_c(q):
            base = pl.multiple_of(qbase_ref[b, q], 16)
            win = litb_ref[0, pl.ds(base, 128), :]

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
            return jnp.where(m, sh, 0)

        for t in range(NST):
            q0 = qs_ref[b, t]
            q1 = qs_ref[b, t + 1]

            def qbody(g, acc):
                q = q0 + 2 * g
                cab = jnp.concatenate([quad_c(q), quad_c(q + 1)], axis=0)
                # 1-D tq concat fails to lower ("input offsets outside of
                # the first tile"); column-concat of the 2-D one-hots does
                pta = jnp.where(row128q == tq_ref[0, q, :][None, :],
                                jnp.float32(1), jnp.float32(0))
                ptb = jnp.where(row128q == tq_ref[0, q + 1, :][None, :],
                                jnp.float32(1), jnp.float32(0))
                pt = jnp.concatenate([pta, ptb], axis=1)
                return acc + jax.lax.dot_general(
                    pt.astype(jnp.bfloat16), cab.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(jnp.int32)

            tile = jax.lax.fori_loop(0, (q1 - q0) >> 1, qbody,
                                     jnp.zeros((128, 128), jnp.int32))
            out_ref[0, t * 128:(t + 1) * 128, :] = tile

    return _kernel_v21


@functools.lru_cache(maxsize=32)
def v21_kernel(block: int, MAXQ: int, RLP: int, K: int = 2,
               interpret: bool = False):
    NR = block // 128
    NB = MAXQ * 4
    G32 = 32 * (-(-NB // 128))
    body = _make_kernel_v21(K)

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


def decode_blocks_v21(pieces_list, lit_list, totals, block: int,
                      interpret: bool = False, device=None,
                      dispatch: int = 16, K: int = 2):
    """v21 decode: v19 packing, pair-merged permute matmul."""
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
    kern = v21_kernel(block, MAXQ, RLP, K, interpret)
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


# ---------------------------------------------------------------------------
# v24: v19 with an f32 data plane (no per-quad int casts).
#
# v19 casts the gathered data f32 -> i32 after the gather matmul and
# c -> bf16 before the permute matmul, and accumulates the tile in i32 —
# three (128,128) elementwise passes per quad that exist only to change
# dtype. Byte values 0..255 are exact in f32 (and in the bf16 one-hot
# matmul inputs), and masked sub-op contributions are lane-disjoint, so
# the whole data plane can stay f32: gather -> rotate-gather (f32 data,
# i32 indices: 32-bit widths match, unlike the Mosaic-rejected bf16
# form) -> mask -> permute matmul -> f32 accumulator, with ONE i32 cast
# per output tile instead of two casts per quad. Control extracts stay
# i32 (unchanged).
# ---------------------------------------------------------------------------


def _make_kernel_v24(K: int):
    def _kernel_v24(qs_ref, qbase_ref, pctrl_ref, tq_ref, litb_ref,
                    out_ref):
        b = pl.program_id(0)
        NST = out_ref.shape[1] // 128
        G32 = pctrl_ref.shape[1] // K
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        rowiota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        row128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)

        def contrib_quad(q):
            base = pl.multiple_of(qbase_ref[b, q], 16)
            win = litb_ref[0, pl.ds(base, 128), :]

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
                preferred_element_type=jnp.float32)
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
            c = jnp.where(m, sh, jnp.float32(0))
            tgt = tq_ref[0, q, :][None, :]
            pt = jnp.where(row128 == tgt, jnp.float32(1), jnp.float32(0))
            return jax.lax.dot_general(
                pt.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        for t in range(NST):
            q0 = qs_ref[b, t]
            q1 = qs_ref[b, t + 1]

            def qbody(g, acc):
                q = q0 + 2 * g
                return acc + contrib_quad(q) + contrib_quad(q + 1)

            tile = jax.lax.fori_loop(0, (q1 - q0) >> 1, qbody,
                                     jnp.zeros((128, 128), jnp.float32))
            out_ref[0, t * 128:(t + 1) * 128, :] = tile.astype(jnp.int32)

    return _kernel_v24


@functools.lru_cache(maxsize=32)
def v24_kernel(block: int, MAXQ: int, RLP: int, K: int = 2,
               interpret: bool = False):
    NR = block // 128
    NB = MAXQ * 4
    G32 = 32 * (-(-NB // 128))
    body = _make_kernel_v24(K)

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
