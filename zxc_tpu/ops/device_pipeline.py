"""End-to-end device decode: archive bytes -> decoded bytes with every
phase accounted for, host prep overlapped with device execution.

The reference's hot path is ONE call per frame doing section parse ->
entropy decode -> sequence copies (zxc_dispatch.c:856-1055 driving
zxc_decompress.c:680-1045). Rounds 1-2 split that across Python/NumPy
passes whose glue dwarfed the kernel (VERDICT round 2: resolve 0.224 s +
NumPy pack 1.643 s around a 0.009 s kernel). This module is the fused
replacement:

* **one native call per block** (`runtime.v19_prep_block` /
  `zxch_v19_prep_block`): payload -> the v19 kernel's packed control
  slices, written directly into the dispatch-group arrays — section
  parse, entropy literal decode, piece resolution and lane-op packing in
  a single cache-hot walk;
* **a host thread pool** preps dispatch group k+1 while the device
  executes group k (ctypes releases the GIL, so the pool is the
  zxc_driver.c:639-1035 worker-ring equivalent);
* **async dispatch**: jitted kernel+fingerprint calls are submitted as
  groups complete and synced once at the end.

Shapes are sized from a first-group sample with margin and the whole
pipeline retries with grown shapes if any block overflows (rare; shape
changes recompile the kernel, so the margins are deliberately generous).
"""
from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np

from .. import constants as C
from ..errors import (ZxcError, ERROR_CORRUPT_DATA, ERROR_BAD_CHECKSUM,
                      ERROR_SRC_TOO_SMALL, ERROR_DICT_REQUIRED,
                      ERROR_DICT_MISMATCH)
from ..format import headers
from ..format.hashes import global_hash_update
from ..format.dictionary import dict_id as compute_dict_id
from ..codec.frame import DecodeOpts
from .. import runtime


@dataclass
class FrameWalk:
    block_size: int
    pos: np.ndarray          # (nb,) u64 payload offsets
    typ: np.ndarray          # (nb,) u8 block types
    comp: np.ndarray         # (nb,) u64 comp sizes
    decompressed_size: int
    dict_buf: np.ndarray | None
    dict_cl: np.ndarray | None

    @property
    def n_blocks(self) -> int:
        return len(self.pos)


def walk_frame(archive: bytes, opts: DecodeOpts | None = None) -> FrameWalk:
    """Frame walk + header/checksum validation (no section parsing)."""
    if len(archive) < C.FILE_HEADER_SIZE + C.FILE_FOOTER_SIZE:
        raise ZxcError(ERROR_SRC_TOO_SMALL)
    fh = headers.read_file_header(archive)
    src = np.frombuffer(archive, np.uint8)

    dict_buf = dict_cl = None
    provided_id = 0
    if opts is not None and opts.dict_content:
        dict_buf = np.frombuffer(opts.dict_content, np.uint8)
        if opts.dict_huf is not None:
            from ..codec import huffman
            dict_cl = huffman.unpack_lengths(bytes(opts.dict_huf))
        provided_id = compute_dict_id(opts.dict_content, opts.dict_huf)
    if fh.dict_id != 0:
        if dict_buf is None:
            raise ZxcError(ERROR_DICT_REQUIRED)
        if provided_id != fh.dict_id:
            raise ZxcError(ERROR_DICT_MISMATCH)

    L = runtime.lib()
    if L is None:
        raise ZxcError(ERROR_CORRUPT_DATA, "native runtime required for the "
                       "e2e device pipeline")
    import ctypes
    max_blocks = len(src) // 8 + 2
    pos = np.empty(max_blocks, np.uint64)
    typ = np.empty(max_blocks, np.uint8)
    comp = np.empty(max_blocks, np.uint64)
    eof = ctypes.c_uint64(0)
    nb = L.zxch_walk_frame(
        src.ctypes.data_as(ctypes.c_void_p), len(src),
        1 if fh.has_checksum else 0,
        C.compress_block_bound(fh.block_size), C.FILE_HEADER_SIZE,
        pos.ctypes.data_as(ctypes.c_void_p),
        typ.ctypes.data_as(ctypes.c_void_p),
        comp.ctypes.data_as(ctypes.c_void_p), max_blocks, ctypes.byref(eof))
    if nb < 0:
        raise ZxcError(int(nb), "frame walk")
    nb = int(nb)
    pos, typ, comp = pos[:nb] + 8, typ[:nb], comp[:nb]  # -> payload offsets

    stored_size, stored_hash = headers.read_file_footer(archive)
    verify = bool(opts and opts.checksum) and fh.has_checksum
    if verify and nb:
        stored = np.empty(nb, np.uint32)
        hashes = np.empty(nb, np.uint32)
        ends = pos + comp
        for k in range(nb):
            stored[k] = src[int(ends[k]):int(ends[k]) + 4].view("<u4")[0]
        L.zxch_rapidhash32_batch(
            src.ctypes.data_as(ctypes.c_void_p),
            np.ascontiguousarray(pos).ctypes.data_as(ctypes.c_void_p),
            np.ascontiguousarray(comp).ctypes.data_as(ctypes.c_void_p),
            hashes.ctypes.data_as(ctypes.c_void_p), nb)
        if not (hashes == stored).all():
            raise ZxcError(ERROR_BAD_CHECKSUM, "block payload checksum")
        g = 0
        for k in range(nb):
            g = global_hash_update(g, int(stored[k]))
        if g != stored_hash:
            raise ZxcError(ERROR_BAD_CHECKSUM, "global hash mismatch")

    return FrameWalk(block_size=fh.block_size, pos=pos, typ=typ, comp=comp,
                     decompressed_size=stored_size, dict_buf=dict_buf,
                     dict_cl=dict_cl)


class ShapeOverflow(Exception):
    def __init__(self, need_maxq: int, need_rlp: int):
        self.need_maxq = need_maxq
        self.need_rlp = need_rlp


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


@dataclass
class GroupBuffers:
    qs: np.ndarray
    qbase: np.ndarray
    pctrl: np.ndarray
    tq: np.ndarray
    lit8: np.ndarray
    totals: np.ndarray
    # per-slot high-water mark of written lit8 rows: rows [litrows, hi)
    # hold a previous block's bytes after pool reuse. The kernel never
    # reads them, but they DO ship over H2D — and through the tunnel's
    # client-side zlib, entropy-grade stale rows cost real compress time
    # where zero rows are nearly free. prep zeroes [litrows, hi) per slot.
    lit_hi: np.ndarray = None  # (B,) int32


def _alloc_group(B: int, NST: int, MAXQ: int, NG32: int, RLP: int,
                 K: int) -> GroupBuffers:
    return GroupBuffers(
        qs=np.zeros((B, NST + 1), np.int32),
        qbase=np.zeros((B, MAXQ), np.int32),
        pctrl=np.full((B, K * NG32, 128), 1 << 7, np.int32),
        tq=np.zeros((B, MAXQ, 128), np.uint8),
        lit8=np.zeros((B, RLP, 128), np.uint8),
        totals=np.zeros(B, np.int32),
        lit_hi=np.zeros(B, np.int32),
    )


# -- group-buffer pool -------------------------------------------------------
# Fresh 20 MB host allocations inside a jax-loaded process cost 0.1-0.4 s
# EACH (page-fault pathology measured on the bench host: 8 group buffers =
# 1.2 s of a 1.6 s e2e wall, vs 4 ms in a clean process). Reuse is safe
# because the native prep fully overwrites every cell of every quad it
# flushes (zxch_v19_prep_block writes empty control words + tq=0 for
# unoccupied slots), quads >= nq are never read (qs ranges bound the
# kernel loop), and lit8 rows >= litrows only feed one-hot gathers that
# never select them. This is the zxc_cctx reuse analog (zxc_common.c:386:
# one workspace, many frames).
import threading

_pool_lock = threading.Lock()
_pool: dict = {}
_flat_pool: dict = {}   # v27 ragged-lit flat buffers, keyed on rows_tot


def _flat_acquire(rows_tot: int) -> np.ndarray:
    with _pool_lock:
        free = _flat_pool.get(rows_tot)
        if free:
            return free.pop()
    return np.zeros((rows_tot, 128), np.uint8)


def _flat_release(buf: np.ndarray, cap: int = 64) -> None:
    with _pool_lock:
        free = _flat_pool.setdefault(buf.shape[0], [])
        if len(free) < cap:
            free.append(buf)


def _pool_acquire(B, NST, MAXQ, NG32, RLP, K) -> GroupBuffers:
    key = (B, NST, MAXQ, NG32, RLP, K)
    with _pool_lock:
        free = _pool.get(key)
        if free:
            return free.pop()
    return _alloc_group(B, NST, MAXQ, NG32, RLP, K)


def _pool_release(buf: GroupBuffers, B, NST, MAXQ, NG32, RLP, K,
                  cap: int = 64) -> None:
    key = (B, NST, MAXQ, NG32, RLP, K)
    with _pool_lock:
        free = _pool.setdefault(key, [])
        if len(free) < cap:
            free.append(buf)


class DevicePipeline:
    """Reusable archive -> device decode pipeline for one frame geometry.

    Splits blocks into dispatch groups of ``dispatch`` blocks, preps each
    group with a native thread pool and submits kernel work as groups
    complete. ``run`` returns per-group jax outputs (device-resident)."""

    def __init__(self, walk: FrameWalk, archive: bytes, K: int = 2,
                 dispatch: int = 16, workers: int | None = None,
                 hint=None, variant: int = 26):
        if walk.block_size % 16384:
            raise ZxcError(ERROR_CORRUPT_DATA,
                           "e2e pipeline needs block_size % 16384 == 0")
        self.walk = walk
        self.src = np.frombuffer(archive, np.uint8)
        self.K = K
        # 26 = unified self-referential window (lit8 = literals+patterns
        # only; matches from earlier supertiles read the kernel's own
        # decoded rows — round-5 contract, kernel-rate parity with v19 at
        # 11% less lit8 H2D); 19 = the round-2..4 materializing contract;
        # 27 = 26 + the ragged lit shipping layout (hint-only — it needs
        # per-block litrows up front; degrades to 26 cold)
        self.variant = 26 if variant == 27 else variant
        self.B = dispatch
        self.NST = walk.block_size // 16384
        self.workers = workers or min(os.cpu_count() or 1, 8)
        self.MAXQ = 0
        self.RLP = 0
        self.NG32 = 0
        self._held: list = []   # (buf, shape-key) pairs
        # piece-plan hint (ops/hints.py): control slices ship verbatim
        # from the mmap; host prep reduces to the lit8 build
        self.hint = hint
        self.v27 = False
        if hint is not None:
            g = hint.geo
            if (g.block_size != walk.block_size or g.nb != walk.n_blocks):
                raise ZxcError(ERROR_CORRUPT_DATA,
                               "hint geometry does not match frame")
            self.K = g.K
            self.NST = g.NST
            self.MAXQ = g.MAXQ
            self.RLP = g.RLP
            self.NG32 = g.NG32
            hv = getattr(g, "variant", 19)
            # 27 = the v26 control contract with the RAGGED lit shipping
            # layout (flat per-group buffer + per-block DMA): available
            # whenever the hint carries v26 geometry and RLP is 32-aligned
            self.v27 = (variant == 27 and hv == 26 and g.RLP % 32 == 0)
            self.variant = 26 if self.v27 else hv
            if self.v27:
                _, self._lr32, self._rows_tot = hint.flat_geometry(dispatch)

    def release(self) -> None:
        """Return this pipeline's group buffers to the module pool. Only
        call after every device computation that read them has completed
        (device_put may alias the host buffers on the CPU backend)."""
        for b, key in self._held:
            _pool_release(b, *key)
        self._held = []
        for f in getattr(self, "_held_flats", []):
            _flat_release(f)
        self._held_flats = []

    def drop_held(self) -> None:
        """Forget held buffers WITHOUT pooling them (retry path: device
        work that aliases them may still be in flight)."""
        self._held = []

    # -- shape discovery ---------------------------------------------------
    def size_shapes(self, sample: int | None = None,
                    margin: float = 1.1) -> None:
        """Prep a sample of blocks into scratch to pick MAXQ/RLP.

        The sample spreads over the whole frame, so the estimated max is
        close to the true max and the margin can stay thin — padding rows
        ship over H2D, so every margin point is inflation (the overflow
        retry path covers the rare miss)."""
        w = self.walk
        nb = w.n_blocks
        if self.hint is not None:
            return   # geometry pinned by the hint file
        if nb == 0:
            self.MAXQ, self.RLP = 32, 128
            self.NG32 = 32 * _round_up(self.MAXQ * 4, 128) // 128
            return
        if sample is None:
            sample = min(max(self.B, 96), nb)
        # generous scratch: piece floor is ~8 bytes/op so a 64 KiB block
        # caps out near block/8/128 quads plus chunk fragmentation
        MAXQ0 = w.block_size // 128 + 256
        RLP0 = _round_up(3 * w.block_size // 128 + (1 << 20) // 128 + 256,
                         128)
        NG320 = _round_up(MAXQ0 * 4, 128) // 4 // 32 * 32
        NG320 = 32 * _round_up(MAXQ0 * 4, 128) // 128
        buf = _pool_acquire(1, self.NST, MAXQ0, NG320, RLP0, self.K)
        idx = np.linspace(0, nb - 1, sample).astype(int)
        max_nq = max_need = 1
        try:
            for i in np.unique(idx):
                total, nq, maxrow, litrows = self._prep_into(
                    int(i), buf, 0, MAXQ0, NG320, RLP0)
                if total < 0:
                    raise ZxcError(int(total), "device prep (sizing)")
                max_nq = max(max_nq, nq)
                max_need = max(max_need, maxrow, litrows)
        finally:
            # sizing scratch never reaches the device: releasable now
            _pool_release(buf, 1, self.NST, MAXQ0, NG320, RLP0, self.K,
                          cap=2)
        self.MAXQ = _round_up(int(max_nq * margin) + 8, 32)
        self.RLP = _round_up(int(max_need * margin) + 16, 128)
        self.NG32 = 32 * _round_up(self.MAXQ * 4, 128) // 128

    def _prep_into(self, i: int, buf: GroupBuffers, j: int, MAXQ: int,
                   NG32: int, RLP: int):
        w = self.walk
        p0 = int(w.pos[i])
        payload = self.src[p0:p0 + int(w.comp[i])]
        r = runtime.v19_prep_block(
            payload, int(w.typ[i]), w.block_size,
            buf.qs[j], buf.qbase[j], buf.pctrl[j], buf.tq[j], buf.lit8[j],
            MAXQ, NG32, RLP, K=self.K,
            dict_buf=w.dict_buf, dict_cl=w.dict_cl,
            self_ref=(self.variant == 26))
        if r is None:
            raise ZxcError(ERROR_CORRUPT_DATA, "native runtime unavailable")
        total, nq, maxrow, litrows = r
        if total >= 0:
            buf.totals[j] = total
        return total, nq, maxrow, litrows

    # -- pipeline ----------------------------------------------------------
    def run(self, consume, device=None, pools: int = 8, carry=None):
        """Prep + dispatch every group. ``consume(dev_args, totals_np, g,
        carry)`` is called per group in order with device-put arrays and
        must return the new carry (e.g. device-resident fingerprint
        accumulators — keeping the reduction on device means ONE host
        readback for the whole archive instead of one RTT per group).
        Returns the final carry. Raises ShapeOverflow when a block exceeds
        the sized shapes (caller re-sizes and retries)."""
        import jax
        w = self.walk
        nb = w.n_blocks
        B = self.B
        n_groups = -(-nb // B) if nb else 0
        if n_groups == 0:
            return carry
        key = (B, self.NST, self.MAXQ, self.NG32, self.RLP, self.K)
        bufs = [_pool_acquire(*key) for _ in range(min(pools, n_groups))]
        self._held.extend((b, key) for b in bufs)
        in_flight: list = [None] * len(bufs)

        hint = self.hint
        v27 = self.v27
        if v27:
            flats = [_flat_acquire(self._rows_tot) for _ in bufs]
            hint_loff, hint_lr32, _ = hint.flat_geometry(B)

        def prep_stripe(g: int, wk: int, nw: int):
            # v27 fast path: ONE native call per worker stripe (the
            # per-block python/FFI dispatch measured as a real term in
            # the concurrent-pipeline slope)
            i0, i1 = g * B, min((g + 1) * B, nb)
            rc = runtime.v19_lit8_load_batch(
                self.src, w.pos, w.comp, w.typ, i0 + wk, i1, nw,
                w.block_size, hint.plans, np.asarray(hint.plan_off),
                np.asarray(hint.litlen), flats[g % len(bufs)],
                hint_loff, self.RLP, zrows=hint_lr32,
                dict_buf=w.dict_buf, dict_cl=w.dict_cl)
            if rc is None or rc < 0:
                raise ZxcError(int(rc or ERROR_CORRUPT_DATA),
                               "hint lit8 batch replay")

        def prep_block(g: int, j: int):
            i = g * B + j
            buf = bufs[g % len(bufs)]
            if i >= nb:   # padding row: empty block
                buf.qs[j] = 0
                buf.totals[j] = 0
                if buf.lit_hi[j]:
                    buf.lit8[j, :buf.lit_hi[j]] = 0
                    buf.lit_hi[j] = 0
                return
            if hint is not None:
                # hint path: control ships from the mmap; only lit8 is
                # built here (archive literal decode + plan replay).
                # v27: the block's rows land at its offset in the
                # group's flat buffer (ragged shipping layout)
                p0 = int(w.pos[i])
                payload = self.src[p0:p0 + int(w.comp[i])]
                if v27:
                    lo = int(hint_loff[i])
                    dst = flats[g % len(bufs)][lo:lo + self.RLP]
                else:
                    dst = buf.lit8[j]
                lr = runtime.v19_lit8_load(
                    payload, int(w.typ[i]), w.block_size,
                    hint.plan_slice(i), int(hint.plan_off[i + 1]
                                            - hint.plan_off[i]),
                    int(hint.litlen[i]), dst, self.RLP,
                    dict_buf=w.dict_buf, dict_cl=w.dict_cl)
                if lr is None or lr < 0:
                    raise ZxcError(int(lr or ERROR_CORRUPT_DATA),
                                   "hint lit8 replay")
                buf.totals[j] = int(hint.totals[i])
                if v27:
                    # zero the 32-row-alignment tail (pool staleness)
                    dst[lr:int(self._lr32[i])] = 0
                    return
                if buf.lit_hi[j] > lr:   # zero stale pool rows (H2D zlib)
                    buf.lit8[j, lr:buf.lit_hi[j]] = 0
                buf.lit_hi[j] = lr
                return
            total, nq, maxrow, litrows = self._prep_into(
                i, buf, j, self.MAXQ, self.NG32, self.RLP)
            if total == -10 and (nq > self.MAXQ or maxrow > self.RLP
                                 or litrows > self.RLP):
                raise ShapeOverflow(max(nq, self.MAXQ),
                                    max(maxrow, litrows, self.RLP))
            if total < 0:
                raise ZxcError(int(total), "device prep")
            if buf.lit_hi[j] > litrows:
                buf.lit8[j, litrows:buf.lit_hi[j]] = 0
            buf.lit_hi[j] = litrows

        with ThreadPoolExecutor(self.workers) as ex:
            futs = {}

            def submit(g):
                if g < n_groups and g not in futs:
                    slot = g % len(bufs)
                    # a pool slot is only reusable after every computation
                    # that read its buffers finished: device_put may ALIAS
                    # the host buffer (zero-copy on the CPU backend), so a
                    # prep must not start overwriting the slot while the
                    # kernel that reads it can still be in flight. This
                    # wait is the pipeline's backpressure: prep of group g
                    # starts once compute of group g-pools completed.
                    if in_flight[slot] is not None:
                        jax.block_until_ready(in_flight[slot])
                        in_flight[slot] = None
                    if v27:
                        buf = bufs[slot]
                        i0, i1 = g * B, min((g + 1) * B, nb)
                        buf.totals[:i1 - i0] = hint.totals[i0:i1]
                        buf.totals[i1 - i0:] = 0
                        nw = self.workers
                        futs[g] = [ex.submit(prep_stripe, g, k, nw)
                                   for k in range(nw)]
                    else:
                        futs[g] = [ex.submit(prep_block, g, j)
                                   for j in range(B)]

            submit(0)
            for g in range(n_groups):
                submit(g + 1)
                for f in futs.pop(g):
                    f.result()   # raises ShapeOverflow / ZxcError
                buf = bufs[g % len(bufs)]
                # per-array puts: a PYTREE device_put takes a slow batched
                # path on this backend (0.42 s vs 0.11 s for the same
                # 160 MB, measured round 3) — put each leaf individually
                if hint is not None:
                    # control pages are device-resident (cached on the
                    # HintFile, built on first decode): repeat decodes
                    # ship ONLY lit8 — the data bytes derived from the
                    # archive — over H2D. v27 ships it RAGGED (flat
                    # buffer + per-block offsets; ~half the volume).
                    ctrl = hint.device_ctrl(g, B, device)
                    if v27:
                        dev_args = (ctrl[0], ctrl[1],
                                    hint.device_loff(g, B, device),
                                    ctrl[2], ctrl[3],
                                    jax.device_put(
                                        flats[g % len(bufs)], device))
                    else:
                        dev_args = ctrl + (
                            jax.device_put(buf.lit8, device),)
                else:
                    dev_args = tuple(
                        jax.device_put(a, device)
                        for a in (buf.qs, buf.qbase, buf.pctrl, buf.tq,
                                  buf.lit8))
                carry = consume(dev_args, buf.totals.copy(), g, carry)
                in_flight[g % len(bufs)] = (dev_args, carry)
        if v27:
            self._held_flats = getattr(self, "_held_flats", []) + flats
        return carry


def _kernel_for(block: int, MAXQ: int, RLP: int, K: int,
                interpret: bool = False, variant: int = 19,
                rows_tot: int = 0):
    from . import pallas_decode
    if variant == 27:
        return pallas_decode.v27_kernel(block, MAXQ, RLP, rows_tot, K,
                                        interpret)
    fn = (pallas_decode.v26_kernel if variant == 26
          else pallas_decode.v19_kernel)
    return fn(block, MAXQ, RLP, K, interpret)


import functools


@functools.lru_cache(maxsize=32)
def _group_fns(block: int, MAXQ: int, RLP: int, K: int, dispatch: int,
               interpret: bool, variant: int = 19, rows_tot: int = 0):
    """Jitted per-group kernel+fingerprint / kernel+reshape callables,
    cached on shape — a fresh @jax.jit closure per decompress_e2e call
    would retrace (and re-hit the compile cache) every archive."""
    import jax
    import jax.numpy as jnp
    kern = _kernel_for(block, MAXQ, RLP, K, interpret, variant, rows_tot)
    NR = block // 128
    flatpos = jnp.arange(NR * 128, dtype=jnp.uint32)
    wgt = (flatpos % 8191).astype(jnp.uint32)

    @jax.jit
    def group_fp(args, tot, f1, f2):
        out = kern(*args)
        flat = out.reshape(dispatch, NR * 128).astype(jnp.uint32)
        mask = flatpos[None, :] < tot[:, None]
        f1 = f1 + jnp.sum(jnp.where(mask, flat, 0))
        f2 = f2 + jnp.sum(jnp.where(mask, flat * wgt[None, :], 0))
        return f1, f2

    @jax.jit
    def group_out(args):
        out = kern(*args)
        return out.reshape(dispatch, NR, 128).astype(jnp.uint8)

    @jax.jit
    def mega_fp(groups, f1, f2):
        # one dispatch for a CHUNK of groups: through the axon tunnel a
        # jit invocation costs ~0.1 s regardless of work, so batching
        # groups into one program is the difference between 8x and 1x of
        # that fixed cost (on attached hardware the overlapped per-group
        # path is preferable; submit="overlap")
        for args, tot in groups:
            out = kern(*args)
            flat = out.reshape(dispatch, NR * 128).astype(jnp.uint32)
            mask = flatpos[None, :] < tot[:, None]
            f1 = f1 + jnp.sum(jnp.where(mask, flat, 0))
            f2 = f2 + jnp.sum(jnp.where(mask, flat * wgt[None, :], 0))
        return f1, f2

    return group_fp, group_out, mega_fp


def decompress_e2e(archive: bytes, opts: DecodeOpts | None = None,
                   dispatch: int = 16, K: int = 2, device=None,
                   workers: int | None = None, _collect: str = "bytes",
                   _phases: dict | None = None, interpret: bool = False,
                   submit: str = "auto", hint=None,
                   variant: int | None = None):
    """One-shot end-to-end device decode (every phase on the clock).

    ``_collect``:
      * ``"bytes"`` — D2H the decoded blocks and return ``bytes``
        (production path; pathological through the axon tunnel, fine on
        attached hardware);
      * ``"fingerprint"`` — keep outputs on device and return
        ``(fp1, fp2, n_blocks, totals)`` device fingerprints for
        verification without D2H (bench path, PERF.md honest-metrics).

    ``submit``: "overlap" dispatches each group as its prep completes
    (right on attached hardware — device executes group k while the host
    preps k+1); "batch" preps everything then submits chunked megasteps
    (right through the axon tunnel, where every jit invocation costs
    ~0.1 s of fixed RTT); "auto" = batch for fingerprint, overlap else.
    """
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    if submit == "auto":
        submit = "batch" if _collect == "fingerprint" else "overlap"
    if isinstance(hint, (str, bytes, os.PathLike)):
        from .hints import HintFile
        hint = HintFile(os.fspath(hint), archive)
    if variant is None:
        variant = int(os.environ.get("ZXC_E2E_VARIANT", "27"))
    w = walk_frame(archive, opts)
    pipe = DevicePipeline(w, archive, K=K, dispatch=dispatch,
                          workers=workers, hint=hint, variant=variant)
    if hint is not None:
        K = pipe.K
    variant = pipe.variant       # hint geometry pins the kernel contract
    NR = w.block_size // 128
    for attempt in range(4):
        try:
            if pipe.MAXQ == 0:
                pipe.size_shapes()
            if _phases is not None:
                _phases.setdefault("walk_size", time.time() - t0)
            group_fp, group_out, mega_fp = _group_fns(
                w.block_size, pipe.MAXQ, pipe.RLP, K, dispatch, interpret,
                27 if pipe.v27 else variant,
                getattr(pipe, "_rows_tot", 0))

            if _collect == "fingerprint" and submit == "batch":
                # stage device-put groups; kernels submitted in chunked
                # megasteps below (fixed per-dispatch tunnel cost paid
                # once per chunk, not per group)
                def consume(dev_args, totals_np, g, carry):
                    carry.append((dev_args,
                                  jnp.asarray(totals_np, jnp.uint32)))
                    return carry

                carry0 = []
                n_groups = -(-w.n_blocks // dispatch) if w.n_blocks else 0
                staged = pipe.run(consume, device=device, carry=carry0,
                                  pools=max(n_groups, 1))
                f1 = jnp.uint32(0)
                f2 = jnp.uint32(0)
                CH = 16
                for c0 in range(0, len(staged), CH):
                    f1, f2 = mega_fp(tuple(staged[c0:c0 + CH]), f1, f2)
                res = (f1, f2)
                break
            if _collect == "fingerprint":
                # fingerprints accumulate ON DEVICE across groups: one
                # scalar readback per archive, not one RTT per group
                def consume(dev_args, totals_np, g, carry):
                    return group_fp(dev_args,
                                    jnp.asarray(totals_np, jnp.uint32),
                                    *carry)

                carry0 = (jnp.uint32(0), jnp.uint32(0))
            else:
                def consume(dev_args, totals_np, g, carry):
                    carry.append((group_out(dev_args), totals_np))
                    return carry

                carry0 = []

            res = pipe.run(consume, device=device, carry=carry0)
            break
        except ShapeOverflow as o:
            if hint is not None:
                raise ZxcError(ERROR_CORRUPT_DATA,
                               "hint geometry overflow (corrupt hint?)")
            pipe.drop_held()   # in-flight device work may alias the bufs
            pipe.MAXQ = _round_up(int(o.need_maxq * 1.5) + 8, 32)
            pipe.RLP = _round_up(int(o.need_rlp * 1.5) + 144, 128)
            pipe.NG32 = 32 * _round_up(pipe.MAXQ * 4, 128) // 128
    else:
        raise ZxcError(ERROR_CORRUPT_DATA, "shape sizing did not converge")

    if _collect == "fingerprint":
        # one stacked readback (scalar pulls each cost a tunnel RTT)
        fp = np.asarray(jnp.stack(res))
        f1 = int(fp[0]) & 0xFFFFFFFF
        f2 = int(fp[1]) & 0xFFFFFFFF
        pipe.release()   # readback synced: device no longer reads the bufs
        if _phases is not None:
            _phases["total"] = time.time() - t0
        return f1, f2, w.n_blocks, w.decompressed_size

    parts = []
    nb = w.n_blocks
    done = 0
    for out, totals_np in res:
        host = np.asarray(out)
        for j in range(min(dispatch, nb - done)):
            parts.append(host[j].reshape(-1)[:totals_np[j]])
        done += dispatch
    pipe.release()   # every group output materialized: bufs are free
    data = b"".join(p.tobytes() for p in parts)
    if len(data) != w.decompressed_size:
        raise ZxcError(ERROR_CORRUPT_DATA, "footer size mismatch")
    if _phases is not None:
        _phases["total"] = time.time() - t0
    return data
