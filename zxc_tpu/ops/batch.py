"""Batched frame decode on device.

The host does phase 1 (headers, section descriptors, varint extras, entropy
literal decode — all O(sections), cheap and variable-length), producing
fixed-shape padded batches; the device runs the output-sized expansion
kernel (:mod:`zxc_tpu.ops.expand`) over many independent blocks at once.
This split mirrors the reference's MT pipeline (zxc_driver.c:639-1035):
reader/section-parser on host threads, the per-byte work on the wide
engine — except the wide engine here is a TPU chip, not a SIMD lane set.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as C
from ..errors import (ZxcError, ERROR_CORRUPT_DATA, ERROR_BAD_OFFSET, ERROR_OVERFLOW,
                      ERROR_BAD_HEADER, ERROR_SRC_TOO_SMALL, ERROR_BAD_CHECKSUM,
                      ERROR_DICT_REQUIRED, ERROR_DICT_MISMATCH)
from ..format import headers
from ..format.hashes import rapidhash32, global_hash_update
from ..format.dictionary import dict_id as compute_dict_id
from ..codec import block_decode, huffman
from ..codec.frame import DecodeOpts
from . import expand

# Blocks expanded per device dispatch. Sized so scratch (int32 node array,
# 4x block) stays comfortably under a few hundred MB of HBM per dispatch
# while keeping the chip busy.
DEFAULT_BATCH = 64


@dataclass
class FramePlan:
    """Host-side phase-1 parse of a whole frame, ready for device batching."""
    block_size: int
    ll: list = field(default_factory=list)       # per-block int32 (n_seq,)
    ml: list = field(default_factory=list)
    off: list = field(default_factory=list)
    lit: list = field(default_factory=list)      # per-block uint8 (lit_len,)
    totals: list = field(default_factory=list)   # expected decoded size
    pieces: list = field(default_factory=list)   # (po,pc,ps,pk) or None
    dict_buf: np.ndarray | None = None
    dict_len: int = 0
    decompressed_size: int = 0

    @property
    def n_blocks(self) -> int:
        return len(self.totals)

    @property
    def max_seq(self) -> int:
        return max((len(a) for a in self.ll), default=0)

    @property
    def max_lit(self) -> int:
        return max((len(a) for a in self.lit), default=0)

    @property
    def all_pieces(self) -> bool:
        return (self.n_blocks > 0 and len(self.pieces) == self.n_blocks
                and all(p is not None for p in self.pieces))

    @property
    def max_pieces(self) -> int:
        return max((len(p[0]) for p in self.pieces if p is not None),
                   default=0)

    def resolve(self, workers: int | None = None) -> None:
        """Flatten match chains into piece plans (host C++; phase 1.5).

        Runs the native resolver across blocks on a thread pool (ctypes
        releases the GIL — this is the zxc_driver worker-pool equivalent).
        Blocks that exceed the piece budget keep ``None`` and decode
        through the iterative chase kernel."""
        import os
        from concurrent.futures import ThreadPoolExecutor
        from .. import runtime
        from ..codec.block_decode import DeferredSection
        if not runtime.available() or any(
                isinstance(l, DeferredSection) for l in self.lit):
            # deferred sections have no host literal bytes to resolve from
            self.pieces = [None] * self.n_blocks
            return
        if workers is None:
            workers = min(os.cpu_count() or 1, 8)

        def one(i):
            return runtime.resolve_pieces(
                self.ll[i], self.ml[i], self.off[i], self.lit[i],
                self.dict_buf)

        if workers <= 1 or self.n_blocks <= 1:
            self.pieces = [one(i) for i in range(self.n_blocks)]
        else:
            with ThreadPoolExecutor(workers) as ex:
                self.pieces = list(ex.map(one, range(self.n_blocks)))


def plan_frame(archive: bytes, opts: DecodeOpts | None = None,
               defer_entropy: bool = False) -> FramePlan:
    """Walk the frame, parse every block's sections on host (phase 1).

    ``defer_entropy`` keeps PivCo literal sections as wire bytes
    (:class:`DeferredSection`) so the device entropy kernel decodes them —
    H2D ships compressed runs instead of expanded symbols."""
    if len(archive) < C.FILE_HEADER_SIZE + C.FILE_FOOTER_SIZE:
        raise ZxcError(ERROR_SRC_TOO_SMALL)
    fh = headers.read_file_header(archive)
    verify = bool(opts and opts.checksum) and fh.has_checksum

    dict_buf = dict_tree = None
    provided_id = 0
    if opts is not None and opts.dict_content:
        dict_buf = np.frombuffer(opts.dict_content, np.uint8)
        if opts.dict_huf is not None:
            dict_tree = huffman.build_tree_packed(bytes(opts.dict_huf))
        provided_id = compute_dict_id(opts.dict_content, opts.dict_huf)
    if fh.dict_id != 0:
        if dict_buf is None:
            raise ZxcError(ERROR_DICT_REQUIRED)
        if provided_id != fh.dict_id:
            raise ZxcError(ERROR_DICT_MISMATCH)

    buf = np.frombuffer(archive, np.uint8)
    plan = FramePlan(block_size=fh.block_size, dict_buf=dict_buf,
                     dict_len=0 if dict_buf is None else len(dict_buf))
    # pass 1: walk headers, collect payload spans, verify checksums
    spans: list[tuple[int, int, int]] = []   # (block_type, off, size)
    global_hash = 0
    pos = C.FILE_HEADER_SIZE
    saw_eof = False
    while pos + C.BLOCK_HEADER_SIZE <= len(archive):
        bh = headers.read_block_header(archive, pos)
        if bh.block_type == C.BLOCK_EOF:
            if bh.comp_size != 0:
                raise ZxcError(ERROR_BAD_HEADER, "EOF with non-zero comp_size")
            saw_eof = True
            break
        payload_off = pos + C.BLOCK_HEADER_SIZE
        tail = C.BLOCK_CHECKSUM_SIZE if fh.has_checksum else 0
        if payload_off + bh.comp_size + tail > len(archive):
            raise ZxcError(ERROR_SRC_TOO_SMALL, "block payload truncated")
        if bh.comp_size > C.compress_block_bound(fh.block_size):
            raise ZxcError(ERROR_CORRUPT_DATA, "comp_size exceeds block bound")
        if fh.has_checksum:
            stored = int(buf[payload_off + bh.comp_size:
                             payload_off + bh.comp_size + 4].view("<u4")[0])
            if verify:
                if rapidhash32(archive[payload_off:payload_off + bh.comp_size]
                               ) != stored:
                    raise ZxcError(ERROR_BAD_CHECKSUM, "block payload checksum")
                global_hash = global_hash_update(global_hash, stored)
        spans.append((bh.block_type, payload_off, bh.comp_size))
        pos = payload_off + bh.comp_size + tail
    if not saw_eof:
        raise ZxcError(ERROR_SRC_TOO_SMALL, "missing EOF block")

    # pass 2: parse block sections (thread pool; numpy + native parsing
    # release the GIL for the bulky parts)
    def parse_one(span):
        btype, p_off, p_size = span
        payload = buf[p_off:p_off + p_size]
        ll, ml, off, lit = block_decode.parse_block(
            btype, payload, fh.block_size, dict_tree, defer_entropy)
        lit_used = int(ll.sum())
        if lit_used > len(lit):
            raise ZxcError(ERROR_OVERFLOW, "literal stream exhausted")
        total = int((ll + ml).sum()) + len(lit) - lit_used
        if total > fh.block_size:
            raise ZxcError(ERROR_OVERFLOW, "decoded size exceeds capacity")
        if not isinstance(lit, block_decode.DeferredSection):
            lit = np.ascontiguousarray(lit)
        return (ll.astype(np.int32), ml.astype(np.int32),
                off.astype(np.int32), lit, total)

    if len(spans) > 3:
        import os as _os
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(min(_os.cpu_count() or 1, 8)) as ex:
            parsed = list(ex.map(parse_one, spans))
    else:
        parsed = [parse_one(s) for s in spans]
    for ll, ml, off, lit, total in parsed:
        plan.ll.append(ll)
        plan.ml.append(ml)
        plan.off.append(off)
        plan.lit.append(lit)
        plan.totals.append(total)
        plan.decompressed_size += total

    stored_size, stored_hash = headers.read_file_footer(archive)
    if stored_size != plan.decompressed_size:
        raise ZxcError(ERROR_CORRUPT_DATA, "footer size mismatch")
    if verify and stored_hash != global_hash:
        raise ZxcError(ERROR_BAD_CHECKSUM, "global hash mismatch")
    return plan


def _pow2(n: int, lo: int = 8) -> int:
    return max(lo, 1 << (max(n, 1) - 1).bit_length())


def _pad_batch(plan: FramePlan, idx: range, S: int, L: int, B: int | None = None):
    """Stack blocks idx into fixed (B, S)/(B, L) arrays (host numpy).

    Rows past len(idx) are empty blocks (n_seq=0, lit_len=0) so the final
    chunk of a frame reuses the same compiled shape."""
    from ..codec.block_decode import DeferredSection
    if B is None:
        B = len(idx)
    ll = np.zeros((B, S), np.int32)
    ml = np.zeros((B, S), np.int32)
    off = np.ones((B, S), np.int32)
    lit = np.zeros((B, L), np.uint8)
    n_seq = np.zeros(B, np.int32)
    lit_len = np.zeros(B, np.int32)
    for j, i in enumerate(idx):
        s = len(plan.ll[i])
        l = len(plan.lit[i])
        ll[j, :s] = plan.ll[i]
        ml[j, :s] = plan.ml[i]
        off[j, :s] = plan.off[i]
        if not isinstance(plan.lit[i], DeferredSection):
            lit[j, :l] = plan.lit[i]
        # deferred rows stay zero on host: the device entropy kernel
        # fills them (decode_plan_device)
        n_seq[j] = s
        lit_len[j] = l
    return ll, ml, off, lit, n_seq, lit_len


_ERRBIT_CODES = {1: (ERROR_OVERFLOW, "literal stream exhausted"),
                 2: (ERROR_OVERFLOW, "decoded size exceeds capacity"),
                 4: (ERROR_BAD_OFFSET, "offset out of window")}


def _raise_errbits(bits: int):
    for bit, (code, msg) in _ERRBIT_CODES.items():
        if bits & bit:
            raise ZxcError(code, msg)
    raise ZxcError(ERROR_CORRUPT_DATA)


def _pad_piece_batch(plan: FramePlan, idx: range, P: int, L: int,
                     B: int | None = None):
    """Stack piece plans for blocks idx into fixed (B, P)/(B, L) arrays."""
    if B is None:
        B = len(idx)
    po = np.zeros((B, P), np.int32)
    pc = np.zeros((B, P), np.int32)
    ps = np.zeros((B, P), np.int32)
    pk = np.ones((B, P), np.int32)
    lit = np.zeros((B, L), np.uint8)
    n_pieces = np.zeros(B, np.int32)
    totals = np.zeros(B, np.int32)
    for j, i in enumerate(idx):
        p_o, p_c, p_s, p_k, lit_full = plan.pieces[i]
        n = len(p_o)
        po[j, :n] = p_o
        pc[j, :n] = p_c
        ps[j, :n] = p_s
        pk[j, :n] = p_k
        lit[j, :len(lit_full)] = lit_full
        n_pieces[j] = n
        totals[j] = plan.totals[i]
    return po, pc, ps, pk, lit, n_pieces, totals


def decode_plan_pieces_device(plan: FramePlan, batch: int = DEFAULT_BATCH,
                              device=None) -> bytes:
    """Decode through the piece-plan kernel (no pointer chase on device)."""
    nb = plan.n_blocks
    P = _pow2(plan.max_pieces)
    L = _pow2(max(len(p[4]) for p in plan.pieces))
    kern = expand.pieces_kernel(plan.block_size)
    Bsz = _pow2(min(batch, nb), lo=4)
    out_parts: list[np.ndarray] = []
    for base in range(0, nb, Bsz):
        idx = range(base, min(base + Bsz, nb))
        host = _pad_piece_batch(plan, idx, P, L, B=Bsz)
        dev = tuple(jax.device_put(a, device) for a in host)
        out = np.asarray(kern(*dev))
        for j, i in enumerate(idx):
            out_parts.append(out[j, :plan.totals[i]])
    return np.concatenate(out_parts).tobytes() if out_parts else b""


def decode_plan_device(plan: FramePlan, batch: int = DEFAULT_BATCH,
                       device=None) -> bytes:
    """Run a FramePlan through the device expansion kernel, batch by batch."""
    nb = plan.n_blocks
    if nb == 0:
        return b""
    if plan.all_pieces:
        return decode_plan_pieces_device(plan, batch=batch, device=device)
    S = _pow2(plan.max_seq)
    L = _pow2(plan.max_lit)
    has_dict = plan.dict_buf is not None
    kern = expand.expand_kernel(plan.block_size, has_dict)
    dict_args = ()
    if has_dict:
        dict_args = (jax.device_put(expand.pad_dict(plan.dict_buf), device),
                     jnp.int32(plan.dict_len))

    # pow2 bucket keeps the number of distinct compiled shapes bounded
    Bsz = _pow2(min(batch, nb), lo=4)
    out_parts: list[np.ndarray] = []
    for base in range(0, nb, Bsz):
        idx = range(base, min(base + Bsz, nb))
        host = _pad_batch(plan, idx, S, L, B=Bsz)
        from ..codec.block_decode import DeferredSection
        deferred = [(j, plan.lit[i]) for j, i in enumerate(idx)
                    if isinstance(plan.lit[i], DeferredSection)]
        dev = list(jax.device_put(a, device) for a in host)
        if deferred:
            # device entropy decode: the batch's PivCo literal sections
            # decode on device from their wire bytes, then merge into the
            # literal rows (H2D shipped compressed runs, not symbols)
            from . import pivco_device
            rows = [j for j, _ in deferred]
            secs = [s.payload for _, s in deferred]
            plans = [pivco_device.plan_section(s.payload, s.n, s.tree)
                     for _, s in deferred]
            args, _, RSEC, FLAT, rounds = pivco_device.pad_plans(
                secs, plans, L=L)
            pk = pivco_device.routing_kernel(
                L, RSEC, FLAT, max(rounds, 12))
            sec_out = pk(*tuple(jax.device_put(a, device) for a in args))
            dev[3] = jnp.asarray(dev[3]).at[jnp.asarray(rows)].set(
                sec_out[:len(rows)])
        out, total, err = kern(*dev, *dict_args)
        err_np = np.asarray(err)[:len(idx)]
        if err_np.any():
            _raise_errbits(int(err_np[err_np != 0][0]))
        total_np = np.asarray(total)[:len(idx)]
        exp = np.asarray(plan.totals[base:base + len(idx)])
        if not (total_np == exp).all():
            raise ZxcError(ERROR_CORRUPT_DATA, "device/plan size disagreement")
        out_np = np.asarray(out)
        for j, i in enumerate(idx):
            out_parts.append(out_np[j, :plan.totals[i]])
    return np.concatenate(out_parts).tobytes() if out_parts else b""


import contextlib


@contextlib.contextmanager
def _null_ctx():
    yield


def decompress(archive: bytes, opts: DecodeOpts | None = None,
               batch: int = DEFAULT_BATCH, device=None,
               use_pieces: bool = True, use_serial: bool = False,
               device_entropy: bool = False) -> bytes:
    """One-shot frame decode with the hot path on the TPU.

    ``use_serial`` routes through the Pallas copy-engine kernel (fastest,
    but each new (block, piece-bucket) shape pays a long Mosaic compile —
    meant for steady-shape production streams, not ad-hoc archives).

    ``device_entropy`` decodes PivCo literal sections ON DEVICE from their
    wire bytes (ops/pivco_device.py) instead of on host — H2D ships
    compressed runs. Implies the chase expansion path (the host piece
    resolver needs literal values).
    """
    from .. import profiling
    ph = profiling.phases()

    def _phase(name):
        return ph.phase(name) if ph is not None else _null_ctx()

    if device_entropy:
        use_pieces = False
        use_serial = False
    with _phase("plan"):
        plan = plan_frame(archive, opts, defer_entropy=device_entropy)
    if use_serial:
        from .. import runtime
        from . import pallas_decode
        pieces, lits = [], []
        with _phase("resolve"):
            for i in range(plan.n_blocks):
                # max_frag=1: the device kernels are issue-bound per piece,
                # so materialize every multi-piece source (see PERF.md)
                r = runtime.resolve_pieces(plan.ll[i], plan.ml[i],
                                           plan.off[i], plan.lit[i],
                                           plan.dict_buf, device_pure=True,
                                           max_frag=1)
                if r is None:
                    break
                pieces.append(r[:4])
                lits.append(r[4])
        ok = len(pieces) == plan.n_blocks
        if ok and plan.n_blocks:
            import os as _os
            variant = int(_os.environ.get("ZXC_SERIAL_VARIANT", "19"))
            with _phase("device"):
                if variant == 19:
                    res = pallas_decode.decode_blocks_v19(
                        pieces, lits, plan.totals, plan.block_size,
                        device=device)
                elif variant == 13:
                    res = pallas_decode.decode_blocks_v13(
                        pieces, lits, plan.totals, plan.block_size,
                        device=device)
                else:
                    # rejected generations (PERF.md 3.2) remain selectable
                    # for A/B reproduction from the attic
                    import sys as _sys
                    _sys.path.insert(0, _os.path.join(_os.path.dirname(
                        _os.path.dirname(_os.path.dirname(
                            _os.path.abspath(__file__)))), "tools"))
                    import kernel_attic
                    res = kernel_attic.decode_blocks(
                        pieces, lits, plan.totals, plan.block_size,
                        device=device, variant=variant)
            return b"".join(res)
    if use_pieces:
        with _phase("resolve"):
            plan.resolve()
    else:
        plan.pieces = [None] * plan.n_blocks
    with _phase("device"):
        return decode_plan_device(plan, batch=batch, device=device)
