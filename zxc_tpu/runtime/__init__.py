"""Native host runtime: C++ implementations of the host-side hot path.

The reference implements its whole runtime in C; here the TPU does the
per-byte decode work and this library covers what stays on the host:
checksums (rapidhash32 at memory speed), frame walking, RLE/varint section
parsing, and a serial expander for the CLI/host-only fallback.

The shared library builds lazily from zxc_host.cpp with g++ on first use
and is cached next to the source; every entry point degrades gracefully to
the pure-Python implementation when the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "zxc_host.cpp")
_SO = os.path.join(_DIR, "libzxchost.so")

_lock = threading.Lock()
_lib = None
KOUT = (1 << 30) + 1   # self-referential piece kind (set from the native
# library on the first resolve_pieces(self_ref=True) call)
_tried = False
_resolve_tl = threading.local()  # resolve_pieces per-thread scratch

# result-buffer fast path: the old np.empty-scratch + tobytes pattern
# paid first-touch page faults on a FRESH scratch every call plus a full
# copy (~45% of one-shot decode wall at 2 GB/s). Instead: per-thread
# REUSED scratch (no faults when warm) + one exact-size
# PyBytes_FromStringAndSize copy. (A _PyBytes_Resize zero-copy variant
# was tried and reverted: ctypes' py_object keepalive retains the
# pre-realloc pointer and corrupts the heap on collection.)
_pyapi = ctypes.pythonapi
_pyapi.PyBytes_FromStringAndSize.restype = ctypes.py_object
_pyapi.PyBytes_FromStringAndSize.argtypes = [ctypes.c_void_p,
                                             ctypes.c_ssize_t]
_pyapi.PyBytes_AsString.restype = ctypes.c_void_p
_pyapi.PyBytes_AsString.argtypes = [ctypes.py_object]


def _frame_scratch(tl_name: str, cap: int) -> np.ndarray:
    tl = _resolve_tl
    buf = getattr(tl, tl_name, None)
    if buf is None or len(buf) < cap:
        buf = np.empty(max(cap, 1 << 20), np.uint8)
        setattr(tl, tl_name, buf)
    return buf


def _native_into_bytes(tl_name: str, cap: int, call):
    """Run ``call(ptr)`` writing up to cap bytes into the per-thread
    scratch; return (exact-size bytes, rc)."""
    buf = _frame_scratch(tl_name, cap)
    ptr = buf.ctypes.data_as(ctypes.c_void_p)
    w = call(ptr)
    if w < 0:
        return None, w
    return _pyapi.PyBytes_FromStringAndSize(ptr, w), w


def _isa_flags() -> list[str]:
    """-march=native by default; ZXCH_PORTABLE=1 selects the AVX2 tier
    (-mavx2 -mbmi -mbmi2 -mlzcnt, no AVX-512) so the produced .so is
    redistributable across x86-64-v3 hosts — the reference ships per-ISA
    variant objects with runtime dispatch (cmake/zxcVariants.cmake:13-83,
    zxc_dispatch.c:148-302); our single-tier analog trades its in-binary
    dispatch for a build-time tier choice, with zxch_isa_supported
    guarding against running a native-tier .so on a weaker CPU."""
    if os.environ.get("ZXCH_PORTABLE"):
        return ["-mavx2", "-mbmi", "-mbmi2", "-mlzcnt"]
    return ["-march=native"]


def _build() -> bool:
    cmd = (["g++", "-O3"] + _isa_flags()
           + ["-pthread", "-shared", "-fPIC", "-o", _SO + ".tmp", _SRC])
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def lib() -> ctypes.CDLL | None:
    """The native library, built on demand; None when unavailable.

    Set ZXC_NO_NATIVE=1 to force the pure-Python paths (used by tests to
    keep the vectorized oracle covered)."""
    global _lib, _tried
    if os.environ.get("ZXC_NO_NATIVE"):
        return None
    # _tried may only be read on the unlocked fast path once it implies a
    # FINISHED attempt: setting it before the build/load completes let
    # concurrent callers observe (_tried=True, _lib=None) and silently
    # take the pure-Python fallback — the source of nondeterministic MT
    # encodes whenever the .so was still building/binding.
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        stale = (not os.path.exists(_SO)
                 or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
        if stale and not _build():
            _tried = True
            return None
        try:
            L = ctypes.CDLL(_SO)
        except OSError:
            _tried = True
            return None
        # ISA guard: the .so cache is keyed by mtime only, so a library
        # built -march=native on another host (copied checkout, shared
        # volume) may use instructions this CPU lacks. zxch_isa_supported
        # re-checks the build ISA against CPUID; on mismatch (or when the
        # symbol predates this guard) rebuild for THIS host before binding.
        try:
            isa_ok = L.zxch_isa_supported()
        except AttributeError:
            isa_ok = 0
        if not isa_ok:
            del L
            if not _build():
                _tried = True
                return None
            try:
                L = ctypes.CDLL(_SO)
                if not L.zxch_isa_supported():
                    _tried = True
                    return None
            except (OSError, AttributeError):
                _tried = True
                return None
        # ALL bindings happen here, inside the lock, before _lib is
        # published: argtypes are mandatory (stack-passed uint64_t gets
        # garbage upper bits under default c_int marshalling), and lazy
        # per-wrapper binding raced under the MT encode pipeline (a
        # worker could call through a half-bound function pointer).
        vp, u64, i64, u32, i32 = (ctypes.c_void_p, ctypes.c_uint64,
                                  ctypes.c_int64, ctypes.c_uint32,
                                  ctypes.c_int32)
        L.zxch_rapidhash64.restype = u64
        L.zxch_rapidhash64.argtypes = [ctypes.c_char_p, ctypes.c_size_t, u64]
        L.zxch_rapidhash32.restype = u32
        L.zxch_rapidhash32.argtypes = [ctypes.c_char_p, ctypes.c_size_t, u64]
        L.zxch_rapidhash32_batch.restype = None
        L.zxch_rapidhash32_batch.argtypes = [vp, vp, vp, vp, ctypes.c_size_t]
        L.zxch_hash8.restype = ctypes.c_uint8
        L.zxch_hash8.argtypes = [ctypes.c_char_p]
        L.zxch_hash16.restype = ctypes.c_uint16
        L.zxch_hash16.argtypes = [ctypes.c_char_p]
        L.zxch_walk_frame.restype = i64
        L.zxch_walk_frame.argtypes = [vp, u64, ctypes.c_int, u64, u64, vp,
                                      vp, vp, u64, vp]
        L.zxch_rle_decode.restype = ctypes.c_int
        L.zxch_rle_decode.argtypes = [vp, u64, vp, u64]
        L.zxch_varint_chain.restype = i64
        L.zxch_varint_chain.argtypes = [vp, u64, u64, vp]
        L.zxch_expand.restype = i64
        L.zxch_expand.argtypes = [vp, vp, vp, u64, vp, u64, vp, u64, vp, u64]
        L.zxch_glo_tokens.restype = ctypes.c_int
        L.zxch_glo_tokens.argtypes = [vp, u64, vp, u64, vp, vp]
        L.zxch_ghi_words.restype = ctypes.c_int
        L.zxch_ghi_words.argtypes = [vp, u64, vp, u64, vp, vp, vp]
        L.zxch_resolve_pieces.restype = i64
        L.zxch_resolve_pieces.argtypes = [vp, vp, vp, u64, vp, u64, u64,
                                          u64, vp, vp, vp, vp, u64, vp,
                                          ctypes.c_int, ctypes.c_int]
        L.zxch_resolve_pieces_sr.restype = i64
        L.zxch_resolve_pieces_sr.argtypes = [vp, vp, vp, u64, vp, u64, u64,
                                             u64, vp, vp, vp, vp, u64, vp,
                                             ctypes.c_int, ctypes.c_int, vp]
        L.zxch_optimal_parse.restype = i64
        L.zxch_optimal_parse.argtypes = [vp, vp, u64, vp, vp, ctypes.c_int,
                                         ctypes.c_int, vp,
                                         vp, vp, vp, u64]
        L.zxch_find_matches.restype = ctypes.c_int
        L.zxch_find_matches.argtypes = [vp, u64, u64, ctypes.c_int, vp, vp]
        L.zxch_lazy_parse.restype = i64
        L.zxch_lazy_parse.argtypes = [vp, vp, u64, ctypes.c_int,
                                      ctypes.c_int, vp, vp, vp, u64]
        ci = ctypes.c_int
        L.zxch_find_parse.restype = i64
        L.zxch_find_parse.argtypes = [vp, u64, u64, ci, ci, ci, ci, ci, ci,
                                      ci, vp, vp, vp, u64]
        for fn in (L.zxch_window_ops, L.zxch_window_ops2):
            fn.restype = i64
            fn.argtypes = [vp] * 4 + [u64, i64, vp, vp, u64]
        L.zxch_lane_ops.restype = i64
        L.zxch_lane_ops.argtypes = [vp] * 4 + [u64, i64] + [vp] * 5 + [u64]
        L.zxch_pivco_decode.restype = ci
        L.zxch_pivco_decode.argtypes = [vp, u64, vp, u64, vp]
        L.zxch_code_lengths.restype = ci
        L.zxch_code_lengths.argtypes = [vp, ci, vp]
        L.zxch_decode_block.restype = i64
        L.zxch_decode_block.argtypes = [ci, vp, u64, vp, u64, vp, u64, vp]
        L.zxch_decompress_frame.restype = i64
        L.zxch_decompress_frame.argtypes = [vp, u64, u64, ci, ci, vp, u64,
                                            vp, vp, u64]
        L.zxch_decompress_frame_mt.restype = i64
        L.zxch_decompress_frame_mt.argtypes = [vp, u64, u64, ci, ci, vp,
                                               u64, vp, vp, u64, ci]
        L.zxch_encode_ghi.restype = i64
        L.zxch_encode_ghi.argtypes = [vp, u64, u64, ci, ci, ci, ci, ci, ci,
                                      ci, vp, u64]
        L.zxch_encode_glo.restype = i64
        L.zxch_encode_glo.argtypes = [vp, u64, u64, ci, ci, ci, ci, ci, ci,
                                      ci, vp, vp, u64]
        L.zxch_pivco_encode.restype = i64
        L.zxch_pivco_encode.argtypes = [vp, u64, vp, vp, u64]
        L.zxch_dict_train.restype = i64
        L.zxch_dict_train.argtypes = [vp, vp, ci, u64, vp, u64]
        L.zxch_train_dict.restype = i64
        L.zxch_train_dict.argtypes = [vp, vp, ci, u64, vp, u64]
        L.zxch_train_dict_huf.restype = i64
        L.zxch_train_dict_huf.argtypes = [vp, vp, ci, vp, u64, vp]
        L.zxch_rle_encode_lit.restype = i64
        L.zxch_rle_encode_lit.argtypes = [vp, u64, vp, u64]
        L.zxch_compress_frame.restype = i64
        L.zxch_compress_frame.argtypes = [vp, u64, ci, ci, ci, ci, ci, ci,
                                          ci, ci, u64, ci, ci, ci, vp, u64,
                                          vp, u32, vp, u64]
        L.zxch_compress_frame_mt.restype = i64
        L.zxch_compress_frame_mt.argtypes = [vp, u64, ci, ci, ci, ci, ci,
                                             ci, ci, ci, u64, ci, ci, ci,
                                             vp, u64, vp, u32, vp, u64, ci]
        L.zxch_v19_prep_block.restype = i64
        L.zxch_v19_prep_block.argtypes = [vp, u64, ci, u64, vp, u64, vp,
                                          ci, ci, vp, vp, vp, vp, vp,
                                          i64, i64, i64, vp, vp, vp]
        L.zxch_v19_prep_block_plan.restype = i64
        L.zxch_v19_prep_block_plan.argtypes = (
            L.zxch_v19_prep_block.argtypes + [vp, i64, vp, vp])
        L.zxch_v19_lit8_load.restype = i64
        L.zxch_v19_lit8_load.argtypes = [vp, u64, ci, u64, vp, u64, vp,
                                         vp, i64, i64, vp, i64]
        L.zxch_v26_prep_block.restype = i64
        L.zxch_v26_prep_block.argtypes = L.zxch_v19_prep_block.argtypes
        L.zxch_v19_lit8_load_batch.restype = i64
        L.zxch_v19_lit8_load_batch.argtypes = [
            vp, vp, vp, vp, i64, i64, i64, u64, vp, u64, vp,
            vp, vp, vp, vp, vp, i64, vp]
        L.zxch_v26_prep_block_plan.restype = i64
        L.zxch_v26_prep_block_plan.argtypes = \
            L.zxch_v19_prep_block_plan.argtypes
        _lib = L
        _install_fast_paths(L)
        _tried = True
        return _lib


def available() -> bool:
    return lib() is not None


def _install_fast_paths(L: ctypes.CDLL) -> None:
    """Swap the pure-Python hash entry points for the native ones."""
    from ..format import hashes

    def native_rapidhash32(data: bytes, seed: int = 0) -> int:
        return L.zxch_rapidhash32(bytes(data), len(data), seed)

    hashes._native_rapidhash32 = native_rapidhash32


# ---------------------------------------------------------------------------
# typed wrappers (None-safe: callers check available() or handle fallback)
# ---------------------------------------------------------------------------

def rapidhash32(data: bytes, seed: int = 0) -> int:
    L = lib()
    if L is None:
        from ..format.hashes import _py_rapidhash32
        return _py_rapidhash32(data, seed)
    return L.zxch_rapidhash32(bytes(data), len(data), seed)


def rle_decode(stream: np.ndarray, out_size: int) -> np.ndarray | None:
    """Native RLE literal decode; None when the library is unavailable."""
    L = lib()
    if L is None:
        return None
    src = np.ascontiguousarray(stream, np.uint8)
    dst = np.empty(out_size, np.uint8)
    rc = L.zxch_rle_decode(src.ctypes.data_as(ctypes.c_void_p),
                           len(src), dst.ctypes.data_as(ctypes.c_void_p),
                           out_size)
    if rc != 0:
        from ..errors import ZxcError, ERROR_CORRUPT_DATA
        raise ZxcError(ERROR_CORRUPT_DATA, "RLE stream (native)")
    return dst


def varint_chain(extras: np.ndarray, count: int) -> tuple[np.ndarray, bool] | None:
    L = lib()
    if L is None:
        return None
    src = np.ascontiguousarray(extras, np.uint8)
    out = np.empty(count, np.uint32)
    rc = L.zxch_varint_chain(src.ctypes.data_as(ctypes.c_void_p), len(src),
                             count, out.ctypes.data_as(ctypes.c_void_p))
    return out, rc >= 0


KBIG = 1 << 30


def resolve_pieces(ll: np.ndarray, ml: np.ndarray, off: np.ndarray,
                   literals: np.ndarray, dict_buf: np.ndarray | None = None,
                   max_pieces: int | None = None, synth_cap: int | None = None,
                   device_pure: bool = False, max_frag: int = 0,
                   self_ref: bool = False):
    """Resolve LZ chains into the flat piecewise-literal mapping
    ``out[p] = lit_full[c + (p - s) % k]``.

    lit_full = dict ++ literals ++ synthetic bytes (source regions the
    resolver materialized to cap piece amplification).

    ``self_ref`` (v25 kernel contract, requires device_pure): matches
    whose source completes before the destination's 16 KiB supertile
    emit ONE piece with k == KOUT and c/s in OUTPUT coordinates
    (out[p] = out[c + (p - s)]) — the device kernel reads its own
    decoded rows for them, so those bytes are neither materialized on
    the host nor shipped over H2D. KOUT is exported as
    ``runtime.KOUT`` after the first self_ref call.

    Returns (out_start, c, s, k, lit_full) — int32 piece tables plus the
    extended uint8 literal buffer — or None when the native library is
    unavailable or the budget is exceeded (caller falls back to the
    iterative device kernel). Raises ZxcError on bad offsets.
    """
    L = lib()
    if L is None:
        return None
    n_seq = len(ll)
    if max_pieces is None:
        max_pieces = 8 * n_seq + 64
    dict_len = 0 if dict_buf is None else len(dict_buf)
    base = np.ascontiguousarray(literals, np.uint8)
    total_out = int(np.asarray(ll).sum() + np.asarray(ml).sum()) + \
        (len(base) - int(np.asarray(ll).sum()))
    if synth_cap is None:
        synth_cap = max(total_out, 1 << 16)
        if device_pure:
            synth_cap += total_out + (1 << 20)  # pattern buffers (2KB each)
    lit_len = dict_len + len(base)
    # reused per-thread scratch: fresh np.empty per call costs more in
    # first-touch page faults than the resolver's own compute (measured
    # 14x: 0.09 GB/s wrapped vs 1.4 GB/s standalone)
    tl = _resolve_tl
    if getattr(tl, "lit", None) is None or len(tl.lit) < lit_len + synth_cap:
        tl.lit = np.empty(max(lit_len + synth_cap, 4 << 20), np.uint8)
    if getattr(tl, "po", None) is None or len(tl.po) < max_pieces:
        cap = max(max_pieces, 1 << 18)
        tl.po, tl.pc = np.empty(cap, np.int32), np.empty(cap, np.int32)
        tl.ps, tl.pk = np.empty(cap, np.int32), np.empty(cap, np.int32)
    lit_full = tl.lit
    if dict_len:
        lit_full[:dict_len] = dict_buf
    lit_full[dict_len:lit_len] = base
    ll32 = np.ascontiguousarray(ll, np.int32)
    ml32 = np.ascontiguousarray(ml, np.int32)
    off32 = np.ascontiguousarray(off, np.int32)
    po, pc, ps, pk = tl.po, tl.pc, tl.ps, tl.pk
    lit_out = ctypes.c_uint64(0)
    if self_ref:
        kout = ctypes.c_int32(0)
        n = L.zxch_resolve_pieces_sr(
            ll32.ctypes.data_as(ctypes.c_void_p),
            ml32.ctypes.data_as(ctypes.c_void_p),
            off32.ctypes.data_as(ctypes.c_void_p), n_seq,
            lit_full.ctypes.data_as(ctypes.c_void_p), lit_len,
            len(lit_full), dict_len,
            po.ctypes.data_as(ctypes.c_void_p),
            pc.ctypes.data_as(ctypes.c_void_p),
            ps.ctypes.data_as(ctypes.c_void_p),
            pk.ctypes.data_as(ctypes.c_void_p),
            max_pieces, ctypes.byref(lit_out), 1 if device_pure else 0,
            max_frag, ctypes.byref(kout))
        global KOUT
        KOUT = int(kout.value)
    else:
        n = L.zxch_resolve_pieces(
            ll32.ctypes.data_as(ctypes.c_void_p),
            ml32.ctypes.data_as(ctypes.c_void_p),
            off32.ctypes.data_as(ctypes.c_void_p), n_seq,
            lit_full.ctypes.data_as(ctypes.c_void_p), lit_len,
            len(lit_full), dict_len,
            po.ctypes.data_as(ctypes.c_void_p),
            pc.ctypes.data_as(ctypes.c_void_p),
            ps.ctypes.data_as(ctypes.c_void_p),
            pk.ctypes.data_as(ctypes.c_void_p),
            max_pieces, ctypes.byref(lit_out), 1 if device_pure else 0,
            max_frag)
    if n == -9:
        from ..errors import ZxcError, ERROR_BAD_OFFSET
        raise ZxcError(ERROR_BAD_OFFSET, "piece resolution")
    if n < 0:
        return None  # budget exceeded: fall back
    # copies, not views: the scratch is reused by the next call
    return (po[:n].copy(), pc[:n].copy(), ps[:n].copy(), pk[:n].copy(),
            lit_full[:lit_out.value].copy())


def _as_dict_args(dict_buf, dict_cl):
    d8 = np.ascontiguousarray(dict_buf, np.uint8) if dict_buf is not None \
        else np.zeros(0, np.uint8)
    cl8 = np.ascontiguousarray(dict_cl, np.uint8) if dict_cl is not None \
        else None
    cl_ptr = cl8.ctypes.data_as(ctypes.c_void_p) if cl8 is not None else None
    return d8, cl8, cl_ptr


def decode_block(block_type: int, payload: np.ndarray, block_size: int,
                 dict_buf: np.ndarray | None = None,
                 dict_cl: np.ndarray | None = None) -> np.ndarray | None:
    """Fully-native single-block decode (section parse + entropy + fused
    expand in one C call). None when the library is unavailable; raises
    ZxcError with the same codes as the Python path on malformed input."""
    L = lib()
    if L is None:
        return None
    pl = np.ascontiguousarray(payload, np.uint8)
    d8, cl8, cl_ptr = _as_dict_args(dict_buf, dict_cl)
    dst = np.empty(block_size + 64, np.uint8)
    n = L.zxch_decode_block(block_type, pl.ctypes.data_as(ctypes.c_void_p),
                            len(pl), dst.ctypes.data_as(ctypes.c_void_p),
                            block_size, d8.ctypes.data_as(ctypes.c_void_p),
                            len(d8), cl_ptr)
    if n < 0:
        from ..errors import ZxcError
        raise ZxcError(int(n), "native block decode")
    return dst[:n]


def decompress_frame(archive, block_size: int, has_checksum: bool,
                     verify: bool, dict_buf: np.ndarray | None = None,
                     dict_cl: np.ndarray | None = None,
                     threads: int = 1, out=None) -> bytes | int | None:
    """Whole-frame native decode: one C call per archive (the host decode
    hot path). None when unavailable; raises ZxcError on malformed input
    with the same codes as the Python frame loop. threads > 1 rides the
    fork-join pthread pool (zxch_decompress_frame_mt) — blocks decode to
    deterministic i*block_size offsets, bit-identical output.

    ``out``: optional writable caller-owned buffer (bytearray / writable
    memoryview / numpy u8 array). Decoded bytes land at out[0:dsize] and
    the byte count is returned — the reference's caller-owned-dst
    contract (zxc_decompress, include/zxc_buffer.h:98-210), skipping the
    fresh-PyBytes allocation + page faults that dominate large-buffer
    API decode."""
    L = lib()
    if L is None:
        return None
    src = np.frombuffer(archive, np.uint8) if isinstance(archive, (bytes, bytearray, memoryview)) \
        else np.ascontiguousarray(archive, np.uint8)
    n = len(src)
    # frame walk first: block count bounds the output allocation, and a
    # footer lying about the size can never overflow it (each block's
    # logical writes are capped at block_size inside the C loop).
    max_blocks = n // 8 + 2
    pos = np.empty(max_blocks, np.uint64)
    typ = np.empty(max_blocks, np.uint8)
    comp = np.empty(max_blocks, np.uint64)
    eof = ctypes.c_uint64(0)
    from .. import constants as C
    nb = L.zxch_walk_frame(src.ctypes.data_as(ctypes.c_void_p), n,
                           1 if has_checksum else 0,
                           C.compress_block_bound(block_size), 16,
                           pos.ctypes.data_as(ctypes.c_void_p),
                           typ.ctypes.data_as(ctypes.c_void_p),
                           comp.ctypes.data_as(ctypes.c_void_p),
                           max_blocks, ctypes.byref(eof))
    if nb < 0:
        from ..errors import ZxcError
        raise ZxcError(int(nb), "frame walk")
    d8, cl8, cl_ptr = _as_dict_args(dict_buf, dict_cl)
    # decode straight into the result bytes object: the footer-declared
    # size bounds the allocation (clamped by the block count so a lying
    # footer cannot force a huge alloc), and the C loop bounces tail
    # blocks without wild-copy headroom through a scratch block, so the
    # exactly-sized buffer is never overrun. The old scratch + full-copy
    # path cost ~13% of one-shot decode wall (PyBytes_FromStringAndSize
    # in the L1 profile).
    dsize = int(np.frombuffer(archive[-12:-4] if isinstance(
        archive, (bytes, bytearray)) else src[-12:-4].tobytes(),
        "<u8")[0]) if n >= 12 else 0
    cap = min(dsize, int(nb) * block_size)
    if out is not None:
        if isinstance(out, np.ndarray):
            if not (out.flags["C_CONTIGUOUS"] and out.flags["WRITEABLE"]
                    and out.dtype == np.uint8 and out.ndim == 1):
                raise TypeError("out= must be a contiguous writable 1-D "
                                "uint8 array or bytearray/memoryview")
            out_cap, ptr = out.nbytes, out.ctypes.data_as(ctypes.c_void_p)
        else:
            mv = memoryview(out)
            if mv.readonly:
                raise TypeError("out= buffer is read-only")
            out_cap = mv.nbytes
            ptr = ctypes.addressof(
                (ctypes.c_uint8 * out_cap).from_buffer(mv.cast("B")))
        if out_cap < cap:
            from ..errors import ZxcError, ERROR_DST_TOO_SMALL
            raise ZxcError(ERROR_DST_TOO_SMALL,
                           f"out= holds {out_cap} bytes, need {cap}")
        result = int(cap)
    else:
        result = _pyapi.PyBytes_FromStringAndSize(None, cap)
        ptr = _pyapi.PyBytes_AsString(result)
        out_cap = cap
    if threads > 1:
        w = L.zxch_decompress_frame_mt(
            src.ctypes.data_as(ctypes.c_void_p), n, block_size,
            1 if has_checksum else 0, 1 if verify else 0,
            d8.ctypes.data_as(ctypes.c_void_p), len(d8), cl_ptr, ptr,
            out_cap, int(threads))
    else:
        w = L.zxch_decompress_frame(
            src.ctypes.data_as(ctypes.c_void_p), n, block_size,
            1 if has_checksum else 0, 1 if verify else 0,
            d8.ctypes.data_as(ctypes.c_void_p), len(d8), cl_ptr, ptr,
            out_cap)
    if w < 0:
        from ..errors import ZxcError
        raise ZxcError(int(w), "native frame decode")
    if int(w) != cap:  # footer lied large; native checks stored_size too
        from ..errors import ZxcError
        raise ZxcError(-8, "footer size mismatch")
    return result


def decompress_frame_into(buffer: bytearray, comp_size: int,
                          block_size: int, has_checksum: bool, verify: bool,
                          dict_buf: np.ndarray | None = None,
                          dict_cl: np.ndarray | None = None) -> int | None:
    """True single-buffer in-place decode: the archive sits flush-right in
    ``buffer``; decoded bytes land at ``buffer[0:dsize]``. The caller has
    already validated the in-place margin (frame.decompress_inplace), which
    guarantees the write cursor stays >= 32 bytes behind the archive read
    cursor — covering the <= 31-byte wild-copy overshoot. None when the
    native library is unavailable."""
    L = lib()
    if L is None:
        return None
    n = len(buffer)
    buf_t = (ctypes.c_uint8 * n).from_buffer(buffer)
    base = ctypes.addressof(buf_t)
    d8, cl8, cl_ptr = _as_dict_args(dict_buf, dict_cl)
    w = L.zxch_decompress_frame(base + n - comp_size, comp_size, block_size,
                                1 if has_checksum else 0, 1 if verify else 0,
                                d8.ctypes.data_as(ctypes.c_void_p), len(d8),
                                cl_ptr, base, n)
    if w < 0:
        from ..errors import ZxcError
        raise ZxcError(int(w), "native in-place decode")
    return int(w)


def find_matches(data: np.ndarray, start: int, max_probes: int):
    """Native hash-chain match finder; returns (lens, offs) int64 arrays
    for positions data[start:], or None when unavailable."""
    L = lib()
    if L is None:
        return None
    d8 = np.ascontiguousarray(data, np.uint8)
    P = len(d8) - start
    lens = np.empty(max(P, 1), np.int32)
    offs = np.empty(max(P, 1), np.int32)
    L.zxch_find_matches(d8.ctypes.data_as(ctypes.c_void_p), len(d8), start,
                        max_probes, lens.ctypes.data_as(ctypes.c_void_p),
                        offs.ctypes.data_as(ctypes.c_void_p))
    return lens[:P], offs[:P]


def lazy_parse(lens: np.ndarray, offs: np.ndarray, lazy: bool,
               min_emit: int = 5):
    """Native greedy/lazy parse; returns (pos, len, off) or None."""
    L = lib()
    if L is None:
        return None
    lens32 = np.ascontiguousarray(lens, np.int32)
    offs32 = np.ascontiguousarray(offs, np.int32)
    P = len(lens32)
    max_seq = P // 5 + 8
    op = np.empty(max_seq, np.int32)
    ol = np.empty(max_seq, np.int32)
    oo = np.empty(max_seq, np.int32)
    n = L.zxch_lazy_parse(lens32.ctypes.data_as(ctypes.c_void_p),
                          offs32.ctypes.data_as(ctypes.c_void_p), P,
                          1 if lazy else 0, min_emit,
                          op.ctypes.data_as(ctypes.c_void_p),
                          ol.ctypes.data_as(ctypes.c_void_p),
                          oo.ctypes.data_as(ctypes.c_void_p), max_seq)
    if n < 0:
        return None
    return op[:n], ol[:n], oo[:n]


def optimal_parse(lens: np.ndarray, offs: np.ndarray, data: np.ndarray,
                  lit_cost_bits: np.ndarray, token_bits: int = 8,
                  only8: bool = False, tok_cost16=None):
    """DP optimal parse (levels 6-7): returns (pos, len, off) int32 arrays
    or None when the native library is unavailable."""
    L = lib()
    if L is None:
        return None
    P = len(data)
    lens32 = np.ascontiguousarray(lens, np.int32)
    offs32 = np.ascontiguousarray(offs, np.int32)
    d8 = np.ascontiguousarray(data, np.uint8)
    lc = np.ascontiguousarray(lit_cost_bits, np.uint16)
    max_seq = P // 5 + 8
    op = np.empty(max_seq, np.int32)
    ol = np.empty(max_seq, np.int32)
    oo = np.empty(max_seq, np.int32)
    n = L.zxch_optimal_parse(
        lens32.ctypes.data_as(ctypes.c_void_p),
        offs32.ctypes.data_as(ctypes.c_void_p), P,
        d8.ctypes.data_as(ctypes.c_void_p),
        lc.ctypes.data_as(ctypes.c_void_p), token_bits,
        1 if only8 else 0,
        (np.ascontiguousarray(tok_cost16, np.uint16)
         .ctypes.data_as(ctypes.c_void_p)
         if tok_cost16 is not None else None),
        op.ctypes.data_as(ctypes.c_void_p),
        ol.ctypes.data_as(ctypes.c_void_p),
        oo.ctypes.data_as(ctypes.c_void_p), max_seq)
    if n < 0:
        return None
    return op[:n], ol[:n], oo[:n]


def expand(ll: np.ndarray, ml: np.ndarray, off: np.ndarray,
           lit: np.ndarray, cap: int,
           dict_buf: np.ndarray | None = None) -> np.ndarray | None:
    """Serial native sequence expansion; None when unavailable, raises
    ZxcError on malformed input (parity with the vectorized path)."""
    L = lib()
    if L is None:
        return None
    ll32 = np.ascontiguousarray(ll, np.int32)
    ml32 = np.ascontiguousarray(ml, np.int32)
    off32 = np.ascontiguousarray(off, np.int32)
    lit8 = np.ascontiguousarray(lit, np.uint8)
    d8 = np.ascontiguousarray(dict_buf, np.uint8) if dict_buf is not None \
        else np.zeros(0, np.uint8)
    dst = np.empty(cap, np.uint8)
    n = L.zxch_expand(ll32.ctypes.data_as(ctypes.c_void_p),
                      ml32.ctypes.data_as(ctypes.c_void_p),
                      off32.ctypes.data_as(ctypes.c_void_p), len(ll32),
                      lit8.ctypes.data_as(ctypes.c_void_p), len(lit8),
                      d8.ctypes.data_as(ctypes.c_void_p), len(d8),
                      dst.ctypes.data_as(ctypes.c_void_p), cap)
    if n < 0:
        from ..errors import ZxcError, ERROR_BAD_OFFSET, ERROR_OVERFLOW
        raise ZxcError(ERROR_BAD_OFFSET if n == -9 else ERROR_OVERFLOW,
                       "native expand")
    return dst[:n]


def find_parse(data: np.ndarray, start: int, max_probes: int, lazy: bool,
               sufficient_len: int = 0, step_base: int = 1,
               step_shift: int = 0, cover_base: int = 1,
               min_emit: int = 5):
    """Combined native find+parse (levels 1-5 hot path); returns
    (pos, len, off) int32 arrays relative to `start`, or None."""
    L = lib()
    if L is None:
        return None
    d8 = np.ascontiguousarray(data, np.uint8)
    P = len(d8) - start
    max_seq = P // 5 + 8
    op = np.empty(max_seq, np.int32)
    ol = np.empty(max_seq, np.int32)
    oo = np.empty(max_seq, np.int32)
    n = L.zxch_find_parse(d8.ctypes.data_as(ctypes.c_void_p), len(d8), start,
                          max_probes, 1 if lazy else 0, sufficient_len,
                          step_base, step_shift, cover_base, min_emit,
                          op.ctypes.data_as(ctypes.c_void_p),
                          ol.ctypes.data_as(ctypes.c_void_p),
                          oo.ctypes.data_as(ctypes.c_void_p), max_seq)
    if n < 0:
        return None
    return op[:n], ol[:n], oo[:n]


def window_ops(po, pc, ps, pk, total: int, split_src: bool = False):
    """Split device_pure pieces into window-confined merge ops (all kernel
    control precomputed). Returns (ops int32 (n,4) flat, wstart int32
    (n_windows+1,)) or None."""
    L = lib()
    if L is None:
        return None
    n = len(po)
    n_windows = (total + 1023) // 1024
    max_ops = (3 if split_src else 2) * n + n_windows + 64
    ops = np.empty(max_ops * 4, np.int32)
    wstart = np.empty(n_windows + 1, np.int32)
    po32 = np.ascontiguousarray(po, np.int32)
    pc32 = np.ascontiguousarray(pc, np.int32)
    ps32 = np.ascontiguousarray(ps, np.int32)
    pk32 = np.ascontiguousarray(pk, np.int32)
    fn = L.zxch_window_ops2 if split_src else L.zxch_window_ops
    r = fn(po32.ctypes.data_as(ctypes.c_void_p),
                          pc32.ctypes.data_as(ctypes.c_void_p),
                          ps32.ctypes.data_as(ctypes.c_void_p),
                          pk32.ctypes.data_as(ctypes.c_void_p), n, total,
                          ops.ctypes.data_as(ctypes.c_void_p),
                          wstart.ctypes.data_as(ctypes.c_void_p), max_ops)
    if r < 0:
        return None
    return ops[:r * 4], wstart


def lane_ops(po, pc, ps, pk, total: int):
    """Split device_pure pieces into (32,128)-tile lane-op batches for the
    v9 per-sublane Pallas kernel. Returns (rows, roll, s, e) int32 arrays
    of shape (n_batches, 32) plus tile_start (n_tiles+1,), or None."""
    L = lib()
    if L is None:
        return None
    n = len(po)
    n_rows = (total + 127) // 128
    n_tiles = (n_rows + 31) // 32
    # worst case: every op its own layer in its tile
    max_batches = 2 * n + 8 * n_tiles + 64
    rows = np.empty((max_batches, 32), np.int32)
    roll = np.empty((max_batches, 32), np.int32)
    s = np.empty((max_batches, 32), np.int32)
    e = np.empty((max_batches, 32), np.int32)
    tile_start = np.empty(n_tiles + 1, np.int32)
    po32 = np.ascontiguousarray(po, np.int32)
    pc32 = np.ascontiguousarray(pc, np.int32)
    ps32 = np.ascontiguousarray(ps, np.int32)
    pk32 = np.ascontiguousarray(pk, np.int32)
    P = lambda a: a.ctypes.data_as(ctypes.c_void_p)  # noqa: E731
    nb = L.zxch_lane_ops(P(po32), P(pc32), P(ps32), P(pk32), n, total,
                         P(rows), P(roll), P(s), P(e), P(tile_start),
                         max_batches)
    if nb < 0:
        return None
    nb = int(nb)
    return rows[:nb], roll[:nb], s[:nb], e[:nb], tile_start


def dict_train(samples: list[bytes], target_size: int = 16384) -> bytes | None:
    """Native one-shot dictionary trainer: returns a serialized .zxd blob
    (header + content + 128-byte shared table) or None when the native
    library is unavailable. Raises ZxcError on trainer-reported errors."""
    L = lib()
    if L is None or not samples:
        return None
    flat = b"".join(samples)
    sizes = np.array([len(s) for s in samples], np.uint64)
    cap = 16 + 65536 + 128
    out = ctypes.create_string_buffer(cap)
    rc = L.zxch_dict_train(
        ctypes.c_char_p(flat), sizes.ctypes.data_as(ctypes.c_void_p),
        len(samples), target_size, ctypes.cast(out, ctypes.c_void_p), cap)
    if rc < 0:
        from ..errors import ZxcError
        raise ZxcError(int(rc), "native dict train")
    return out.raw[:int(rc)]


def compress_frame(data: np.ndarray, level: int, max_probes: int,
                   lazy: bool, sufficient_len: int, step_base: int,
                   step_shift: int, cover_base: int, block_size: int,
                   block_size_code: int, checksum: bool,
                   seekable: bool, min_emit: int = 5,
                   dict_buf: np.ndarray | None = None,
                   dict_cl: np.ndarray | None = None,
                   dict_id: int = 0, threads: int = 1) -> bytes | None:
    """Whole-frame one-shot encode (with or without a dictionary
    window / shared table); byte-identical with the Python frame
    assembly. threads > 1 fans the per-block dispatch over the
    persistent native worker pool (zxch_compress_frame_mt) — archive
    bytes are identical at every thread count. None when unavailable."""
    L = lib()
    if L is None:
        return None
    d8 = np.ascontiguousarray(data, np.uint8)
    n = len(d8)
    db, cl8, cl_ptr = _as_dict_args(dict_buf, dict_cl)
    n_blocks = (n + block_size - 1) // block_size
    cap = 16 + 12 + n + n_blocks * (8 + 4 + 64) + n // 4 + 4 * n_blocks + 8 + 4096
    if threads > 1:
        call = lambda ptr: L.zxch_compress_frame_mt(
            d8.ctypes.data_as(ctypes.c_void_p), n, level,
            max_probes, 1 if lazy else 0, sufficient_len,
            step_base, step_shift, cover_base, min_emit, block_size,
            block_size_code, 1 if checksum else 0, 1 if seekable else 0,
            db.ctypes.data_as(ctypes.c_void_p), len(db), cl_ptr,
            ctypes.c_uint32(dict_id), ptr, cap, int(threads))
    else:
        call = lambda ptr: L.zxch_compress_frame(
            d8.ctypes.data_as(ctypes.c_void_p), n, level,
            max_probes, 1 if lazy else 0, sufficient_len,
            step_base, step_shift, cover_base, min_emit, block_size,
            block_size_code, 1 if checksum else 0, 1 if seekable else 0,
            db.ctypes.data_as(ctypes.c_void_p), len(db), cl_ptr,
            ctypes.c_uint32(dict_id), ptr, cap)
    out, w = _native_into_bytes("encbuf", cap, call)
    if w < 0:
        return None
    return out


def pivco_encode(data: np.ndarray, code_len: np.ndarray) -> bytes | None:
    """Native PivCo payload encode (no lengths header); byte-exact with
    huffman.encode_payload. None when unavailable."""
    L = lib()
    if L is None:
        return None
    d8 = np.ascontiguousarray(data, np.uint8)
    cl = np.ascontiguousarray(code_len, np.uint8)
    cap = 2 * len(d8) + 4096
    out = np.empty(cap, np.uint8)
    n = L.zxch_pivco_encode(d8.ctypes.data_as(ctypes.c_void_p), len(d8),
                            cl.ctypes.data_as(ctypes.c_void_p),
                            out.ctypes.data_as(ctypes.c_void_p), cap)
    if n < 0:
        return None
    return out[:n].tobytes()


def rle_encode_lit(lit: np.ndarray) -> bytes | None:
    """Native RLE literal-section emitter; byte-exact with
    block_encode.encode_rle_literals. None when unavailable."""
    L = lib()
    if L is None:
        return None
    d8 = np.ascontiguousarray(lit, np.uint8)
    cap = 2 * len(d8) + 8
    out = np.empty(max(cap, 1), np.uint8)
    n = L.zxch_rle_encode_lit(d8.ctypes.data_as(ctypes.c_void_p), len(d8),
                              out.ctypes.data_as(ctypes.c_void_p), cap)
    if n < 0:
        return None
    return out[:n].tobytes()


def pivco_decode(payload: np.ndarray, n: int, code_len: np.ndarray):
    """Native PivCo section decode; returns uint8 array or None, raises
    ZxcError on malformed input."""
    L = lib()
    if L is None:
        return None
    src = np.ascontiguousarray(payload, np.uint8)
    cl = np.ascontiguousarray(code_len, np.uint8)
    out = np.empty(n, np.uint8)
    rc = L.zxch_pivco_decode(src.ctypes.data_as(ctypes.c_void_p), len(src),
                             cl.ctypes.data_as(ctypes.c_void_p), n,
                             out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        from ..errors import ZxcError, ERROR_CORRUPT_DATA
        raise ZxcError(ERROR_CORRUPT_DATA, "PivCo section (native)")
    return out


def encode_ghi(data: np.ndarray, start: int, max_probes: int, lazy: bool,
               sufficient_len: int = 0, step_base: int = 1,
               step_shift: int = 0, cover_base: int = 1,
               min_emit: int = 5):
    """Fully-native GHI payload emission (levels 1-2); returns bytes or
    None when unavailable."""
    L = lib()
    if L is None:
        return None
    d8 = np.ascontiguousarray(data, np.uint8)
    P = len(d8) - start
    cap = 16 + 24 + P + 4 * (P // 5 + 8) + 8
    out = np.empty(cap, np.uint8)
    n = L.zxch_encode_ghi(d8.ctypes.data_as(ctypes.c_void_p), len(d8), start,
                          max_probes, 1 if lazy else 0, sufficient_len,
                          step_base, step_shift, cover_base, min_emit,
                          out.ctypes.data_as(ctypes.c_void_p), cap)
    if n < 0:
        return None
    return out[:n].tobytes()


def encode_glo(data: np.ndarray, start: int, max_probes: int, lazy: bool,
               sufficient_len: int = 0, step_base: int = 1,
               step_shift: int = 0, cover_base: int = 1,
               min_emit: int = 5, dict_cl: np.ndarray | None = None):
    """Fully-native GLO payload emission (levels 1-5; RAW/RLE/inline-
    Huffman literal pricing, plus the shared-dict table when ``dict_cl``
    is given — ``data[:start]`` is the dictionary window); returns bytes
    or None."""
    L = lib()
    if L is None:
        return None
    d8 = np.ascontiguousarray(data, np.uint8)
    P = len(d8) - start
    cap = 16 + 32 + 2 * P + 6 * (P // 5 + 8) + 64
    out = np.empty(cap, np.uint8)
    cl_ptr = None
    if dict_cl is not None:
        cl8 = np.ascontiguousarray(dict_cl, np.uint8)
        cl_ptr = cl8.ctypes.data_as(ctypes.c_void_p)
    n = L.zxch_encode_glo(d8.ctypes.data_as(ctypes.c_void_p), len(d8), start,
                          max_probes, 1 if lazy else 0, sufficient_len,
                          step_base, step_shift, cover_base, min_emit,
                          cl_ptr, out.ctypes.data_as(ctypes.c_void_p), cap)
    if n < 0:
        return None
    return out[:n].tobytes()


def code_lengths(freq: np.ndarray, max_len: int) -> np.ndarray | None:
    """Native package-merge code lengths; None when unavailable."""
    L = lib()
    if L is None:
        return None
    f = np.ascontiguousarray(freq, np.uint64)
    if len(f) != 256:
        return None
    cl = np.zeros(256, np.uint8)
    rc = L.zxch_code_lengths(f.ctypes.data_as(ctypes.c_void_p), max_len,
                             cl.ctypes.data_as(ctypes.c_void_p))
    if rc < 0:
        return None
    return cl


def v19_prep_block(payload: np.ndarray, block_type: int, block_size: int,
                   qs_row: np.ndarray, qbase_row: np.ndarray,
                   pctrl_row: np.ndarray, tq_row: np.ndarray,
                   lit8_row: np.ndarray, MAXQ: int, NG32: int, RLP: int,
                   K: int = 2, quad_align: int = 2,
                   dict_buf: np.ndarray | None = None,
                   dict_cl: np.ndarray | None = None,
                   self_ref: bool = False):
    """Fused device-dispatch prep: one native call takes a block payload to
    its v19 control slices (section parse + entropy literals + piece
    resolution + lane-op packing — pack_blocks_v19 layout, asserted
    byte-identical by tests/test_device_pipeline.py).

    The *_row arrays are this block's slices of the dispatch-group arrays
    (C-contiguous). Returns (total, nq, maxrow, litrows); total < 0 is a
    ZXC error code, with -10 also meaning "MAXQ/RLP too small" (nq/maxrow/
    litrows then hold the needed lower bounds). None when the native
    library is unavailable."""
    L = lib()
    if L is None:
        return None
    pl = np.ascontiguousarray(payload, np.uint8)
    d8, cl8, cl_ptr = _as_dict_args(dict_buf, dict_cl)
    nq = ctypes.c_int64(0)
    maxrow = ctypes.c_int64(0)
    litrows = ctypes.c_int64(0)
    P = lambda a: a.ctypes.data_as(ctypes.c_void_p)  # noqa: E731
    fn = L.zxch_v26_prep_block if self_ref else L.zxch_v19_prep_block
    total = fn(
        P(pl), len(pl), block_type, block_size,
        d8.ctypes.data_as(ctypes.c_void_p), len(d8), cl_ptr,
        K, quad_align,
        P(qs_row), P(qbase_row), P(pctrl_row), P(tq_row), P(lit8_row),
        MAXQ, NG32, RLP,
        ctypes.byref(nq), ctypes.byref(maxrow), ctypes.byref(litrows))
    return int(total), int(nq.value), int(maxrow.value), int(litrows.value)


def v19_prep_block_plan(payload: np.ndarray, block_type: int,
                        block_size: int, qs_row: np.ndarray,
                        qbase_row: np.ndarray, pctrl_row: np.ndarray,
                        tq_row: np.ndarray, lit8_row: np.ndarray,
                        MAXQ: int, NG32: int, RLP: int,
                        plan: np.ndarray, K: int = 2, quad_align: int = 2,
                        dict_buf: np.ndarray | None = None,
                        dict_cl: np.ndarray | None = None,
                        self_ref: bool = False):
    """`v19_prep_block` PLUS the lit8 replay plan (encode-time piece-plan
    hint, SURVEY.md §5): ``plan`` is an (N, 4) i32 array receiving
    {kind, dst, src_or_byte, len} records. Returns (total, nq, maxrow,
    litrows, n_plan, lit_len); total == -16 means plan too small."""
    L = lib()
    if L is None:
        return None
    pl = np.ascontiguousarray(payload, np.uint8)
    d8, cl8, cl_ptr = _as_dict_args(dict_buf, dict_cl)
    nq = ctypes.c_int64(0)
    maxrow = ctypes.c_int64(0)
    litrows = ctypes.c_int64(0)
    n_plan = ctypes.c_int64(0)
    litlen = ctypes.c_int64(0)
    P = lambda a: a.ctypes.data_as(ctypes.c_void_p)  # noqa: E731
    fn = (L.zxch_v26_prep_block_plan if self_ref
          else L.zxch_v19_prep_block_plan)
    total = fn(
        P(pl), len(pl), block_type, block_size,
        d8.ctypes.data_as(ctypes.c_void_p), len(d8), cl_ptr,
        K, quad_align,
        P(qs_row), P(qbase_row), P(pctrl_row), P(tq_row), P(lit8_row),
        MAXQ, NG32, RLP,
        ctypes.byref(nq), ctypes.byref(maxrow), ctypes.byref(litrows),
        P(plan), len(plan), ctypes.byref(n_plan), ctypes.byref(litlen))
    return (int(total), int(nq.value), int(maxrow.value),
            int(litrows.value), int(n_plan.value), int(litlen.value))


def v19_lit8_load(payload: np.ndarray, block_type: int, block_size: int,
                  plan: np.ndarray, n_plan: int, lit_len: int,
                  lit8_row: np.ndarray, RLP: int,
                  dict_buf: np.ndarray | None = None,
                  dict_cl: np.ndarray | None = None):
    """Hint-replay lit8 build: archive literal decode + plan replay —
    skips piece resolution and lane-op packing (those ship verbatim in
    the hint file). Returns litrows >= 0 or a negative ZXC error; None
    when the native library is unavailable."""
    L = lib()
    if L is None:
        return None
    pl = np.ascontiguousarray(payload, np.uint8)
    d8, cl8, cl_ptr = _as_dict_args(dict_buf, dict_cl)
    P = lambda a: a.ctypes.data_as(ctypes.c_void_p)  # noqa: E731
    return int(L.zxch_v19_lit8_load(
        P(pl), len(pl), block_type, block_size,
        d8.ctypes.data_as(ctypes.c_void_p), len(d8), cl_ptr,
        P(plan), n_plan, lit_len, P(lit8_row), RLP))


def v19_lit8_load_batch(src: np.ndarray, pos: np.ndarray, comp: np.ndarray,
                        typ: np.ndarray, i0: int, i1: int, stride: int,
                        block_size: int, plans: np.ndarray,
                        plan_off: np.ndarray, litlen: np.ndarray,
                        lit8_base: np.ndarray, loff: np.ndarray, RLP: int,
                        zrows: np.ndarray | None = None,
                        dict_buf: np.ndarray | None = None,
                        dict_cl: np.ndarray | None = None):
    """Batched hint replay over a worker stripe (blocks i0, i0+stride,
    ... < i1): one FFI call instead of one per block — the decode
    server's prep stream loses its per-block python dispatch term.
    ``loff`` gives each block's row offset within ``lit8_base``; rows
    [litrows, zrows[b]) are zeroed when ``zrows`` is given. Returns 0,
    a negative ZXC error, or None without the native library."""
    L = lib()
    if L is None:
        return None
    d8, cl8, cl_ptr = _as_dict_args(dict_buf, dict_cl)
    P = lambda a: a.ctypes.data_as(ctypes.c_void_p)  # noqa: E731
    return int(L.zxch_v19_lit8_load_batch(
        P(src), P(pos), P(comp), P(typ), i0, i1, stride, block_size,
        d8.ctypes.data_as(ctypes.c_void_p), len(d8), cl_ptr,
        P(plans), P(plan_off), P(litlen), P(lit8_base), P(loff), RLP,
        None if zrows is None else P(zrows)))
