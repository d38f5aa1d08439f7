"""Frame-level one-shot buffer API: the block loop around the block codecs.

Mirrors zxc_compress / zxc_decompress_frame (zxc_dispatch.c:671-1055):
header -> data blocks -> EOF -> optional SEK -> footer, with per-block and
rolling global checksums.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import constants as C
from ..errors import (ZxcError, ERROR_BAD_HEADER, ERROR_CORRUPT_DATA, ERROR_SRC_TOO_SMALL,
                      ERROR_BAD_CHECKSUM, ERROR_DICT_REQUIRED, ERROR_DICT_MISMATCH,
                      ERROR_DICT_TOO_LARGE, ERROR_BAD_BLOCK_SIZE)
from ..format import headers
from ..format.hashes import rapidhash32, global_hash_update
from ..format.dictionary import dict_id as compute_dict_id
from . import block_decode, huffman


@dataclass
class DecodeOpts:
    checksum: bool = False         # verify per-block + global checksums
    dict_content: bytes | None = None
    dict_huf: bytes | None = None  # 128-byte packed shared table
    threads: int = 1               # >1: fork-join native MT block decode


def _dict_state(opts: DecodeOpts | None):
    """Returns (dict_buf, dict_tree, provided_id)."""
    if opts is None or not opts.dict_content:
        return None, None, 0
    dict_buf = np.frombuffer(opts.dict_content, np.uint8)
    tree = None
    if opts.dict_huf is not None:
        tree = huffman.build_tree_packed(bytes(opts.dict_huf))
    did = compute_dict_id(opts.dict_content, opts.dict_huf)
    return dict_buf, tree, did


def iter_blocks(archive: bytes):
    """Yield (pos, BlockHeader) for each data block; stops at EOF.

    ``pos`` is the offset of the 8-byte block header. Raises on corrupt
    headers or missing EOF.
    """
    fh = headers.read_file_header(archive)
    pos = C.FILE_HEADER_SIZE
    while True:
        if pos + C.BLOCK_HEADER_SIZE > len(archive):
            raise ZxcError(ERROR_SRC_TOO_SMALL, "missing EOF block")
        bh = headers.read_block_header(archive, pos)
        if bh.block_type == C.BLOCK_EOF:
            if bh.comp_size != 0:
                raise ZxcError(ERROR_BAD_HEADER, "EOF with non-zero comp_size")
            return
        yield pos, bh
        pos += C.BLOCK_HEADER_SIZE + bh.comp_size + \
            (C.BLOCK_CHECKSUM_SIZE if fh.has_checksum else 0)


def decompress(archive: bytes, opts: DecodeOpts | None = None,
               out=None) -> bytes | int:
    """One-shot frame decode (zxc_decompress equivalent, always bounds-safe).

    ``out``: optional caller-owned writable buffer (bytearray, writable
    memoryview, or 1-D uint8 numpy array). When given, decoded bytes land
    at ``out[0:dsize]`` and the function returns ``dsize`` instead of a
    fresh ``bytes`` object — the reference's caller-owned-dst contract
    (zxc_decompress, include/zxc_buffer.h:98-210). At large sizes a fresh
    result buffer costs ~55-60% of the decode wall in first-touch page
    faults (PERF.md §1); reusing a warm buffer via ``out=`` erases that.
    Raises ERROR_DST_TOO_SMALL when ``out`` is smaller than the decoded
    size (size it with :func:`get_decompressed_size`)."""
    if len(archive) < C.FILE_HEADER_SIZE + C.FILE_FOOTER_SIZE:
        raise ZxcError(ERROR_SRC_TOO_SMALL)
    fh = headers.read_file_header(archive)
    verify = bool(opts and opts.checksum) and fh.has_checksum
    dict_buf, dict_tree, provided_id = _dict_state(opts)
    if fh.dict_id != 0:
        if dict_buf is None:
            raise ZxcError(ERROR_DICT_REQUIRED)
        if provided_id != fh.dict_id:
            raise ZxcError(ERROR_DICT_MISMATCH)

    try:  # fully-native frame loop: one C call per archive (the host
        # decode hot path); the NumPy loop below stays as the oracle
        from .. import runtime
        nat = runtime.decompress_frame(
            archive, fh.block_size, fh.has_checksum, verify, dict_buf,
            None if dict_tree is None else dict_tree.code_len,
            threads=(opts.threads if opts else 1), out=out)
        if nat is not None:
            return nat
    except ImportError:
        pass

    buf = np.frombuffer(archive, np.uint8)
    out_parts: list[np.ndarray] = []
    produced = 0
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
        payload = buf[payload_off:payload_off + bh.comp_size]
        stored = None
        if fh.has_checksum:
            stored = int(buf[payload_off + bh.comp_size:
                             payload_off + bh.comp_size + 4].view("<u4")[0])
            if verify:
                global_hash = global_hash_update(global_hash, stored)
        blk = block_decode.decode_block(bh.block_type, payload, fh.block_size,
                                        dict_buf, dict_tree,
                                        verify_checksum=verify, stored_checksum=stored)
        out_parts.append(blk)
        produced += len(blk)
        pos = payload_off + bh.comp_size + tail
    if not saw_eof:
        raise ZxcError(ERROR_SRC_TOO_SMALL, "missing EOF block")

    stored_size, stored_hash = headers.read_file_footer(archive)
    if stored_size != produced:
        raise ZxcError(ERROR_CORRUPT_DATA, "footer size mismatch")
    if verify and stored_hash != global_hash:
        raise ZxcError(ERROR_BAD_CHECKSUM, "global hash mismatch")
    if out is not None:  # caller-owned destination (oracle path)
        from ..errors import ERROR_DST_TOO_SMALL
        dst = np.frombuffer(out, np.uint8) if not isinstance(
            out, np.ndarray) else out
        if dst.nbytes < produced:
            raise ZxcError(ERROR_DST_TOO_SMALL,
                           f"out= holds {dst.nbytes} bytes, need {produced}")
        w = 0
        for part in out_parts:
            dst[w:w + len(part)] = part
            w += len(part)
        return produced
    if not out_parts:
        return b""
    return np.concatenate(out_parts).tobytes()


DECOMPRESS_TAIL_PAD = 32


def _inplace_margin(dsize: int, block_size: int, has_checksum: bool) -> int:
    """One block + per-block overhead + trailing structures + wild-copy
    pad (reference: zxc_inplace_margin, zxc_dispatch.c:1045)."""
    nblocks = (dsize + block_size - 1) // block_size if block_size else 0
    per_block = C.BLOCK_HEADER_SIZE + (C.BLOCK_CHECKSUM_SIZE
                                       if has_checksum else 0)
    trailing = (C.BLOCK_HEADER_SIZE
                + (C.BLOCK_HEADER_SIZE + nblocks * C.SEEK_ENTRY_SIZE)
                + C.FILE_FOOTER_SIZE)
    return block_size + nblocks * per_block + trailing + DECOMPRESS_TAIL_PAD


def decompress_inplace_bound(archive: bytes) -> int:
    """Minimum single-buffer size for an in-place decode; 0 when invalid
    (zxc_decompress_inplace_bound parity)."""
    try:
        fh = headers.read_file_header(archive)
        dsize, _ = headers.read_file_footer(archive)
    except ZxcError:
        return 0
    return dsize + _inplace_margin(dsize, fh.block_size, fh.has_checksum)


def decompress_inplace(buffer: bytearray, comp_size: int,
                       opts: DecodeOpts | None = None) -> int:
    """Decode an archive sitting flush-right in ``buffer`` into
    ``buffer[0:dsize]``; returns dsize (zxc_decompress_inplace parity,
    zxc_dispatch.c:1104-1165 — single caller-owned allocation; the margin
    validated here keeps the write cursor >= 32 bytes behind the archive
    read cursor at every block, so native decode runs truly in place)."""
    if comp_size < C.FILE_HEADER_SIZE + C.FILE_FOOTER_SIZE or \
            comp_size > len(buffer):
        raise ZxcError(ERROR_SRC_TOO_SMALL)
    hdr = bytes(buffer[len(buffer) - comp_size:
                       len(buffer) - comp_size + C.FILE_HEADER_SIZE])
    foot = bytes(buffer[len(buffer) - C.FILE_FOOTER_SIZE:])
    fh = headers.read_file_header(hdr)
    dsize, _ = struct_unpack_footer(foot)
    margin = _inplace_margin(dsize, fh.block_size, fh.has_checksum)
    from ..errors import ERROR_DST_TOO_SMALL
    if dsize > len(buffer) or len(buffer) - dsize < margin:
        raise ZxcError(ERROR_DST_TOO_SMALL, "missing in-place margin")
    verify = bool(opts and opts.checksum) and fh.has_checksum
    dict_buf, dict_tree, provided_id = _dict_state(opts)
    if fh.dict_id != 0:
        if dict_buf is None:
            raise ZxcError(ERROR_DICT_REQUIRED)
        if provided_id != fh.dict_id:
            raise ZxcError(ERROR_DICT_MISMATCH)
    try:  # true in-place: native decoder writes directly into `buffer`
        from .. import runtime
        w = runtime.decompress_frame_into(
            buffer, comp_size, fh.block_size, fh.has_checksum, verify,
            dict_buf, None if dict_tree is None else dict_tree.code_len)
        if w is not None:
            return w
    except ImportError:
        pass
    # pure-Python fallback: decode out of place, copy back (oracle path)
    out = decompress(bytes(buffer[len(buffer) - comp_size:]), opts)
    buffer[:len(out)] = out
    return len(out)


def struct_unpack_footer(foot: bytes) -> tuple[int, int]:
    import struct
    return struct.unpack("<QI", foot)


def get_decompressed_size(archive: bytes) -> int:
    """Footer-derived size with plausibility checks (zxc_get_decompressed_size)."""
    headers.read_file_header(archive)
    size, _ = headers.read_file_footer(archive)
    return size


def get_dict_id(archive: bytes) -> int:
    return headers.read_file_header(archive).dict_id


@dataclass
class EncodeOpts:
    level: int = C.LEVEL_DEFAULT
    block_size: int = C.BLOCK_SIZE_DEFAULT
    checksum: bool = False
    seekable: bool = False
    dict_content: bytes | None = None
    dict_huf: bytes | None = None
    threads: int = 1               # >1: native MT per-block fan-out


def compress(data: bytes, opts: EncodeOpts | None = None) -> bytes:
    """One-shot frame encode (zxc_compress equivalent, zxc_dispatch.c:671)."""
    from . import block_encode

    opts = opts or EncodeOpts()
    level = max(C.LEVEL_MIN, min(C.LEVEL_MAX, opts.level or C.LEVEL_DEFAULT))
    block_size = opts.block_size or C.BLOCK_SIZE_DEFAULT
    if block_size != 1 << C.block_size_code(block_size):
        raise ZxcError(ERROR_BAD_BLOCK_SIZE)
    dict_state = None
    dict_id = 0
    if opts.dict_content:
        if len(opts.dict_content) > C.DICT_SIZE_MAX:
            raise ZxcError(ERROR_DICT_TOO_LARGE)
        dict_state = block_encode.DictState(
            np.frombuffer(opts.dict_content, np.uint8), opts.dict_huf)
        dict_id = compute_dict_id(opts.dict_content, opts.dict_huf)

    arr = np.frombuffer(data, np.uint8)
    # fully-native frame loop at EVERY level (byte-identical;
    # zxch_compress_frame — levels 6-7 route through the native DP
    # optimal parse + Huffman auction since round 3); a dictionary rides
    # along as the parse window prefix + the shared-table literal
    # candidate. The Python block loop below is the oracle/fallback.
    from .. import runtime
    from . import block_encode
    params = block_encode.level_params(level)
    nat = runtime.compress_frame(
        arr, level, params.n_candidates, params.lazy,
        params.sufficient_len, params.step_base, params.step_shift,
        params.cover_base, block_size, C.block_size_code(block_size),
        opts.checksum, opts.seekable, params.min_emit,
        dict_buf=None if dict_state is None else dict_state.content,
        dict_cl=None if dict_state is None or dict_state.tree is None
        else dict_state.tree.code_len,
        dict_id=dict_id, threads=opts.threads)
    if nat is not None:
        return nat
    out = bytearray()
    out += headers.write_file_header(block_size, opts.checksum, dict_id)
    global_hash = 0
    seek_sizes: list[int] = []
    for pos in range(0, len(arr), block_size):
        chunk = arr[pos:pos + block_size]
        blk = block_encode.encode_chunk(chunk, level, dict_state, opts.checksum)
        if opts.checksum:
            stored = int.from_bytes(blk[-4:], "little")
            global_hash = global_hash_update(global_hash, stored)
        seek_sizes.append(len(blk))
        out += blk
    out += headers.write_block_header(C.BLOCK_EOF, 0)
    if opts.seekable and seek_sizes:
        out += headers.write_seek_table(seek_sizes)
    out += headers.write_file_footer(len(data), global_hash, opts.checksum)
    return bytes(out)
