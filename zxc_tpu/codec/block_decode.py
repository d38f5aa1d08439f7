"""GLO / GHI / RAW block decoding, formulated as a parallel pipeline.

Instead of the reference's serial per-sequence copy loop
(zxc_decompress.c:680-1467), decoding is three vectorized phases — the same
shape the TPU kernels in :mod:`zxc_tpu.ops` use:

1. **Section parse**: token/offset streams to (ll, ml, off) arrays; extras
   varints resolved by pointer-doubling over the self-delimiting chain.
2. **Prefix sums**: exclusive cumsums of ll and ll+ml give every sequence's
   literal-source and output positions; all offset/bounds validation happens
   here as whole-array predicates (the reference's SAFE->FAST threshold
   loops collapse into one vectorized check).
3. **Resolution**: literals scatter directly; match positions get a pointer
   ``p - off`` with self-overlap collapsed analytically (off < ml runs jump
   straight out of their own match), then log-doubling root-finding until
   every position lands on a literal.
"""
from __future__ import annotations

import numpy as np

from .. import constants as C
from ..errors import (ZxcError, ERROR_CORRUPT_DATA, ERROR_BAD_OFFSET, ERROR_OVERFLOW,
                      ERROR_BAD_HEADER, ERROR_DICT_REQUIRED, ERROR_BAD_CHECKSUM,
                      ERROR_BAD_BLOCK_TYPE)
from ..format import headers
from ..format.varint import varint_decode_array
from ..format.hashes import rapidhash32
from . import huffman


# ---------------------------------------------------------------------------
# RLE literal section (enc_lit=1)
# ---------------------------------------------------------------------------

def decode_rle_literals(stream: np.ndarray, required_size: int) -> np.ndarray:
    """Tokenized RLE: raw-copy tokens (high bit clear, len = tok+1, bytes
    follow) and run tokens (high bit set, len = (tok&0x7F)+4, one fill byte).

    Token starts are recovered with the same jump-table doubling used for
    varints; output is a single gather. (reference: zxc_decompress.c:757-816)
    """
    n = len(stream)
    if required_size == 0:
        return np.zeros(0, np.uint8)
    if n == 0:
        raise ZxcError(ERROR_CORRUPT_DATA, "empty RLE stream")
    try:  # native serial decode when the host runtime is built
        from .. import runtime
        out = runtime.rle_decode(stream, required_size)
        if out is not None:
            return out
    except ImportError:
        pass
    b = stream.astype(np.int64)
    is_run = (b & C.LIT_RLE_FLAG) != 0
    consumed = np.where(is_run, 2, b + 2)          # token byte + payload
    out_len = np.where(is_run, (b & C.LIT_LEN_MASK) + 4, b + 1)

    # mark token starts: chain from 0 via jump table, doubling
    jt = np.minimum(np.arange(n, dtype=np.int64) + consumed, n)
    jt = np.concatenate([jt, [n]])
    mark = np.zeros(n + 1, bool)
    mark[0] = True
    covered = 1
    while covered < n:
        idx = np.nonzero(mark[:n])[0]
        mark[jt[idx]] = True
        jt = jt[jt]
        covered *= 2
    starts = np.nonzero(mark[:n])[0]

    # cumulative output; find the cut where the writer stops (w_ptr == w_end)
    t_out = out_len[starts]
    cum = np.cumsum(t_out)
    fit = np.searchsorted(cum, required_size, side="left")
    if fit >= len(starts) or cum[fit] != required_size:
        # either stream exhausted early, or a token overshoots w_end
        raise ZxcError(ERROR_CORRUPT_DATA, "RLE output size mismatch")
    starts = starts[:fit + 1]
    t_out = t_out[:fit + 1]
    t_run = is_run[starts]
    t_consumed = consumed[starts]
    # source bounds: every consumed token must fit the stream
    if int(starts[-1] + t_consumed[-1]) > n or ((starts + t_consumed) > n).any():
        raise ZxcError(ERROR_CORRUPT_DATA, "RLE token out of bounds")

    out_start = np.cumsum(t_out) - t_out
    tok_of = np.repeat(np.arange(len(starts), dtype=np.int64), t_out)
    pos_in_tok = np.arange(required_size, dtype=np.int64) - out_start[tok_of]
    src = starts[tok_of] + 1 + np.where(t_run[tok_of], 0, pos_in_tok)
    return stream[src]


# ---------------------------------------------------------------------------
# Shared sequence expansion (phase 2 + 3)
# ---------------------------------------------------------------------------

def expand_sequences(ll: np.ndarray, ml: np.ndarray, off: np.ndarray,
                     literals: np.ndarray, dst_capacity: int,
                     dict_buf: np.ndarray | None = None) -> np.ndarray:
    """Resolve LZ sequences into output bytes.

    ``ll``/``ml``/``off`` are int64 arrays of equal length (ml already
    includes MIN_MATCH; off already unbiased). Trailing literals (stream
    bytes beyond the sum of ll) are appended after the last sequence.
    """
    ll = ll.astype(np.int64)
    ml = ml.astype(np.int64)
    off = off.astype(np.int64)
    n_lit = len(literals)
    dict_size = 0 if dict_buf is None else len(dict_buf)

    try:  # native serial expansion when the host runtime is built; the
        # vectorized path below stays as the TPU-shaped reference oracle
        from .. import runtime
        if runtime.available():
            out = runtime.expand(ll, ml, off, literals, dst_capacity, dict_buf)
            if out is not None:
                return out
    except ImportError:
        pass

    lit_used = int(ll.sum())
    if lit_used > n_lit:
        raise ZxcError(ERROR_OVERFLOW, "literal stream exhausted")
    trailing = n_lit - lit_used
    seq_out = ll + ml
    out_start = np.cumsum(seq_out) - seq_out          # exclusive
    match_start = out_start + ll
    total = int(seq_out.sum()) + trailing
    if total > dst_capacity:
        raise ZxcError(ERROR_OVERFLOW, "decoded size exceeds capacity")
    if (off > match_start + dict_size).any():
        raise ZxcError(ERROR_BAD_OFFSET)
    if len(ll) == 0:
        return literals.copy()

    # Positions: [dict | output]; work in shifted coordinates q = dict_size + p.
    D = dict_size
    Q = D + total
    # pointer array: identity for dict+literal positions, back-pointer for
    # match positions with self-overlap collapsed.
    ptr = np.arange(Q, dtype=np.int64)
    base = np.zeros(Q, np.uint8)
    if D:
        base[:D] = dict_buf

    # literal positions: for each sequence i, out [out_start, +ll) takes
    # literals [cum_ll, +ll); trailing literals at the end.
    cum_ll = np.cumsum(ll) - ll
    # segment ids over output positions: 2 segments per sequence (lit, match)
    seg_lens = np.empty(2 * len(ll), np.int64)
    seg_lens[0::2] = ll
    seg_lens[1::2] = ml
    seg_id = np.repeat(np.arange(2 * len(ll), dtype=np.int64), seg_lens)
    pos = np.arange(total - trailing, dtype=np.int64)
    seq_id = seg_id >> 1
    is_match = (seg_id & 1).astype(bool)
    seg_start = np.empty(2 * len(ll), np.int64)
    seg_start[0::2] = out_start
    seg_start[1::2] = match_start
    rel = pos - seg_start[seg_id]

    # literals scatter (vectorized: positions where ~is_match take
    # consecutive literal bytes in order)
    lit_pos = pos[~is_match]
    base[D + lit_pos] = literals[cum_ll[seq_id[~is_match]] + rel[~is_match]]
    if trailing:
        base[D + total - trailing:] = literals[lit_used:]

    # match pointers with self-overlap collapse
    m_pos = pos[is_match]
    m_off = off[seq_id[is_match]]
    m_rel = rel[is_match]
    # within-match self reference: p - off >= match_start  <=>  rel >= off
    collapsed = np.where(m_rel >= m_off, m_rel % m_off, m_rel) - m_off
    ptr[D + m_pos] = D + match_start[seq_id[is_match]] + collapsed

    # root finding by pointer doubling (identity at non-match positions)
    is_src = np.ones(Q, bool)
    is_src[D + m_pos] = False
    root = ptr
    while True:
        unresolved = ~is_src[root]
        if not unresolved.any():
            break
        root = np.where(unresolved, root[root], root)
        # progress guarantee: collapsed pointers strictly decrease, so this
        # terminates in <= log2(chain depth) iterations
    out = base[root]
    if D:
        out[:D] = base[:D]
        return out[D:]
    return out


# ---------------------------------------------------------------------------
# GLO / GHI block decode
# ---------------------------------------------------------------------------

def _resolve_extras(mask_a: np.ndarray, mask_b: np.ndarray,
                    extras: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Resolve interleaved per-sequence (a=LL, b=ML) varint extensions."""
    n_var = int(mask_a.sum()) + int(mask_b.sum())
    if n_var == 0:
        z = np.zeros(len(mask_a), np.int64)
        return z, z.copy()
    vals, ok = varint_decode_array(extras, n_var)
    if not ok:
        raise ZxcError(ERROR_CORRUPT_DATA, "extras varint chain")
    both = mask_a.astype(np.int64) + mask_b.astype(np.int64)
    before = np.cumsum(both) - both
    a = np.zeros(len(mask_a), np.int64)
    b = np.zeros(len(mask_a), np.int64)
    a[mask_a] = vals.astype(np.int64)[before[mask_a]]
    b[mask_b] = vals.astype(np.int64)[(before + mask_a)[mask_b]]
    return a, b


from dataclasses import dataclass


@dataclass
class DeferredSection:
    """An entropy-coded literal section kept as wire bytes for DEVICE
    decode (ops/pivco_device.py): H2D ships the compressed run bytes
    instead of the expanded symbols. ``payload`` excludes the 128-byte
    lengths header (the tree is host-built either way — it is per-section
    metadata, not bulk)."""
    payload: np.ndarray   # u8 node-run bytes
    n: int                # symbol count
    tree: object          # huffman.PivcoTree

    def __len__(self):    # lets size bookkeeping treat it like the array
        return self.n

    def decode(self) -> np.ndarray:
        return huffman.decode_payload(self.payload, self.n, self.tree)


def _decode_literal_section(enc_lit: int, stream: np.ndarray, required_size: int,
                            dst_capacity: int, dict_tree,
                            defer_entropy: bool = False) -> np.ndarray:
    if enc_lit == C.ENC_RAW:
        return stream
    if required_size > dst_capacity:
        raise ZxcError(ERROR_CORRUPT_DATA, "literal section larger than block")
    if enc_lit == C.ENC_RLE:
        if required_size == 0:
            return np.zeros(0, np.uint8)
        return decode_rle_literals(stream, required_size)
    if enc_lit == C.ENC_HUFFMAN:
        if required_size == 0:
            return np.zeros(0, np.uint8)
        if defer_entropy:
            if len(stream) < C.HUF_TABLE_SIZE:
                raise ZxcError(ERROR_CORRUPT_DATA,
                               "section smaller than lengths header")
            tree = huffman.build_tree_packed(
                bytes(stream[:C.HUF_TABLE_SIZE]))
            return DeferredSection(stream[C.HUF_TABLE_SIZE:],
                                   required_size, tree)
        return huffman.decode_section(stream, required_size)
    if enc_lit == C.ENC_HUFFMAN_DICT:
        if dict_tree is None:
            raise ZxcError(ERROR_DICT_REQUIRED, "enc_lit=3 without dictionary table")
        if required_size == 0:
            return np.zeros(0, np.uint8)
        if defer_entropy:
            return DeferredSection(stream, required_size, dict_tree)
        return huffman.decode_payload(stream, required_size, dict_tree)
    raise ZxcError(ERROR_CORRUPT_DATA, f"bad enc_lit {enc_lit}")


def parse_block_glo(payload: np.ndarray, dst_capacity: int,
                    dict_tree=None, defer_entropy: bool = False
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Phase 1 only: GLO payload -> (ll, ml, off, literals) int64/uint8 arrays.

    Shared by the host expander below and the device batch planner
    (:mod:`zxc_tpu.ops.batch`), which ships these arrays to the TPU.
    """
    gh, descs = headers.read_gnr_header(payload.tobytes()[:C.GNR_HEADER_SIZE +
                                                          C.GLO_SECTIONS * 8], C.GLO_SECTIONS)
    p = C.GNR_HEADER_SIZE + C.GLO_SECTIONS * C.SECTION_DESC_SIZE
    sz_lit, raw_lit = descs[0]
    sz_tok, _ = descs[1]
    sz_off, _ = descs[2]
    sz_ext, _ = descs[3]
    if p + sz_lit + sz_tok + sz_off + sz_ext != len(payload):
        raise ZxcError(ERROR_CORRUPT_DATA, "GLO sections do not tile payload")
    lit_stream = payload[p:p + sz_lit]
    p += sz_lit
    tok_stream = payload[p:p + sz_tok]
    p += sz_tok
    off_stream = payload[p:p + sz_off]
    p += sz_off
    extras = payload[p:p + sz_ext]

    literals = _decode_literal_section(gh.enc_lit, lit_stream, raw_lit,
                                       dst_capacity, dict_tree,
                                       defer_entropy)

    n_seq = gh.n_sequences
    expected_off = n_seq if gh.enc_off == 1 else 2 * n_seq
    if sz_off < expected_off:
        raise ZxcError(ERROR_CORRUPT_DATA, "offsets section too small")

    if gh.enc_litlen == C.ENC_HUFFMAN:
        tokens = huffman.decode_section(tok_stream, n_seq) if n_seq else np.zeros(0, np.uint8)
    elif gh.enc_litlen == C.ENC_RAW:
        if sz_tok < n_seq:
            raise ZxcError(ERROR_CORRUPT_DATA, "token section too small")
        tokens = tok_stream[:n_seq]
    else:
        raise ZxcError(ERROR_CORRUPT_DATA, f"bad enc_litlen {gh.enc_litlen}")

    ll = (tokens >> C.TOKEN_LIT_BITS).astype(np.int64)
    mlf = (tokens & C.TOKEN_ML_MASK).astype(np.int64)
    if gh.enc_off == 1:
        off = off_stream[:n_seq].astype(np.int64) + C.OFFSET_BIAS
    else:
        off = off_stream[:2 * n_seq].view("<u2").astype(np.int64) + C.OFFSET_BIAS
    ext_ll, ext_ml = _resolve_extras(ll == C.TOKEN_LL_MASK, mlf == C.TOKEN_ML_MASK, extras)
    ll = ll + ext_ll
    ml = mlf + ext_ml + C.MIN_MATCH
    return ll, ml, off, literals


def decode_block_glo(payload: np.ndarray, dst_capacity: int,
                     dict_buf: np.ndarray | None = None,
                     dict_tree=None) -> np.ndarray:
    ll, ml, off, literals = parse_block_glo(payload, dst_capacity, dict_tree)
    return expand_sequences(ll, ml, off, literals, dst_capacity, dict_buf)


def parse_block_ghi(payload: np.ndarray, dst_capacity: int
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Phase 1 only: GHI payload -> (ll, ml, off, literals)."""
    gh, descs = headers.read_gnr_header(payload.tobytes()[:C.GNR_HEADER_SIZE +
                                                          C.GHI_SECTIONS * 8], C.GHI_SECTIONS)
    p = C.GNR_HEADER_SIZE + C.GHI_SECTIONS * C.SECTION_DESC_SIZE
    sz_lit, _ = descs[0]
    sz_seq, _ = descs[1]
    sz_ext, _ = descs[2]
    if p + sz_lit + sz_seq + sz_ext != len(payload):
        raise ZxcError(ERROR_CORRUPT_DATA, "GHI sections do not tile payload")
    literals = payload[p:p + sz_lit]
    p += sz_lit
    seq_stream = payload[p:p + sz_seq]
    p += sz_seq
    extras = payload[p:p + sz_ext]

    n_seq = gh.n_sequences
    if sz_seq < 4 * n_seq:
        raise ZxcError(ERROR_CORRUPT_DATA, "sequence section too small")
    words = seq_stream[:4 * n_seq].view("<u4").astype(np.int64)
    ll = words >> 24
    mlf = (words >> 16) & 0xFF
    off = (words & 0xFFFF) + C.OFFSET_BIAS
    ext_ll, ext_ml = _resolve_extras(ll == C.SEQ_LL_MASK, mlf == C.SEQ_ML_MASK, extras)
    ll = ll + ext_ll
    ml = mlf + ext_ml + C.MIN_MATCH
    return ll, ml, off, literals


def decode_block_ghi(payload: np.ndarray, dst_capacity: int,
                     dict_buf: np.ndarray | None = None) -> np.ndarray:
    ll, ml, off, literals = parse_block_ghi(payload, dst_capacity)
    return expand_sequences(ll, ml, off, literals, dst_capacity, dict_buf)


def parse_block(block_type: int, payload: np.ndarray, dst_capacity: int,
                dict_tree=None, defer_entropy: bool = False
                ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Uniform phase-1 parse for any data block type.

    RAW blocks become the degenerate (no sequences, all-literal) case, so the
    device expansion kernel handles mixed-type batches uniformly. With
    ``defer_entropy``, PivCo literal sections come back as
    :class:`DeferredSection` for device-side decode.
    """
    if block_type == C.BLOCK_RAW:
        if len(payload) > dst_capacity:
            raise ZxcError(ERROR_OVERFLOW, "RAW block exceeds capacity")
        z = np.zeros(0, np.int64)
        return z, z.copy(), z.copy(), payload
    if block_type == C.BLOCK_GLO:
        return parse_block_glo(payload, dst_capacity, dict_tree,
                               defer_entropy)
    if block_type == C.BLOCK_GHI:
        return parse_block_ghi(payload, dst_capacity)
    raise ZxcError(ERROR_BAD_BLOCK_TYPE, f"type {block_type}")


def decode_block(block_type: int, payload: np.ndarray, dst_capacity: int,
                 dict_buf: np.ndarray | None = None, dict_tree=None,
                 verify_checksum: bool = False,
                 stored_checksum: int | None = None) -> np.ndarray:
    """Chunk-wrapper equivalent (zxc_decompress.c:1495): checksum check +
    dispatch on block type."""
    if verify_checksum and stored_checksum is not None:
        if rapidhash32(payload.tobytes()) != stored_checksum:
            raise ZxcError(ERROR_BAD_CHECKSUM, "block payload checksum")
    try:  # fused native block decode (one C call); NumPy path = oracle
        from .. import runtime
        out = runtime.decode_block(
            block_type, payload, dst_capacity, dict_buf,
            None if dict_tree is None else dict_tree.code_len)
        if out is not None:
            return out
    except ImportError:
        pass
    if block_type == C.BLOCK_RAW:
        if len(payload) > dst_capacity:
            raise ZxcError(ERROR_OVERFLOW, "RAW block exceeds capacity")
        return payload
    if block_type == C.BLOCK_GLO:
        return decode_block_glo(payload, dst_capacity, dict_buf, dict_tree)
    if block_type == C.BLOCK_GHI:
        return decode_block_ghi(payload, dst_capacity, dict_buf)
    raise ZxcError(ERROR_BAD_BLOCK_TYPE, f"type {block_type}")
