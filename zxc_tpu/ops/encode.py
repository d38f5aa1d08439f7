"""Device-side (XLA) match finding + parse for the encoder.

SURVEY.md §7 step 6's TPU formulation, executed on device: per-position
5-byte hashes, candidate lists from one stable sort (the vectorized
equivalent of hash-chain walking — reference zxc_lz77_find_best_match,
zxc_compress.c:193-560), data-parallel word-compare extension rounds,
lazy selection + greedy tiling as a pointer-doubling jump table.

Everything runs under jit with uint32 arithmetic (x64 stays off); the
byte-emission back half stays on host (`codec/block_encode` emitters),
fed with the device-chosen sequences.  Archives produced this way are
valid (bit-exact roundtrip, reference-decodable) but not byte-identical
to the host matcher's — BASELINE.json requires roundtrip + size, not
archive equality.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .. import constants as C

_M1 = np.uint32(0x9E3779B1)
_M2 = np.uint32(0x85EBCA77)
_HASH_BITS = 17


def _le32(d: jnp.ndarray) -> jnp.ndarray:
    """u32 little-endian word starting at every position (4-byte pad req)."""
    n = d.shape[0] - 4
    u = d.astype(jnp.uint32)
    return (u[:n] | (u[1:n + 1] << 8) | (u[2:n + 2] << 16)
            | (u[3:n + 3] << 24))


def _run_lengths(d: jnp.ndarray) -> jnp.ndarray:
    """run[p] = consecutive bytes equal to d[p] starting at p."""
    n = d.shape[0]
    change = jnp.concatenate([d[:-1] != d[1:], jnp.ones(1, bool)])
    pos = jnp.where(change, jnp.arange(n), n - 1)
    nxt = lax.cummin(pos[::-1])[::-1]
    return nxt - jnp.arange(n) + 1


@functools.partial(jax.jit, static_argnames=("n_candidates",))
def find_matches_device(data: jnp.ndarray, n_candidates: int
                        ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Best (len, off) per position of a u8 block; lens==0 means no match.

    Mirrors the host `codec.block_encode.find_matches` semantics
    (offset-1 run analytics + k-back sorted-hash candidates) entirely in
    XLA ops: one stable sort replaces the hash chains, and extension is
    4-byte compare rounds under a single while_loop.
    """
    n = data.shape[0]
    lens = jnp.zeros(n, jnp.int32)
    offs = jnp.ones(n, jnp.int32)
    if n < C.MIN_MATCH + 1:
        return lens, offs
    pad = jnp.concatenate([data, jnp.zeros(4, jnp.uint8)])
    w32 = _le32(pad)                      # word at p, p <= n-... (len n)
    run = _run_lengths(data)

    # offset-1 run matches (analytic: no iteration on deep runs)
    prev_same = jnp.concatenate([jnp.zeros(1, bool), data[1:] == data[:-1]])
    run_match = prev_same & (run >= C.MIN_MATCH)
    lens = jnp.where(run_match, run.astype(jnp.int32), lens)
    in_run = prev_same & (run >= 64)      # skip hash search inside deep runs

    nh = n - (C.MIN_MATCH - 1)
    lo = w32[:nh]
    b5 = data[C.MIN_MATCH - 1:C.MIN_MATCH - 1 + nh].astype(jnp.uint32)
    h = ((lo * _M1) ^ (b5 * _M2)) >> np.uint32(32 - _HASH_BITS)

    order = jnp.argsort(h, stable=True)   # hash groups, position-ascending
    hs = h[order]
    rank = jnp.zeros(nh, jnp.int32).at[order].set(
        jnp.arange(nh, dtype=jnp.int32))

    best_len = jnp.zeros(nh, jnp.int32)
    best_off = jnp.zeros(nh, jnp.int32)
    p_arr = jnp.arange(nh)
    searchable = ~in_run[:nh]
    for k in range(1, n_candidates + 1):
        cr = rank - k
        valid = (cr >= 0) & searchable
        cri = jnp.maximum(cr, 0)
        cand = order[cri]
        ok = valid & (hs[cri] == hs[rank])
        dist = p_arr - cand
        ok &= (dist >= 1) & (dist <= C.WINDOW_SIZE)
        # confirm real 5-byte equality (hash collisions)
        ok &= (lo[jnp.minimum(cand, nh - 1)] == lo) & \
              (b5[jnp.minimum(cand, nh - 1)] == b5)

        # extension: all pairs advance in 4-byte rounds together
        c_s = jnp.where(ok, cand, 0)
        max_len = n - p_arr
        def ext_cond(st):
            m, active = st
            return jnp.any(active)
        def ext_body(st):
            m, active = st
            can4 = (m + 4 <= max_len) & active
            eq4 = w32[jnp.minimum(c_s + m, n - 1)] == \
                  w32[jnp.minimum(p_arr + m, n - 1)]
            adv = can4 & eq4
            m = jnp.where(adv, m + 4, m)
            return m, adv
        m0 = jnp.where(ok, 4, 0)          # first 4 bytes known equal
        m, _ = lax.while_loop(ext_cond, ext_body,
                              (m0, ok & (max_len >= 8)))
        # byte tail (up to 3 bytes, plus bounds clamp)
        for _ in range(3):
            more = ok & (m < max_len) & \
                (pad[jnp.minimum(c_s + m, n)] == pad[jnp.minimum(p_arr + m, n)])
            m = jnp.where(more, m + 1, m)
        m = jnp.minimum(m, max_len).astype(jnp.int32)
        better = ok & (m > best_len)
        best_len = jnp.where(better, m, best_len)
        best_off = jnp.where(better, dist.astype(jnp.int32), best_off)

    use = (best_len >= C.MIN_MATCH) & (best_len > lens[:nh])
    lens = lens.at[:nh].set(jnp.where(use, best_len, lens[:nh]))
    offs = offs.at[:nh].set(jnp.where(use, best_off, offs[:nh]))
    return lens, offs


def _lcp_pre(data: jnp.ndarray, K: int):
    """Per-block candidate generation + kernel-input packing (pure XLA,
    vmappable). Returns (lens0, pbase, ctl, blk8_rows, oks, cands)."""
    from . import pallas_encode as PE

    n = data.shape[0]
    lens = jnp.zeros(n, jnp.int32)
    pad = jnp.concatenate([data, jnp.zeros(4, jnp.uint8)])
    w32 = _le32(pad)
    run = _run_lengths(data)
    prev_same = jnp.concatenate([jnp.zeros(1, bool), data[1:] == data[:-1]])
    run_match = prev_same & (run >= C.MIN_MATCH)
    lens = jnp.where(run_match, run.astype(jnp.int32), lens)
    in_run = prev_same & (run >= 64)

    nh = n - (C.MIN_MATCH - 1)
    lo = w32[:nh]
    b5 = data[C.MIN_MATCH - 1:C.MIN_MATCH - 1 + nh].astype(jnp.uint32)
    h = ((lo * _M1) ^ (b5 * _M2)) >> np.uint32(32 - _HASH_BITS)
    order = jnp.argsort(h, stable=True)
    rank = jnp.zeros(nh, jnp.int32).at[order].set(
        jnp.arange(nh, dtype=jnp.int32))
    p_arr = jnp.arange(nh, dtype=jnp.int32)
    searchable = ~in_run[:nh]

    cands = []
    oks = []
    for k in range(1, K + 1):
        cr = rank - k
        valid = (cr >= 0) & searchable
        cri = jnp.maximum(cr, 0)
        cand = order[cri]
        dist = p_arr - cand
        # no hash-group or 5-byte verification: the LCP kernel compares
        # from byte 0, so a collision candidate just scores lcp < 5 and
        # is filtered by the MIN_MATCH gate — three 64K gathers saved
        ok = valid & (dist >= 1) & (dist <= C.WINDOW_SIZE)
        cands.append(jnp.where(ok, cand, jnp.maximum(p_arr - 1, 0)))
        oks.append(ok)

    # pairs, ascending-p with the K candidates of a position adjacent
    pos_f = jnp.repeat(p_arr, K)                       # (nh*K,)
    cand_f = jnp.stack(cands, axis=1).reshape(-1)
    npairs = nh * K
    npad = -(-npairs // 128) * 128
    nt = -(-(npad // 128) // 32)
    fullpad = nt * 32 * 128
    val = (cand_f.astype(jnp.uint32)
           | (pos_f.astype(jnp.uint32) << 16))
    val = jnp.concatenate([
        val, jnp.broadcast_to(val[-1], (fullpad - npairs,))])
    # ctl[t, k%32, 4*qlocal + k//32] = val[Q*128 + k]: a pure transpose
    ctl = val.astype(jnp.int32).reshape(nt, 32, 4, 32).transpose(
        0, 3, 1, 2).reshape(nt, 32, 128)
    nrows = -(-n // 128)
    R = max(nrows + PE.PAD_ROWS, PE.P_WIN)
    p0 = lax.shift_right_logical(val.reshape(-1, 128)[:, 0],
                                 jnp.uint32(16))
    pbase = jnp.minimum(((p0 >> 7) // 16 * 16).astype(jnp.int32),
                        R - PE.P_WIN)
    blk8 = jnp.pad(data, (0, R * 128 - n)).reshape(R, 128)
    return (lens, pbase, ctl, blk8,
            jnp.stack(oks, axis=0), jnp.stack(cands, axis=0))


def _lcp_post(lcp_pairs_flat, lens0, oks, cands, n: int, K: int):
    """Per-block best-of-K merge of kernel LCPs into (lens, offs)."""
    nh = n - (C.MIN_MATCH - 1)
    p_arr = jnp.arange(nh, dtype=jnp.int32)
    max_len = (n - jnp.repeat(p_arr, K)).astype(jnp.int32)
    m2 = jnp.minimum(lcp_pairs_flat[:nh * K], max_len).reshape(nh, K)
    best_len = jnp.zeros(nh, jnp.int32)
    best_off = jnp.zeros(nh, jnp.int32)
    for k in range(K):
        mk = jnp.where(oks[k], m2[:, k], 0)
        better = mk > best_len
        best_len = jnp.where(better, mk, best_len)
        best_off = jnp.where(better, p_arr - cands[k], best_off)
    lens = lens0
    offs = jnp.ones(n, jnp.int32)
    use = (best_len >= C.MIN_MATCH) & (best_len > lens[:nh])
    lens = lens.at[:nh].set(jnp.where(use, best_len, lens[:nh]))
    offs = offs.at[:nh].set(jnp.where(use, best_off, offs[:nh]))
    return lens, offs


@functools.partial(jax.jit, static_argnames=("n_candidates", "interpret"))
def find_matches_device_lcp_batch(blocks: jnp.ndarray, n_candidates: int,
                                  interpret: bool = False
                                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched find_matches_device_lcp over (B, n) same-length blocks —
    ONE jitted program: the candidate generation vmaps, the LCP kernel
    natively takes the batch as its first grid dim."""
    from . import pallas_encode as PE

    B, n = blocks.shape
    assert n <= 65536, "pallas matcher packs positions into 16 bits"
    if n < C.MIN_MATCH + 1:
        return (jnp.zeros((B, n), jnp.int32), jnp.ones((B, n), jnp.int32))
    K = n_candidates
    lens0, pbase, ctl, blk8, oks, cands = jax.vmap(
        lambda d: _lcp_pre(d, K))(blocks)
    nt = ctl.shape[1]
    R = blk8.shape[1]
    kern = PE.lcp_kernel(R, nt, interpret=interpret)
    lcp = kern(pbase, ctl, blk8).reshape(B, -1)
    return jax.vmap(
        lambda l, l0, o, c: _lcp_post(l, l0, o, c, n, K))(
            lcp, lens0, oks, cands)


@functools.partial(jax.jit, static_argnames=("n_candidates", "interpret"))
def find_matches_device_lcp(data: jnp.ndarray, n_candidates: int,
                            interpret: bool = False
                            ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """find_matches_device with the extension done by the Pallas LCP
    kernel (pallas_encode.py) instead of gather-priced compare rounds —
    ~20x on hardware (PERF.md 3.4). Candidate generation (hash sort)
    is unchanged XLA. Match lengths cap at 128*ROUNDS (=256, the host
    finder's sufficient-length stop, zxch_find_matches); offset-1 runs
    stay analytic and uncapped, and capped sequences are extended
    exactly on the host during emission. Blocks must be <= 64 KiB
    (positions pack into 16 bits of the kernel's control word)."""
    lens, offs = find_matches_device_lcp_batch(data[None], n_candidates,
                                               interpret=interpret)
    return lens[0], offs[0]


@functools.partial(jax.jit, static_argnames=("lazy", "min_emit"))
def parse_compact_device(lens: jnp.ndarray, offs: jnp.ndarray, lazy: bool,
                         min_emit: int = 5
                         ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                    jnp.ndarray]:
    """parse_device + on-device compaction of the chosen sequences.

    Returns (n_seq, pos, len, off) with the streams packed into fixed
    (P//5+1)-element buffers — the D2H readback is ~5x smaller than the
    per-position arrays, which matters on links where readback is the
    bottleneck (and never hurts)."""
    keep = parse_device(lens, offs, lazy, min_emit)
    P = lens.shape[0]
    cap = P // C.MIN_MATCH + 1
    idx = jnp.cumsum(keep) - 1
    slot = jnp.where(keep, jnp.minimum(idx, cap - 1), cap - 1)
    dump = cap - 1  # unused tail slot; real data overwrites via .max order
    pos_buf = jnp.zeros(cap, jnp.int32).at[slot].max(
        jnp.where(keep, jnp.arange(P, dtype=jnp.int32), 0))
    len_buf = jnp.zeros(cap, jnp.int32).at[slot].max(
        jnp.where(keep, lens.astype(jnp.int32), 0))
    off_buf = jnp.zeros(cap, jnp.int32).at[slot].max(
        jnp.where(keep, offs.astype(jnp.int32), 0))
    del dump
    n_seq = jnp.sum(keep).astype(jnp.int32)
    return n_seq, pos_buf, len_buf, off_buf


@functools.partial(jax.jit, static_argnames=("lazy", "min_emit",
                                              "interpret"))
def parse_compact_walk(lens: jnp.ndarray, offs: jnp.ndarray, lazy: bool,
                       min_emit: int = 5, interpret: bool = False
                       ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                  jnp.ndarray]:
    """parse_compact_device via the Pallas scalar-walk kernel
    (pallas_encode.parse_walk_kernel): the serial cursor walk runs as a
    sub-ms SMEM loop instead of log2(P) jump-table doubling rounds of
    64K-element gathers. Identical results."""
    from . import pallas_encode as PE

    P = lens.shape[0]
    cap = P // C.MIN_MATCH + 1
    good = lens >= max(C.MIN_MATCH, min_emit)
    if lazy and P > 1:
        nxt_len = jnp.concatenate([lens[1:], jnp.zeros(1, lens.dtype)])
        nxt_good = jnp.concatenate([good[1:], jnp.zeros(1, bool)])
        defer = good & nxt_good & (nxt_len > lens)
        emit = good & ~defer
    else:
        emit = good
    step = jnp.where(emit, lens, 1).astype(jnp.int32)
    nseq, pos_raw = PE.parse_walk_kernel(P, cap, interpret=interpret)(step)
    n_seq = nseq[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    msk = idx < n_seq
    pos_b = jnp.where(msk, jnp.clip(pos_raw, 0, P - 1), 0)
    len_b = jnp.where(msk, lens[pos_b].astype(jnp.int32), 0)
    off_b = jnp.where(msk, offs[pos_b].astype(jnp.int32), 0)
    pos_b = jnp.where(msk, pos_b, 0)
    return n_seq, pos_b, len_b, off_b


@functools.partial(jax.jit, static_argnames=("lazy", "min_emit"))
def parse_device(lens: jnp.ndarray, offs: jnp.ndarray, lazy: bool,
                 min_emit: int = 5) -> jnp.ndarray:
    """Greedy/lazy tiling of the block: True where a kept match starts.

    The serial cursor walk becomes a jump table squared log2(P) times
    (pointer doubling) — identical result to the host parse_sequences.
    """
    P = lens.shape[0]
    good = lens >= max(C.MIN_MATCH, min_emit)
    if lazy and P > 1:
        nxt_len = jnp.concatenate([lens[1:], jnp.zeros(1, lens.dtype)])
        nxt_good = jnp.concatenate([good[1:], jnp.zeros(1, bool)])
        defer = good & nxt_good & (nxt_len > lens)
        emit = good & ~defer
    else:
        emit = good
    step = jnp.where(emit, lens, 1)
    jt = jnp.minimum(jnp.arange(P) + step, P)
    jt = jnp.concatenate([jt, jnp.array([P])])
    mark = jnp.zeros(P + 1, bool).at[0].set(True)
    rounds = max(1, int(np.ceil(np.log2(max(P, 2)))) + 1)
    for _ in range(rounds):
        mark = mark.at[jt[:P]].max(mark[:P])
        jt = jt[jt]
    return mark[:P] & emit


def _extend_capped_host(arr: np.ndarray, pos, lns, off):
    """Host fixup for the LCP matcher's 256-byte cap: sequences sitting
    exactly at the cap are extended by chunked byte compare (exact LZ
    semantics, matching the copy-from-output rule), and following
    sequences swallowed by the extension are dropped (greedy re-tile).
    Runs on the host where the sequences already live for emission;
    O(extension bytes) — capped sequences are rare outside long-match
    corpora, where this recovers the archive size the cap would cost
    (+15% measured on periodic text without it)."""
    from .pallas_encode import ROUNDS
    cap = 128 * ROUNDS
    if not (lns >= cap).any():
        return pos, lns, off
    n = len(arr)
    o_pos, o_len, o_off = [], [], []
    cursor = 0
    for i in range(len(pos)):
        p0, l0, o0 = int(pos[i]), int(lns[i]), int(off[i])
        if p0 < cursor:
            continue
        if l0 >= cap:
            q = p0 + l0
            while q < n:
                span = min(4096, n - q)
                a = arr[q:q + span]
                b = arr[q - o0:q - o0 + span]
                neq = np.flatnonzero(a != b)
                if len(neq):
                    q += int(neq[0])
                    break
                q += span
            l0 = q - p0
        o_pos.append(p0)
        o_len.append(l0)
        o_off.append(o0)
        cursor = p0 + l0
    return (np.asarray(o_pos, np.int64), np.asarray(o_len, np.int64),
            np.asarray(o_off, np.int64))


def encode_chunk_device(data: bytes | np.ndarray, level: int,
                        device=None, checksum: bool = False) -> bytes:
    """Full block encode with match finding + parse on the device.

    Host keeps only byte emission (sections, Huffman, headers).  No
    dictionary support on this path (dict windows stay host-side).
    """
    from ..codec import block_encode

    arr = np.frombuffer(data, np.uint8) if isinstance(data, bytes) else data
    params = block_encode.level_params(level)
    d = jnp.asarray(arr)
    if device is not None:
        d = jax.device_put(d, device)
    # Pallas LCP matcher where its 16-bit control packing allows (<=64K
    # blocks): ~100x the gather-round extension on hardware. Opt out
    # with ZXC_DEVICE_MATCHER=xla (A/B, interpret-mode CI).
    import os
    use_lcp = (len(arr) <= 65536
               and os.environ.get("ZXC_DEVICE_MATCHER", "lcp") == "lcp")
    if use_lcp:
        interp = jax.default_backend() == "cpu"
        lens, offs = find_matches_device_lcp(d, params.n_candidates,
                                             interpret=interp)
    else:
        lens, offs = find_matches_device(d, params.n_candidates)
    if use_lcp and not interp:
        # scalar-walk parse: sub-ms on hardware, but its serial while
        # runs per-iteration in interpret mode — CPU keeps the doubling
        # parse (identical results; parity asserted in tests + on hw)
        n_seq, pos_b, len_b, off_b = parse_compact_walk(
            lens, offs, params.lazy, params.min_emit)
    else:
        n_seq, pos_b, len_b, off_b = parse_compact_device(lens, offs,
                                                          params.lazy,
                                                          params.min_emit)
    k = int(n_seq)
    seqs = (np.asarray(pos_b[:k]).astype(np.int64),
            np.asarray(len_b[:k]).astype(np.int64),
            np.asarray(off_b[:k]).astype(np.int64))
    if use_lcp and k:
        seqs = _extend_capped_host(arr, *seqs)
    return block_encode.encode_chunk(arr, level, None, checksum,
                                     sequences=seqs)


@functools.partial(jax.jit, static_argnames=("n_candidates", "lazy",
                                              "min_emit"))
def _device_encode_batch(blocks: jnp.ndarray, n_candidates: int,
                         lazy: bool, min_emit: int):
    """Matcher + parse for (B, n) blocks as ONE jitted program (hardware
    path): batched LCP matcher, then B scalar-walk parse kernels inlined
    into the same program. Returns stacked (n_seq, pos, len, off)."""
    lens, offs = find_matches_device_lcp_batch(blocks, n_candidates)
    outs = [parse_compact_walk(lens[b], offs[b], lazy, min_emit)
            for b in range(blocks.shape[0])]
    return (jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]),
            jnp.stack([o[2] for o in outs]),
            jnp.stack([o[3] for o in outs]))


def compress_device(data: bytes, level: int = C.LEVEL_DEFAULT,
                    block_size: int = C.BLOCK_SIZE_DEFAULT,
                    device=None, checksum: bool = False) -> bytes:
    """Frame encode with device-side match finding per block.

    On hardware with the LCP matcher, full blocks run in batched
    dispatches (one jitted matcher+parse program per group of up to 16
    blocks — padding repeats the last block so a steady stream pays one
    compile); the tail block and the CPU/interpret path go block-at-a-
    time. Emission and frame plumbing are host-side (byte-twiddling,
    not compute).
    """
    import os
    from ..codec import block_encode
    from ..codec.stream import global_hash_update
    from ..format import headers

    C.block_size_code(block_size)  # validate
    out = bytearray(headers.write_file_header(block_size, checksum))
    global_hash = 0
    n_full = len(data) // block_size
    use_batch = (n_full >= 2 and block_size <= 65536
                 and os.environ.get("ZXC_DEVICE_MATCHER", "lcp") == "lcp"
                 and jax.default_backend() != "cpu")
    blk_bytes: list[bytes] = []
    if use_batch:
        params = block_encode.level_params(level)
        arr_all = np.frombuffer(data[:n_full * block_size], np.uint8)
        blocks = arr_all.reshape(n_full, block_size)
        DB = 16
        for g0 in range(0, n_full, DB):
            grp = blocks[g0:g0 + DB]
            pad = DB - len(grp) if n_full > DB else 0
            gb = np.concatenate([grp, np.repeat(grp[-1:], pad, 0)]) \
                if pad else grp
            db = jnp.asarray(gb)
            if device is not None:
                db = jax.device_put(db, device)
            n_seq_d, pos_d, len_d, off_d = _device_encode_batch(
                db, params.n_candidates, params.lazy, params.min_emit)
            n_seq = np.asarray(n_seq_d)
            cap = pos_d.shape[1]
            for j in range(len(grp)):
                # pull only ~the first k entries per block (rounded to a
                # 1K granule so slice shapes — and their compiled pull
                # programs — stay few): readback is O(sequences), not
                # O(padded buffers)
                k = int(n_seq[j])
                kp = min(-(-max(k, 1) // 1024) * 1024, cap)
                seqs = (np.asarray(pos_d[j, :kp])[:k].astype(np.int64),
                        np.asarray(len_d[j, :kp])[:k].astype(np.int64),
                        np.asarray(off_d[j, :kp])[:k].astype(np.int64))
                if k:
                    seqs = _extend_capped_host(blocks[g0 + j], *seqs)
                blk_bytes.append(block_encode.encode_chunk(
                    blocks[g0 + j], level, None, checksum, sequences=seqs))
        for pos in range(n_full * block_size, len(data), block_size):
            blk_bytes.append(encode_chunk_device(
                data[pos:pos + block_size], level, device, checksum))
    else:
        for pos in range(0, len(data), block_size):
            blk_bytes.append(encode_chunk_device(
                data[pos:pos + block_size], level, device, checksum))
    for blk in blk_bytes:
        if checksum:
            stored = int.from_bytes(blk[-4:], "little")
            global_hash = global_hash_update(global_hash, stored)
        out += blk
    out += headers.write_block_header(C.BLOCK_EOF, 0)
    out += headers.write_file_footer(len(data), global_hash, checksum)
    return bytes(out)
