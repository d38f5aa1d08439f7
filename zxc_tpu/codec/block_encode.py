"""Block encoders: GHI (levels 1-2), GLO (levels 3-7), RAW fallback.

TPU-native formulation (no hash-chain pointer chasing, no serial parse):

1. **Candidate generation**: every position hashes its next 5 bytes; a
   single stable sort groups equal hashes, and the k-th previous element of
   each group is the k-th most recent candidate — the vectorized equivalent
   of walking a hash chain (reference: zxc_lz77_find_best_match,
   zxc_compress.c:193-560).
2. **Match extension**: all (position, candidate) pairs extend together in
   8-byte word-compare rounds; long same-byte runs are resolved
   analytically (offset-1 matches) so run-heavy blocks never iterate.
3. **Parse**: greedy/lazy becomes a per-position ``next[]`` jump table;
   the chosen sequence boundaries are the chain from position 0, recovered
   by pointer doubling — the same primitive the decoder uses.
4. **Sections**: token/offset/extras streams are pure cumsum+scatter;
   literal-section candidates (RAW / RLE / Huffman / shared-dict Huffman)
   are priced with the reference's space-speed rule
   ``J = size + (n_decoded * premium) >> 8`` and the minimum wins.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import constants as C
from ..errors import ZxcError, ERROR_CORRUPT_DATA
from ..format import headers
from ..format.varint import varint_encode
from . import huffman

_HASH_MULT = np.uint64(0x9E3779B97F4A7C15)
_HASH_BITS = 17


@dataclass
class LevelParams:
    n_candidates: int
    lazy: bool
    max_code_len: int  # Huffman cap (8 below ULTRA, 11 at ULTRA)
    sufficient_len: int = 0  # chain-walk early exit (0 = unbounded)
    step_base: int = 1      # miss-path skip: step_base + (run >> step_shift)
    step_shift: int = 0     # 0 = no acceleration
    cover_base: int = 1     # chain-insert stride inside emitted matches
    min_emit: int = 5       # shortest match the parse will emit


def level_params(level: int) -> LevelParams:
    """Search depth / lazy / early-exit per level (reference table:
    zxc_internal.h:951 zxc_get_lz77_params; depths retuned for our
    5-byte-hash chain matcher to match or beat its per-level sizes)."""
    level = max(C.LEVEL_MIN, min(C.LEVEL_MAX, level))
    table = {
        # min_emit=6 at the GHI levels was measured to buy ~3% size (a
        # 4-byte sequence word makes length-5 matches marginal) but cost
        # ~28% encode speed (rejected matches become miss-steps); with the
        # all-literal Huffman fallback (encode_block_hufflit) covering the
        # low-entropy corpora that motivated it, min_emit=5 passes every
        # size gate with margin, so speed wins.
        # retuned round 2c (tools/retune_fast.py): the fast levels sat
        # 6-9 pp INSIDE the per-level size gate at 0.3-0.6x reference
        # speed; these points keep >=1.8 pp margin on every held-out
        # corpus and run 1.2-1.7x faster than the previous ladder.
        # Round 4: n_candidates <= 2 with lazy=False selects the NATIVE
        # depth-1 tier (no hash chain, store-only inserts — PERF 2); L2
        # moved 3 -> 2 candidates for it, spending 2 pp of its fattest-
        # in-ladder size margin for 0.60x -> 0.77x reference speed.
        # Round 5: sufficient_len -> 12 AND cover_base -> 6 together
        # (interleaved A/B x2 sessions: L1 1.09-1.17x, L2 1.13-1.21x at
        # -0.02..-0.17% size — the pair interacts; either alone is a
        # wash). Sparser insert coverage cuts the store-only insert
        # events (0.28/byte, the largest event class in the round-4
        # counter profile) and the lower sufficient-stop trims the
        # single head candidate's verify.
        1: LevelParams(2, False, 8, 12, 1, 4, 6),
        2: LevelParams(2, False, 8, 12, 1, 4, 6),
        3: LevelParams(5, False, 8, 32, 1, 5, 4),
        4: LevelParams(8, False, 8, 64, cover_base=2),
        # Round 5: depth 24 -> 12 / sufficient_len 128 -> 96 on the
        # post-PivCo-v2 + pair-finder cost model: 0.84x -> 1.21x the
        # reference encoder at -8.8% (was -9.7%); gates PASS (thinnest
        # L5 elf margin measured below)
        5: LevelParams(12, True, 8, 96, cover_base=2),
        # L6 stays at depth 64: probes=48 measured 0.99x reference
        # speed (from 0.76-0.84x) but the size gate margins collapse to
        # pinned -0.16% / elf -0.00% / json -0.17% — L6's mission is
        # ratio, and a zero elf margin is one held-out binary away from
        # losing to the reference. Declined (round 5).
        6: LevelParams(64, True, 8),
        # Round 5: 192 -> 128 probes + the pairwise-interleaved finder
        # (zxch_find_matches pair walks): 0.77x -> 1.00x the reference
        # encoder's L7 speed at -1.27% size (was -1.65%); gates PASS on
        # all 7 corpora. The finder was profiled at 89% of L7 wall.
        7: LevelParams(128, True, 11),
    }
    return table[level]


def _prem_rle(level: int) -> int:
    return 1 if level >= 6 else 8


def _prem_huf(level: int) -> int:
    return 4 if level >= 6 else 8


# ---------------------------------------------------------------------------
# Match finding
# ---------------------------------------------------------------------------

def _run_lengths(data: np.ndarray) -> np.ndarray:
    """run[p] = number of consecutive bytes equal to data[p] starting at p."""
    n = len(data)
    if n == 0:
        return np.zeros(0, np.int64)
    change = np.empty(n, bool)
    change[-1] = True
    np.not_equal(data[:-1], data[1:], out=change[:-1])
    # index of the next change at or after p
    idx = np.nonzero(change)[0]
    nxt = idx[np.searchsorted(idx, np.arange(n))]
    return nxt - np.arange(n) + 1


def _true_run_lengths(mask: np.ndarray) -> np.ndarray:
    """r[i] = number of consecutive True starting at i (0 where False)."""
    n = len(mask)
    if n == 0:
        return np.zeros(0, np.int64)
    # index of next False at or after i
    falses = np.nonzero(~mask)[0]
    falses = np.concatenate([falses, [n]])
    nxt = falses[np.searchsorted(falses, np.arange(n))]
    return nxt - np.arange(n)


def find_matches(data: np.ndarray, start: int, n_candidates: int
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Best (length, offset) per position in data[start:].

    ``data`` includes any dictionary prefix of length ``start``; candidate
    sources may lie in the prefix, match positions may not.
    Returns (lens, offs) of length len(data) - start; lens==0 means no match.
    """
    n = len(data)
    P = n - start
    lens = np.zeros(P, np.int64)
    offs = np.ones(P, np.int64)
    if n < C.MIN_MATCH + 1:
        return lens, offs

    run = _run_lengths(data)

    # offset-1 run matches: p continues the run of p-1
    in_run = np.zeros(P, bool)
    pos_abs = np.arange(start, n, dtype=np.int64)
    cont = pos_abs >= 1
    prev_same = np.zeros(P, bool)
    prev_same[cont] = data[pos_abs[cont] - 1] == data[pos_abs[cont]]
    run_here = run[pos_abs]
    run_match = prev_same & (run_here >= C.MIN_MATCH)
    lens[run_match] = run_here[run_match]
    offs[run_match] = 1
    # exclude deep-run interiors from hash candidate search (their offset-1
    # match is maximal within the run; this bounds the word-compare rounds)
    in_run = prev_same & (run_here >= 64)

    # 5-byte hash per position
    nh = n - (C.MIN_MATCH - 1)
    d64 = data.astype(np.uint64)
    v5 = (d64[:nh]
          | (d64[1:nh + 1] << np.uint64(8))
          | (d64[2:nh + 2] << np.uint64(16))
          | (d64[3:nh + 3] << np.uint64(24))
          | (d64[4:nh + 4] << np.uint64(32)))
    h = ((v5 * _HASH_MULT) >> np.uint64(64 - _HASH_BITS)).astype(np.int64)

    order = np.argsort(h, kind="stable")  # groups by hash, position-ascending
    h_sorted = h[order]
    same_group = np.zeros(nh, bool)
    same_group[1:] = h_sorted[1:] == h_sorted[:-1]

    # precomputed u64 words at every byte offset for the extension rounds
    pad = np.concatenate([data, np.zeros(8, np.uint8)]).astype(np.uint64)
    w64 = pad[:n].copy()
    for k in range(1, 8):
        w64 |= pad[k:n + k] << np.uint64(8 * k)

    # rank of each element within the sorted order
    rank = np.empty(nh, np.int64)
    rank[order] = np.arange(nh)

    pos_block = pos_abs[pos_abs < nh]          # positions that have a hash
    pr = rank[pos_block]
    mask_search = ~in_run[:len(pos_block)] if start == 0 else ~in_run[pos_block - start]

    best_len = np.zeros(len(pos_block), np.int64)
    best_off = np.zeros(len(pos_block), np.int64)
    for k in range(1, n_candidates + 1):
        cr = pr - k
        valid = (cr >= 0) & mask_search
        # same hash group k back
        grp_ok = np.zeros(len(pos_block), bool)
        vi = np.nonzero(valid)[0]
        if len(vi) == 0:
            break
        # all of (cr, pr] must be in the same group: since groups are
        # contiguous, it suffices that same_group holds over the span; check
        # via group-id comparison instead (cheaper): equal hash values.
        grp_ok[vi] = h_sorted[cr[vi]] == h_sorted[pr[vi]]
        cand = np.full(len(pos_block), -1, np.int64)
        cand[vi] = order[cr[vi]]
        p_arr = pos_block
        ok = grp_ok & (cand >= 0) & (p_arr - cand >= 1) & (p_arr - cand <= C.WINDOW_SIZE)
        # confirm real 5-byte equality (hash collisions)
        oi = np.nonzero(ok)[0]
        oi = oi[v5[p_arr[oi]] == v5[cand[oi]]]
        if len(oi) == 0:
            continue
        # extend: word-compare rounds, capped; deep survivors are resolved
        # exactly via per-lag equality runs (O(n) per distinct lag), which
        # bounds the work on periodic data where every candidate matches
        # thousands of bytes deep.
        p_s = p_arr[oi]
        c_s = cand[oi]
        max_len = n - p_s
        mlen = np.zeros(len(oi), np.int64)
        active = np.arange(len(oi))
        rounds = 0
        while len(active) and rounds < 16:
            a_p = p_s[active] + mlen[active]
            a_c = c_s[active] + mlen[active]
            rem = max_len[active] - mlen[active]
            can8 = rem >= 8
            wa = w64[np.minimum(a_p, n - 1)]
            wb = w64[np.minimum(a_c, n - 1)]
            x = wa ^ wb
            eq_full = (x == 0) & can8
            # mismatch within the next min(rem, 8) bytes
            tz_bytes = np.zeros(len(active), np.int64)
            nz = x != 0
            if nz.any():
                xv = x[nz]
                tz = np.zeros(len(xv), np.int64)
                for shift in (32, 16, 8):
                    m = (xv & ((np.uint64(1) << np.uint64(shift)) - np.uint64(1))) == 0
                    tz[m] += shift
                    xv[m] >>= np.uint64(shift)
                tz_bytes[nz] = tz >> 3
            adv = np.where(eq_full, 8, np.minimum(tz_bytes, rem))
            mlen[active] += adv
            active = active[eq_full]
            rounds += 1
        if len(active):
            # survivors matched >= 128 bytes: exact lcp from per-lag runs
            lags = p_s[active] - c_s[active]
            for lag in np.unique(lags):
                sel = active[lags == lag]
                eq = data[lag:] == data[:-lag]
                eq_run = _true_run_lengths(eq)
                mlen[sel] = np.minimum(eq_run[c_s[sel]], max_len[sel])
        take = mlen >= C.MIN_MATCH
        ti = oi[take]
        better = mlen[take] > best_len[ti]
        ti = ti[better]
        best_len[ti] = mlen[take][better]
        best_off[ti] = (p_arr - cand)[ti]

    # merge hash matches with run matches (prefer longer; ties prefer run/off-1)
    blk_idx = pos_block - start
    hb = best_len > lens[blk_idx]
    lens[blk_idx[hb]] = best_len[hb]
    offs[blk_idx[hb]] = best_off[hb]
    return lens, offs


# ---------------------------------------------------------------------------
# Parse: greedy / lazy via jump-table doubling
# ---------------------------------------------------------------------------

def parse_sequences(lens: np.ndarray, offs: np.ndarray, lazy: bool,
                    min_emit: int = 5
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Chain-of-jumps parse. Returns (match_pos, match_len, match_off)."""
    P = len(lens)
    good = lens >= max(C.MIN_MATCH, min_emit)
    if lazy and P > 1:
        nxt_len = np.concatenate([lens[1:], [0]])
        nxt_good = np.concatenate([good[1:], [False]])
        defer = good & nxt_good & (nxt_len > lens)
        emit = good & ~defer
    else:
        emit = good
    step = np.where(emit, lens, 1)
    jt = np.minimum(np.arange(P, dtype=np.int64) + step, P)
    jt = np.concatenate([jt, [P]])
    mark = np.zeros(P + 1, bool)
    mark[0] = True
    covered = 1
    while covered < P:
        idx = np.nonzero(mark[:P])[0]
        mark[jt[idx]] = True
        jt = jt[jt]
        covered *= 2
    chosen = np.nonzero(mark[:P] & emit)[0]
    return chosen, lens[chosen], offs[chosen]


# ---------------------------------------------------------------------------
# Section emitters
# ---------------------------------------------------------------------------

def encode_rle_literals(lit: np.ndarray) -> bytes:
    """RLE tokenization, byte-compatible with the reference emitter
    (zxc_compress.c:1745-1800): runs >= 4 become run tokens chunked at 131
    with a 1-3 byte raw tail; gaps up to the next 4-byte run become raw
    tokens chunked at 128."""
    n = len(lit)
    if n == 0:
        return b""
    try:  # native fast path (byte-exact; the L6/L7 pricing loop calls
        # this for every candidate section)
        from .. import runtime
        out_n = runtime.rle_encode_lit(lit)
        if out_n is not None:
            return out_n
    except ImportError:
        pass
    run = _run_lengths(lit)
    idx4 = np.nonzero(run >= C.RLE_RUN_MIN)[0]
    out = bytearray()
    p = 0
    while p < n:
        r = int(run[p])
        if r >= C.RLE_RUN_MIN:
            b = int(lit[p])
            rem = r
            while rem >= C.RLE_RUN_MIN:
                chunk = min(C.RLE_RUN_MAX, rem)
                out.append(C.LIT_RLE_FLAG | (chunk - 4))
                out.append(b)
                rem -= chunk
            if rem:
                out.append(rem - 1)
                out += lit[p + r - rem:p + r].tobytes()
            p += r
        else:
            j = np.searchsorted(idx4, p)
            q = int(idx4[j]) if j < len(idx4) else n
            while p < q:
                chunk = min(C.RLE_RAW_MAX, q - p)
                out.append(chunk - 1)
                out += lit[p:p + chunk].tobytes()
                p += chunk
    return bytes(out)


def _emit_extras(vals: list[int]) -> bytes:
    return b"".join(varint_encode(v) for v in vals)


def _extras_stream(ll: np.ndarray, mlb: np.ndarray, ll_mask: int, ml_mask: int) -> bytes:
    """Interleaved LL/ML overflow varints in sequence order (vectorized)."""
    sat_ll = ll >= ll_mask
    sat_ml = mlb >= ml_mask
    n_ll = int(sat_ll.sum())
    n_ml = int(sat_ml.sum())
    if n_ll + n_ml == 0:
        return b""
    # wire order: per sequence LL extra first, then ML extra
    slot = np.zeros(len(ll), np.int64)
    slot[sat_ll] += 1
    slot[sat_ml] += 1
    start = np.cumsum(slot) - slot
    vals = np.zeros(n_ll + n_ml, np.int64)
    vals[start[sat_ll]] = ll[sat_ll] - ll_mask
    vals[(start + sat_ll)[sat_ml]] = mlb[sat_ml] - ml_mask
    # vectorized 1..3-byte prefix varints (low-bits-first payload)
    nbytes = np.where(vals < 0x80, 1, np.where(vals < 0x4000, 2, 3))
    off = np.cumsum(nbytes) - nbytes
    total = int(nbytes.sum())
    out = np.zeros(total, np.uint8)
    b1 = nbytes == 1
    out[off[b1]] = vals[b1]
    b2 = nbytes == 2
    out[off[b2]] = 0x80 | (vals[b2] & 0x3F)
    out[off[b2] + 1] = (vals[b2] >> 6) & 0xFF
    b3 = nbytes == 3
    out[off[b3]] = 0xC0 | (vals[b3] & 0x1F)
    out[off[b3] + 1] = (vals[b3] >> 5) & 0xFF
    out[off[b3] + 2] = (vals[b3] >> 13) & 0xFF
    return out.tobytes()


@dataclass
class DictState:
    """Encoder-side dictionary state: content + optional shared table."""
    content: np.ndarray
    huf_lengths: bytes | None = None
    tree: "huffman.PivcoTree" = None

    def __post_init__(self):
        if self.huf_lengths is not None and self.tree is None:
            self.tree = huffman.build_tree_packed(bytes(self.huf_lengths))


def _build_sequences(data: np.ndarray, level: int,
                     dict_state: DictState | None, sequences=None,
                     probes: int | None = None):
    """Shared front half: match find + parse. Returns a non-empty list of
    candidate (ll, ml, off, literals) stream tuples in block coordinates —
    more than one when the parser proposes alternative encodings (e.g.
    8-bit-only offset mode) for the caller to price exactly.

    ``sequences`` short-circuits the matcher with precomputed
    (m_pos, m_len, m_off) — the device-matcher entry (ops.encode).
    ``probes`` overrides the level's chain-walk depth (the L6 adaptive
    deepening pass)."""
    params = level_params(level)
    if probes is not None:
        import dataclasses
        params = dataclasses.replace(params, n_candidates=probes)
    if sequences is not None:
        m_pos, m_len, m_off = (np.asarray(a, np.int64) for a in sequences)
        return [_sequences_to_streams(data, m_pos, m_len, m_off)]
    if dict_state is not None and len(dict_state.content):
        full = np.concatenate([dict_state.content, data])
        start = len(dict_state.content)
    else:
        full = data
        start = 0
    m_pos = None
    lens = offs = None
    if level < 6:
        try:  # combined native find+parse: search only at the parse cursor
            from .. import runtime
            r = runtime.find_parse(full, start, params.n_candidates,
                                   params.lazy, params.sufficient_len,
                                   params.step_base, params.step_shift,
                                   params.cover_base, params.min_emit)
            if r is not None:
                m_pos, m_len, m_off = (a.astype(np.int64) for a in r)
        except ImportError:
            pass
    if m_pos is None:
        try:  # per-position native finder (feeds the DP at levels 6-7)
            from .. import runtime
            r = runtime.find_matches(full, start, params.n_candidates)
            if r is not None:
                lens, offs = r
        except ImportError:
            pass
        if lens is None:
            lens, offs = find_matches(full, start, params.n_candidates)
    if level >= 6:
        # DP optimal parse (native; reference: zxc_lz77_optimal_parse_glo,
        # zxc_compress.c:809). Literal costs come from the POST-LZ literal
        # histogram of a first-pass lazy parse (cf. the reference's sampled
        # estimate, zxc_opt_estimate_lit_bits :733).
        try:
            from .. import runtime
            r = runtime.lazy_parse(lens, offs, True)
            if r is not None:
                g_pos, g_len, _ = r
            else:
                g_pos, g_len, _ = parse_sequences(lens, offs, True)
            cover = np.zeros(len(data) + 1, np.int64)
            np.add.at(cover, g_pos, 1)
            np.add.at(cover, np.minimum(g_pos + g_len, len(data)), -1)
            first_lit = data[np.cumsum(cover[:len(data)]) == 0]
            freq = np.bincount(first_lit, minlength=256)
            cl = huffman.build_code_lengths(freq, params.max_code_len)
            if cl is None:
                cost = np.full(256, 8, np.uint16)
            else:
                # regime check first: on high-entropy data (machine
                # code) the literal section will WIN the auction as RAW,
                # so Huffman per-symbol prices (avg < 8 bits) under-value
                # matches and the DP keeps literals a RAW section then
                # pays 8 bits for. Price flat 8 whenever the Huffman
                # estimate (+ the 128-byte lengths table) loses to RAW
                # on the first-pass histogram — the regime the final
                # auction will pick. (Found via the L6 ELF size gate:
                # +0.03..0.10% vs reference on libc/libstdc++ bytes.)
                hb = int((freq * np.where(cl > 0, cl, 0)).sum())
                tot = int(freq.sum())
                if hb + 128 * 8 >= tot * 8:
                    cost = np.full(256, 8, np.uint16)
                else:
                    # absent symbols: finite pessimistic cost (+1
                    # smoothing would force a uniform 8-bit code over
                    # all 256 symbols and poison the model on small
                    # alphabets)
                    cost = np.where(cl > 0, cl,
                                    params.max_code_len + 2).astype(np.uint16)
            # ULTRA Huffman-codes the token stream too; price tokens at
            # 5 bits so the DP trades literals for matches the way the
            # final sections will actually charge (empirically the best
            # across silesia/word-soup/tiny-alphabet corpora; 4 bits
            # over-matches small alphabets)
            tok_bits = 5 if level >= 7 else 8
            r = runtime.optimal_parse(lens, offs, data, cost, tok_bits)
            if r is not None:
                parses = [r]
                if level >= 7 and len(r[0]) >= 64:
                    # second DP priced with the ACTUAL candidate token
                    # tree (reference prices DP tokens with the real
                    # tree, zxc_compress.c:1665-1688): histogram
                    # pass-1's tokens, build the 8-bit-capped lengths
                    # the token section will use, marginalize over the
                    # LL nibble so each match edge pays
                    # E[len(tok) | ml_nibble]. The re-priced parse can
                    # LOSE on corpora where it shifts its own token
                    # distribution (csrc/md measured +0.8/+0.1%), so it
                    # enters the payload auction as a CANDIDATE next to
                    # pass 1 instead of replacing it.
                    p1_pos = r[0].astype(np.int64)
                    p1_len = r[1].astype(np.int64)
                    p1_ll = p1_pos - np.concatenate(
                        [[0], (p1_pos + p1_len)[:-1]])
                    nib_ll = np.minimum(p1_ll, C.TOKEN_LL_MASK)
                    nib_ml = np.minimum(p1_len - C.MIN_MATCH,
                                        C.TOKEN_ML_MASK)
                    toks = (nib_ll << C.TOKEN_LIT_BITS) | nib_ml
                    tcl = huffman.build_code_lengths(
                        np.bincount(toks, minlength=256), 8)
                    if tcl is not None:
                        tcost = np.where(tcl > 0, tcl, 10).astype(
                            np.float64)
                        pll = np.bincount(nib_ll, minlength=16).astype(
                            np.float64)
                        pll /= max(pll.sum(), 1.0)
                        tok16 = np.rint(
                            pll @ tcost.reshape(16, 16)).astype(np.uint16)
                        r2 = runtime.optimal_parse(lens, offs, data, cost,
                                                   tok_bits,
                                                   tok_cost16=tok16)
                        if r2 is not None and not all(
                                np.array_equal(a, b)
                                for a, b in zip(r2, r)):
                            parses.append(r2)
                out = []
                for pr in parses:
                    m_pos, m_len, m_off = (a.astype(np.int64) for a in pr)
                    out.append(_sequences_to_streams(data, m_pos, m_len,
                                                     m_off))
                if any(len(pr[2]) and pr[2].max() > 256 for pr in parses):
                    # The emitted parse flips the whole block to 16-bit
                    # offsets. A/B an 8-bit-only DP (far candidates
                    # invisible) — callers keep the smaller payload
                    # (reference offset-mode choice, zxc_compress.c:1694).
                    r8 = runtime.optimal_parse(lens, offs, data, cost,
                                               tok_bits, only8=True)
                    if r8 is not None:
                        alt = tuple(a.astype(np.int64) for a in r8)
                        out.append(_sequences_to_streams(data, *alt))
                if len(out) > 1:
                    return out
                m_pos, m_len, m_off = (a.astype(np.int64)
                                       for a in parses[0])
        except ImportError:
            pass
    if m_pos is None:
        try:
            from .. import runtime
            r = runtime.lazy_parse(lens, offs, params.lazy,
                                   params.min_emit)
            if r is not None:
                m_pos, m_len, m_off = (a.astype(np.int64) for a in r)
        except ImportError:
            pass
    if m_pos is None:
        m_pos, m_len, m_off = parse_sequences(lens, offs, params.lazy,
                                              params.min_emit)
    return [_sequences_to_streams(data, m_pos, m_len, m_off)]


def _sequences_to_streams(data: np.ndarray, m_pos: np.ndarray,
                          m_len: np.ndarray, m_off: np.ndarray):
    P = len(data)
    n_seq = len(m_pos)
    if n_seq == 0:
        ll = np.zeros(0, np.int64)
        ml = np.zeros(0, np.int64)
        off = np.zeros(0, np.int64)
        literals = data
        return ll, ml, off, literals
    prev_end = np.concatenate([[0], m_pos[:-1] + m_len[:-1]])
    ll = m_pos - prev_end
    # literal bytes = positions not covered by any match (order-preserving);
    # int8 cover + int32 cumsum keeps this memory-bound pass cheap
    cover = np.zeros(P + 1, np.int8)
    np.add.at(cover, m_pos, 1)
    np.add.at(cover, np.minimum(m_pos + m_len, P), -1)
    in_match = np.cumsum(cover[:P], dtype=np.int32) > 0
    literals = data[~in_match]
    return ll, m_len, m_off, literals


def encode_block_glo(data: np.ndarray, level: int,
                     dict_state: DictState | None = None,
                     sequences=None) -> bytes | None:
    """GLO payload (no block header); None when the caller should fall back
    to RAW (reference: zxc_encode_block_glo, zxc_compress.c:1179-1864)."""
    if sequences is None and level < 6:
        try:  # fully-native fast path (find+parse+emit + literal auction)
            from .. import runtime
            params = level_params(level)
            if dict_state is not None and len(dict_state.content):
                full = np.concatenate([dict_state.content, data])
                cl = (dict_state.tree.code_len
                      if dict_state.tree is not None else None)
                out = runtime.encode_glo(full, len(dict_state.content),
                                         params.n_candidates, params.lazy,
                                         params.sufficient_len,
                                         params.step_base, params.step_shift,
                                         params.cover_base, params.min_emit,
                                         dict_cl=cl)
            else:
                out = runtime.encode_glo(data, 0, params.n_candidates,
                                         params.lazy, params.sufficient_len,
                                         params.step_base, params.step_shift,
                                         params.cover_base, params.min_emit)
            if out is not None:
                return out
        except ImportError:
            pass
    cands = _build_sequences(data, level, dict_state, sequences)
    pays = [_glo_payload(data, level, dict_state, c) for c in cands]
    best = min(pays, key=len)
    # adaptive deepening (L6; mirrors zxch_encode_block_dispatch): on
    # poorly-compressing blocks (payload > 45% of input — machine code)
    # re-run the whole pipeline at 3x chain depth and keep the smaller
    # payload. Compressible corpora never trigger.
    if (level == 6 and sequences is None
            and len(best) * 20 > len(data) * 9):
        deep = _build_sequences(data, level, dict_state, None,
                                probes=level_params(level).n_candidates * 3)
        dpays = [_glo_payload(data, level, dict_state, c) for c in deep]
        d = min(dpays, key=len)
        if len(d) < len(best):
            best = d
    return best


def _glo_payload(data: np.ndarray, level: int,
                 dict_state: DictState | None, streams) -> bytes:
    ll, ml, off, literals = streams
    n_seq = len(ml)
    n_lit = len(literals)
    mlb = ml - C.MIN_MATCH  # token field basis

    # token bytes
    tok_ll = np.minimum(ll, C.TOKEN_LL_MASK)
    tok_ml = np.minimum(mlb, C.TOKEN_ML_MASK)
    tokens = ((tok_ll << C.TOKEN_LIT_BITS) | tok_ml).astype(np.uint8)
    extras = _extras_stream(ll, mlb, C.TOKEN_LL_MASK, C.TOKEN_ML_MASK)

    use_8bit = bool(n_seq == 0 or off.max(initial=1) <= 256)
    if use_8bit:
        off_stream = (off - C.OFFSET_BIAS).astype(np.uint8).tobytes()
    else:
        off_stream = (off - C.OFFSET_BIAS).astype("<u2").tobytes()

    # --- literal section candidates, priced J = size + tax ---
    enc_lit = C.ENC_RAW
    lit_stream = literals.tobytes()
    best_j = n_lit
    best_stream = lit_stream
    if n_lit > 0:
        rle = encode_rle_literals(literals)
        j = len(rle) + ((n_lit * _prem_rle(level)) >> 8)
        if j < best_j:
            enc_lit, best_j, best_stream = C.ENC_RLE, j, rle
        if n_lit >= 139:
            # fast levels reach here only on the dict path (the native
            # emitter owns no-dict L1-5 and prices its own hufflit);
            # the inline candidate competes there too — package-merge
            # runs native (zxch_code_lengths), so the auction is cheap
            # even on tiny dict-framed blocks
            freq = np.bincount(literals, minlength=256)
            cl = huffman.build_code_lengths(freq, level_params(level).max_code_len)
            # NOTE round 2: the decode-speed "nudge" (reduced-cap
            # rebuilds) was A/B-measured against this framework's
            # VBMI2 level-merge decoder and made decode ~30% SLOWER at
            # +0.1% size (it optimizes the reference's SIMD-shuffle
            # cost model, not ours — flat-subtree preservation matters
            # more here). Optimal-length trees win on both axes, so the
            # nudge is not applied; huffman.nudge_code_lengths remains
            # for parity study.
            if cl is not None:
                # sound skip: per-node byte rounding only ADDS to
                # sum(freq*len)/8, so when even the optimistic bound
                # loses the auction the candidate is dead weight
                bound = C.HUF_TABLE_SIZE + int(
                    (freq * cl.astype(np.int64)).sum() >> 3)
                if bound + ((n_lit * _prem_huf(level)) >> 8) < best_j:
                    # price BY ENCODING (native pivco): exact size and
                    # the winner's bytes in one pass, no Python trie
                    from .. import runtime
                    pay = runtime.pivco_encode(literals, cl)
                    if pay is None:
                        tree = huffman.build_tree(cl)
                        pay = huffman.encode_payload(literals, tree)
                    size = C.HUF_TABLE_SIZE + len(pay)
                    j = size + ((n_lit * _prem_huf(level)) >> 8)
                    if j < best_j:
                        enc_lit, best_j = C.ENC_HUFFMAN, j
                        best_stream = huffman.pack_lengths(cl) + pay
        if dict_state is not None and dict_state.tree is not None and n_lit > 0:
            # the shared table competes at EVERY level: it costs no
            # 128-byte inline header, which dominates on small frames
            # (reference gates this at ULTRA only; our auction prices
            # it exactly, so letting it compete is strictly >= in size)
            freq = np.bincount(literals, minlength=256)
            cl_d = dict_state.tree.code_len
            # native encode silently drops uncoded symbols — gate first
            if not ((freq > 0) & (cl_d == 0)).any():
                from .. import runtime
                pay = runtime.pivco_encode(literals, cl_d)
                if pay is None:
                    pay = huffman.encode_payload(literals, dict_state.tree)
                j = len(pay) + ((n_lit * _prem_huf(level)) >> 8)
                if j < best_j:
                    enc_lit, best_j = C.ENC_HUFFMAN_DICT, j
                    best_stream = pay

    # --- token section candidate (ULTRA): Huffman over token bytes ---
    enc_tok = C.ENC_RAW
    tok_stream = tokens.tobytes()
    if level >= 7 and n_seq >= 139:
        tfreq = np.bincount(tokens, minlength=256)
        tcl = huffman.build_code_lengths(tfreq, level_params(level).max_code_len)
        if tcl is not None:
            ttree = huffman.build_tree(tcl)
            tsize = huffman.calc_size(tfreq, ttree, with_header=True)
            if tsize + ((n_seq * _prem_huf(level)) >> 8) < n_seq:
                enc_tok = C.ENC_HUFFMAN
                tok_stream = huffman.pack_lengths(tcl) + huffman.encode_payload(tokens, ttree)

    gh = headers.GnrHeader(n_seq, n_lit, enc_lit, enc_tok, 0, 1 if use_8bit else 0)
    descs = [(len(best_stream), n_lit),
             (len(tok_stream), n_seq),
             (len(off_stream), len(off_stream)),
             (len(extras), len(extras))]
    return headers.write_gnr_header(gh, descs) + best_stream + tok_stream + off_stream + extras


def encode_block_ghi(data: np.ndarray, level: int,
                     dict_state: DictState | None = None,
                     sequences=None) -> bytes:
    """GHI payload (reference: zxc_encode_block_ghi, zxc_compress.c:1895)."""
    if sequences is None and (dict_state is None
                              or not len(dict_state.content)):
        try:  # fully-native fast path (find+parse+emit in one C call)
            from .. import runtime
            params = level_params(level)
            out = runtime.encode_ghi(data, 0, params.n_candidates,
                                     params.lazy, params.sufficient_len,
                                     params.step_base, params.step_shift,
                                     params.cover_base, params.min_emit)
            if out is not None:
                return out
        except ImportError:
            pass
    ll, ml, off, literals = _build_sequences(data, level, dict_state,
                                             sequences)[0]
    n_seq = len(ml)
    n_lit = len(literals)
    mlb = ml - C.MIN_MATCH
    w_ll = np.minimum(ll, C.SEQ_LL_MASK)
    w_ml = np.minimum(mlb, C.SEQ_ML_MASK)
    words = ((w_ll.astype(np.uint32) << 24)
             | (w_ml.astype(np.uint32) << 16)
             | (off - C.OFFSET_BIAS).astype(np.uint32)).astype("<u4")
    extras = _extras_stream(ll, mlb, C.SEQ_LL_MASK, C.SEQ_ML_MASK)
    gh = headers.GnrHeader(n_seq, n_lit, C.ENC_RAW, C.ENC_RAW, 0, 0)
    lit_stream = literals.tobytes()
    seq_stream = words.tobytes()
    descs = [(len(lit_stream), n_lit),
             (len(seq_stream), len(seq_stream)),
             (len(extras), len(extras))]
    return headers.write_gnr_header(gh, descs) + lit_stream + seq_stream + extras


def encode_block_hufflit(data: np.ndarray, budget: int) -> bytes | None:
    """Sequence-free GLO payload with Huffman-coded literals, or None
    unless strictly smaller than ``budget``.

    Entropy fallback for the GHI levels: GHI literals are RAW by format,
    so on short-match-dense/low-entropy data an all-literal PivCo block
    can beat any GHI parse. Block types are self-describing, so mixing a
    GLO block into a level-1 frame is wire-legal (the reference decoder
    dispatches per block type: zxc_decompress.c:1495-1544). Byte-identical
    with the native zxch_encode_hufflit (zxc_host.cpp)."""
    P = len(data)
    FIXED = C.GNR_HEADER_SIZE + 4 * C.SECTION_DESC_SIZE + 128
    if FIXED + (P + 7) // 8 >= budget:
        return None                       # 1 bit/symbol lower bound
    freq = np.bincount(data, minlength=256)
    if int((freq > 0).sum()) < 2:
        return None                       # degenerate: GHI/RAW always wins
    cl = huffman.build_code_lengths(freq, 8)
    if cl is None:
        return None
    bits = int((freq.astype(np.int64) * cl).sum())
    if FIXED + (bits + 7) // 8 >= budget:
        return None
    tree = huffman.build_tree(cl)
    pay = huffman.pack_lengths(cl) + huffman.encode_payload(data, tree)
    if C.GNR_HEADER_SIZE + 4 * C.SECTION_DESC_SIZE + len(pay) >= budget:
        return None
    gh = headers.GnrHeader(0, P, C.ENC_HUFFMAN, C.ENC_RAW, 0, 1)
    descs = [(len(pay), P), (0, 0), (0, 0), (0, 0)]
    return headers.write_gnr_header(gh, descs) + pay


def encode_chunk(data: np.ndarray, level: int,
                 dict_state: DictState | None = None,
                 checksum: bool = False, sequences=None) -> bytes:
    """Chunk wrapper: block header + payload (+ checksum), RAW fallback on
    expansion (reference: zxc_compress_chunk_wrapper, zxc_compress.c:2122).

    ``sequences`` — optional precomputed (m_pos, m_len, m_off) from an
    external matcher (e.g. ops.encode device kernels); bypasses the host
    match finder."""
    from ..format.hashes import rapidhash32

    if level <= 1:
        payload = encode_block_ghi(data, level, dict_state, sequences)
        btype = C.BLOCK_GHI
        if dict_state is None or not len(dict_state.content):
            budget = min(len(payload),
                         max(len(data) - C.BLOCK_HEADER_SIZE, 0))
            hl = encode_block_hufflit(data, budget)
            if hl is not None:
                payload, btype = hl, C.BLOCK_GLO
    elif level <= 5:
        # L2 rides GLO (greedy shallow parse): on every gate corpus the
        # GLO sections beat the GHI packing at the same parse AND the
        # emit is faster (round-2c interleaved A/B: 155 vs 118 MB/s,
        # 45.2% vs 46.3%); block types are self-describing so a GLO
        # block at level 2 is wire-legal. The all-literal Huffman
        # candidate competes at ALL the fast GLO levels (2-5): below
        # ULTRA the GLO literal section prices only RAW/RLE, so on
        # low-entropy or match-poor data a 0-sequence Huffman block
        # wins outright (L5 elf -0.4 -> -6.5%, tinyalpha -3.6 -> -41%)
        payload = encode_block_glo(data, level, dict_state, sequences)
        btype = C.BLOCK_GLO
        # the all-literal candidate operates on the block bytes alone and
        # is wire-legal inside a dict frame, so it competes either way
        # (matching the native frame path)
        budget = min(len(payload),
                     max(len(data) - C.BLOCK_HEADER_SIZE, 0))
        hl = encode_block_hufflit(data, budget)
        if hl is not None:
            payload = hl
    else:
        payload = encode_block_glo(data, level, dict_state, sequences)
        btype = C.BLOCK_GLO
    total = C.BLOCK_HEADER_SIZE + len(payload)
    if total >= len(data):
        payload = data.tobytes()
        btype = C.BLOCK_RAW
    elif isinstance(payload, (bytes, bytearray)):
        pass
    out = headers.write_block_header(btype, len(payload)) + bytes(payload)
    if checksum:
        out += int(rapidhash32(bytes(payload))).to_bytes(4, "little")
    return out
