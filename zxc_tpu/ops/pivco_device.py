"""Device-side PivCo-Huffman section decode (VERDICT round-2 item #2).

The reference's second hot loop decodes entropy sections serially
(zxc_pivco_decode_core, zxc_huffman.c:2133-2293: BFS run sizing, then
bottom-up level merges). Rounds 1-2 ran that on the HOST, so the device
pipeline shipped fully-expanded literal buffers — a major share of the
measured H2D inflation. This module decodes the sections ON DEVICE from
the raw wire bytes.

Formulation — top-down routing instead of bottom-up merges: every output
position walks the code trie root-to-leaf *independently*, so the decode
is ``max_depth + 1`` data-parallel rounds over a ``(n,)`` lane vector with
no cross-lane dependencies beyond two prefix sums computed once:

* the wire stores one byte-padded bit run per emitting node; an exclusive
  **popcount prefix** ``P`` over the section bytes (one vectorized table-
  free popcount + cumsum) lets any lane compute ``ones_before(node, p)``
  = ``P[byte] - P[run_start] + popcount(partial byte)`` in O(1);
* a lane at ``(node, p)`` reads bit ``p`` of the node's run and descends:
  bit 1 -> right child at position ``ones_before``, bit 0 -> left child at
  ``p - ones_before`` (the exact inverse of the reference's merge);
* **flat subtree roots** terminate a lane by gathering ``D`` packed bits
  (``p*D`` LSB-first) and one path->symbol table lookup — the reference's
  ``zxc_pivco_unpack_flat`` ladder collapses into a single gather;
* leaves terminate with their symbol.

H2D per section = the *compressed* wire bytes + ~10 KB of per-node scalar
tables, vs the decoded symbols the host path shipped. All shapes static;
sections batch along a leading axis via ``vmap``.

Host-side planning (`plan_section`) runs the reference's pass 1 (run
sizing by popcount, with its absent-child validation) in vectorized
NumPy; the tree itself comes from :func:`zxc_tpu.codec.huffman.build_tree`.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from .. import constants as C
from ..codec.huffman import PivcoTree, MAX_LEN
from ..errors import ZxcError, ERROR_CORRUPT_DATA

NN = 512          # >= PIVCO_MAX_NODES (2*256 - 1)

_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                      axis=1).sum(1).astype(np.int32)


@dataclass
class SectionPlan:
    """Per-section device routing tables (host numpy, pre-padding)."""
    nxt0: np.ndarray       # (NN,) i32 left-child node id (0 when absent)
    nxt1: np.ndarray       # (NN,) i32 right-child node id
    run_off: np.ndarray    # (NN,) i32 byte offset of the node's run
    typ: np.ndarray        # (NN,) i32 0=bitmap 1=leaf 2=flat-root
    sym: np.ndarray        # (NN,) i32 leaf symbol
    flat_base: np.ndarray  # (NN,) i32 offset into c2s
    flat_d: np.ndarray     # (NN,) i32 flat depth D
    c2s: np.ndarray        # (n_flat_entries,) u8 concatenated path tables
    n: int                 # symbol count
    rounds: int            # routing rounds needed (max_depth + 1)
    sec_len: int           # wire bytes consumed


def plan_section(payload: np.ndarray, n: int, tree: PivcoTree) -> SectionPlan:
    """Pass 1 (run sizing + validation) -> device routing tables.

    Mirrors zxc_pivco_decode_core's first loop (zxc_huffman.c:2146-2192):
    walk nodes in BFS wire order, size each run from the node's symbol
    count, popcount it to split counts between children. Rejects the same
    malformed streams the host decoder rejects.
    """
    t = tree
    payload = np.asarray(payload, np.uint8)
    if n <= 0:
        raise ZxcError(ERROR_CORRUPT_DATA, "empty section")
    n_nodes = len(t.sym)
    if n_nodes > NN:
        raise ZxcError(ERROR_CORRUPT_DATA, "node overflow")
    pop = _POP8[payload]
    count = np.zeros(n_nodes, np.int64)
    count[0] = n
    run_off = np.zeros(NN, np.int32)
    pos = 0
    plen = len(payload)
    for i in range(n_nodes):
        nid = int(t.bfs[i])
        if t.covered[nid] or t.sym[nid] >= 0:
            continue
        c = int(count[nid])
        fd = int(t.flat_d[nid])
        nbytes = (c * fd + 7) // 8 if fd else (c + 7) // 8
        if plen - pos < nbytes:
            raise ZxcError(ERROR_CORRUPT_DATA, "node run out of bounds")
        run_off[nid] = pos
        pos += nbytes
        if fd:
            continue
        full = c // 8
        ones = int(pop[run_off[nid]:run_off[nid] + full].sum())
        rem = c & 7
        if rem:
            ones += int(_POP8[payload[run_off[nid] + full]
                              & ((1 << rem) - 1)])
        ch0, ch1 = int(t.child[nid, 0]), int(t.child[nid, 1])
        if ch1 >= 0:
            count[ch1] = ones
        elif ones:
            raise ZxcError(ERROR_CORRUPT_DATA,
                           "symbols routed to absent right child")
        if ch0 >= 0:
            count[ch0] = c - ones
        elif c - ones:
            raise ZxcError(ERROR_CORRUPT_DATA,
                           "symbols routed to absent left child")

    nxt0 = np.zeros(NN, np.int32)
    nxt1 = np.zeros(NN, np.int32)
    typ = np.zeros(NN, np.int32)
    sym = np.zeros(NN, np.int32)
    flat_base = np.zeros(NN, np.int32)
    flat_d32 = np.ones(NN, np.int32)    # 1 keeps p*D harmless on non-flats
    c2s_parts: list[np.ndarray] = []
    fpos = 0
    for nid in range(n_nodes):
        if t.sym[nid] >= 0:
            typ[nid] = 1
            sym[nid] = int(t.sym[nid])
            continue
        if t.flat_d[nid] > 0 and not t.covered[nid]:
            D = int(t.flat_d[nid])
            typ[nid] = 2
            flat_d32[nid] = D
            flat_base[nid] = fpos
            c2s_parts.append(_flat_table(t, nid, D))
            fpos += 1 << D
            continue
        ch0, ch1 = int(t.child[nid, 0]), int(t.child[nid, 1])
        nxt0[nid] = max(ch0, 0)
        nxt1[nid] = max(ch1, 0)
    c2s = (np.concatenate(c2s_parts) if c2s_parts
           else np.zeros(1, np.uint8))
    return SectionPlan(nxt0, nxt1, run_off, typ, sym, flat_base, flat_d32,
                       c2s, n, t.max_depth + 1, pos)


def _flat_table(t: PivcoTree, nid: int, D: int) -> np.ndarray:
    """Path-index -> symbol for a flat root (bit j = branch at depth j)."""
    c2s = np.zeros(1 << D, np.uint8)
    stack = [(nid, 0, 0)]
    while stack:
        cn, cp, cl_ = stack.pop()
        if t.sym[cn] >= 0:
            c2s[cp] = t.sym[cn]
            continue
        stack.append((int(t.child[cn, 0]), cp, cl_ + 1))
        stack.append((int(t.child[cn, 1]), cp | (1 << cl_), cl_ + 1))
    return c2s


# ---------------------------------------------------------------------------
# Device kernel
# ---------------------------------------------------------------------------

def _popcount_u8(v):
    """Branch-free popcount of values < 256 held in int32 lanes."""
    import jax.numpy as jnp
    v = v - ((v >> 1) & 0x55)
    v = (v & 0x33) + ((v >> 2) & 0x33)
    return (v + (v >> 4)) & 0x0F


@functools.lru_cache(maxsize=64)
def routing_kernel(L: int, RSEC: int, FLAT: int, rounds: int):
    """Jitted batched section decode.

    Args (all batched on a leading B axis):
      sec (B, RSEC) u8, tables (B, NN) i32 x7, c2s (B, FLAT) u8,
      n (B,) i32.
    Returns (B, L) u8 decoded symbols (0 beyond n).

    Per-lane work is GATHER-BOUND (TPU XLA gathers run ~140 M elem/s,
    measured round 3), so the hot loop packs everything into exactly TWO
    gathers per round: an i64 node word {run_off, nxt0, nxt1, typ,
    ones_base} and an i64 section word {byte, popcount-prefix}. Flat-root
    and leaf emission run once in a post-pass instead of per round.
    """
    import jax
    import jax.numpy as jnp

    def one(sec, nxt0, nxt1, run_off, typ, sym, flat_base, flat_d, c2s, n):
        sec32 = sec.astype(jnp.int32)
        pop = _popcount_u8(sec32)
        P = jnp.cumsum(pop, dtype=jnp.int32) - pop   # exclusive, (RSEC,)
        # packed tables, 32-bit lanes (x64 is disabled):
        #   node_w = run_off(22) | typ(2)<<22     -- per-node
        #   nxt_w  = nxt0(9) | nxt1(9)<<9 | ones_base(14 low bits unused)
        #   sec_w  = byte(8) | P(24)<<8           -- per section byte
        # P is the exclusive bit-popcount prefix truncated to 24 bits; node
        # run lengths are < 2^24 bits (2 MiB max block), so the wrapped
        # difference (P[b]-P[ro]) & 0xFFFFFF is exact.
        node_w = run_off | (typ << 22)
        nxt_w = nxt0 | (nxt1 << 9)
        ones_b = P[jnp.minimum(run_off, RSEC - 1)] & 0xFFFFFF
        sec_w = sec32 | ((P & 0xFFFFFF) << 8)

        pos = jnp.arange(L, dtype=jnp.int32)
        node = jnp.zeros(L, jnp.int32)
        p = pos
        live = pos < n
        for _ in range(rounds):
            w = node_w[node]
            t = (w >> 22) & 3
            step = live & (t == 0)
            ro = w & 0x3FFFFF
            bidx = jnp.minimum(ro + (p >> 3), RSEC - 1)
            sw = sec_w[bidx]
            byte = sw & 0xFF
            bit = (byte >> (p & 7)) & 1
            ones = ((((sw >> 8) & 0xFFFFFF) - ones_b[node]) & 0xFFFFFF) \
                + _popcount_u8(byte & ((1 << (p & 7)) - 1))
            nw = nxt_w[node]
            nb = jnp.where(bit == 1, (nw >> 9) & 0x1FF, nw & 0x1FF)
            pb = jnp.where(bit == 1, ones, p - ones)
            node = jnp.where(step, nb, node)
            p = jnp.where(step, pb, p)
        # post-pass: every live lane now sits on a terminal (leaf or flat
        # root); resolve symbols with one flat-bit fetch + table lookup
        t = typ[node]
        D = flat_d[node]
        ro = run_off[node]
        bp = p * D
        fb = ro + (bp >> 3)
        wfl = (sec32[jnp.minimum(fb, RSEC - 1)]
               | (sec32[jnp.minimum(fb + 1, RSEC - 1)] << 8)
               | (sec32[jnp.minimum(fb + 2, RSEC - 1)] << 16))
        path = (wfl >> (bp & 7)) & ((1 << D) - 1)
        oflat = c2s[jnp.minimum(flat_base[node] + path, FLAT - 1)]
        out = jnp.where(t == 1, sym[node].astype(jnp.uint8), oflat)
        return jnp.where(live, out, jnp.uint8(0))

    return jax.jit(jax.vmap(one))


def _pow2(n: int, lo: int = 8) -> int:
    return max(lo, 1 << (max(n, 1) - 1).bit_length())


def pad_plans(payloads: list[np.ndarray], plans: list[SectionPlan],
              L: int | None = None, RSEC: int | None = None,
              FLAT: int | None = None):
    """Stack sections + plans into fixed-shape batch arrays (host numpy)."""
    B = len(plans)
    if L is None:
        L = _pow2(max(p.n for p in plans))
    if RSEC is None:
        RSEC = _pow2(max(max(p.sec_len for p in plans), 4))
    if FLAT is None:
        FLAT = _pow2(max(len(p.c2s) for p in plans))
    sec = np.zeros((B, RSEC), np.uint8)
    c2s = np.zeros((B, FLAT), np.uint8)
    tabs = {k: np.zeros((B, NN), np.int32)
            for k in ("nxt0", "nxt1", "run_off", "typ", "sym", "flat_base")}
    flat_d = np.ones((B, NN), np.int32)
    n = np.zeros(B, np.int32)
    for j, (pay, p) in enumerate(zip(payloads, plans)):
        sec[j, :p.sec_len] = pay[:p.sec_len]
        c2s[j, :len(p.c2s)] = p.c2s
        tabs["nxt0"][j] = p.nxt0
        tabs["nxt1"][j] = p.nxt1
        tabs["run_off"][j] = p.run_off
        tabs["typ"][j] = p.typ
        tabs["sym"][j] = p.sym
        tabs["flat_base"][j] = p.flat_base
        flat_d[j] = p.flat_d
        n[j] = p.n
    rounds = max(p.rounds for p in plans)
    return (sec, tabs["nxt0"], tabs["nxt1"], tabs["run_off"], tabs["typ"],
            tabs["sym"], tabs["flat_base"], flat_d, c2s, n), L, RSEC, FLAT, rounds


def decode_sections_device(payloads: list[np.ndarray], ns: list[int],
                           trees: list[PivcoTree], device=None,
                           L: int | None = None) -> list[np.ndarray]:
    """Decode many PivCo sections on device; returns per-section uint8.

    Payloads are the node-run bytes (no 128-byte lengths header).
    """
    import jax
    if not payloads:
        return []
    plans = [plan_section(pay, n, t)
             for pay, n, t in zip(payloads, ns, trees)]
    args, L, RSEC, FLAT, rounds = pad_plans(payloads, plans, L=L)
    kern = routing_kernel(L, RSEC, FLAT, max(rounds, MAX_LEN + 1))
    dev_args = tuple(jax.device_put(a, device) for a in args)
    out = np.asarray(kern(*dev_args))
    return [out[j, :p.n] for j, p in enumerate(plans)]
