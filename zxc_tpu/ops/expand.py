"""Device LZ sequence expansion: the decode hot path on TPU.

This is phase 2+3 of the parallel decode pipeline (the reference's serial
4x-unrolled SAFE/FAST copy loops, zxc_decompress.c:890-1034, reformulated):

* **prefix sums** of (ll, ll+ml) give every sequence's literal-source and
  output positions; all offset/bounds validation is one whole-array
  predicate (the SAFE->FAST threshold collapses into a flag reduce);
* a **segment-id map** (scatter ones at segment starts, cumsum) assigns each
  output byte its sequence;
* literal bytes resolve by a single gather; match bytes get a back-pointer
  with *within-match self-overlap collapsed analytically* (``rel % off``
  jumps straight out of the byte's own match, so ``off==1`` fills and the
  reference's pattern-replication ladder, zxc_decompress.c:159-274, cost
  nothing extra);
* remaining cross-match chains resolve by **pointer doubling** — each round
  squares the jump distance, so a chain of depth d needs ceil(log2 d)
  gathers, with a whole-batch early exit when everything is resolved.

Everything is static-shape: sequences pad to S, literals to L, output to the
frame's block size. Batched with vmap over the leading axis; the batch is
the data-parallel axis that shards across chips (zxc_tpu.parallel).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .. import constants as C

# Right-aligned dictionary pad for the dict variant: [dict | output] coords.
DICT_PAD = 1 << 16


def _exclusive_cumsum(x):
    return jnp.cumsum(x) - x


def _expand_one(ll, ml, off, lit, n_seq, lit_len, block: int, dict_buf=None,
                dict_len=None):
    """Expand one block. All inputs device arrays; shapes static.

    ll/ml/off: (S,) int32 (ml includes MIN_MATCH, off unbiased >= 1)
    lit:       (L,) uint8 entropy-decoded literal bytes
    n_seq, lit_len: () int32 actual counts
    dict_buf:  (DICT_PAD,) uint8 right-aligned dictionary or None
    Returns (out: (block,) uint8, total: () int32, err: () int32 bitmask).
    """
    S = ll.shape[0]
    L = lit.shape[0]
    D = DICT_PAD if dict_buf is not None else 0
    Q = D + block

    sidx = jnp.arange(S, dtype=jnp.int32)
    valid = sidx < n_seq
    ll = jnp.where(valid, ll, 0)
    ml = jnp.where(valid, ml, 0)
    off = jnp.where(valid, jnp.maximum(off, 1), 1)

    seq_out = ll + ml
    out_start = _exclusive_cumsum(seq_out)            # (S,) exclusive
    match_start = out_start + ll
    cum_ll = _exclusive_cumsum(ll)
    total_seq = jnp.sum(seq_out)
    lit_used = jnp.sum(ll)
    trailing = jnp.maximum(lit_len - lit_used, 0)
    total = total_seq + trailing

    # error bits: 1 = literal stream exhausted, 2 = capacity overflow,
    # 4 = offset out of window (maps to the reference's error codes)
    dlen = dict_len if dict_buf is not None else jnp.int32(0)
    err = ((lit_used > lit_len).astype(jnp.int32)
           | ((total > block).astype(jnp.int32) << 1)
           | (jnp.any(valid & (off > match_start + dlen)).astype(jnp.int32) << 2))

    # segment ids: every valid sequence emits >= MIN_MATCH bytes, so
    # out_start is strictly increasing and a 1-scatter + cumsum is exact.
    starts = jnp.where(valid, out_start, block)       # park padding off-end
    seg = jnp.zeros(block + 1, jnp.int32).at[starts].add(1, mode="drop")
    sid = jnp.cumsum(seg[:block]) - 1                 # (block,) int32
    sid = jnp.clip(sid, 0, jnp.maximum(n_seq - 1, 0))

    p = jnp.arange(block, dtype=jnp.int32)
    in_seq = (p < total_seq) & (n_seq > 0)
    ms = match_start[sid]
    osr = out_start[sid]
    is_match = in_seq & (p >= ms)

    # literal source index: in-sequence literals, then trailing tail
    lit_idx = jnp.where(in_seq, cum_ll[sid] + (p - osr),
                        lit_used + (p - total_seq))
    lit_byte = lit[jnp.clip(lit_idx, 0, L - 1)]

    # match back-pointer in q-space with self-overlap collapsed
    offv = off[sid]
    rel = p - ms
    collapsed = jnp.where(rel >= offv, rel % offv, rel) - offv
    q_target = jnp.maximum(D + ms + collapsed, 0)

    node = jnp.where(is_match, q_target, -(lit_byte.astype(jnp.int32) + 1))
    if D:
        dnode = -(dict_buf.astype(jnp.int32) + 1)
        node = jnp.concatenate([dnode, node])

    # pointer doubling; chains strictly decrease so <= log2(Q)+1 rounds,
    # with a batch-wide early exit (vmap reduces the predicate with any()).
    max_iters = int(math.ceil(math.log2(Q))) + 1

    def cond(state):
        i, nd = state
        return (i < max_iters) & jnp.any(nd >= 0)

    def body(state):
        i, nd = state
        return i + 1, jnp.where(nd >= 0, nd[jnp.maximum(nd, 0)], nd)

    _, node = jax.lax.while_loop(cond, body, (jnp.int32(0), node))
    out = (-(node[D:]) - 1).astype(jnp.uint8)
    out = jnp.where(p < total, out, 0)
    return out, total, err


@functools.lru_cache(maxsize=None)
def expand_kernel(block: int, has_dict: bool):
    """Jitted batched expansion kernel for static (block, has_dict).

    Call signature (no dict):  (ll, ml, off, lit, n_seq, lit_len) batched on
    the leading axis; with dict, trailing (dict_buf, dict_len) broadcast.
    Returns (out (B, block) u8, total (B,) i32, err (B,) bool).
    """
    if has_dict:
        def fn(ll, ml, off, lit, n_seq, lit_len, dict_buf, dict_len):
            return _expand_one(ll, ml, off, lit, n_seq, lit_len, block,
                               dict_buf, dict_len)
        return jax.jit(jax.vmap(fn, in_axes=(0, 0, 0, 0, 0, 0, None, None)))

    def fn(ll, ml, off, lit, n_seq, lit_len):
        return _expand_one(ll, ml, off, lit, n_seq, lit_len, block)
    return jax.jit(jax.vmap(fn))


def _expand_pieces_one(po, pc, ps, pk, lit, n_pieces, total, block: int):
    """Piece-plan expansion: no pointer chase, two gathers total.

    The host resolver (zxc_tpu.runtime.resolve_pieces) flattened all match
    chains into ``out[p] = lit[c + (p - s) % k]`` pieces, so the device
    does: rank assignment (scatter + cumsum), one packed table gather, the
    modulo, and one byte gather — every pass dense or single-gather.

    po/pc/ps/pk: (P,) int32 piece tables (po strictly increasing)
    lit: (L,) uint8 = dict ++ literals; n_pieces/total: () int32.
    """
    P = po.shape[0]
    L = lit.shape[0]
    pidx = jnp.arange(P, dtype=jnp.int32)
    valid = pidx < n_pieces
    starts = jnp.where(valid, po, block)
    seg = jnp.zeros(block + 1, jnp.int32).at[starts].add(1, mode="drop")
    rank = jnp.clip(jnp.cumsum(seg[:block]) - 1, 0,
                    jnp.maximum(n_pieces - 1, 0))
    p = jnp.arange(block, dtype=jnp.int32)
    c = pc[rank]
    s = ps[rank]
    k = jnp.maximum(pk[rank], 1)
    lit_idx = c + (p - s) % k
    out = lit[jnp.clip(lit_idx, 0, L - 1)]
    return jnp.where(p < total, out, 0)


@functools.lru_cache(maxsize=None)
def pieces_kernel(block: int):
    """Jitted batched piece-plan kernel; leading batch axis via vmap."""
    def fn(po, pc, ps, pk, lit, n_pieces, total):
        return _expand_pieces_one(po, pc, ps, pk, lit, n_pieces, total, block)
    return jax.jit(jax.vmap(fn))


def pad_dict(dict_buf) -> jnp.ndarray:
    """Right-align a dictionary into the static DICT_PAD coordinate space."""
    import numpy as np
    d = np.zeros(DICT_PAD, np.uint8)
    if dict_buf is not None and len(dict_buf):
        d[DICT_PAD - len(dict_buf):] = dict_buf
    return jnp.asarray(d)
