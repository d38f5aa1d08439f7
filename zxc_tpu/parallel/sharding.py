"""Multi-chip decode: block data-parallelism + in-block sequence parallelism.

The reference's parallelism is pthreads over independent blocks
(zxc_driver.c:639-1035) and fork-join over seekable ranges
(zxc_seekable.c:1005-1123). The TPU-native equivalents:

* **dp** — independent blocks shard across chips on the leading batch axis
  (the ring-buffer worker pool becomes one sharded dispatch);
* **sp** — inside a block, output positions shard across chips; the
  pointer-doubling rounds exchange the resolution array with
  ``lax.all_gather`` over ICI (the reference has no equivalent — its window
  always fits one cache);
* per-block error flags reduce with ``psum``-style collectives, and frame
  assembly is an ordered gather on host 0 (``jax.device_get`` of the
  dp-sharded output respects batch order by construction).
"""
from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import constants as CONST
from ..ops import expand
from ..ops.batch import FramePlan, _pad_batch, _raise_errbits, _pow2
from ..errors import ZxcError, ERROR_CORRUPT_DATA


def make_mesh(devices=None, axes: tuple[str, ...] = ("dp",),
              shape: tuple[int, ...] | None = None) -> Mesh:
    """Build a device mesh; defaults to 1-D data-parallel over all devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) if len(axes) == 1 else (n // 2, 2)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axes)


# ---------------------------------------------------------------------------
# dp: batched blocks sharded over the mesh
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _dp_kernel(block: int, mesh_key, dp_axis: str, has_dict: bool = False):
    """Jitted dp-sharded expansion: the batch axis partitioned over chips;
    the dictionary (when present) is replicated — the "broadcast once over
    ICI" of the north-star design."""
    mesh = _MESHES[mesh_key]
    kern = expand.expand_kernel(block, has_dict)
    shard = NamedSharding(mesh, P(dp_axis))
    repl = NamedSharding(mesh, P())
    in_sh = (shard,) * 6 + ((repl, repl) if has_dict else ())
    out_sh = (shard, shard, shard)
    return jax.jit(kern, in_shardings=in_sh, out_shardings=out_sh), shard, repl


_MESHES: dict = {}


def _mesh_key(mesh: Mesh):
    key = (tuple(d.id for d in mesh.devices.flat), mesh.devices.shape,
           mesh.axis_names)
    _MESHES[key] = mesh
    return key


def decode_plan_sharded(plan: FramePlan, mesh: Mesh, dp_axis: str = "dp",
                        batch: int | None = None) -> bytes:
    """Decode a FramePlan with blocks sharded data-parallel over the mesh.

    Outputs are device_get in batch order — the frame-ordered gather on
    host 0 (the reference's ordering writer, zxc_driver.c:521-597).
    """
    nb = plan.n_blocks
    if nb == 0:
        return b""
    has_dict = plan.dict_buf is not None
    ndev = int(np.prod([mesh.shape[a] for a in (dp_axis,)]))
    if batch is None:
        batch = max(ndev, ((min(nb, 64) + ndev - 1) // ndev) * ndev)
    S = _pow2(plan.max_seq)
    L = _pow2(plan.max_lit)
    kern, shard, repl = _dp_kernel(plan.block_size, _mesh_key(mesh), dp_axis,
                                   has_dict)
    dict_args = ()
    if has_dict:
        import jax.numpy as jnp
        dict_args = (jax.device_put(expand.pad_dict(plan.dict_buf), repl),
                     jnp.int32(plan.dict_len))

    out_parts: list[np.ndarray] = []
    for base in range(0, nb, batch):
        hi = min(base + batch, nb)
        idx = range(base, hi)
        host = _pad_batch(plan, idx, S, L)
        # pad batch to a multiple of the mesh so shards are equal
        pad_to = ((len(idx) + ndev - 1) // ndev) * ndev
        if pad_to != len(idx):
            host = tuple(np.concatenate(
                [a, np.zeros((pad_to - len(idx),) + a.shape[1:], a.dtype)
                 + (1 if i == 2 else 0)])  # off pads with 1
                for i, a in enumerate(host))
        dev = tuple(jax.device_put(a, shard) for a in host)
        out, total, err = kern(*dev, *dict_args)
        err_np = np.asarray(err)[:len(idx)]
        if err_np.any():
            _raise_errbits(int(err_np[err_np != 0][0]))
        out_np = np.asarray(out)
        for j, i in enumerate(idx):
            out_parts.append(out_np[j, :plan.totals[i]])
    return np.concatenate(out_parts).tobytes() if out_parts else b""


# ---------------------------------------------------------------------------
# dp x sp: positions inside each block sharded too (shard_map + all_gather)
# ---------------------------------------------------------------------------

def _expand_sp_local(ll, ml, off, lit, n_seq, lit_len, *, block: int,
                     sp_axis: str, n_sp: int):
    """Per-shard body: this chip owns ``block / n_sp`` output positions of
    every local block; pointer-doubling all_gathers the resolution array."""
    S = ll.shape[0]
    L = lit.shape[0]
    chunk = block // n_sp
    me = jax.lax.axis_index(sp_axis)
    p0 = me * chunk

    sidx = jnp.arange(S, dtype=jnp.int32)
    valid = sidx < n_seq
    ll = jnp.where(valid, ll, 0)
    ml = jnp.where(valid, ml, 0)
    off = jnp.where(valid, jnp.maximum(off, 1), 1)
    seq_out = ll + ml
    out_start = jnp.cumsum(seq_out) - seq_out
    match_start = out_start + ll
    cum_ll = jnp.cumsum(ll) - ll
    total_seq = jnp.sum(seq_out)
    lit_used = jnp.sum(ll)
    trailing = jnp.maximum(lit_len - lit_used, 0)
    total = total_seq + trailing
    err = ((lit_used > lit_len).astype(jnp.int32)
           | ((total > block).astype(jnp.int32) << 1)
           | (jnp.any(valid & (off > match_start)).astype(jnp.int32) << 2))

    # local positions
    p = p0 + jnp.arange(chunk, dtype=jnp.int32)
    # segment id via branchless searchsorted (S is small in the dryrun/test
    # regime; the dp kernel's scatter+cumsum needs global positions)
    sid = jnp.clip(jnp.searchsorted(
        jnp.where(valid, out_start, jnp.int32(2 ** 30)), p, side="right") - 1,
        0, jnp.maximum(n_seq - 1, 0)).astype(jnp.int32)
    in_seq = (p < total_seq) & (n_seq > 0)
    ms = match_start[sid]
    osr = out_start[sid]
    is_match = in_seq & (p >= ms)
    lit_idx = jnp.where(in_seq, cum_ll[sid] + (p - osr),
                        lit_used + (p - total_seq))
    lit_byte = lit[jnp.clip(lit_idx, 0, L - 1)]
    offv = off[sid]
    rel = p - ms
    collapsed = jnp.where(rel >= offv, rel % offv, rel) - offv
    q_target = jnp.maximum(ms + collapsed, 0)
    node = jnp.where(is_match, q_target, -(lit_byte.astype(jnp.int32) + 1))

    # Fixed trip count: the loop body contains a collective (all_gather), so
    # every sp shard MUST run the same number of rounds — a data-dependent
    # while_loop would diverge across shards and deadlock the collective.
    max_iters = int(math.ceil(math.log2(max(block, 2)))) + 1

    def body(_, nd):
        # assemble the full resolution array over the sp axis, then jump
        full = jax.lax.all_gather(nd, sp_axis, axis=0, tiled=True)
        return jnp.where(nd >= 0, full[jnp.maximum(nd, 0)], nd)

    node = jax.lax.fori_loop(0, max_iters, body, node)
    out = (-node - 1).astype(jnp.uint8)
    out = jnp.where(p < total, out, 0)
    # every shard reports the same totals; err reduces with max (psum-style)
    err = jax.lax.pmax(err, sp_axis)
    return out, total, err


@functools.lru_cache(maxsize=None)
def dp_sp_kernel(block: int, mesh_key, dp_axis: str = "dp",
                 sp_axis: str = "sp"):
    """Fully-sharded decode step: blocks over dp, positions over sp.

    Input batch axis shards over dp; each block's ``block`` output positions
    shard over sp. This is the kernel ``__graft_entry__.dryrun_multichip``
    compiles over an N-device mesh.
    """
    mesh = _MESHES[mesh_key]
    n_sp = mesh.shape[sp_axis]
    body = functools.partial(_expand_sp_local, block=block,
                             sp_axis=sp_axis, n_sp=n_sp)
    vb = jax.vmap(body, in_axes=(0, 0, 0, 0, 0, 0))

    from jax.experimental.shard_map import shard_map
    sm = shard_map(
        vb, mesh=mesh,
        in_specs=(P(dp_axis), P(dp_axis), P(dp_axis), P(dp_axis),
                  P(dp_axis), P(dp_axis)),
        out_specs=(P(dp_axis, sp_axis), P(dp_axis), P(dp_axis)),
        check_rep=False)
    return jax.jit(sm)


def decode_plan_dp_sp(plan: FramePlan, mesh: Mesh) -> bytes:
    """Decode with the fully-sharded dp x sp kernel (demonstration/dryrun
    path; production single-host decode uses decode_plan_sharded)."""
    nb = plan.n_blocks
    if nb == 0:
        return b""
    ndp = mesh.shape["dp"]
    S = _pow2(plan.max_seq)
    L = _pow2(plan.max_lit)
    B = ((nb + ndp - 1) // ndp) * ndp
    host = _pad_batch(plan, range(nb), S, L)
    host = tuple(np.concatenate(
        [a, np.zeros((B - nb,) + a.shape[1:], a.dtype) + (1 if i == 2 else 0)])
        for i, a in enumerate(host))
    kern = dp_sp_kernel(plan.block_size, _mesh_key(mesh))
    out, total, err = kern(*host)
    err_np = np.asarray(err)[:nb]
    if err_np.any():
        _raise_errbits(int(err_np[err_np != 0][0]))
    out_np = np.asarray(out)
    return np.concatenate([out_np[i, :plan.totals[i]]
                           for i in range(nb)]).tobytes()


# ---------------------------------------------------------------------------
# Encode-side dp: device match finding sharded over blocks
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _encode_dp_kernel(mesh_key, dp_axis: str, n_candidates: int, lazy: bool):
    """jit(shard_map(vmap(match+parse))) over the dp axis.

    Blocks are independent (the reference's worker-pool axis,
    zxc_driver.c:639), so no collectives are needed — the mesh gives
    linear scale-out of the sort-bound matcher.
    """
    from jax.experimental.shard_map import shard_map
    from ..ops import encode as dev_enc

    mesh = _MESHES[mesh_key]

    def one(block):
        lens, offs = dev_enc.find_matches_device(block, n_candidates)
        return dev_enc.parse_compact_device(lens, offs, lazy)

    shard = shard_map(jax.vmap(one), mesh=mesh,
                      in_specs=P(dp_axis, None),
                      out_specs=(P(dp_axis), P(dp_axis, None),
                                 P(dp_axis, None), P(dp_axis, None)))
    return jax.jit(shard)


def encode_blocks_sharded(blocks: np.ndarray, mesh: Mesh, level: int = 3,
                          dp_axis: str = "dp"):
    """Match+parse a (B, S) batch of equal-size blocks across the mesh.

    Returns (n_seq (B,), pos, len, off — each (B, S//5+1) int32, compacted).
    B must be a multiple of the dp axis size (pad with zero blocks and
    ignore their outputs).  Byte emission stays host-side per block.
    """
    from ..codec import block_encode

    params = block_encode.level_params(level)
    key = _mesh_key(mesh)
    fn = _encode_dp_kernel(key, dp_axis, params.n_candidates, params.lazy)
    return fn(jnp.asarray(blocks, jnp.uint8))


def compress_sharded(data: bytes, mesh: Mesh, level: int = 3,
                     block_size: int = 65536, checksum: bool = False,
                     dp_axis: str = "dp") -> bytes:
    """Frame encode with match finding dp-sharded across the mesh.

    Full blocks run as one sharded dispatch; the tail block (and padding
    remainders) fall back to the single-device path.  Ordered frame
    assembly on host mirrors the reference's ordering writer.
    """
    from ..codec import block_encode
    from ..codec.stream import global_hash_update
    from ..format import headers
    from ..ops import encode as dev_enc

    CONST.block_size_code(block_size)
    ndp = mesh.shape[dp_axis]
    n_full = len(data) // block_size
    n_batch = (n_full // ndp) * ndp  # blocks that ride the sharded dispatch
    out = bytearray(headers.write_file_header(block_size, checksum))
    global_hash = 0

    def emit(chunk_arr, seqs):
        nonlocal global_hash
        blk = block_encode.encode_chunk(chunk_arr, level, None, checksum,
                                        sequences=seqs)
        if checksum:
            stored = int.from_bytes(blk[-4:], "little")
            global_hash = global_hash_update(global_hash, stored)
        out.extend(blk)

    if n_batch:
        arr = np.frombuffer(data[:n_batch * block_size], np.uint8)
        blocks = arr.reshape(n_batch, block_size)
        n_seq, pos_b, len_b, off_b = encode_blocks_sharded(
            blocks, mesh, level, dp_axis)
        n_seq = np.asarray(n_seq)
        pos_b = np.asarray(pos_b)
        len_b = np.asarray(len_b)
        off_b = np.asarray(off_b)
        for i in range(n_batch):
            k = int(n_seq[i])
            emit(blocks[i], (pos_b[i, :k].astype(np.int64),
                             len_b[i, :k].astype(np.int64),
                             off_b[i, :k].astype(np.int64)))
    for pos in range(n_batch * block_size, len(data), block_size):
        chunk = data[pos:pos + block_size]
        blk = dev_enc.encode_chunk_device(chunk, level, None, checksum)
        if checksum:
            stored = int.from_bytes(blk[-4:], "little")
            global_hash = global_hash_update(global_hash, stored)
        out.extend(blk)
    out += headers.write_block_header(CONST.BLOCK_EOF, 0)
    out += headers.write_file_footer(len(data), global_hash, checksum)
    return bytes(out)
