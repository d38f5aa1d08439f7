"""MT streaming pipeline + in-place decode (reference: stream suite +
test_multithread_roundtrip + in-place cases)."""
import io

import numpy as np
import pytest

from zxc_tpu.codec import frame, stream
from zxc_tpu.codec.frame import (DecodeOpts, EncodeOpts, decompress_inplace,
                                 decompress_inplace_bound)
from zxc_tpu.errors import ZxcError

import ref_oracle


def _data(n=800_000, seed=0):
    rng = np.random.default_rng(seed)
    seg = rng.integers(0, 256, 1511, dtype=np.uint8).tobytes()
    return (seg * (n // len(seg) + 1))[:n]


@pytest.mark.parametrize("threads", [1, 4])
def test_stream_roundtrip_mt(threads):
    data = _data()
    src = io.BytesIO(data)
    comp = io.BytesIO()
    n = stream.stream_compress(src, comp, EncodeOpts(level=3,
                                                     block_size=65536,
                                                     checksum=True), threads)
    assert n == comp.tell()
    comp.seek(0)
    out = io.BytesIO()
    produced = stream.stream_decompress(comp, out,
                                        DecodeOpts(checksum=True), threads)
    assert produced == len(data)
    assert out.getvalue() == data


def test_stream_matches_oneshot():
    data = _data(200_000, seed=1)
    comp = io.BytesIO()
    stream.stream_compress(io.BytesIO(data), comp,
                           EncodeOpts(level=2, block_size=16384,
                                      checksum=True, seekable=True), 4)
    want = frame.compress(data, EncodeOpts(level=2, block_size=16384,
                                           checksum=True, seekable=True))
    assert comp.getvalue() == want


def test_stream_decompress_ref_archive():
    data = _data(300_000, seed=2)
    arc = ref_oracle.ref_compress(data, level=3, block_size=65536,
                                  checksum=True, seekable=True)
    out = io.BytesIO()
    stream.stream_decompress(io.BytesIO(arc), out, DecodeOpts(checksum=True), 4)
    assert out.getvalue() == data


def test_stream_get_decompressed_size():
    data = _data(50_000, seed=3)
    arc = frame.compress(data, EncodeOpts(level=1))
    assert stream.stream_get_decompressed_size(io.BytesIO(arc)) == len(data)


def test_stream_truncated_detected():
    data = _data(100_000, seed=4)
    arc = frame.compress(data, EncodeOpts(level=1, block_size=16384))
    with pytest.raises(ZxcError):
        stream.stream_decompress(io.BytesIO(arc[:len(arc) // 2]),
                                 io.BytesIO(), None, 2)


def test_inplace_decode():
    data = _data(150_000, seed=5)
    arc = frame.compress(data, EncodeOpts(level=3, block_size=16384,
                                          checksum=True))
    bound = decompress_inplace_bound(arc)
    assert bound >= len(data)
    buf = bytearray(bound)
    buf[bound - len(arc):] = arc  # flush-right
    n = decompress_inplace(buf, len(arc), DecodeOpts(checksum=True))
    assert n == len(data)
    assert bytes(buf[:n]) == data


def test_inplace_rejects_small_buffer():
    data = _data(60_000, seed=6)
    arc = frame.compress(data, EncodeOpts(level=3, block_size=16384))
    buf = bytearray(len(data) + 16)   # no margin
    buf[len(buf) - len(arc):] = arc
    with pytest.raises(ZxcError):
        decompress_inplace(buf, len(arc))


def test_inplace_bound_invalid_archive():
    assert decompress_inplace_bound(b"not an archive at all!") == 0


def test_progress_callback_compress():
    """Writer-side progress: monotone input-byte counts per block, final
    call reports the full input (zxc_opts.h:34-47 semantics)."""
    import io
    data = _data(100_000, seed=11)
    calls = []
    buf = io.BytesIO()
    stream.stream_compress(io.BytesIO(data), buf,
                           EncodeOpts(level=2, block_size=16384),
                           progress=lambda done, total: calls.append((done, total)),
                           total_bytes=len(data))
    n_blocks = (len(data) + 16383) // 16384
    assert len(calls) == n_blocks
    dones = [c[0] for c in calls]
    assert dones == sorted(dones) and dones[-1] == len(data)
    assert all(c[1] == len(data) for c in calls)
    assert frame.decompress(buf.getvalue()) == data


def test_progress_callback_decompress():
    import io
    data = _data(80_000, seed=12)
    arc = frame.compress(data, EncodeOpts(level=3, block_size=16384))
    calls = []
    out = io.BytesIO()
    stream.stream_decompress(io.BytesIO(arc), out,
                             progress=lambda done, total: calls.append(done))
    assert out.getvalue() == data
    assert calls[-1] == len(data)
    assert calls == sorted(calls)


def test_phase_metrics_device_decode():
    """profiling.collect_phases records plan/resolve/device wall time for
    the device decode path (SURVEY §5 tracing subsystem)."""
    import jax
    from zxc_tpu import ops, profiling
    data = _data(200_000, seed=13)
    arc = frame.compress(data, EncodeOpts(level=3, block_size=16384))
    cpu = jax.devices("cpu")[0]
    with profiling.collect_phases() as ph:
        out = ops.decompress(arc, device=cpu)
    assert out == data
    m = ph.as_dict()
    assert set(m) >= {"plan", "resolve", "device"}
    assert all(v["seconds"] >= 0 and v["calls"] >= 1 for v in m.values())
    # collector uninstalled outside the block
    assert profiling.phases() is None


def test_mt_encode_deterministic_under_cold_native_load():
    """Regression: lib()'s _tried flag once published before the .so
    finished loading, so MT workers racing a cold native build silently
    fell back to the Python encoder for a nondeterministic subset of
    blocks (valid archives, differing bytes). Force the coldest path —
    delete the .so so the first worker rebuilds it with g++ — and require
    byte-identical MT output across fresh processes."""
    import os
    import subprocess
    import sys
    data = _data(700_000, seed=31)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(root, "zxc_tpu", "runtime", "libzxchost.so")
    script = (
        "import sys, io\n"
        "sys.path.insert(0, %r)\n"
        "from zxc_tpu.codec import stream\n"
        "from zxc_tpu.codec.frame import EncodeOpts\n"
        "data = sys.stdin.buffer.read()\n"
        "buf = io.BytesIO()\n"
        "stream.stream_compress(io.BytesIO(data), buf,\n"
        "                       EncodeOpts(level=1, checksum=True), 4)\n"
        "sys.stdout.buffer.write(buf.getvalue())\n" % root)
    outs = []
    env = dict(os.environ)
    env.pop("ZXC_NO_NATIVE", None)
    for _ in range(2):
        if os.path.exists(so):
            os.unlink(so)
        r = subprocess.run([sys.executable, "-c", script], input=data,
                           capture_output=True, env=env, timeout=300)
        assert r.returncode == 0, r.stderr[-500:]
        outs.append(r.stdout)
    assert outs[0] == outs[1]
    assert frame.decompress(outs[0], DecodeOpts(checksum=True)) == data
