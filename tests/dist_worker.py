"""Multi-process jax.distributed worker (launched by test_distributed.py).

Each process owns 2 virtual CPU devices; N processes form one global mesh.
The dp x sp decode kernel then runs with REAL cross-process collectives:
`lax.all_gather` inside the pointer-doubling rounds crosses the process
boundary (the ICI/DCN stand-in), `pmax` reduces error flags, and the
frame-ordered gather lands on process 0 — the reference's ordering-writer
role (zxc_driver.c:521-597) mapped to jax.distributed (SURVEY.md section 5
"distributed communication backend").

Usage: python dist_worker.py <pid> <nproc> <port> [bench] [ndev] [bpd]
  ndev = virtual CPU devices per process (default 2; 1 = the clean
         non-oversubscribed configuration, one core per process)
  bpd  = blocks per DEVICE for the bench (weak scaling; default 4)
Exit code 0 = this process's shard of every check passed.
"""
import json
import os
import sys
import time


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    bench = len(sys.argv) > 4 and sys.argv[4] == "bench"
    ndev_pp = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    bpd = int(sys.argv[6]) if len(sys.argv) > 6 else 4

    import jax

    # CPU mesh must be configured before first backend use. On a real pod
    # set ZXC_DIST_PLATFORM=tpu: local devices are then the host's chips
    # and ndev is ignored (PERF.md section 4 runbook).
    if os.environ.get("ZXC_DIST_PLATFORM", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", ndev_pp)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    assert len(jax.devices()) == ndev_pp * nproc, \
        f"global devices {len(jax.devices())} != {ndev_pp * nproc}"
    assert len(jax.local_devices()) == ndev_pp

    from zxc_tpu import parallel
    from zxc_tpu.parallel import sharding
    from zxc_tpu.codec import frame
    from zxc_tpu.codec.frame import EncodeOpts
    from zxc_tpu.ops import plan_frame
    from zxc_tpu.ops.batch import _pad_batch, _pow2

    # deterministic mini-frame: every process derives the identical plan
    BLOCK = 4096 if not bench else 16384
    rng = np.random.default_rng(41)
    seg = rng.integers(0, 256, 467, dtype=np.uint8).tobytes()
    n_blocks = bpd * ndev_pp * nproc
    data = (seg * (BLOCK * n_blocks // len(seg) + 1) +
            b"repeatable tail " * 64)[:BLOCK * n_blocks]
    archive = frame.compress(data, EncodeOpts(level=3, block_size=BLOCK))
    plan = plan_frame(archive)
    S, L = _pow2(plan.max_seq), _pow2(plan.max_lit)
    host = _pad_batch(plan, range(plan.n_blocks), S, L)

    # ---- dp x sp over the GLOBAL mesh (2 sp shards inside each process
    # pair, dp crossing the process boundary) ----
    ndev = ndev_pp * nproc
    sp = 2 if ndev % 2 == 0 and ndev_pp > 1 else 1
    mesh = parallel.make_mesh(jax.devices(), axes=("dp", "sp"),
                              shape=(ndev // sp, sp))
    sh = NamedSharding(mesh, P("dp"))
    kern = sharding.dp_sp_kernel(BLOCK, sharding._mesh_key(mesh))

    def gmake(a):
        return jax.make_array_from_callback(
            a.shape, sh, lambda idx, _a=a: _a[idx])

    dev = tuple(gmake(a) for a in host)
    out, total, err = kern(*dev)
    # error flags already pmax-reduced over sp inside the kernel; gather
    # the dp-sharded output to every host, assert on process 0
    out_all = multihost_utils.process_allgather(out, tiled=True)
    err_all = multihost_utils.process_allgather(err, tiled=True)
    assert not np.asarray(err_all).any(), "decode error flags set"
    got = b"".join(np.asarray(out_all)[i, :plan.totals[i]].tobytes()
                   for i in range(plan.n_blocks))
    assert got == data, "dp x sp multi-process decode mismatch"

    # ---- dp-only kernel: same global mesh, 1-D dp axis ----
    mesh_dp = parallel.make_mesh(jax.devices(), axes=("dp",))
    sh_dp = NamedSharding(mesh_dp, P("dp"))
    kern_dp, _, _ = sharding._dp_kernel(BLOCK, sharding._mesh_key(mesh_dp),
                                        "dp", False)

    def gmake_dp(a):
        return jax.make_array_from_callback(
            a.shape, sh_dp, lambda idx, _a=a: _a[idx])

    dev_dp = tuple(gmake_dp(a) for a in host)
    out2, total2, err2 = kern_dp(*dev_dp)
    out2_all = np.asarray(multihost_utils.process_allgather(out2, tiled=True))
    got2 = b"".join(out2_all[i, :plan.totals[i]].tobytes()
                    for i in range(plan.n_blocks))
    assert got2 == data, "dp multi-process decode mismatch"

    if bench:
        # ICI-analog dictionary broadcast (the "dict + shared table
        # broadcast once" role, SURVEY.md section 5): one 64 KiB + 128 B
        # payload from process 0 to every process, timed separately from
        # the decode loop.
        dict_blob = (rng.integers(0, 256, 65536 + 128, dtype=np.uint8)
                     if pid == 0 else
                     np.zeros(65536 + 128, np.uint8))
        multihost_utils.sync_global_devices("bcast_start")
        t0 = time.perf_counter()
        got_d = multihost_utils.broadcast_one_to_all(dict_blob)
        t_bcast = time.perf_counter() - t0
        assert got_d.shape == (65536 + 128,)

        multihost_utils.sync_global_devices("bench_start")
        reps = 5
        best = 1e9
        for _ in range(reps):
            multihost_utils.sync_global_devices("rep")
            t0 = time.perf_counter()
            r = kern(*dev)
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - t0)
        if pid == 0:
            print(json.dumps({"nproc": nproc, "ndev": ndev,
                              "bytes": len(data), "best_s": best,
                              "bcast_s": t_bcast}), flush=True)

    multihost_utils.sync_global_devices("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
