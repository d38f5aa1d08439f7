"""Multi-process jax.distributed validation (SURVEY.md:251).

Spawns N OS processes, each with 2 virtual CPU devices, joined through
``jax.distributed.initialize`` into one global mesh. The dp and dp x sp
decode kernels then execute with genuine cross-process collectives —
the single-process 8-device dryrun cannot exercise the coordination
service, multi-controller array construction, or process_allgather;
this suite does. (Reference analog: the pthread ring-buffer engine,
zxc_driver.c:639-1035, whose "distributed backend" role BASELINE.json
maps to jax.distributed over ICI/DCN.)
"""
import os
import socket
import subprocess
import sys

import pytest

_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_DIR)
WORKER = os.path.join(_DIR, "dist_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(nproc: int, bench: bool = False, timeout: int = 420):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = (_REPO + os.pathsep + "/root/.axon_site"
                         + os.pathsep + env.get("PYTHONPATH", ""))
    # keep the child off the real TPU tunnel (exclusive single-process lock)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    procs = []
    for pid in range(nproc):
        args = [sys.executable, WORKER, str(pid), str(nproc), str(port)]
        if bench:
            args.append("bench")
        procs.append(subprocess.Popen(
            args, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    outs = []
    try:
        for p in procs:
            out, errtxt = p.communicate(timeout=timeout)
            outs.append((p.returncode, out, errtxt))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, errtxt in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{errtxt[-3000:]}"
    return outs


@pytest.mark.parametrize("nproc", [2])
def test_multiprocess_dp_sp_decode(nproc):
    """2 processes x 2 devices: dp x sp decode bit-exact across the
    process boundary (all_gather + pmax over real IPC)."""
    _launch(nproc)


@pytest.mark.slow
def test_multiprocess_four_processes():
    _launch(4, timeout=600)
