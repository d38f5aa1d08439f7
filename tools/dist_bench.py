"""Multi-process scaling-efficiency harness (CPU-relative).

Runs the dp x sp decode kernel under jax.distributed with 1, 2, and 4
processes (2 virtual CPU devices each, blocks-per-device held constant —
weak scaling) and reports efficiency = t(1 proc) / t(N proc). On real
TPU pods the same worker measures the >= 80% multi-host target
(BASELINE.json); this harness validates the measurement pipeline and the
collective path end to end on one machine.

Usage: python tools/dist_bench.py
"""
import json
import os
import socket
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(_REPO, "tests", "dist_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run(nproc: int, ndev: int = 1, bpd: int = 16) -> dict:
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = (_REPO + os.pathsep + "/root/.axon_site"
                         + os.pathsep + env.get("PYTHONPATH", ""))
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nproc), str(port), "bench",
         str(ndev), str(bpd)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(nproc)]
    result = None
    for p in procs:
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            raise RuntimeError(f"worker rc={p.returncode}:\n{err[-2000:]}")
        for line in out.splitlines():
            try:
                result = json.loads(line)
            except json.JSONDecodeError:
                continue
    assert result is not None, "no bench line from process 0"
    return result


def main():
    # clean configuration: ONE virtual device per process, one core per
    # process on this 4-core host (no oversubscription at N <= 4);
    # blocks-per-device constant (weak scaling)
    import multiprocessing
    ncpu = multiprocessing.cpu_count()
    ns = [n for n in (1, 2, 4) if n <= ncpu]
    rows = [run(n, ndev=1, bpd=16) for n in ns]
    t1 = rows[0]["best_s"]
    print(f"{'nproc':>6} {'devices':>8} {'bytes':>10} {'time_s':>9} "
          f"{'per-dev MB/s':>13} {'weak-scale eff':>15} {'bcast_ms':>9}")
    for r in rows:
        n = r["nproc"]
        eff = t1 / r["best_s"]
        rate = r["bytes"] / r["best_s"] / 1e6 / r["ndev"]
        print(f"{n:>6} {r['ndev']:>8} {r['bytes']:>10} {r['best_s']:>9.4f} "
              f"{rate:>13.1f} {eff:>14.0%} {r['bcast_s']*1e3:>9.2f}")


if __name__ == "__main__":
    main()
