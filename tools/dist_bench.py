"""Multi-process scaling-efficiency harness (CPU-relative).

Runs the dp x sp decode kernel under jax.distributed with 1, 2, and 4
processes (2 virtual CPU devices each, blocks-per-device held constant —
weak scaling) and reports efficiency = t(1 proc) / t(N proc). On real
TPU pods the same worker measures the >= 80% multi-host target
(BASELINE.json); this harness validates the measurement pipeline and the
collective path end to end on one machine.

Usage: [DIST_NS=1,2,3,4] [DIST_BPD=16] [DIST_PIN=1] python tools/dist_bench.py

DIST_BPD scales the per-device workload (blocks of 16 KiB per device;
the round-4 verdict flagged the 16-block default as launch-overhead-
dominated — DIST_BPD=256 gives a seconds-long sustained decode).
DIST_PIN=1 pins worker i to core i (taskset) and caps XLA intra-op
threads at 1 — the core-pressure control for the N=4 row.
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


def run(nproc: int, ndev: int = 1, bpd: int = 16, pin: bool = False) -> dict:
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = (_REPO + os.pathsep + "/root/.axon_site"
                         + os.pathsep + env.get("PYTHONPATH", ""))
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    if pin:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_cpu_multi_thread_eigen=false")
        env["OMP_NUM_THREADS"] = "1"
    procs = [subprocess.Popen(
        ((["taskset", "-c", str(pid)] if pin else [])
         + [sys.executable, WORKER, str(pid), str(nproc), str(port),
            "bench", str(ndev), str(bpd)]),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(nproc)]
    result = None
    for p in procs:
        out, err = p.communicate(timeout=1800)
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
    ns = [int(x) for x in os.environ.get(
        "DIST_NS", "1,2,3,4").split(",") if int(x) <= ncpu]
    bpd = int(os.environ.get("DIST_BPD", "16"))
    pin = os.environ.get("DIST_PIN", "0") == "1"
    rows = [run(n, ndev=1, bpd=bpd, pin=pin) for n in ns]
    t1 = rows[0]["best_s"]
    print(f"# bpd={bpd} (16 KiB blocks/device: "
          f"{bpd * 16384 / 1e6:.1f} MB/device), pin={pin}")
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
