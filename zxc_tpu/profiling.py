"""Tracing / per-phase metrics (SURVEY.md §5 tracing subsystem).

The reference has CLI bench timers only (src/cli/main.c:497-522 with
``zxc_now`` monotonic clocks); the TPU-native equivalents here are:

* :func:`trace` — a context manager around ``jax.profiler.trace`` that
  captures a TensorBoard/XProf device trace of everything inside it
  (compiles, DMAs, kernel timings).  View with
  ``tensorboard --logdir <dir>``.
* :class:`Phases` / :func:`phases` — lightweight host-side per-phase
  wall-time accumulator.  The device decode path records ``plan`` /
  ``resolve`` / ``device`` phases into the module-level collector when
  enabled, so production callers can see where a decode spent its time
  without attaching a profiler.

Both are zero-overhead when unused: ``phases()`` returns the active
collector or ``None``, and call sites guard on that.
"""
from __future__ import annotations

import contextlib
import time


class Phases:
    """Accumulates wall-time per named phase; re-entrant per phase."""

    def __init__(self) -> None:
        self.seconds: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.seconds[name] = self.seconds.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def as_dict(self) -> dict[str, dict[str, float]]:
        return {k: {"seconds": self.seconds[k], "calls": self.counts[k]}
                for k in self.seconds}

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        body = ", ".join(f"{k}={v:.4f}s" for k, v in self.seconds.items())
        return f"Phases({body})"


_active: Phases | None = None


def phases() -> Phases | None:
    """The currently-installed collector (None = metrics disabled)."""
    return _active


@contextlib.contextmanager
def collect_phases():
    """Enable per-phase metrics for the dynamic extent; yields the
    :class:`Phases` collector that instrumented paths write into."""
    global _active
    prev = _active
    _active = Phases()
    try:
        yield _active
    finally:
        _active = prev


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a JAX/XProf device trace into ``logdir``.

    Wraps ``jax.profiler.trace``; inside the block, run the workload you
    want profiled (e.g. ``ops.decompress(...)``).  On TPU this records
    per-kernel device timings; on CPU it still captures host events.
    """
    import jax

    with jax.profiler.trace(logdir):
        yield
