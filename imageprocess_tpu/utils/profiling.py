"""Profiling hooks: jax profiler traces + per-stage wall timers.

The reference's only tracing is elapsed-seconds log prefixes and per-step
wall timers (SURVEY §5).  The rebuild adds a real device profile: pass
``--xprof DIR`` to any CLI command (or use :func:`maybe_profile`) to capture
a TensorBoard-loadable trace of the XLA programs, plus ``StageTimer`` for
cheap named host-side stage breakdowns.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str]):
    """jax.profiler.trace(trace_dir) when a directory is given, else no-op."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


class StageTimer:
    """Accumulating named wall timers.

    >>> timer = StageTimer()
    >>> with timer("decode"): ...
    >>> timer.report(print)
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self, log=print) -> None:
        total = sum(self.totals.values()) or 1.0
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            log(f"[profile] {name:<16} {t:8.3f}s "
                f"({100 * t / total:5.1f}%)  x{self.counts[name]}")
