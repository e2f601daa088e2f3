"""Observability: run logs, progress + ETA (the reference's L8 layer).

Reference semantics: ``GuiLogger`` writes append-only
``RES/logs/run_YYYYMMDD_HHMMSS.txt`` with ``[START]``/``[END]`` stamps and
mirrors every line to the console (src/INT/Fluor_INT.py:679-724, sample log
committed at Testsamples/.../RES/logs/run_20251122_122406.txt); progress is
a determinate bar with ROI-weighted totals and a moving-average ETA
(:2285-2319); the drawer prefixes messages with elapsed seconds
(src/roi_manual_drawer.py:158-161).
"""

from __future__ import annotations

import os
import threading
import time
from datetime import datetime
from typing import Callable, Optional


class RunLogger:
    """Console + append-only file logger with [START]/[END] stamps."""

    def __init__(self, log_dir: Optional[str] = None, echo: Callable = print,
                 elapsed_prefix: bool = False):
        self._echo = echo
        self._lock = threading.Lock()
        self._path: Optional[str] = None
        self._t0 = time.time()
        self._elapsed_prefix = elapsed_prefix
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            ts = datetime.now().strftime("%Y%m%d_%H%M%S")
            self._path = os.path.join(log_dir, f"run_{ts}.txt")
            self._write(f"[START] {datetime.now().strftime('%H:%M:%S')}")

    @property
    def path(self) -> Optional[str]:
        return self._path

    def _write(self, line: str) -> None:
        if self._path is None:
            return
        with self._lock:
            with open(self._path, "a", encoding="utf-8") as f:
                f.write(line + "\n")

    def __call__(self, *args) -> None:
        msg = " ".join(str(a) for a in args)
        if self._elapsed_prefix:
            msg = f"[{time.time() - self._t0:8.2f}s] {msg}"
        self._echo(msg)
        self._write(msg)

    def close(self) -> None:
        self._write(f"[END] {datetime.now().strftime('%H:%M:%S')}")


class Progress:
    """Determinate progress with moving-average ETA
    (Fluor_INT.py:2285-2319)."""

    def __init__(self, total: int, log: Callable = print, window: int = 8,
                 report_every: int = 1):
        self.total = max(1, int(total))
        self.done = 0
        self._log = log
        self._window = window
        self._report_every = report_every
        self._times = [time.time()]
        self._units = [0]  # cumulative WEIGHTED units at each tick

    def step(self, n: int = 1, label: str = "") -> None:
        self.done += n
        now = time.time()
        self._times.append(now)
        self._units.append(self.done)
        if len(self._times) > self._window + 1:
            self._times.pop(0)
            self._units.pop(0)
        if self.done % self._report_every == 0 or self.done >= self.total:
            span = self._times[-1] - self._times[0]
            # rate in WEIGHTED units/s, the same units as the total — a
            # call-count rate under-estimated throughput by the average
            # weight per call (ROI-weighted callers pass n = len(rows))
            units = self._units[-1] - self._units[0]
            rate = units / span if span > 0 else 0.0
            remain = (self.total - self.done) / rate if rate > 0 else 0.0
            mm, ss = divmod(int(remain), 60)
            pct = 100.0 * self.done / self.total
            suffix = f" {label}" if label else ""
            self._log(f"[{pct:5.1f}%] {self.done}/{self.total} "
                      f"ETA {mm:02d}:{ss:02d}{suffix}")


def elapsed_str(t0: float) -> str:
    dt = time.time() - t0
    mm, ss = divmod(int(dt), 60)
    return f"{mm:02d}:{ss:02d}"
