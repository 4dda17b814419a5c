"""Structured observability: JSONL per-round metrics + wall-clock timers.

Reference parity: the reference's only instrumentation is ``print`` plus saved
result arrays and wall-clock timing around selection (SURVEY.md section 5).
Here every round emits one JSON line (AP, MAP-so-far, selection/update
milliseconds, labeled count) while stdout stays human-readable.
"""

from __future__ import annotations

import json
import time
from typing import Any, Optional, TextIO


def device_mem_mb() -> float:
    """Bytes in use on device 0, in MB (0.0 when the backend has no stats)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats() or {}
        return stats.get("bytes_in_use", 0) / 1e6
    except Exception:
        return 0.0


class JsonlLogger:
    def __init__(self, path: Optional[str]):
        self._fh: Optional[TextIO] = open(path, "a") if path else None

    def log(self, **record: Any) -> None:
        if self._fh is None:
            return
        self._fh.write(json.dumps(record, default=float) + "\n")
        self._fh.flush()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


class Timer:
    """Accumulating wall-clock timer: ``with timer.span("select"): ...``."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self.lasts: dict[str, float] = {}
        self.values: dict[str, list[float]] = {}

    def span(self, name: str):
        return _Span(self, name)

    def ms(self, name: str) -> float:
        """Mean milliseconds per recorded span."""
        c = self.counts.get(name, 0)
        return 1e3 * self.totals.get(name, 0.0) / c if c else 0.0

    def last_ms(self, name: str) -> float:
        """Milliseconds of the most recent span — what per-round JSONL rows
        should carry (a running mean there hides first-call compile/transfer
        cost inside every later row; docs/PROFILE.md section 6)."""
        return 1e3 * self.lasts.get(name, 0.0)

    def first_ms(self, name: str) -> float:
        """Milliseconds of the FIRST span — compile / cache-load / transfer
        cost, which must be reported separately, never averaged into
        per-round claims (PROFILE.md section 6 recording rule)."""
        v = self.values.get(name)
        return 1e3 * v[0] if v else 0.0

    def median_ms(self, name: str, *, skip_first: int = 1) -> Optional[float]:
        """Steady-state median milliseconds, excluding the first
        ``skip_first`` spans (the compile/transfer rounds).

        Returns ``None`` when no span survives the exclusion (e.g. a single
        recorded cohort): there IS no steady-state measurement then, and
        falling back to the compile-laden first span would be exactly the
        pollution the PROFILE.md section 6 recording rule forbids in fields
        labeled "steady" (code-review round 4) — records carry JSON null
        instead."""
        v = self.values.get(name, [])[skip_first:]
        if not v:
            return None
        s = sorted(v)
        mid = len(s) // 2
        return 1e3 * (s[mid] if len(s) % 2 else 0.5 * (s[mid - 1] + s[mid]))


class _Span:
    def __init__(self, timer: Timer, name: str):
        self.timer, self.name = timer, name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self.t0
        self.timer.totals[self.name] = self.timer.totals.get(self.name, 0.0) + dt
        self.timer.counts[self.name] = self.timer.counts.get(self.name, 0) + 1
        self.timer.lasts[self.name] = dt
        self.timer.values.setdefault(self.name, []).append(dt)
        return False
