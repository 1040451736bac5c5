"""Frame timer and RAII-style scope stopwatch.

Ref: Source/Utils/TimeHelpers.hpp:18-28 (``Timer::GetDeltaSeconds``) and
TimeHelpers.cpp:57-75 (``ScopeTime`` logging ``[TIME] <label>`` on scope exit).
"""

from __future__ import annotations

import time

from vulkanraytracing_tpu.utils.logging import log_t


class Timer:
    """Per-frame delta-time source."""

    def __init__(self) -> None:
        self._last: float | None = None

    def get_delta_seconds(self) -> float:
        now = time.perf_counter()
        if self._last is None:
            self._last = now
            return 0.0
        dt = now - self._last
        self._last = now
        return dt


class ScopeTime:
    """Context manager that logs elapsed wall-clock on exit.

    >>> with ScopeTime("Scene build"):
    ...     build()
    [TIME] Scene build: 1.234 s
    """

    def __init__(self, label: str) -> None:
        self.label = label
        self.elapsed = 0.0

    def __enter__(self) -> "ScopeTime":
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.elapsed = time.perf_counter() - self._start
        log_t(f"{self.label}: {self.elapsed * 1e3:.3f} ms")
