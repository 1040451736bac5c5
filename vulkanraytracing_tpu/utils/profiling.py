"""Tracing / profiling hooks.

Ref: SURVEY.md section 5 — the reference's instrumentation is ScopeTime
wall-clock scopes, the ImGui FPS overlay, and Vulkan debug object names for
GPU captures (VulkanHelpers.hpp:105-114).  The TPU equivalents:

- ``trace_scope``: ``jax.named_scope`` + wall clock in one context manager —
  names show up in XLA/Perfetto traces the way vkSetDebugUtilsObjectName
  labels show up in RenderDoc;
- ``profile_to``: capture a jax.profiler trace viewable in
  TensorBoard/Perfetto;
- ``RayCounter``: the Mrays/s counter fed by TraceStats (the FPS-overlay
  analog; the Engine's StatsSystem renders it).
"""

from __future__ import annotations

import contextlib
import time

import jax

from vulkanraytracing_tpu.utils.logging import log_t


@contextlib.contextmanager
def trace_scope(name: str, log: bool = False):
    """Named region: appears in jax profiler traces; optionally logs wall
    time like the reference's ScopeTime."""
    start = time.perf_counter()
    with jax.named_scope(name):
        yield
    if log:
        log_t(f"{name}: {(time.perf_counter() - start) * 1e3:.3f} ms")


@contextlib.contextmanager
def profile_to(log_dir: str):
    """Capture a device trace (open with TensorBoard or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RayCounter:
    """Running Mrays/s over a sliding window of frames."""

    def __init__(self) -> None:
        self._t0 = time.perf_counter()
        self._rays = 0.0

    def add(self, rays: float) -> None:
        self._rays += float(rays)

    def mrays_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._rays / dt / 1e6 if dt > 0 else 0.0

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._rays = 0.0
