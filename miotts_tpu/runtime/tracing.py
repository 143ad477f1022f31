"""Tracing/profiling helpers.

The reference's observability is fixed stderr lines (SURVEY §5:
``synth breakdown: decode=... istft=...``, per-request server lines). Here,
the same per-phase timings are kept (SynthesisResult fields + server log
lines) and deep profiling uses ``jax.profiler``:

- set ``MIOTTS_PROFILE_DIR=/path`` to capture a TensorBoard-compatible trace
  around synthesis/generation calls (one trace per process)
- or use the ``trace_phase`` context manager to annotate phases in traces
"""

from __future__ import annotations

import contextlib
import os
import threading

_started = False
_lock = threading.Lock()


def maybe_start_profiler() -> bool:
    """Start a jax.profiler trace once per process when MIOTTS_PROFILE_DIR
    is set. Returns True if a trace is running."""
    global _started
    trace_dir = os.environ.get("MIOTTS_PROFILE_DIR")
    if not trace_dir:
        return False
    with _lock:
        if not _started:
            import jax

            jax.profiler.start_trace(trace_dir)
            _started = True
    return True


def stop_profiler() -> None:
    global _started
    with _lock:
        if _started:
            import jax

            jax.profiler.stop_trace()
            _started = False


@contextlib.contextmanager
def trace_phase(name: str):
    """Annotate a host phase in profiler traces (no-op overhead otherwise)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
