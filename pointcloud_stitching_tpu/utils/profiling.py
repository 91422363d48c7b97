"""Device tracing hooks.

Structured replacement for the reference's -t stopwatch flags (SURVEY.md §5
'Tracing / profiling'): wraps jax.profiler so a streaming run can dump a
trace viewable in TensorBoard/Perfetto alongside the host-side StageTimer.
"""
from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(trace_dir: str):
    """Capture a device trace for the enclosed block.

    Usage:
        with trace("/tmp/pcs-trace"):
            for _ in range(30):
                client.step()
    """
    import jax
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host-span annotation that shows up inside device traces."""
    import jax
    return jax.profiler.TraceAnnotation(name)
