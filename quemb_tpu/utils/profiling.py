"""Profiling helpers: function-level timers + device traces.

The reference profiles with a FunctionTimer registry (shared/helper.py:130,
applied to the BE driver hot paths) and prints [TIMER] tables; here the
same registry (utils/helper.py timer) wraps BE.initialize/oneshot/optimize,
and device-side profiling hooks into jax.profiler for TensorBoard-readable
traces of the jitted fragment programs.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax

from quemb_tpu.utils.helper import timer

__all__ = ["device_trace", "print_timings", "timer"]


@contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler device trace around a code region."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def print_timings(n: int = 12) -> None:
    """Print the accumulated per-function wall-time table."""
    timer.print_top(n)
