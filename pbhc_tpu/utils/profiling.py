"""Profiling helpers (SURVEY §5.1: JAX profiler + per-phase timers).

    with trace("/tmp/jax_trace"):            # open in TensorBoard/Perfetto
        ... jitted work ...

    with phase_timer("rollout") as t: ...    # wall time with device sync
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir):
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class phase_timer:
    """Wall-clock timer that syncs the device before/after the phase."""

    def __init__(self, name, sync_value=None, verbose=True):
        self.name = name
        self.sync_value = sync_value
        self.verbose = verbose

    def __enter__(self):
        (jax.block_until_ready(self.sync_value) if self.sync_value is not None else None)
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        if self.verbose:
            print(f"[timer] {self.name}: {self.elapsed*1000:.2f} ms")


def timeit(fn, *args, reps=20, warmup=1):
    """Median-of-reps timing of a jitted callable with final sync."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps
