"""Profiling helpers (the reference's only tracing is a pass-index
printf, mgm_core.cc:491; here: real device traces + wall timers)."""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace viewable in TensorBoard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(tag: str, sync=None):
    """Wall-clock a block; pass `sync` (array/pytree) to block on it."""
    t0 = time.perf_counter()
    yield
    if sync is not None:
        jax.block_until_ready(sync)
    print(f"[{tag}] {(time.perf_counter() - t0) * 1e3:.1f} ms", flush=True)
