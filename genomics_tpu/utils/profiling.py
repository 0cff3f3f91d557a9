"""Profiling hooks (SURVEY.md §5: the reference has per-app wall-clock
timers and checked-in Nsight traces; the TPU equivalent is the JAX
profiler + the shared Timer/GCUPS counters in utils.timers)."""
from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/genomics_tpu_trace"):
    """Capture a JAX/XLA profiler trace around a region:

        with profiling.trace("/tmp/tr"):
            engine.align(...)

    View with TensorBoard or xprof."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats():
    import jax

    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    return stats or {}
