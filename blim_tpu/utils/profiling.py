"""Profiling hooks.

The reference's observability is wall-clock + CUDA max-memory in the metric
logger (reference: util/misc.py:121-150). Here: `jax.profiler` traces (viewable
in XProf/TensorBoard), a simple scoped timer, and device memory readings.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace scope; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(name: str, sink=print):
    t0 = time.perf_counter()
    yield
    sink(f"{name}: {time.perf_counter() - t0:.3f}s")


def device_memory_gb() -> Optional[float]:
    """Peak device memory in GiB when the backend exposes stats (the TPU
    counterpart of torch.cuda.max_memory_allocated)."""
    import jax

    stats = jax.devices()[0].memory_stats()
    if not stats:
        return None
    peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
    return peak / 2**30 if peak else None


def annotate(name: str):
    """Named trace annotation for profiler timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)
