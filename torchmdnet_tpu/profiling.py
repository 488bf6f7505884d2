"""Tracing / profiling helpers (SURVEY.md section 5 aux subsystem).

The reference relied on NVTX ranges + CUDA events (benchmarks/inference.py:72,
benchmarks/neighbors.py:89-107); the TPU-native equivalents are
jax.profiler traces (viewable in XProf/Perfetto/TensorBoard) and
jax.named_scope annotations, wrapped here with a timing harness.
"""

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace into ``log_dir`` (open with XProf/TensorBoard).

    >>> with trace("/tmp/jax-trace"):
    ...     model.apply(params, batch)[0].block_until_ready()
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


scope = jax.named_scope  # re-export: annotate regions inside jitted code


def benchmark(fn: Callable, *args, warmup: int = 3, iters: int = 30) -> Dict[str, float]:
    """Steady-state latency of a jitted callable (compile excluded).

    Returns mean/min milliseconds per call; mirrors the reference's
    torch.utils.benchmark.Timer usage (benchmarks/neighbors.py:89-107).
    """
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return {
        "mean_ms": sum(times) / len(times) * 1e3,
        "min_ms": min(times) * 1e3,
        "iters": iters,
    }


def benchmark_pipelined(fn: Callable, *args, warmup: int = 3, iters: int = 30):
    """Throughput timing: enqueue all iterations, block once (measures the
    device-side rate the MD/training loop actually achieves)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return {"mean_ms": (time.perf_counter() - t0) / iters * 1e3, "iters": iters}
