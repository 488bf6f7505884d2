"""Tracing / profiling helpers (SURVEY.md section 5 aux subsystem).

The reference relied on NVTX ranges + CUDA events (benchmarks/inference.py:72,
benchmarks/neighbors.py:89-107); the TPU-native equivalents are
jax.profiler traces (viewable in XProf/Perfetto/TensorBoard) and
jax.named_scope annotations, wrapped here with a timing harness.

TIMING CAVEAT (important): on some remote/experimental platforms (the 'axon'
TPU tunnel used here), ``jax.block_until_ready`` does NOT force computation —
execution is lazy until array contents are actually fetched to the host.
Timing with block_until_ready alone can under-report by 100x.  Every harness
in this module therefore forces materialization by fetching a scalar from
each output, and the pipelined harness fetches every queued output after the
loop so no iteration can be skipped by a lazy engine.
"""

import contextlib
import time
from typing import Callable, Dict

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace into ``log_dir`` (open with XProf/TensorBoard).

    >>> with trace("/tmp/jax-trace"):
    ...     force(model.apply(params, batch))
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


scope = jax.named_scope  # re-export: annotate regions inside jitted code


def force(out):
    """Force materialization of every array in ``out`` (lazy-platform-safe).

    Fetches one element of each leaf to the host, which requires the backing
    computation to actually run; returns ``out`` unchanged.
    """
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[0])
    return out


def benchmark(fn: Callable, *args, warmup: int = 3, iters: int = 30) -> Dict[str, float]:
    """Per-call latency of a jitted callable (compile excluded).

    Each iteration dispatches AND fetches, so the number includes one
    host<->device round trip — the honest per-call latency an interactive
    caller (e.g. an MD engine calling the calculator once per step) sees.
    Mirrors the reference's torch.utils.benchmark.Timer usage
    (benchmarks/neighbors.py:89-107).
    """
    for _ in range(warmup):
        out = fn(*args)
    force(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force(fn(*args))
        times.append(time.perf_counter() - t0)
    return {
        "mean_ms": sum(times) / len(times) * 1e3,
        "min_ms": min(times) * 1e3,
        "median_ms": float(np.median(times) * 1e3),
        "iters": iters,
    }


def device_ms_per_iter(
    step_fn: Callable,
    init_carry,
    k_lo: int = 2,
    k_hi: int = 22,
    reps: int = 3,
):
    """Scan-differenced pure device time per iteration of ``step_fn``.

    The ONLY sound sub-100ms methodology on a lazy high-RTT platform: run K
    iterations inside one jitted lax.scan whose carry chains each iteration's
    output into the next input (multiplied by the runtime-zero ``eps`` so
    XLA can neither fold nor DCE the chain), fetch one scalar, and difference
    two K values so dispatch+fetch overhead cancels.

    step_fn(carry, eps) -> carry.  IMPORTANT: the carry chain must consume
    every output you intend to measure — XLA dead-code-eliminates anything
    the chain doesn't depend on (e.g. summing only a neighbor list's
    n_neighbors silently drops the whole top-k compaction).
    """
    import time
    from functools import partial

    import jax.numpy as jnp

    from torchmdnet_tpu.ops.pallas import jit_vmem_retry

    # default compile first, raised scoped-VMEM limit only on overflow
    # (an unconditional raise slows programs that fit — PERF.md r4)
    @partial(jit_vmem_retry, static_argnames=("k",))
    def loop(carry, eps, k):
        carry, _ = jax.lax.scan(
            lambda c, _: (step_fn(c, eps), None), carry, None, length=k
        )
        return jax.tree_util.tree_leaves(carry)[0].ravel()[0]

    eps = jnp.float32(0.0)
    float(np.asarray(loop(init_carry, eps, k_lo)))  # compile both
    float(np.asarray(loop(init_carry, eps, k_hi)))

    def best(k):
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(loop(init_carry, eps, k)))
            vals.append(time.perf_counter() - t0)
        return min(vals)

    return (best(k_hi) - best(k_lo)) / (k_hi - k_lo) * 1e3


def trace_summary(log_dir: str, top: int = 25, iters: int = 1):
    """Summarize a ``trace()`` capture: top device fusions by total time.

    Parses the Perfetto-format trace JSON that jax.profiler writes (the
    TPU-native analog of skimming an NVTX/nsys timeline) and aggregates
    device-side HLO ops, so hot fusions can be ranked without a GUI:

    >>> with trace("/tmp/t"):           # run >=1 steps of a jitted fn
    ...     force(step(args))
    >>> rows = trace_summary("/tmp/t", iters=1)

    Returns a list of dicts {name, ms, count, gbps, category, long_name}
    sorted by total time (``ms`` is per ``iters``); also prints a table.
    ``gbps`` is the fusion's achieved HBM bandwidth (bytes_accessed / time) —
    the single most useful signal on TPU, where most graph-NN ops are
    traffic-bound: elementwise fusions near peak (~800 GB/s on v5e) are at
    speed-of-light, gathers typically reach ~25-30% of peak.
    """
    import glob
    import gzip
    import json
    import os

    paths = sorted(
        glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True)
    )
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {log_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)

    agg: Dict[str, Dict] = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        args = e.get("args") or {}
        # device HLO events carry device_duration_ps + hlo_category; host
        # frames and whole-program/region groupings don't
        if "device_duration_ps" not in args or "hlo_category" not in args:
            continue
        row = agg.setdefault(
            name,
            {
                "name": name,
                "ms": 0.0,
                "count": 0,
                "bytes": 0,
                "category": args.get("hlo_category", ""),
                "long_name": args.get("long_name", "")[:200],
            },
        )
        row["ms"] += float(args["device_duration_ps"]) / 1e9
        row["bytes"] += int(args.get("bytes_accessed", 0))
        row["count"] += 1

    rows = sorted(agg.values(), key=lambda r: -r["ms"])
    total = sum(r["ms"] for r in rows)
    for r in rows:
        r["ms"] /= iters
        r["count"] //= iters
        r["gbps"] = (r["bytes"] / iters) / (r["ms"] * 1e6) if r["ms"] else 0.0
        del r["bytes"]
    print(f"device total: {total / iters:.2f} ms/iter over {len(rows)} ops")
    for r in rows[:top]:
        print(
            f"{r['ms']:8.3f} ms x{r['count']:<3d} {r['gbps']:6.0f} GB/s "
            f"{r['category'][:18]:18s} {r['name']}"
        )
    return rows


def benchmark_pipelined(fn: Callable, *args, warmup: int = 3, iters: int = 30):
    """Throughput timing: enqueue all iterations, then force every output.

    Measures the device-side rate a dispatch-pipelined loop achieves; all
    outputs are fetched after the queue is built so a lazy engine cannot
    dead-code-eliminate any iteration (fetch round trips amortize across
    the queue).
    """
    for _ in range(warmup):
        out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for out in outs:
        force(out)
    return {"mean_ms": (time.perf_counter() - t0) / iters * 1e3, "iters": iters}
