"""Neighbor-list strategy benchmarks (reference benchmarks/neighbors.py analog).

Sweeps strategy x system size, reporting device ms/iteration with ALL
outputs consumed (XLA dead-code-eliminates the top-k compaction otherwise —
see PERF.md).

Usage: python benchmarks/neighbors.py [--sizes 1024,2489,...] [--k 80]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.systems import get_system_by_count


def bench_strategy(strategy, n, k, cutoff):
    import jax.numpy as jnp
    import numpy as np

    from torchmdnet_tpu.ops.cell_list import neighbor_list_cell
    from torchmdnet_tpu.ops.neighbors import neighbor_list
    from torchmdnet_tpu.profiling import device_ms_per_iter

    z, pos, _src = get_system_by_count(n)
    npad = (n + 7) // 8 * 8
    posp = np.zeros((npad, 3), np.float32)
    posp[:n] = pos
    posj = jnp.asarray(posp)
    maskj = jnp.asarray(np.arange(npad) < n)
    bv = jnp.zeros((npad,), jnp.int32)

    from torchmdnet_tpu.ops.cell_list import (
        suggest_cell_capacity,
        suggest_max_cells,
    )

    # headroom > 1.0 + loud pre-timing check: the timed scan drifts
    # positions, and an exact-capacity probe can overflow mid-scan silently.
    # max_cells is probed too (sparse/hollow systems like solvated STMV
    # violate the N//8 default's occupancy assumption).
    cap = suggest_cell_capacity(posp[:n], cutoff_upper=cutoff, headroom=1.1)
    mc = suggest_max_cells(posp[:n], cutoff_upper=cutoff)
    # cell_overflow ONLY (k-truncation is part of the measured contract)
    _pre = neighbor_list(
        posj, bv, maskj, k=k, cutoff_upper=cutoff, strategy="cell",
        cell_capacity=cap, max_cells=mc,
    )
    if _pre.cell_overflow is not None and bool(np.asarray(_pre.cell_overflow)):
        raise ValueError("benchmarks/neighbors.py: probed capacity overflowed")

    def step(carry, eps):
        p, acc = carry
        if strategy == "cell-hash":
            nbl = neighbor_list_cell(
                p, bv, maskj, k=k, cutoff_upper=cutoff, hash_strategy=True
            )
        elif strategy == "cell":
            # product setup path: occupancy-probed capacity (headroom for
            # scan drift, pre-checked above), selection-kernel compaction
            nbl = neighbor_list(
                p, bv, maskj, k=k, cutoff_upper=cutoff, strategy=strategy,
                cell_capacity=cap, max_cells=mc,
            )
        else:
            nbl = neighbor_list(
                p, bv, maskj, k=k, cutoff_upper=cutoff, strategy=strategy
            )
        s = (nbl.n_neighbors.sum() + nbl.idx.sum() + nbl.mask.sum()).astype(
            jnp.float32
        )
        return (p + eps * s, acc + s)

    return device_ms_per_iter(step, (posj, jnp.float32(0.0)), k_hi=12)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1024,2489,5807,16384,30327")
    ap.add_argument("--k", type=int, default=80)
    ap.add_argument("--cutoff", type=float, default=5.0)
    ap.add_argument("--strategies", default="brute,cell,cell-hash")
    args = ap.parse_args()

    sizes = [int(s) for s in args.sizes.split(",")]
    strategies = args.strategies.split(",")
    print("| N | " + " | ".join(strategies) + " |")
    print("|---|" + "---|" * len(strategies))
    for n in sizes:
        row = []
        for strat in strategies:
            if strat == "brute" and n > 20000:
                row.append("(skip)")
                continue
            ms = bench_strategy(strat, n, args.k, args.cutoff)
            row.append(f"{ms:.2f} ms")
        print(f"| {n} | " + " | ".join(row) + " |")


if __name__ == "__main__":
    main()
