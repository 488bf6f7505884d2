"""Experiment: where does the DHFR cell-list 1.7 ms go, op by op?

The GN-floor study (exp_gn_floor.py) showed the neighbor build is 43% of
the bench.py headline.  This captures a device trace of the cell list alone
(GN headline config: K=32, cutoff 5.0, real-PDB DHFR) and ranks fusions.

Usage: python benchmarks/exp_cell_trace.py [--k 32] [--scan]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.systems import get_system
from torchmdnet_tpu.ops.cell_list import neighbor_list_cell
from torchmdnet_tpu.profiling import device_ms_per_iter, trace_summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--system", default="dhfr")
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--cap", type=int, default=0, help="0 = occupancy probe")
    ap.add_argument("--no-trace", action="store_true")
    args = ap.parse_args()

    z, pos, src = get_system(args.system)
    print(f"# system source: {src}")
    n = (len(z) + 7) // 8 * 8
    posp = jnp.zeros((n, 3), jnp.float32).at[: len(z)].set(jnp.asarray(pos))
    mask = jnp.arange(n) < len(z)
    batch = jnp.zeros((n,), jnp.int32)
    if not args.cap:
        from torchmdnet_tpu.ops.cell_list import suggest_cell_capacity

        args.cap = suggest_cell_capacity(posp, mask, cutoff_upper=5.0, headroom=1.1)
        print(f"# probed cell_capacity: {args.cap}")
    from torchmdnet_tpu.ops.cell_list import suggest_max_cells

    mc = suggest_max_cells(posp, mask, cutoff_upper=5.0)

    def consume(p):
        nbl = neighbor_list_cell(
            p, batch, mask, k=args.k, cutoff_upper=5.0,
            cell_capacity=args.cap, max_cells=mc,
        )
        # consume everything so nothing DCEs
        return (
            nbl.idx.sum()
            + nbl.mask.sum()
            + nbl.n_neighbors.sum()
            + nbl.cell_overflow.astype(jnp.int32)
        )

    def step(p, eps):
        s = consume(p)
        return p + eps * s.astype(jnp.float32)

    ms = device_ms_per_iter(step, posp)
    print(f"cell list k={args.k} cap={args.cap}: {ms:.3f} ms/it (scan-differenced)")
    if args.no_trace:
        return

    f = jax.jit(consume)
    _ = f(posp)
    d = tempfile.mkdtemp(prefix="celltrace")
    with jax.profiler.trace(d):
        for _ in range(8):
            out = f(posp)
        jax.block_until_ready(out)
        float(out)  # force through the lazy tunnel
    trace_summary(d, top=20, iters=8)


if __name__ == "__main__":
    main()
