"""Ring ICI model: predicted multi-chip scaling numbers (r4 verdict item 6).

Real multi-chip hardware is unavailable here, so this experiment makes the
>80% edges/s scaling-efficiency claim FALSIFIABLE in advance: it computes
the exact per-hop ICI byte accounting of the ring schedule
(`parallel.edge_partition.ring_comm_stats`) on the real benchmark systems,
prices the hops against the v5e's ICI link bandwidth, and prints predicted
per-layer comm times, scaling efficiency, and edges/s at D=4 and D=8 — the
numbers the first real multi-chip run must confirm (PERF.md "Ring ICI
model").

The ring ships whole O(N/D) source-row chunks (bytes are shape-exact, not
an estimate); the boundary-compaction ratio bounds the per-hop boundary
COMPUTE the transfer must overlap with.  Compute times per layer come from
the measured single-chip numbers in PERF.md.

Runs on CPU with a virtual 8-device mesh (the same path the distributed
tests use); the neighbor lists are the real cell-strategy builds.

Usage: python benchmarks/exp_ring_ici.py [--system stmv]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

# v5e ICI: 2D torus, ~45 GB/s per link per direction (public "How to Scale
# Your Model" numbers); a 1D ring rides one link each way.
ICI_GBPS = 45.0

# measured single-chip per-layer fused ET kernel times at STMV scale
# (PERF.md r5 trace decomposition, probed plan R=16/W=384): fwd 28.9 ms,
# bwd 53.7 ms -> one force evaluation touches each layer's edge phase
# ~2.9x-equivalent; we price conservatively with the FORWARD time only
# (less compute to hide behind).
MEASURED = {
    # system -> (model, H, K, per-layer fwd ms single-chip, layers,
    #            single-chip force-MD ms/step)
    "stmv": ("equivariant-transformer", 128, 80, 28.9, 6, 901.3),
    "dhfr": ("equivariant-transformer", 128, 80, 1.6, 6, 38.6),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--system", default="stmv", choices=sorted(MEASURED))
    ap.add_argument("--k", type=int, default=0)
    args = ap.parse_args()

    from benchmarks.systems import get_system
    from torchmdnet_tpu.data.batch import pad_molecules, spatial_sort
    from torchmdnet_tpu.ops.cell_list import (
        suggest_cell_capacity,
        suggest_max_cells,
    )
    from torchmdnet_tpu.ops.neighbors import neighbor_list
    from torchmdnet_tpu.parallel.edge_partition import ring_comm_stats

    model_name, h, k, fwd_ms_layer, layers, md_ms = MEASURED[args.system]
    k = args.k or k
    z, pos, src = get_system(args.system)
    print(f"# system {args.system} ({len(z)} atoms, source {src}), K={k}")
    npad = (len(z) + 31) // 32 * 32
    batch = pad_molecules([{"z": z, "pos": pos}], num_atoms=npad, num_mol=1)
    batch, _ = spatial_sort(batch)

    cap = suggest_cell_capacity(batch.pos, batch.atom_mask, cutoff_upper=5.0, headroom=1.1)
    mc = suggest_max_cells(batch.pos, batch.atom_mask, cutoff_upper=5.0)
    nbl = neighbor_list(
        batch.pos, batch.batch, batch.atom_mask, k=k, cutoff_upper=5.0,
        loop=True, strategy="cell", cell_capacity=cap, max_cells=mc,
    )

    # fused ET ring rows: the (N, 7H) bf16 source table feeding the kernels
    row_bytes = 7 * h * 2
    edges = int(np.asarray(nbl.mask).sum())
    print(f"# valid edges: {edges}  row_bytes (7H bf16): {row_bytes}")

    for d in (4, 8):
        mesh = Mesh(np.array(jax.devices()[:d]), ("dp",))
        st = ring_comm_stats(nbl.idx, nbl.mask, mesh, row_bytes=row_bytes)
        hop_ms = st.bytes_per_hop / (ICI_GBPS * 1e9) * 1e3
        # per layer, one ring gather forward + one ring reduce backward
        comm_ms_layer = 2 * st.hops * hop_ms
        comp_ms_layer = fwd_ms_layer / d
        # ring hops overlap with local compute (ppermute is async); the
        # un-overlappable floor is max(comm, comp) per layer, so predicted
        # efficiency = comp / max(comp, comm) with a boundary-compute tax
        # proportional to the boundary fraction
        overlap_eff = comp_ms_layer / max(comp_ms_layer, comm_ms_layer)
        eff = overlap_eff * (1.0 - st.boundary_fraction)
        step_ms = md_ms / d / max(eff, 1e-9)
        edges_s = edges * layers / (step_ms / 1e3)
        print(
            f"D={d}: n_local={st.n_local} bytes/hop={st.bytes_per_hop/1e6:.2f} MB "
            f"hop={hop_ms:.3f} ms comm/layer={comm_ms_layer:.2f} ms "
            f"comp/layer={comp_ms_layer:.2f} ms "
            f"boundary_fraction={st.boundary_fraction:.4f} "
            f"predicted_efficiency={eff:.3f} "
            f"predicted force-MD {step_ms:.0f} ms/step "
            f"predicted {edges_s/1e6:.1f} M edge-layers/s"
        )


if __name__ == "__main__":
    main()
