"""MD-loop throughput benchmark (the reference's "MD speed" notion,
benchmarks/graph_network.ipynb, measured there as forward-only ms/it; here
the REAL thing: full velocity-Verlet steps with forces, Verlet-skin neighbor
reuse, on-device scan stepping).

Timing: one warm-up step() call compiles; then step(n) is timed around a
forced fetch.  Each chunk is hundreds of ms of device work, so the 35-70 ms
tunnel RTT amortizes to <1% (PERF.md methodology notes).

Usage:
    python benchmarks/md.py --system stmv --model graph-network \
        --bf16-messages --remat --skin 0.5 --rebuild-every 10
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.systems import SYSTEMS, get_system
from benchmarks.inference import model_args


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--system", default="dhfr", choices=sorted(SYSTEMS))
    ap.add_argument("--model", default="graph-network")
    ap.add_argument("--bf16-messages", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--skin", type=float, default=0.5)
    ap.add_argument("--rebuild-every", type=int, default=10)
    ap.add_argument("--timestep-fs", type=float, default=1.0)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cell-capacity", type=int, default=0, help="0 = probe max occupancy at setup (suggest_cell_capacity, headroom for skin drift)")
    ap.add_argument("--max-cells", type=int, default=0, help="0 = strategy default (N//8; smaller-cutoff models on sparse boxes need more)")
    ap.add_argument("--k", type=int, default=80, help="max_num_neighbors")
    ap.add_argument("--gather-plan", action="store_true",
                    help="spatial-sort atoms and route gathers via the one-hot MXU plan")
    ap.add_argument("--plan-width", type=int, default=0,
                    help="0 = auto: probe (R, W, A) from the skin list (suggest_plan_shape; r5: STMV probes R=16/W=384 where the old fixed default was R=32/W=640 — the fused kernels' MXU work scales with W, ET STMV MD 1329 -> 901 ms/step)")
    ap.add_argument("--plan-rows", type=int, default=0)
    ap.add_argument("--plan-inv-capacity", type=int, default=0,
                    help="0 = auto (16 * 32/plan_rows)")
    ap.add_argument("--fused-attention", action="store_true",
                    help="fused Pallas edge kernel (ET/tensornet; implies --gather-plan)")
    ap.add_argument("--trace", action="store_true",
                    help="capture a device trace of one chunk and print the top fusions")
    args = ap.parse_args()
    if args.fused_attention:
        args.gather_plan = True

    import jax
    import numpy as np

    from torchmdnet_tpu.data.batch import pad_molecules, spatial_sort
    from torchmdnet_tpu.models.potential import create_model
    from torchmdnet_tpu.md import Simulation

    n_atoms = SYSTEMS[args.system]
    z, pos, src = get_system(args.system)
    print(f"# system source: {src}")
    npad = (n_atoms + 31) // 32 * 32 if args.gather_plan else (n_atoms + 7) // 8 * 8
    batch = pad_molecules([{"z": z, "pos": pos}], num_atoms=npad, num_mol=1)
    if args.gather_plan:
        batch, _ = spatial_sort(batch)

    margs = model_args(args.model)
    margs.update(
        bf16_messages=args.bf16_messages,
        remat=args.remat,
        max_num_neighbors=args.k,
        fused_attention=args.fused_attention,
        fused_message=args.fused_attention,
    )
    model = create_model(margs)
    params = model.init(jax.random.PRNGKey(0), batch)

    if not args.cell_capacity:
        from torchmdnet_tpu.ops.cell_list import suggest_cell_capacity

        # generous headroom: the skin list bins at cutoff+skin and atoms
        # drift between rebuilds; overflow is still loudly detected.
        args.cell_capacity = suggest_cell_capacity(
            batch.pos,
            batch.atom_mask,
            cutoff_upper=margs["cutoff_upper"] + args.skin,
            headroom=1.3,
        )
        print(f"# probed cell_capacity: {args.cell_capacity}")
    if not args.max_cells:
        from torchmdnet_tpu.ops.cell_list import suggest_max_cells

        # sparse/hollow systems (solvated STMV at cutoff 5: 4547 occupied
        # cells, mean occupancy 6.7) violate the N//8 default's assumption
        args.max_cells = suggest_max_cells(
            batch.pos,
            batch.atom_mask,
            cutoff_upper=margs["cutoff_upper"] + args.skin,
        )
        print(f"# probed max_cells: {args.max_cells}")

    if args.gather_plan and not args.plan_width:
        # probe the tight (R, W, A) on the REAL skin list the MD loop builds
        from torchmdnet_tpu.ops.pallas.onehot_gather import suggest_plan_shape

        probe_nbl = model.neighbors(
            batch, skin=args.skin, cell_capacity=args.cell_capacity,
            max_cells=args.max_cells,
        )
        shape = suggest_plan_shape(
            jax.device_get(probe_nbl.idx),
            block_rows=args.plan_rows or 16, headroom=1.15,
        )
        assert shape is not None, "padded N not divisible by 8"
        args.plan_rows, args.plan_width, probed_a = shape
        if not args.plan_inv_capacity:
            args.plan_inv_capacity = probed_a
        print(f"# probed gather-plan shape: R={args.plan_rows} W={args.plan_width} A={probed_a}")

    sim = Simulation(
        model,
        params,
        batch,
        timestep_fs=args.timestep_fs,
        temperature_K=300.0,
        friction_per_fs=0.01,
        neighbor_skin=args.skin,
        rebuild_every=args.rebuild_every,
        neighbor_kwargs={
            **({"max_cells": args.max_cells} if args.max_cells else {}),
            "cell_capacity": args.cell_capacity,
            "gather_plan": args.gather_plan,
            "plan_width": args.plan_width or 512,
            "plan_block_rows": args.plan_rows or 16,
            "plan_inv_capacity": args.plan_inv_capacity
            or 16 * max(1, 32 // (args.plan_rows or 16)),
        },
    )
    sim.set_velocities_from_temperature(300.0)

    sim.step(args.rebuild_every)  # compile both executables
    float(np.asarray(sim.state.energy.ravel()[0]))  # force materialization

    t0 = time.perf_counter()
    sim.step(args.steps)
    e = float(np.asarray(sim.state.energy.ravel()[0]))
    dt = time.perf_counter() - t0
    stale = bool(np.asarray(sim.state.stale))

    ms = dt / args.steps * 1e3
    ns_day = args.timestep_fs * 86400.0 / ms / 1e6 * 1e3
    print(
        f"{args.model} {args.system} ({n_atoms} atoms) "
        f"bf16={args.bf16_messages} remat={args.remat} "
        f"skin={args.skin} rebuild={args.rebuild_every}: "
        f"{ms:.1f} ms/step ({ns_day:.2f} ns/day at {args.timestep_fs} fs), "
        f"energy={e:.3f}, stale={stale}"
    )

    if args.trace:
        from torchmdnet_tpu.profiling import trace, trace_summary

        log_dir = "/tmp/bench_md_trace"
        with trace(log_dir):
            sim.step(args.rebuild_every)
            float(np.asarray(sim.state.energy.ravel()[0]))
        trace_summary(log_dir, top=30, iters=args.rebuild_every)


if __name__ == "__main__":
    main()
