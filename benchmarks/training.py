"""Training-step throughput benchmark (molecules/s on one chip).

Times the full jitted AdamW train step (forward + force grad-of-grad +
optimizer update + device-side loss accumulation) on synthetic padded batches
at a chosen model scale, wall-clocked over a dispatch-pipelined run of many
steps with one final fetch (each step is dispatched asynchronously; the
35-70 ms tunnel RTT amortizes across the run — PERF.md methodology).

Usage:
    python benchmarks/training.py --model equivariant-transformer \
        --batch-size 128 --num-atoms 18 --bf16-messages
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="equivariant-transformer")
    ap.add_argument("--embedding-dimension", type=int, default=256)
    ap.add_argument("--num-layers", type=int, default=8)
    ap.add_argument("--num-rbf", type=int, default=64)
    ap.add_argument("--max-num-neighbors", type=int, default=32)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--num-atoms", type=int, default=18)
    ap.add_argument("--forces", action="store_true", help="train on forces too")
    ap.add_argument("--bf16-messages", action="store_true")
    ap.add_argument("--fused-attention", action="store_true",
                    help="fused Pallas edge kernels (ET/tensornet; the trainer builds the gather plan; implies --bf16-messages)")
    ap.add_argument("--plan-width", type=int, default=0,
                    help="0 = auto: probe (R, W, A) from the batch like Trainer.fit")
    ap.add_argument("--plan-rows", type=int, default=0)
    ap.add_argument("--system", default=None,
                    help="benchmark system name (e.g. dhfr): one big molecule per batch instead of batch-size small ones")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--steps-per-dispatch", type=int, default=1)
    ap.add_argument("--trace", action="store_true", help="capture a device trace of a few dispatches and print the top fusions")
    ap.add_argument("--force-grad-mode", default="gradgrad",
                    choices=("gradgrad", "jvp"),
                    help="force-loss gradient formulation (trainer hparam force_grad_mode)")
    args = ap.parse_args()

    if args.fused_attention:
        args.bf16_messages = True

    import jax
    import numpy as np

    from torchmdnet_tpu.data.batch import pad_molecules, spatial_sort
    from torchmdnet_tpu.models.potential import create_model
    from torchmdnet_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    if args.system:
        from benchmarks.systems import get_system

        z, pos, src = get_system(args.system)
        print(f"# system source: {src}")
        mol = {
            "z": z.astype(np.int64), "pos": pos.astype(np.float32),
            "y": rng.standard_normal((1, 1)).astype(np.float32),
        }
        if args.forces:
            mol["neg_dy"] = rng.standard_normal(pos.shape).astype(np.float32)
        args.batch_size = 1
        args.num_atoms = len(z)
        mols = [mol]
        total = (len(z) + 31) // 32 * 32
    else:
        mols = []
        for _ in range(args.batch_size):
            n = args.num_atoms
            mol = {
                "z": rng.integers(1, 9, n).astype(np.int64),
                "pos": (rng.standard_normal((n, 3)) * 1.8).astype(np.float32),
                "y": rng.standard_normal((1, 1)).astype(np.float32),
            }
            if args.forces:
                mol["neg_dy"] = rng.standard_normal((n, 3)).astype(np.float32)
            mols.append(mol)
        total = (args.batch_size * args.num_atoms + 7) // 8 * 8
    batch = pad_molecules(mols, num_atoms=total, num_mol=args.batch_size)
    if args.fused_attention:
        batch, _ = spatial_sort(batch)

    h = dict(
        model=args.model,
        embedding_dimension=args.embedding_dimension,
        num_layers=args.num_layers,
        num_rbf=args.num_rbf,
        rbf_type="expnorm",
        trainable_rbf=False,
        activation="silu",
        neighbor_embedding=args.model != "tensornet",
        cutoff_lower=0.0,
        cutoff_upper=5.0,
        max_z=100,
        max_num_neighbors=args.max_num_neighbors,
        derivative=args.forces,
        bf16_messages=args.bf16_messages,
        output_model="Scalar",
        prior_model=None,
        reduce_op="add",
        precision=32,
        atom_filter=-1,
        lr=1e-4,
        lr_warmup_steps=0,
        weight_decay=0.0,
        ema_alpha_y=1.0,
        ema_alpha_neg_dy=1.0,
        y_weight=1.0,
        neg_dy_weight=1.0 if args.forces else 0.0,
        fused_attention=args.fused_attention
        and args.model in ("equivariant-transformer", "transformer"),
        fused_message=args.fused_attention and args.model == "tensornet",
        plan_width=args.plan_width,
        plan_block_rows=args.plan_rows,
        force_grad_mode=args.force_grad_mode,
    )
    import jax.numpy as jnp

    model = create_model(h)
    h["log_dir"] = "/tmp/bench_training_logs"
    trainer = Trainer(model, h)
    from torchmdnet_tpu.ops.cell_list import (
        suggest_cell_capacity,
        suggest_max_cells,
        wants_cell_probe,
    )

    if args.system and wants_cell_probe(batch.num_atoms, batch.num_mol):
        # mirror Trainer.fit's batch0 occupancy probe (this harness drives
        # _train_step directly) — max_cells included: hollow systems exceed
        # the N//8 default (solvated STMV: 4547 occupied cells vs 3792)
        trainer._cell_capacity = suggest_cell_capacity(
            batch.pos,
            batch.atom_mask,
            cutoff_upper=h.get("cutoff_upper", 5.0),
            headroom=1.3,
        )
        trainer._max_cells = suggest_max_cells(
            batch.pos,
            batch.atom_mask,
            cutoff_upper=h.get("cutoff_upper", 5.0),
        )
        print(
            f"# probed cell_capacity: {trainer._cell_capacity} "
            f"max_cells: {trainer._max_cells}"
        )
    if h["fused_attention"] or h["fused_message"]:
        if not args.plan_width:
            # mirror Trainer.fit's gather-plan shape probe (batch is already
            # spatially sorted above — the order the in-step plans see).
            # Like the trainer, the probe list rides the probed cell
            # capacities and is overflow-checked: a silently truncated
            # batch0 list would undersize W and the bench would time wrong
            # numerics.
            from torchmdnet_tpu.ops.pallas.onehot_gather import (
                suggest_plan_shape,
            )

            cell_kwargs = {}
            if trainer._cell_capacity:
                cell_kwargs["cell_capacity"] = trainer._cell_capacity
            if trainer._max_cells:
                cell_kwargs["max_cells"] = trainer._max_cells
            probe_nbl = trainer.model.neighbors(batch, **cell_kwargs)
            # Per-atom K truncation is deliberate here (the reference's
            # radius_graph truncates to max_num_neighbors the same way, see
            # bench.py) — but a CELL overflow would silently drop candidate
            # atoms and undersize W, so that one is fatal.
            if probe_nbl.cell_overflow is not None and bool(
                np.asarray(probe_nbl.cell_overflow)
            ):
                raise ValueError(
                    "benchmark plan-shape probe: cell capacity overflowed"
                )
            trainer._plan_shape = suggest_plan_shape(
                jax.device_get(probe_nbl.idx),
                block_rows=args.plan_rows or 16,
            )
            assert trainer._plan_shape is not None, "padded N not divisible by 8"
            print("# probed gather-plan shape: R=%d W=%d A=%d" % trainer._plan_shape)
    params = model.init(jax.random.PRNGKey(0), batch)
    opt_state = trainer.optimizer.init(params)
    acc = jnp.zeros(4)
    ema_y = ema_f = jnp.zeros(())

    spd = args.steps_per_dispatch
    if spd > 1:
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *([batch] * spd)
        )
        lrs = jnp.full((spd,), 1e-4, jnp.float32)

        def dispatch(params, opt_state, acc, ema_y, ema_f):
            return trainer._train_step_multi(
                params, opt_state, acc, stacked, ema_y, ema_f, lrs
            )
    else:

        def dispatch(params, opt_state, acc, ema_y, ema_f):
            return trainer._train_step(
                params, opt_state, acc, batch, ema_y, ema_f
            )

    # compile + settle (losses thread back in as the EMA carries, exactly as
    # the epoch loop does)
    params, opt_state, acc, ema_y, ema_f = dispatch(
        params, opt_state, acc, ema_y, ema_f
    )
    float(np.asarray(acc).ravel()[0])

    n_disp = max(1, args.steps // spd)
    t0 = time.perf_counter()
    for _ in range(n_disp):
        params, opt_state, acc, ema_y, ema_f = dispatch(
            params, opt_state, acc, ema_y, ema_f
        )
    float(np.asarray(acc).ravel()[0])
    dt = time.perf_counter() - t0

    ms = dt / (n_disp * spd) * 1e3
    mols_s = args.batch_size / (ms / 1e3)
    print(
        f"{args.model} H={args.embedding_dimension} L={args.num_layers} "
        f"batch={args.batch_size}x{args.num_atoms} forces={args.forces} "
        f"bf16={args.bf16_messages} fused={args.fused_attention} spd={spd}: "
        f"{ms:.1f} ms/step = {mols_s:.0f} molecules/s"
    )

    if args.trace:
        from torchmdnet_tpu.profiling import trace, trace_summary

        log_dir = "/tmp/bench_training_trace"
        with trace(log_dir):
            for _ in range(2):
                params, opt_state, acc, ema_y, ema_f = dispatch(
                    params, opt_state, acc, ema_y, ema_f
                )
            float(np.asarray(acc).ravel()[0])
        trace_summary(log_dir, top=30, iters=2 * spd)


if __name__ == "__main__":
    main()
