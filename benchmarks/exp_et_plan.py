"""Experiment: ET DHFR fwd / fwd+bwd with gather_plan routing (scratch).

VERDICT r1 item 7: the 81 ms bf16 fwd+bwd number predates plan routing of
the wide (3H=384) v-gather and its G^T transpose.  Measure the full-model
effect of {bf16} x {plan off/on} on the real chip (real PDB coordinates,
spatially sorted atom order).

Usage: python benchmarks/exp_et_plan.py [--f32] [--systems dhfr,factor_ix]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.systems import SYSTEMS, get_system_by_count
from benchmarks.inference import model_args
from torchmdnet_tpu.data.batch import pad_molecules, spatial_sort
from torchmdnet_tpu.models.potential import create_model
from torchmdnet_tpu.profiling import device_ms_per_iter


def bench(name, n_atoms, bf16, plan, k_hi=12, plan_width=512, fused=False,
          plan_rows=32, cell_capacity=0, strategy="auto"):
    z, pos, src = get_system_by_count(n_atoms)
    npad = max(32, (n_atoms + 31) // 32 * 32)
    batch = pad_molecules([{"z": z, "pos": pos}], num_atoms=npad, num_mol=1)
    batch, _ = spatial_sort(batch)
    args = model_args(name)
    args["bf16_messages"] = bf16
    args["fused_attention"] = fused
    args["fused_message"] = fused
    model = create_model(args)
    params = model.init(jax.random.PRNGKey(0), batch)
    cell_kwargs = {"cell_capacity": cell_capacity} if cell_capacity else {}
    nbl = model.neighbors(
        batch, strategy=strategy, gather_plan=plan, plan_width=plan_width,
        plan_block_rows=plan_rows,
        # smaller receiver blocks spread each source over more blocks
        plan_inv_capacity=16 * max(1, 32 // plan_rows),
        **cell_kwargs,
    )
    nbl.raise_on_overflow("bench")

    def step_f(carry, eps):
        p, acc = carry
        y = model.energy(params, batch.replace(pos=p), nbl=nbl)
        return (p + eps * y.sum(), acc + y.sum())

    ms_f = device_ms_per_iter(step_f, (batch.pos, jnp.float32(0.0)), k_hi=k_hi)

    def step_fb(carry, eps):
        p, acc = carry
        y, neg_dy = model.energy_and_forces(params, batch.replace(pos=p), nbl=nbl)
        return (p + eps * neg_dy, acc + y.sum())

    ms_fb = device_ms_per_iter(step_fb, (batch.pos, jnp.float32(0.0)), k_hi=k_hi)
    return ms_f, ms_fb, src


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--systems", default="dhfr")
    ap.add_argument("--model", default="equivariant-transformer")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--plan-width", type=int, default=512)
    ap.add_argument("--plan-rows", type=int, default=32)
    ap.add_argument("--cell-capacity", type=int, default=0, help="0 = strategy default")
    ap.add_argument("--strategy", default="auto")
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--modes", default=None,
                    help="comma list from {base,plan,fused}; overrides defaults")
    args = ap.parse_args()
    bf16 = not args.f32
    print(f"platform={jax.devices()[0].platform} model={args.model} bf16={bf16}")
    print("| system | atoms | mode | fwd ms | fwd+bwd ms |")
    print("|---|---|---|---|---|")
    modes = [("plan", True, False), ("fused", True, True)]
    if not args.skip_baseline:
        modes.insert(0, ("base", False, False))
    if args.modes:
        byname = {"base": ("base", False, False), "plan": ("plan", True, False),
                  "fused": ("fused", True, True)}
        modes = [byname[m] for m in args.modes.split(",")]
    for s in args.systems.split(","):
        n = SYSTEMS[s]
        for label, plan, fused in modes:
            ms_f, ms_fb, src = bench(
                args.model, n, bf16, plan, plan_width=args.plan_width,
                fused=fused, plan_rows=args.plan_rows,
                cell_capacity=args.cell_capacity, strategy=args.strategy,
            )
            print(
                f"| {s} ({src}) | {n} | {label} | {ms_f:.2f} | {ms_fb:.2f} |",
                flush=True,
            )


if __name__ == "__main__":
    main()
