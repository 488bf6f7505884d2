"""Experiment: is the headline GN DHFR forward at its floor? (r3 verdict #7)

Splits the 4.0 ms bench.py headline (GN 6x128, K=32, fp32, reference-exact
config) into neighbor-build vs network time, measures the bf16 variant, and
captures a device trace so the per-op split (gathers vs filter MLPs vs
reductions) is on record.

Usage: python benchmarks/exp_gn_floor.py [--trace]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.systems import get_system
from torchmdnet_tpu.data.batch import pad_molecules
from torchmdnet_tpu.models.potential import create_model
from torchmdnet_tpu.profiling import device_ms_per_iter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    z, pos, src = get_system("dhfr")
    print(f"# system source: {src}")
    batch = pad_molecules(
        [{"z": z, "pos": pos}], num_atoms=(len(z) + 7) // 8 * 8, num_mol=1
    )

    base = dict(
        model="graph-network", embedding_dimension=128, num_layers=6,
        num_rbf=50, rbf_type="expnorm", trainable_rbf=True, activation="silu",
        neighbor_embedding=True, cutoff_lower=0.0, cutoff_upper=5.0,
        max_z=100, max_num_neighbors=32, derivative=False,
        output_model="Scalar", prior_model=None, reduce_op="add",
        precision=32, atom_filter=-1, aggr="add",
    )

    for label, over in (
        ("fp32 (headline config)", {}),
        ("bf16_messages", {"bf16_messages": True}),
    ):
        model = create_model(dict(base, **over))
        params = model.init(jax.random.PRNGKey(0), batch)
        nbl = model.neighbors(batch)

        def step_total(carry, eps):
            p, acc = carry
            y = model.energy(params, batch.replace(pos=p))
            return (p + eps * y.sum(), acc + y.sum())

        def step_net(carry, eps):  # neighbor list prebuilt outside
            p, acc = carry
            y = model.energy(params, batch.replace(pos=p), nbl=nbl)
            return (p + eps * y.sum(), acc + y.sum())

        def step_nbl(carry, eps):  # list build alone (all outputs consumed)
            p, acc = carry
            nb = model.neighbors(batch.replace(pos=p))
            s = nb.idx.sum() + nb.mask.sum() + nb.n_neighbors.sum()
            return (p + eps * s, acc + s.astype(jnp.float32))

        ms_total = device_ms_per_iter(step_total, (batch.pos, jnp.float32(0.0)))
        ms_net = device_ms_per_iter(step_net, (batch.pos, jnp.float32(0.0)))
        ms_nbl = device_ms_per_iter(step_nbl, (batch.pos, jnp.float32(0.0)))
        print(
            f"{label}: total {ms_total:.2f} ms = nbl {ms_nbl:.2f} + "
            f"net {ms_net:.2f} (6 layers -> {ms_net / 6 * 1e3:.0f} us/layer)",
            flush=True,
        )

    if args.trace:
        from torchmdnet_tpu.profiling import trace, trace_summary

        model = create_model(base)
        params = model.init(jax.random.PRNGKey(0), batch)
        fn = jax.jit(lambda p: model.energy(params, batch.replace(pos=p)))
        fn(batch.pos)  # compile
        log_dir = "/tmp/gn_floor_trace"
        import numpy as np

        with trace(log_dir):
            for _ in range(3):
                y = fn(batch.pos)
            float(np.asarray(y).ravel()[0])
        trace_summary(log_dir, top=25, iters=3)


if __name__ == "__main__":
    main()
