"""Model inference benchmarks (reference benchmarks/inference.py analog).

Measures forward and forward+backward (forces) device ms/iteration for each
model on each synthetic system, via scan differencing (PERF.md methodology).

Usage:
    python benchmarks/inference.py --models gn,tensornet --systems dhfr,stmv
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.systems import SYSTEMS, get_system_by_count

MODEL_ALIASES = {
    "gn": "graph-network",
    "t": "transformer",
    "et": "equivariant-transformer",
    "tensornet": "tensornet",
}

# Reference numbers where published (BASELINE.md; GN on an NVIDIA desktop
# GPU, graph_network.ipynb cell 7/11 outputs).
REF_GN_FWD = {22: 7.85, 166: 8.23, 2489: 27.22, 5807: 65.5, 30327: 217.7}
REF_GN_FWDBWD = {22: 5.25, 166: 8.89, 2489: 34.2, 5807: 75.8}


def model_args(name):
    args = dict(
        model=name,
        embedding_dimension=128,
        num_layers=6,
        num_rbf=50,
        rbf_type="expnorm",
        trainable_rbf=True,
        activation="silu",
        neighbor_embedding=True,
        cutoff_lower=0.0,
        cutoff_upper=5.0,
        max_z=128,
        max_num_neighbors=80,
        derivative=True,
        output_model="Scalar",
        prior_model=None,
        reduce_op="add",
        precision=32,
        atom_filter=-1,
        aggr="add",
        num_heads=8,
        distance_influence="both",
        attn_activation="silu",
    )
    if name == "tensornet":
        args.update(
            num_layers=2, num_rbf=32, trainable_rbf=False, cutoff_upper=4.5,
            max_num_neighbors=64, equivariance_invariance_group="O(3)",
        )
    return args


def bench_model(name, n_atoms, k_hi=12):
    import jax
    import jax.numpy as jnp

    from torchmdnet_tpu.data.batch import pad_molecules
    from torchmdnet_tpu.models.potential import create_model
    from torchmdnet_tpu.profiling import device_ms_per_iter

    z, pos, src = get_system_by_count(n_atoms)
    print(f"# system source: {src}")
    npad = max(8, (n_atoms + 7) // 8 * 8)
    batch = pad_molecules([{"z": z, "pos": pos}], num_atoms=npad, num_mol=1)
    model = create_model(model_args(name))
    params = model.init(jax.random.PRNGKey(0), batch)

    def step_f(carry, eps):
        p, acc = carry
        y = model.energy(params, batch.replace(pos=p))
        return (p + eps * y.sum(), acc + y.sum())

    ms_f = device_ms_per_iter(step_f, (batch.pos, jnp.float32(0.0)), k_hi=k_hi)

    def step_fb(carry, eps):
        p, acc = carry
        y, neg_dy = model.energy_and_forces(params, batch.replace(pos=p))
        return (p + eps * neg_dy, acc + y.sum())

    ms_fb = device_ms_per_iter(step_fb, (batch.pos, jnp.float32(0.0)), k_hi=k_hi)
    return ms_f, ms_fb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="gn,tensornet")
    ap.add_argument("--systems", default="ala2,chignolin,dhfr,factor_ix")
    args = ap.parse_args()

    models = [MODEL_ALIASES.get(m, m) for m in args.models.split(",")]
    systems = args.systems.split(",")
    print("| model | system | atoms | fwd ms | fwd+bwd ms | ref fwd | ref fwd+bwd |")
    print("|---|---|---|---|---|---|---|")
    for m in models:
        for s in systems:
            n = SYSTEMS[s]
            ms_f, ms_fb = bench_model(m, n)
            rf = REF_GN_FWD.get(n, "") if m == "graph-network" else ""
            rfb = REF_GN_FWDBWD.get(n, "") if m == "graph-network" else ""
            print(f"| {m} | {s} | {n} | {ms_f:.2f} | {ms_fb:.2f} | {rf} | {rfb} |")


if __name__ == "__main__":
    main()
