"""Experiment: XLA row gather vs block-compacted one-hot MXU gather.

The (N*K, F) neighbor-row gathers are the one op class far from the HBM
roofline (PERF.md: ~227 GB/s of ~800 on the wide ET gathers).  This measures
the Pallas one-hot matmul alternative (ops/pallas/onehot_gather.py) on real
cell-list neighbor structure with spatially sorted receivers, at the
reference benchmark sizes.

Run on the TPU:  python benchmarks/exp_gather.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from systems import synthetic_system
from torchmdnet_tpu.ops.neighbors import neighbor_list
from torchmdnet_tpu.ops.pallas.onehot_gather import (
    make_block_gather_plan,
    onehot_gather,
)
from torchmdnet_tpu.profiling import device_ms_per_iter


def spatially_sorted_idx(n, k=80, cutoff=5.0):
    z, pos = synthetic_system(n)
    # build the list on the host CPU backend: structure prep, not the thing
    # being measured (remote TPU compiles of the big cell-list program are slow)
    with jax.default_device(jax.devices("cpu")[0]):
        nbl = neighbor_list(jnp.asarray(pos), k=k, cutoff_upper=cutoff, loop=True,
                            strategy="cell" if n > 2048 else "brute")
        idx = np.asarray(nbl.idx)
    cell = np.floor((pos - pos.min(0)) / cutoff).astype(np.int64)
    key = (cell[:, 0] * 100000 + cell[:, 1]) * 100000 + cell[:, 2]
    pi = np.argsort(key, kind="stable")
    inv = np.empty(n, np.int64)
    inv[pi] = np.arange(n)
    idx_sorted = inv[idx[pi]]  # rows AND ids in sorted labels
    npad = -(-n // 64) * 64
    pad = np.arange(n, npad)[:, None] * np.ones((1, idx.shape[1]), np.int64)
    return jnp.asarray(np.concatenate([idx_sorted, pad]), jnp.int32), npad


def bench_one(n, f, dtype, r=32, w=512):
    idx, npad = spatially_sorted_idx(n)
    k = idx.shape[1]
    plan = make_block_gather_plan(idx, block_rows=r, width=w)
    ov = int(plan.overflow)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((npad, f)), dtype)

    def step_xla(c, eps):
        out = c[idx]
        red = out.sum(axis=1).astype(c.dtype)  # consume all rows
        return (c + eps.astype(c.dtype) * red).astype(c.dtype)

    def step_onehot(c, eps):
        out = onehot_gather(c, plan)
        red = out.sum(axis=1).astype(c.dtype)
        return (c + eps.astype(c.dtype) * red).astype(c.dtype)

    t_xla = device_ms_per_iter(step_xla, x)
    t_oh = device_ms_per_iter(step_onehot, x)
    print(
        f"N={n:6d} K={k} F={f:4d} {np.dtype(dtype).name if dtype != jnp.bfloat16 else 'bf16'}"
        f"  W={w} overflow={ov}:  xla {t_xla:7.3f} ms   onehot {t_oh:7.3f} ms"
        f"   ({t_xla / t_oh:4.2f}x)", flush=True
    )


def bench_transpose(n, f, dtype, r=32, w=512):
    from torchmdnet_tpu.ops.neighbors import ell_transpose_sum
    from torchmdnet_tpu.ops.pallas.onehot_gather import onehot_transpose_sum

    idx, npad = spatially_sorted_idx(n)
    k = idx.shape[1]
    plan = make_block_gather_plan(idx, block_rows=r, width=w)
    ov = int(plan.overflow) + int(plan.inv_overflow)
    rng = np.random.default_rng(0)
    g0 = jnp.asarray(rng.standard_normal((npad, k, f)), dtype)

    def step_argsort(c, eps):
        red = ell_transpose_sum(c, idx)
        return (c + eps.astype(c.dtype) * red[:, None, :]).astype(c.dtype)

    def step_onehot(c, eps):
        red = onehot_transpose_sum(c, plan)
        return (c + eps.astype(c.dtype) * red[:, None, :]).astype(c.dtype)

    t_a = device_ms_per_iter(step_argsort, g0)
    t_o = device_ms_per_iter(step_onehot, g0)
    print(
        f"transpose N={n:6d} K={k} F={f:4d} W={w} overflow={ov}: "
        f"argsort {t_a:7.3f} ms   onehot {t_o:7.3f} ms   ({t_a / t_o:4.2f}x)",
        flush=True,
    )


if __name__ == "__main__":
    import sys as _sys

    configs = [
        (2489, 384, jnp.bfloat16),
        (30327, 384, jnp.bfloat16),
        (2489, 1152, jnp.bfloat16),
        (2489, 128, jnp.bfloat16),
        (30327, 128, jnp.bfloat16),
        (5807, 384, jnp.bfloat16),
    ]
    limit = int(_sys.argv[1]) if len(_sys.argv) > 1 else len(configs)
    mode = _sys.argv[2] if len(_sys.argv) > 2 else "gather"
    for n, f, dtype in configs[:limit]:
        w = 512 if n < 30000 else 640
        if mode == "gather":
            bench_one(n, f, dtype, w=w)
        else:
            bench_transpose(n, f, dtype, w=w)
