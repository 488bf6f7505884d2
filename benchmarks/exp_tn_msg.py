"""Experiment: TensorNet interaction message-pass variants (scratch).

Times the hot part of tensornet.Interaction -- the per-edge weight MLP +
(N, K, 9H) gather + per-block multiply/K-reduce -- under several layouts,
via scan differencing on the real chip.  Informs PERF.md "next targets".
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.systems import synthetic_system
from torchmdnet_tpu.ops.neighbors import (
    edge_geometry_components,
    ell_gather,
    neighbor_list,
)
from torchmdnet_tpu.ops.rbf import rbf_class_mapping
from torchmdnet_tpu.ops.cutoff import cosine_cutoff
from torchmdnet_tpu.profiling import device_ms_per_iter

N = 2489
K = 64
H = 128
NUM_RBF = 32
CUT = 4.5


def setup():
    z, pos = synthetic_system(N)
    npad = (N + 7) // 8 * 8
    pos = np.concatenate([pos, np.zeros((npad - N, 3), np.float32)])
    mask = np.arange(npad) < N
    batch = np.zeros(npad, np.int32)
    pos = jnp.asarray(pos)
    nbl = neighbor_list(
        pos, jnp.asarray(batch), jnp.asarray(mask), k=K,
        cutoff_lower=0.0, cutoff_upper=CUT, loop=True,
    )
    _, dist = edge_geometry_components(pos, nbl)
    rbf = rbf_class_mapping["expnorm"](0.0, CUT, NUM_RBF, False)
    edge_attr = rbf.apply(rbf.init(jax.random.PRNGKey(0), dist), dist)
    return nbl, dist, edge_attr


def make_weights(key, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    w1 = jax.random.normal(ks[0], (NUM_RBF, H), dtype) * 0.1
    w2 = jax.random.normal(ks[1], (H, 2 * H), dtype) * 0.1
    w3 = jax.random.normal(ks[2], (2 * H, 3 * H), dtype) * 0.1
    cat = jax.random.normal(ks[3], (N + 7) // 8 * 8 * 9 * H, dtype)
    cat = cat.reshape(-1, 9 * H)
    return (w1, w2, w3), cat


def w_mlp(ws, edge_attr, c, mask):
    w1, w2, w3 = ws
    w = jax.nn.silu(edge_attr @ w1)
    w = jax.nn.silu(w @ w2)
    w = jax.nn.silu(w @ w3)
    w = w * c[..., None]
    return jnp.where(mask[..., None], w, 0.0)


def reduce_current(cat, w, nbl):
    cat_j = ell_gather(cat, nbl.idx)  # (N, K, 9H)
    w_i, w_a, w_s = jnp.split(w, 3, axis=-1)
    wb = (w_i, w_a, w_a, w_a, w_s, w_s, w_s, w_s, w_s)
    return [
        (cat_j[:, :, i * H : (i + 1) * H] * wb[i]).sum(axis=1) for i in range(9)
    ]


def reduce_concat(cat, w, nbl):
    cat_j = ell_gather(cat, nbl.idx)
    w_i, w_a, w_s = jnp.split(w, 3, axis=-1)
    wcat = jnp.concatenate([w_i, w_a, w_a, w_a, w_s, w_s, w_s, w_s, w_s], -1)
    m = (cat_j * wcat).sum(axis=1)  # (N, 9H)
    return [m[:, i * H : (i + 1) * H] for i in range(9)]


def reduce_scan(chunk):
    def impl(cat, w, nbl):
        npad = nbl.idx.shape[0]
        idx_c = nbl.idx.T.reshape(K // chunk, chunk, npad)  # (S, chunk, N)
        w_c = w.transpose(1, 0, 2).reshape(K // chunk, chunk, npad, 3 * H)

        def body(acc, xs):
            ic, wc = xs  # (chunk, N), (chunk, N, 3H)
            cj = cat[ic]  # (chunk, N, 9H)
            w_i, w_a, w_s = jnp.split(wc, 3, axis=-1)
            wcat = jnp.concatenate(
                [w_i, w_a, w_a, w_a, w_s, w_s, w_s, w_s, w_s], -1
            )
            return acc + (cj * wcat).sum(axis=0), None

        acc0 = jnp.zeros((npad, 9 * H), cat.dtype)
        m, _ = jax.lax.scan(body, acc0, (idx_c, w_c))
        return [m[:, i * H : (i + 1) * H] for i in range(9)]

    return impl


def reduce_bf16(cat, w, nbl):
    cat_j = ell_gather(cat.astype(jnp.bfloat16), nbl.idx)
    w_i, w_a, w_s = jnp.split(w.astype(jnp.bfloat16), 3, axis=-1)
    wb = (w_i, w_a, w_a, w_a, w_s, w_s, w_s, w_s, w_s)
    return [
        (cat_j[:, :, i * H : (i + 1) * H].astype(jnp.float32)
         * wb[i].astype(jnp.float32)).sum(axis=1)
        for i in range(9)
    ]


def reduce_bf16_gather(cat, w, nbl):
    # only the gathered neighbor rows are quantized; weights stay f32
    cat_j = ell_gather(cat.astype(jnp.bfloat16), nbl.idx).astype(jnp.float32)
    w_i, w_a, w_s = jnp.split(w, 3, axis=-1)
    wb = (w_i, w_a, w_a, w_a, w_s, w_s, w_s, w_s, w_s)
    return [
        (cat_j[:, :, i * H : (i + 1) * H] * wb[i]).sum(axis=1) for i in range(9)
    ]


def reduce_bf16_acc32(cat, w, nbl):
    # bf16 gather AND product; K-accumulation in f32
    cat_j = ell_gather(cat.astype(jnp.bfloat16), nbl.idx)
    w_i, w_a, w_s = jnp.split(w.astype(jnp.bfloat16), 3, axis=-1)
    wb = (w_i, w_a, w_a, w_a, w_s, w_s, w_s, w_s, w_s)
    return [
        (cat_j[:, :, i * H : (i + 1) * H] * wb[i]).sum(axis=1, dtype=jnp.float32)
        for i in range(9)
    ]


def bench(label, reducer, with_mlp=True):
    nbl, dist, edge_attr = setup()
    ws, cat = make_weights(jax.random.PRNGKey(1))
    c = cosine_cutoff(dist, 0.0, CUT)

    def step(carry, eps):
        catc, acc = carry
        if with_mlp:
            w = w_mlp(ws, edge_attr, c, nbl.mask)
        else:
            w = jnp.broadcast_to(c[..., None], (*c.shape, 3 * H))
        outs = reducer(catc, w, nbl)
        s = sum(o.sum() for o in outs)
        return (catc + eps * s, acc + s), None

    def stepfn(carry, eps):
        (catc, acc), _ = step(carry, eps)
        return (catc, acc)

    ms = device_ms_per_iter(stepfn, (cat, jnp.float32(0.0)), k_hi=12)
    print(f"{label:28s} {ms:7.3f} ms")
    return ms


if __name__ == "__main__":
    which = sys.argv[1:] or ["current", "concat", "scan8", "scan16", "bf16"]
    impls = {
        "current": reduce_current,
        "concat": reduce_concat,
        "scan4": reduce_scan(4),
        "scan8": reduce_scan(8),
        "scan16": reduce_scan(16),
        "bf16": reduce_bf16,
        "bf16gather": reduce_bf16_gather,
        "bf16acc32": reduce_bf16_acc32,
    }
    for name in which:
        bench(name, impls[name])
