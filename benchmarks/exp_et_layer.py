"""Experiment: where does an ET attention layer spend its time? (scratch)

Times cumulative sub-parts of EquivariantMultiHeadAttention (gathers only ->
+ edge products -> + attn matmul -> + dk/dv filter MLPs -> full layer), fwd
and fwd+bwd, via scan differencing on the real chip.  Informs PERF.md.

Usage: python benchmarks/exp_et_layer.py [stage ...]   (default: all)
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
from torchmdnet_tpu.ops.cutoff import cosine_cutoff
from torchmdnet_tpu.profiling import device_ms_per_iter

N = 2489
K = 80
H = 128
HEADS = 8
NUM_RBF = 50
CUT = 5.0
BF16 = "--f32" not in sys.argv


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
    delta, dist = edge_geometry_components(pos, nbl)
    inv = jnp.where(dist > 0, 1.0, 0.0) / jnp.where(dist > 0, dist, 1.0)
    edge_dir = tuple(c * inv for c in delta)
    return nbl, dist, edge_dir, npad


def make_weights(key, npad):
    ks = jax.random.split(key, 10)
    r = lambda i, shape: jax.random.normal(ks[i], shape, jnp.float32) * 0.1
    return dict(
        q=r(0, (npad, H)), k=r(1, (npad, H)), v=r(2, (npad, 3 * H)),
        vec=tuple(r(3 + c, (npad, H)) for c in range(3)),
        edge_attr=r(6, (npad, K + 1, NUM_RBF)),
        wdk=r(7, (NUM_RBF, H)), wdv=r(8, (NUM_RBF, 3 * H)),
        ones=jnp.asarray(
            np.kron(np.eye(HEADS), np.ones((H // HEADS, H // HEADS))),
            jnp.float32,
        ),
    )


def run_stage(stage, W, nbl, dist, edge_dir):
    mp = jnp.bfloat16 if BF16 else jnp.float32
    e = lambda t: t.astype(mp)
    c = cosine_cutoff(dist, 0.0, CUT)
    outs = []
    k_j = ell_gather(e(W["k"]), nbl.idx)
    v_j = ell_gather(e(W["v"]), nbl.idx)
    vec_j = [ell_gather(e(W["vec"][cc]), nbl.idx) for cc in range(3)]
    if stage == "gathers":
        return [k_j.sum(axis=1, dtype=jnp.float32),
                v_j.sum(axis=1, dtype=jnp.float32),
                *[vj.sum(axis=1, dtype=jnp.float32) for vj in vec_j]]

    if stage in ("full", "filters"):
        dk = jax.nn.silu(e(W["edge_attr"]) @ e(W["wdk"]))
        dv = jax.nn.silu(e(W["edge_attr"]) @ e(W["wdv"]))
    else:
        dk = dv = None

    prod = e(W["q"])[:, None, :] * k_j
    if dk is not None:
        prod = prod * dk
    if stage in ("full", "filters", "attn"):
        attn = jax.nn.silu(prod @ e(W["ones"]))
    else:
        attn = prod
    attn = attn * e(c)[..., None]
    attn = jnp.where(nbl.mask[..., None], attn, 0.0)

    if dv is not None:
        v_j = v_j * dv
    x_m, vw1, vw2 = jnp.split(v_j, 3, axis=-1)
    outs.append((x_m * attn).sum(axis=1, dtype=jnp.float32))
    for cc in range(3):
        m = vec_j[cc] * vw1 + vw2 * e(edge_dir[cc])[..., None]
        m = jnp.where(nbl.mask[:, :, None], m, 0.0)
        outs.append(m.sum(axis=1, dtype=jnp.float32))
    return outs


def bench_pos(n_layers=1):
    """Differentiate w.r.t. POSITIONS (the force path): includes the edge
    geometry, cutoff, and RBF VJPs the k-only stages skip."""
    from torchmdnet_tpu.ops.rbf import rbf_class_mapping

    z, pos0 = synthetic_system(N)
    npad = (N + 7) // 8 * 8
    pos0 = jnp.asarray(
        np.concatenate([pos0, np.zeros((npad - N, 3), np.float32)])
    )
    mask = np.arange(npad) < N
    batch = jnp.asarray(np.zeros(npad, np.int32))
    maskj = jnp.asarray(mask)
    nbl = neighbor_list(
        pos0, batch, maskj, k=K, cutoff_lower=0.0, cutoff_upper=CUT, loop=True
    )
    W = make_weights(jax.random.PRNGKey(1), npad)
    rbf = rbf_class_mapping["expnorm"](0.0, CUT, NUM_RBF, False)
    rbf_p = rbf.init(jax.random.PRNGKey(0), jnp.zeros((npad, nbl.k)))

    def loss(pos):
        delta, dist = edge_geometry_components(pos, nbl)
        inv = jnp.where(dist > 0, 1.0, 0.0) / jnp.where(dist > 0, dist, 1.0)
        edge_dir = tuple(c * inv for c in delta)
        Wx = dict(W, edge_attr=rbf.apply(rbf_p, dist))
        s = jnp.float32(0.0)
        for _ in range(n_layers):
            outs = run_stage("full", Wx, nbl, dist, edge_dir)
            s = s + sum((o * o).sum() for o in outs)
        return s

    def fb_step(carry, eps):
        p, acc = carry
        val, g = jax.value_and_grad(loss)(p)
        return (p + eps * g, acc + val)

    ms_fb = device_ms_per_iter(fb_step, (pos0, jnp.float32(0.0)), k_hi=12)
    print(f"pos-grad x{n_layers}  fwd+bwd {ms_fb:7.3f} ms")


def bench(stage):
    nbl, dist, edge_dir, npad = setup()
    W = make_weights(jax.random.PRNGKey(1), npad)

    def fwd_step(carry, eps):
        x, acc = carry
        Wx = dict(W, k=W["k"] + eps * x, v=W["v"])
        outs = run_stage(stage, Wx, nbl, dist, edge_dir)
        s = sum(o.sum() for o in outs)
        return (x + eps * s, acc + s)

    ms_f = device_ms_per_iter(fwd_step, (jnp.zeros(()), jnp.float32(0.0)), k_hi=12)

    def loss(knode, x):
        Wx = dict(W, k=W["k"] + x * knode)
        outs = run_stage(stage, Wx, nbl, dist, edge_dir)
        return sum((o * o).sum() for o in outs)

    def fb_step(carry, eps):
        x, acc = carry
        val, g = jax.value_and_grad(loss, argnums=0)(W["k"], x)
        return (x + eps * (val + g.sum()), acc + val)

    ms_fb = device_ms_per_iter(fb_step, (jnp.zeros(()), jnp.float32(0.0)), k_hi=12)
    print(f"{stage:10s} fwd {ms_f:7.3f} ms   fwd+bwd {ms_fb:7.3f} ms")


if __name__ == "__main__":
    stages = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "gathers", "edgeprod", "attn", "filters", "full",
    ]
    for s in stages:
        if s.startswith("pos"):
            bench_pos(int(s[3:]) if len(s) > 3 else 1)
        else:
            bench(s)
