"""Pallas TPU kernel: the TensorNet message phase as one fused kernel.

The TensorNet Interaction's edge phase (reference tensornet.py:329-332 +
the 3-layer edge MLP at :376-381) is, in the T9 representation:

    w   = act(L3(act(L2(act(L1(edge_attr)))))) * cutoff * mask   (N, K, 3H)
    m_i = sum_k  wb(comp)[i,k] * cat[idx[i,k], comp]             (N, 9H)

where cat holds the 9 unique irrep components and wb maps component ->
{w_I, w_A, w_S} thirds of w.  The composable path materializes w, two MLP
intermediates, and the gathered (N, K, 9H) rows in HBM; this kernel keeps
all of them in VMEM per receiver block (same architecture as
ops/pallas/et_message.py: one-hot MXU gather from the BlockGatherPlan's
compacted tables, f32 K-axis accumulators, a recomputing backward kernel).

Differentiable at EVERY order via the same custom_jvp / custom_transpose
sandwich as the ET kernel (see et_message.py module docstring): one reverse
pass (forces, MD, energy training) runs the fwd+bwd Pallas kernels;
grad-of-grad (force-loss training) routes the outer pass through the
composable second-order rule while the inner force evaluation stays fused.

Wiring: TensorNet(fused_message=True) + neighbors(gather_plan=True) +
bf16_messages; see models/tensornet.py.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchmdnet_tpu.ops.pallas.onehot_gather import BlockGatherPlan
from torchmdnet_tpu.ops.pallas.et_message import (
    _act_v,
    _dact_v,
    _chunks,
    _inverse_scatter,
    _ref_edge_gather,
    _table_gather,
    _table_scatter,
    reconstruct_idx,
)


class FusedTNConfig(NamedTuple):
    h: int
    act: str
    interpret: bool
    kc: int = 8
    # ring edge-partitioning (see et_message.FusedETConfig)
    ring_axis: str = None
    ring_d: int = 0


def _wb_cat(w3, h):
    """(.., 3H) edge weights -> (.., 9H) per-component multiplier
    [w_I, w_A x3, w_S x5] (tensornet.py irrep component order)."""
    wi = w3[..., :h]
    wa = w3[..., h : 2 * h]
    ws = w3[..., 2 * h :]
    return jnp.concatenate([wi, wa, wa, wa, ws, ws, ws, ws, ws], axis=-1)


def _mlp_fwd(act, ea2, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, bf):
    """act(L3(act(L2(act(L1(ea)))))), whole block, pre-activations returned."""
    p1 = jax.lax.dot(ea2, w1_ref[...], preferred_element_type=jnp.float32).astype(bf) + b1_ref[...]
    t1 = _act_v(act, p1)
    p2 = jax.lax.dot(t1, w2_ref[...], preferred_element_type=jnp.float32).astype(bf) + b2_ref[...]
    t2 = _act_v(act, p2)
    p3 = jax.lax.dot(t2, w3_ref[...], preferred_element_type=jnp.float32).astype(bf) + b3_ref[...]
    t3 = _act_v(act, p3)
    return p1, t1, p2, t2, p3, t3


def _fwd_kernel(
    local_ref, xw_ref, ea_ref, cutm_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    m_out_ref,
    *, w, kc, h, act,
):
    r, k = local_ref.shape
    rk, rbf = ea_ref.shape
    xw = xw_ref[0]  # (W, 9H)
    bf = xw.dtype
    _, _, _, _, _, t3 = _mlp_fwd(
        act, ea_ref[...], w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, bf
    )
    wm3 = t3.reshape(r, k, 3 * h)
    m_acc = jnp.zeros((r, 9 * h), jnp.float32)
    for c0, kn in _chunks(k, kc):
        rc = r * kn
        cols = jax.lax.broadcasted_iota(jnp.int32, (r, kn, w), 2).astype(jnp.float32)
        loc = local_ref[:, c0 : c0 + kn].astype(jnp.float32)[:, :, None]
        oh = jnp.where(loc == cols, 1.0, 0.0).reshape(rc, w).astype(bf)
        g3 = (
            jax.lax.dot(oh, xw, preferred_element_type=jnp.float32)
            .astype(bf).reshape(r, kn, 9 * h)
        )
        cutm3 = cutm_ref[:, c0 : c0 + kn][:, :, None].astype(bf)
        wb3 = _wb_cat(wm3[:, c0 : c0 + kn, :], h) * cutm3  # (R, Kn, 9H)
        m_acc = m_acc + (g3 * wb3).astype(jnp.float32).sum(axis=1)
    m_out_ref[...] = m_acc


def _bwd_kernel(
    local_ref, xw_ref, ea_ref, cutm_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    ct_ref,
    dea_ref, dcutm_ref, dxw_ref,
    dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref,
    *, w, kc, h, act,
):
    """Fully K-chunked backward: each chunk recomputes ITS OWN slice of the
    edge MLP and backprops it immediately, so no full-(R*K) activation or
    cotangent lives across the loop — the scoped-VMEM footprint is
    O(R*kc)-sized chunk temporaries plus the (W, 9H) source table/cotangent
    and the tiny weight-grad accumulators.  The earlier whole-block variant
    held six (R*K, 1..3H) MLP activations plus the concatenated filter
    cotangent and blew the 16 MB limit at STMV-scale K (~113) even at R=8;
    chunking is what lets single-chip TensorNet STMV forces compile at all.

    ``ea``/``dea`` ride as 3D (R, K, RBF128) refs here (unlike the forward
    kernel's 2D layout), with RBF zero-padded to a 128-lane multiple by the
    caller: Mosaic rejects leading-dim collapses on sub-128 lane dims
    ("unsupported shape cast"), and the padding costs ~4x on the smallest
    operand of the phase (negligible HBM share) while every chunk reshape
    becomes legal.
    """
    r, k, rbf = ea_ref.shape
    xw = xw_ref[0]
    bf = xw.dtype
    ct3 = ct_ref[...][:, None, :]  # (R, 1, 9H) f32
    dxw_acc = jnp.zeros((w, 9 * h), jnp.float32)
    dw1_acc = jnp.zeros((rbf, h), jnp.float32)
    db1_acc = jnp.zeros((1, h), jnp.float32)
    dw2_acc = jnp.zeros((h, 2 * h), jnp.float32)
    db2_acc = jnp.zeros((1, 2 * h), jnp.float32)
    dw3_acc = jnp.zeros((2 * h, 3 * h), jnp.float32)
    db3_acc = jnp.zeros((1, 3 * h), jnp.float32)
    for c0, kn in _chunks(k, kc):
        rc = r * kn
        ea2 = ea_ref[:, c0 : c0 + kn, :].reshape(rc, rbf)
        p1, t1, p2, t2, p3, t3 = _mlp_fwd(
            act, ea2, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, bf
        )
        wmc = t3.reshape(r, kn, 3 * h)
        cols = jax.lax.broadcasted_iota(jnp.int32, (r, kn, w), 2).astype(jnp.float32)
        loc = local_ref[:, c0 : c0 + kn].astype(jnp.float32)[:, :, None]
        oh = jnp.where(loc == cols, 1.0, 0.0).reshape(rc, w).astype(bf)
        g3 = (
            jax.lax.dot(oh, xw, preferred_element_type=jnp.float32)
            .astype(bf).reshape(r, kn, 9 * h)
        )
        cutm3 = cutm_ref[:, c0 : c0 + kn][:, :, None].astype(bf)
        wb3 = _wb_cat(wmc, h) * cutm3
        ct3b = ct3.astype(bf)
        # d_g = ct * wb ; d_wb = ct * g
        d_g3 = ct3b * wb3
        dxw_acc = dxw_acc + jax.lax.dot_general(
            oh, d_g3.reshape(rc, 9 * h),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_wb3 = ct3b * g3  # (R, Kn, 9H)
        # wb component map transpose: I <- comp0, A <- comps 1..3, S <- 4..8
        d_wI = d_wb3[:, :, :h]
        d_wA = (
            d_wb3[:, :, h : 2 * h] + d_wb3[:, :, 2 * h : 3 * h]
            + d_wb3[:, :, 3 * h : 4 * h]
        )
        d_wS = (
            d_wb3[:, :, 4 * h : 5 * h] + d_wb3[:, :, 5 * h : 6 * h]
            + d_wb3[:, :, 6 * h : 7 * h] + d_wb3[:, :, 7 * h : 8 * h]
            + d_wb3[:, :, 8 * h :]
        )
        d_wfull3 = jnp.concatenate([d_wI, d_wA, d_wS], axis=-1)  # (R, Kn, 3H)
        dcutm_ref[:, c0 : c0 + kn] = (
            (d_wfull3 * wmc).astype(jnp.float32).sum(axis=-1)
        )
        # ---- edge-MLP backward for THIS chunk (w_used = wm * cutm)
        d_t3 = (d_wfull3 * cutm3).reshape(rc, 3 * h)
        d_p3 = _dact_v(act, p3) * d_t3
        d_t2 = jax.lax.dot_general(
            d_p3, w3_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(bf)
        dw3_acc = dw3_acc + jax.lax.dot_general(
            t2, d_p3, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db3_acc = db3_acc + d_p3.astype(jnp.float32).sum(axis=0, keepdims=True)
        d_p2 = _dact_v(act, p2) * d_t2
        d_t1 = jax.lax.dot_general(
            d_p2, w2_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(bf)
        dw2_acc = dw2_acc + jax.lax.dot_general(
            t1, d_p2, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db2_acc = db2_acc + d_p2.astype(jnp.float32).sum(axis=0, keepdims=True)
        d_p1 = _dact_v(act, p1) * d_t1
        dea_ref[:, c0 : c0 + kn, :] = (
            jax.lax.dot_general(
                d_p1, w1_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dea_ref.dtype).reshape(r, kn, rbf)
        )
        dw1_acc = dw1_acc + jax.lax.dot_general(
            ea2, d_p1, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db1_acc = db1_acc + d_p1.astype(jnp.float32).sum(axis=0, keepdims=True)
    dw3_ref[...] = dw3_acc[None]
    db3_ref[...] = db3_acc[None]
    dw2_ref[...] = dw2_acc[None]
    db2_ref[...] = db2_acc[None]
    dw1_ref[...] = dw1_acc[None]
    db1_ref[...] = db1_acc[None]
    dxw_ref[...] = dxw_acc.astype(dxw_ref.dtype)[None]


def _specs(r, k, rbf, w, h, f9):
    nk = lambda: pl.BlockSpec((r, k), lambda b: (b, 0), memory_space=pltpu.VMEM)
    return [
        nk(),  # local
        pl.BlockSpec((1, w, f9), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r * k, rbf), lambda b: (b, 0), memory_space=pltpu.VMEM),
        nk(),  # cutm
        pl.BlockSpec((rbf, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 2 * h), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * h), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * h, 3 * h), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * h), lambda b: (0, 0), memory_space=pltpu.VMEM),
    ]


def _composable_tn_reference(cfg, plan, inputs):
    """Plain-JAX twin of _fwd_kernel (bf16 compute, f32 accumulate); the body
    the higher-order rules differentiate — never executed in pure reverse
    mode."""
    cat, ea, cutm, w1, b1, w2, b2, w3, b3 = inputs
    h = cfg.h
    bf = cat.dtype
    idx = reconstruct_idx(plan)
    n, k = idx.shape
    ea2 = ea.reshape(n * k, -1)
    _, _, _, _, _, t3 = _mlp_fwd(
        cfg.act, ea2, _Val(w1), _Val(b1), _Val(w2), _Val(b2), _Val(w3), _Val(b3), bf
    )
    wm = t3.reshape(n, k, 3 * h)
    wb = _wb_cat(wm, h) * cutm[..., None].astype(bf)
    g = _ref_edge_gather(cfg, cat, idx, plan)  # (N, K, 9H)
    return (g * wb).astype(jnp.float32).sum(axis=1)


class _Val:
    """Adapter so _mlp_fwd's ref[...] reads work on plain arrays."""

    def __init__(self, a):
        self.a = a

    def __getitem__(self, _):
        return self.a


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def _tn_bwd_op(cfg, plan, inputs, ct):
    """VJP of the fused TN message phase via the backward Pallas kernel;
    differentiating THIS op runs the composable second-order rule."""
    cat, ea, cutm, w1, b1, w2, b2, w3, b3 = inputs
    n, k = plan.local.shape
    nb, w = plan.u.shape
    rbf_true = ea.shape[-1]
    rbf = -(-rbf_true // 128) * 128  # lane-pad for the kernel (see docstring)
    if rbf != rbf_true:
        ea = jnp.pad(ea, ((0, 0), (0, 0), (0, rbf - rbf_true)))
        w1 = jnp.pad(w1, ((0, rbf - rbf_true), (0, 0)))
    h = cfg.h
    r = n // nb
    xw = _table_gather(cfg, cat, plan)
    kern = functools.partial(_bwd_kernel, w=w, kc=cfg.kc, h=h, act=cfg.act)
    nk = lambda: pl.BlockSpec((r, k), lambda b: (b, 0), memory_space=pltpu.VMEM)
    in_specs = [
        nk(),  # local
        pl.BlockSpec((1, w, 9 * h), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        # ea rides 3D (R, K, RBF): the kernel slices K-chunks and collapses
        # leading dims only (sub-128 RBF lane dim untouched)
        pl.BlockSpec((r, k, rbf), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        nk(),  # cutm
        pl.BlockSpec((rbf, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, 2 * h), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * h), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * h, 3 * h), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * h), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r, 9 * h), lambda b: (b, 0), memory_space=pltpu.VMEM),
    ]
    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((r, k, rbf), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            nk(),
            pl.BlockSpec((1, w, 9 * h), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rbf, h), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, 2 * h), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * h), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * h, 3 * h), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3 * h), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k, rbf), ea.dtype),
            jax.ShapeDtypeStruct((n, k), jnp.float32),  # dcutm
            jax.ShapeDtypeStruct((nb, w, 9 * h), cat.dtype),
            jax.ShapeDtypeStruct((nb, rbf, h), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, h), jnp.float32),
            jax.ShapeDtypeStruct((nb, h, 2 * h), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, 2 * h), jnp.float32),
            jax.ShapeDtypeStruct((nb, 2 * h, 3 * h), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, 3 * h), jnp.float32),
        ],
        interpret=cfg.interpret,
    )(
        plan.local, xw, ea, cutm,
        w1, b1, w2, b2, w3, b3, ct.astype(jnp.float32),
    )
    dea, dcutm, dxw, dw1, db1, dw2, db2, dw3, db3 = outs
    dea = dea[:, :, :rbf_true]
    dw1 = dw1[:, :rbf_true, :]
    # NO whole-table f32 upcast: dxw is (NB, W, 9H) — 8.3 GB at STMV scale
    # in f32; _table_scatter accumulates its K/ring sums in f32 on its own
    d_cat = _table_scatter(cfg, dxw, plan, cat.shape[0]).astype(cat.dtype)
    return (
        d_cat,
        dea.astype(ea.dtype),
        dcutm.astype(cutm.dtype),
        dw1.sum(axis=0).astype(w1.dtype),
        db1.sum(axis=0).astype(b1.dtype),
        dw2.sum(axis=0).astype(w2.dtype),
        db2.sum(axis=0).astype(b2.dtype),
        dw3.sum(axis=0).astype(w3.dtype),
        db3.sum(axis=0).astype(b3.dtype),
    )


@_tn_bwd_op.defjvp
def _tn_bwd_op_jvp(cfg, primals, tangents):
    """Second-order rule: the tangent rides `_tn_bwd_dot` (custom_transpose,
    linear in the tangents) whose transpose — the grad-of-grad force-training
    hot path — is the fused second-order kernel `_tn_bwd2_op`.  The primal
    still runs the Pallas bwd kernel."""
    from jax.core import ShapedArray

    plan, inputs, ct = primals
    _, d_inputs, d_ct = tangents
    primal_out = _tn_bwd_op(cfg, plan, inputs, ct)
    out_types = jax.tree_util.tree_map(
        lambda o: ShapedArray(jnp.shape(o), o.dtype), primal_out
    )
    tangent_out = _tn_bwd_dot(cfg)(
        out_types, (plan, inputs, ct), (tuple(d_inputs), d_ct)
    )
    return primal_out, tangent_out


def _tn_ref_vjp_fn(cfg, plan, inputs, ct):
    _, vjp = jax.vjp(
        lambda ins: _composable_tn_reference(cfg, plan, ins), inputs
    )
    (d,) = vjp(ct)
    return d


def _composable_tn_bwd_vjp(cfg, plan, inputs, ct, Z):
    """Composable twin of `_tn_bwd2_op` (third-order body, test oracle)."""

    def s_fn(inputs, ct):
        g = _tn_ref_vjp_fn(cfg, plan, inputs, ct)
        return sum(
            jnp.sum(gi.astype(jnp.float32) * zi.astype(jnp.float32))
            for gi, zi in zip(g, Z)
        )

    return jax.grad(s_fn, argnums=(0, 1))(inputs, ct)


@functools.lru_cache(maxsize=None)
def _tn_bwd_dot(cfg):
    from jax.custom_transpose import custom_transpose

    @custom_transpose
    def dot(res, lin):
        plan, inputs, ct = res
        d_inputs, d_ct = lin
        _, tangent = jax.jvp(
            lambda i, c: _tn_ref_vjp_fn(cfg, plan, i, c),
            (inputs, ct), (d_inputs, d_ct),
        )
        return tangent

    @dot.def_transpose
    def dot_t(res, Z):
        plan, inputs, ct = res
        Z = tuple(
            jnp.zeros_like(x) if z is None else z for z, x in zip(Z, inputs)
        )
        return _tn_bwd2_op(cfg, plan, inputs, ct, Z)

    return dot


def _tn_chunk_fwd_fn(cfg, oh, r, kn, h):
    """One `_fwd_kernel` chunk as a pure function of its differentiable
    args, shaped for nested autodiff inside the second-order kernel.  Same
    Mosaic constraint as et_message._chunk_fwd_fn: no slice/concatenate on
    any differentiated value — the packed source table, the ct, and the L3
    weights arrive pre-split per irrep third (ref-level sliced loads), and
    the nine component partials return separately.  `_WB` maps component ->
    which L3 third multiplies it (tensornet.py irrep order I, A x3, S x5)."""

    def fwd(xws, ea2, cutm_c, w1, b1, w2, b2, w3i, w3a, w3s, b3i, b3a, b3s):
        bf = xws[0].dtype
        p1 = jax.lax.dot(ea2, w1, preferred_element_type=jnp.float32).astype(bf) + b1
        t1 = _act_v(cfg.act, p1)
        p2 = jax.lax.dot(t1, w2, preferred_element_type=jnp.float32).astype(bf) + b2
        t2 = _act_v(cfg.act, p2)
        cutm3 = cutm_c[:, :, None].astype(bf)
        thirds = []
        for wv, bv in ((w3i, b3i), (w3a, b3a), (w3s, b3s)):
            p3 = jax.lax.dot(t2, wv, preferred_element_type=jnp.float32).astype(bf) + bv
            thirds.append(_act_v(cfg.act, p3).reshape(r, kn, h) * cutm3)
        parts = []
        for c, third in enumerate(_WB):
            g3 = (
                jax.lax.dot(oh, xws[c], preferred_element_type=jnp.float32)
                .astype(bf).reshape(r, kn, h)
            )
            parts.append(
                (g3 * thirds[third]).astype(jnp.float32).sum(axis=1)
            )
        return tuple(parts)

    return fwd


_WB = (0, 1, 1, 1, 2, 2, 2, 2, 2)  # component -> L3 third (I, A, S)


def _tn_bwd2_kernel(
    local_ref, xw_ref, ea_ref, cutm_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, ct_ref,
    zxw_ref, zea_ref, zcutm_ref,
    zw1_ref, zb1_ref, zw2_ref, zb2_ref, zw3_ref, zb3_ref,
    gea_ref, gcutm_ref, gxw_ref,
    gw1_ref, gb1_ref, gw2_ref, gb2_ref, gw3_ref, gb3_ref, gct_ref,
    *, w, kc, h, act,
):
    """Fused VJP-of-VJP of the TN message phase (see et_message._bwd2_kernel
    for the construction): per chunk, S = <vjp(chunk_fwd)(ct), Z_chunk> and
    jax.grad(S) emits gradients wrt every primal input and wrt ct."""
    r, k, rbf = ea_ref.shape
    f32 = jnp.float32
    cfg_like = FusedTNConfig(h=h, act=act, interpret=False)
    xparts = tuple(xw_ref[0, :, c * h : (c + 1) * h] for c in range(9))
    zxparts = tuple(
        zxw_ref[0, :, c * h : (c + 1) * h].astype(f32) for c in range(9)
    )
    tslices = tuple(slice(c * h, (c + 1) * h) for c in range(3))
    w3_p = tuple(w3_ref[:, s] for s in tslices)
    b3_p = tuple(b3_ref[:, s] for s in tslices)
    zw3_p = tuple(zw3_ref[:, s].astype(f32) for s in tslices)
    zb3_p = tuple(zb3_ref[:, s].astype(f32) for s in tslices)
    ct_p = tuple(ct_ref[:, c * h : (c + 1) * h].astype(f32) for c in range(9))
    w1 = w1_ref[...]
    b1 = b1_ref[...]
    w2 = w2_ref[...]
    b2 = b2_ref[...]
    zw1 = zw1_ref[...].astype(f32)
    zb1 = zb1_ref[...].astype(f32)
    zw2 = zw2_ref[...].astype(f32)
    zb2 = zb2_ref[...].astype(f32)
    gx_acc = [jnp.zeros((w, h), f32) for _ in range(9)]
    gw1_acc = jnp.zeros((rbf, h), f32)
    gb1_acc = jnp.zeros((1, h), f32)
    gw2_acc = jnp.zeros((h, 2 * h), f32)
    gb2_acc = jnp.zeros((1, 2 * h), f32)
    gw3_acc = [jnp.zeros((2 * h, h), f32) for _ in range(3)]
    gb3_acc = [jnp.zeros((1, h), f32) for _ in range(3)]
    gct_acc = [jnp.zeros((r, h), f32) for _ in range(9)]
    for c0, kn in _chunks(k, kc):
        rc = r * kn
        cols = jax.lax.broadcasted_iota(jnp.int32, (r, kn, w), 2).astype(f32)
        loc = local_ref[:, c0 : c0 + kn].astype(f32)[:, :, None]
        oh = jnp.where(loc == cols, 1.0, 0.0).reshape(rc, w).astype(
            xparts[0].dtype
        )
        fwd = _tn_chunk_fwd_fn(cfg_like, oh, r, kn, h)
        args = (
            xparts,
            ea_ref[:, c0 : c0 + kn, :].reshape(rc, rbf),
            cutm_ref[:, c0 : c0 + kn],
            w1, b1, w2, b2,
        ) + w3_p + b3_p
        zea2 = zea_ref[:, c0 : c0 + kn, :].reshape(rc, rbf).astype(f32)
        zcutm_c = zcutm_ref[:, c0 : c0 + kn].astype(f32)
        zs = (
            zxparts, zea2, zcutm_c, zw1, zb1, zw2, zb2,
        ) + zw3_p + zb3_p

        def S(a, cts):
            _, vjpf = jax.vjp(lambda t: fwd(*t), a)
            (g,) = vjpf(cts)
            total = jnp.zeros((), f32)
            for gi, zi in zip(g, zs):
                if isinstance(zi, tuple):
                    for gij, zij in zip(gi, zi):
                        total = total + jnp.sum(gij.astype(f32) * zij)
                else:
                    total = total + jnp.sum(gi.astype(f32) * zi)
            return total

        ga, gc = jax.grad(S, argnums=(0, 1))(args, ct_p)
        for c in range(9):
            gx_acc[c] = gx_acc[c] + ga[0][c].astype(f32)
        gea_ref[:, c0 : c0 + kn, :] = ga[1].astype(gea_ref.dtype).reshape(
            r, kn, rbf
        )
        gcutm_ref[:, c0 : c0 + kn] = ga[2].astype(f32)
        gw1_acc = gw1_acc + ga[3].astype(f32)
        gb1_acc = gb1_acc + ga[4].astype(f32)
        gw2_acc = gw2_acc + ga[5].astype(f32)
        gb2_acc = gb2_acc + ga[6].astype(f32)
        for c in range(3):
            gw3_acc[c] = gw3_acc[c] + ga[7 + c].astype(f32)
            gb3_acc[c] = gb3_acc[c] + ga[10 + c].astype(f32)
        for c in range(9):
            gct_acc[c] = gct_acc[c] + gc[c].astype(f32)
    for c in range(9):
        gxw_ref[0, :, c * h : (c + 1) * h] = gx_acc[c].astype(gxw_ref.dtype)
        gct_ref[:, c * h : (c + 1) * h] = gct_acc[c]
    gw1_ref[...] = gw1_acc[None]
    gb1_ref[...] = gb1_acc[None]
    gw2_ref[...] = gw2_acc[None]
    gb2_ref[...] = gb2_acc[None]
    for c in range(3):
        gw3_ref[0, :, c * h : (c + 1) * h] = gw3_acc[c]
        gb3_ref[0, :, c * h : (c + 1) * h] = gb3_acc[c]


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def _tn_bwd2_op(cfg, plan, inputs, ct, Z):
    """VJP of `_tn_bwd_op` wrt (inputs, ct) via the fused second-order
    kernel.  Z: 9-tuple of cotangents on the backward op's outputs.
    Returns (g_inputs 9-tuple, g_ct)."""
    cat, ea, cutm, w1, b1, w2, b2, w3, b3 = inputs
    z_cat, z_ea, z_cutm, z_w1, z_b1, z_w2, z_b2, z_w3, z_b3 = Z
    n, k = plan.local.shape
    nb, w = plan.u.shape
    rbf_true = ea.shape[-1]
    rbf = -(-rbf_true // 128) * 128
    if rbf != rbf_true:
        pad3 = ((0, 0), (0, 0), (0, rbf - rbf_true))
        padw = ((0, rbf - rbf_true), (0, 0))
        ea = jnp.pad(ea, pad3)
        z_ea = jnp.pad(z_ea, pad3)
        w1 = jnp.pad(w1, padw)
        z_w1 = jnp.pad(z_w1, padw)
    h = cfg.h
    r = n // nb
    xw = _table_gather(cfg, cat, plan)
    z_xw = _table_gather(cfg, z_cat.astype(cat.dtype), plan)
    # K-chunk: bigger chunks mean fuller MXU calls (R*kc rows) and fewer
    # per-chunk autodiff re-traversals; the r5 sweep (DHFR 2x128 K=64 force
    # training, ms/step) measured kc=2: 106.5, 4: 85.6, 8: 70.7, 16: 66.4,
    # 32: 65.5 — saturating at 16, which jit_vmem_retry's raised scoped-VMEM
    # rungs accommodate (the nine per-component chains' temporaries scale
    # with kc, so kc=2 was the only size fitting the DEFAULT 16 MB limit).
    kc = max(2, min(2 * cfg.kc, k))
    kern = functools.partial(_tn_bwd2_kernel, w=w, kc=kc, h=h, act=cfg.act)
    nk = lambda: pl.BlockSpec((r, k), lambda b: (b, 0), memory_space=pltpu.VMEM)
    blk = lambda *s: pl.BlockSpec(
        s, lambda b, _nd=len(s): (b,) + (0,) * (_nd - 1), memory_space=pltpu.VMEM
    )
    bcast = lambda *s: pl.BlockSpec(
        s, lambda b: (0,) * len(s), memory_space=pltpu.VMEM
    )
    wspecs = [
        bcast(rbf, h), bcast(1, h), bcast(h, 2 * h), bcast(1, 2 * h),
        bcast(2 * h, 3 * h), bcast(1, 3 * h),
    ]
    in_specs = (
        [nk(), blk(1, w, 9 * h), blk(r, k, rbf), nk()]
        + wspecs
        + [blk(r, 9 * h)]  # ct
        + [blk(1, w, 9 * h), blk(r, k, rbf), nk()]
        + wspecs
    )
    out_specs = (
        [blk(r, k, rbf), nk(), blk(1, w, 9 * h)]
        + [
            blk(1, rbf, h), blk(1, 1, h), blk(1, h, 2 * h), blk(1, 1, 2 * h),
            blk(1, 2 * h, 3 * h), blk(1, 1, 3 * h),
        ]
        + [blk(r, 9 * h)]
    )
    out_shape = [
        jax.ShapeDtypeStruct((n, k, rbf), jnp.float32),
        jax.ShapeDtypeStruct((n, k), jnp.float32),
        jax.ShapeDtypeStruct((nb, w, 9 * h), cat.dtype),
        jax.ShapeDtypeStruct((nb, rbf, h), jnp.float32),
        jax.ShapeDtypeStruct((nb, 1, h), jnp.float32),
        jax.ShapeDtypeStruct((nb, h, 2 * h), jnp.float32),
        jax.ShapeDtypeStruct((nb, 1, 2 * h), jnp.float32),
        jax.ShapeDtypeStruct((nb, 2 * h, 3 * h), jnp.float32),
        jax.ShapeDtypeStruct((nb, 1, 3 * h), jnp.float32),
        jax.ShapeDtypeStruct((n, 9 * h), jnp.float32),
    ]
    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=cfg.interpret,
    )(
        plan.local, xw, ea, cutm, w1, b1, w2, b2, w3, b3,
        ct.astype(jnp.float32),
        z_xw, z_ea, z_cutm.astype(jnp.float32),
        z_w1, z_b1, z_w2, z_b2, z_w3, z_b3,
    )
    (gea, gcutm, gxw, gw1, gb1, gw2, gb2, gw3, gb3, gct) = outs
    g_cat = _table_scatter(cfg, gxw, plan, cat.shape[0]).astype(cat.dtype)
    g_inputs = (
        g_cat,
        gea[:, :, :rbf_true].astype(inputs[1].dtype),
        gcutm.astype(cutm.dtype),
        gw1[:, :rbf_true, :].sum(axis=0).astype(inputs[3].dtype),
        gb1.sum(axis=0).astype(b1.dtype),
        gw2.sum(axis=0).astype(w2.dtype),
        gb2.sum(axis=0).astype(b2.dtype),
        gw3.sum(axis=0).astype(w3.dtype),
        gb3.sum(axis=0).astype(b3.dtype),
    )
    return g_inputs, gct.astype(ct.dtype)


@_tn_bwd2_op.defjvp
def _tn_bwd2_op_jvp(cfg, primals, tangents):
    """Third-order rule: composable.  Reached only beyond grad-of-grad."""
    plan, inputs, ct, Z = primals
    _, d_inputs, d_ct, d_Z = tangents
    primal_out = _tn_bwd2_op(cfg, plan, inputs, ct, Z)
    _, tangent_out = jax.jvp(
        lambda i, c, z: _composable_tn_bwd_vjp(cfg, plan, i, c, z),
        (inputs, ct, Z), (d_inputs, d_ct, d_Z),
    )
    return primal_out, tangent_out


@functools.lru_cache(maxsize=None)
def _tn_dot(cfg):
    from jax.custom_transpose import custom_transpose

    @custom_transpose
    def dot(res, d_inputs):
        plan, inputs = res
        _, tangent = jax.jvp(
            lambda ins: _composable_tn_reference(cfg, plan, ins),
            (inputs,), (d_inputs,),
        )
        return tangent

    @dot.def_transpose
    def dot_t(res, ct):
        plan, inputs = res
        return _tn_bwd_op(cfg, plan, inputs, ct)

    return dot


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def fused_tn_messages(cfg, plan, cat, ea, cutm, w1, b1, w2, b2, w3, b3):
    """Fused TensorNet message phase: m (N, 9H) f32.

    Args:
        cfg: FusedTNConfig (static).
        plan: BlockGatherPlan over the layer's ELL idx.
        cat: (N, 9H) irrep-component source rows (message dtype, bf16).
        ea: (N, K, RBF) edge RBF features (bf16).
        cutm: (N, K) f32 cosine_cutoff(dist) * mask.
        w1/b1, w2/b2, w3/b3: the edge MLP params (bf16, biases (1, F)).

    Differentiable at every order (module docstring): one reverse pass runs
    the fwd+bwd Pallas kernels; grad-of-grad routes the outer pass through
    the composable second-order rule.
    """
    n, k = plan.local.shape
    nb, w = plan.u.shape
    rbf = ea.shape[-1]
    h = cfg.h
    xw = _table_gather(cfg, cat, plan)  # (NB, W, 9H)
    kern = functools.partial(_fwd_kernel, w=w, kc=cfg.kc, h=h, act=cfg.act)
    r = n // nb
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=_specs(r, k, rbf, w, h, 9 * h),
        out_specs=pl.BlockSpec((r, 9 * h), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 9 * h), jnp.float32),
        interpret=cfg.interpret,
    )(plan.local, xw, ea.reshape(n * k, rbf), cutm, w1, b1, w2, b2, w3, b3)


@fused_tn_messages.defjvp
def _fused_tn_messages_jvp(cfg, primals, tangents):
    from jax.core import ShapedArray

    plan, *arrays = primals
    _, *d_arrays = tangents
    out = fused_tn_messages(cfg, plan, *arrays)
    out_types = ShapedArray(jnp.shape(out), out.dtype)
    d_out = _tn_dot(cfg)(out_types, (plan, tuple(arrays)), tuple(d_arrays))
    return out, d_out
