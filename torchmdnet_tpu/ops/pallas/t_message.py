"""Pallas TPU kernel: the (invariant) Transformer attention edge phase fused.

The T layer's edge phase (reference torchmd_t.py:185-283) is the ET edge
phase minus the vector features: per edge,

    dk/dv  = act(edge_attr @ Wdk/Wdv + b)                    (N, K, H)
    attn   = attn_act((q_i * k_j * dk) @ ones_block) * cutm  (N, K, H)
    out_i  = sum_k (v_j * dv * attn)                         (N, H)

The composable path materializes the gathered k_j/v_j rows, both filters,
attention and the message in HBM — the same (E, H)-intermediate traffic that
made the ET kernel pay (PERF.md "Where ET time goes"); this kernel keeps all
of it in VMEM per receiver block, exactly like ops/pallas/et_message.py but
with a (W, 2H) source table and no vector/direction outputs.

Differentiable at every order via the same custom_jvp / custom_transpose
sandwich (see et_message.py module docstring), and composes with ring
edge-partitioning through the shared _table_gather/_table_scatter/
_ref_edge_gather helpers (cfg.ring_axis + BlockGatherPlan.ring).

Wiring: TorchMD_T(fused_attention=True) + neighbors(gather_plan=True) +
bf16_messages; see models/transformer.py.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchmdnet_tpu.ops.pallas.et_message import (
    _act_v,
    _chunks,
    _dact_v,
    _ones_block,
    _ref_edge_gather,
    _table_gather,
    _table_scatter,
    reconstruct_idx,
)


class FusedTConfig(NamedTuple):
    """Static (hashable) config of the fused T edge phase."""

    h: int
    heads: int
    act: str
    attn_act: str
    has_dk: bool
    has_dv: bool
    interpret: bool
    kc: int = 16
    # ring edge-partitioning (see et_message.FusedETConfig)
    ring_axis: str = None
    ring_d: int = 0


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------


def _fwd_kernel(
    local_ref, xw_ref, q_ref, ea_ref, cutm_ref,
    wdk_ref, bdk_ref, wdv_ref, bdv_ref, ones_ref,
    x_out_ref,
    *, w, kc, h, act, attn_act, has_dk, has_dv,
):
    r, k = local_ref.shape
    rk, rbf = ea_ref.shape
    xw = xw_ref[0]  # (W, 2H)
    bf = xw.dtype
    ones = ones_ref[...]
    q3 = q_ref[...][:, None, :]
    x_acc = jnp.zeros((r, h), jnp.float32)
    ea2 = ea_ref[...]
    dk_f3 = dv_f3 = None
    if has_dk:
        pre = jax.lax.dot(ea2, wdk_ref[...], preferred_element_type=jnp.float32)
        dk_f3 = _act_v(act, pre.astype(bf) + bdk_ref[...]).reshape(r, k, h)
    if has_dv:
        pre = jax.lax.dot(ea2, wdv_ref[...], preferred_element_type=jnp.float32)
        dv_f3 = _act_v(act, pre.astype(bf) + bdv_ref[...]).reshape(r, k, h)
    for c0, kn in _chunks(k, kc):
        rc = r * kn
        cols = jax.lax.broadcasted_iota(jnp.int32, (r, kn, w), 2).astype(jnp.float32)
        loc = local_ref[:, c0 : c0 + kn].astype(jnp.float32)[:, :, None]
        oh = jnp.where(loc == cols, 1.0, 0.0).reshape(rc, w).astype(bf)
        g2 = jax.lax.dot(oh, xw, preferred_element_type=jnp.float32).astype(bf)
        prod3 = q3 * g2[:, :h].reshape(r, kn, h)
        if dk_f3 is not None:
            prod3 = prod3 * dk_f3[:, c0 : c0 + kn, :]
        pre_a = jax.lax.dot(
            prod3.reshape(rc, h), ones, preferred_element_type=jnp.float32
        ).astype(bf)
        cutm3 = cutm_ref[:, c0 : c0 + kn][:, :, None].astype(bf)
        attn3 = _act_v(attn_act, pre_a.reshape(r, kn, h)) * cutm3
        vj3 = g2[:, h:].reshape(r, kn, h)
        if dv_f3 is not None:
            vj3 = vj3 * dv_f3[:, c0 : c0 + kn, :]
        x_acc = x_acc + (vj3 * attn3).astype(jnp.float32).sum(axis=1)
    x_out_ref[...] = x_acc


# --------------------------------------------------------------------------
# backward kernel (recomputes the forward chunk, then backprops it)
# --------------------------------------------------------------------------


def _bwd_kernel(
    local_ref, xw_ref, q_ref, ea_ref, cutm_ref,
    wdk_ref, bdk_ref, wdv_ref, bdv_ref, ones_ref,
    ct_x_ref,
    dq_ref, dea_ref, dcutm_ref, dxw_ref,
    dwdk_ref, dbdk_ref, dwdv_ref, dbdv_ref,
    *, w, kc, h, act, attn_act, has_dk, has_dv,
):
    r, k, rbf = ea_ref.shape
    xw = xw_ref[0]
    bf = xw.dtype
    ones = ones_ref[...]
    q3 = q_ref[...][:, None, :]
    ct_x3 = ct_x_ref[...][:, None, :].astype(bf)
    dq_acc = jnp.zeros((r, h), jnp.float32)
    dxw_acc = jnp.zeros((w, 2 * h), jnp.float32)
    dwdk_acc = jnp.zeros((rbf, h), jnp.float32)
    dbdk_acc = jnp.zeros((1, h), jnp.float32)
    dwdv_acc = jnp.zeros((rbf, h), jnp.float32)
    dbdv_acc = jnp.zeros((1, h), jnp.float32)
    for c0, kn in _chunks(k, kc):
        rc = r * kn
        ea2 = ea_ref[:, c0 : c0 + kn, :].reshape(rc, rbf)
        dk3 = pre_k = None
        if has_dk:
            pre_k = (
                jax.lax.dot(ea2, wdk_ref[...], preferred_element_type=jnp.float32)
                .astype(bf) + bdk_ref[...]
            )
            dk3 = _act_v(act, pre_k).reshape(r, kn, h)
        dv3 = pre_v = None
        if has_dv:
            pre_v = (
                jax.lax.dot(ea2, wdv_ref[...], preferred_element_type=jnp.float32)
                .astype(bf) + bdv_ref[...]
            )
            dv3 = _act_v(act, pre_v).reshape(r, kn, h)
        # ---- recompute the forward chunk
        cols = jax.lax.broadcasted_iota(jnp.int32, (r, kn, w), 2).astype(jnp.float32)
        loc = local_ref[:, c0 : c0 + kn].astype(jnp.float32)[:, :, None]
        oh = jnp.where(loc == cols, 1.0, 0.0).reshape(rc, w).astype(bf)
        g2 = jax.lax.dot(oh, xw, preferred_element_type=jnp.float32).astype(bf)
        kj3 = g2[:, :h].reshape(r, kn, h)
        vj3 = g2[:, h:].reshape(r, kn, h)
        prod3 = q3 * kj3
        if dk3 is not None:
            prod3 = prod3 * dk3
        pre_a3 = (
            jax.lax.dot(prod3.reshape(rc, h), ones, preferred_element_type=jnp.float32)
            .astype(bf).reshape(r, kn, h)
        )
        a_act3 = _act_v(attn_act, pre_a3)
        cutm3 = cutm_ref[:, c0 : c0 + kn][:, :, None].astype(bf)
        attn3 = a_act3 * cutm3
        vdv3 = vj3 * dv3 if dv3 is not None else vj3
        # ---- backward through the chunk
        d_attn3 = ct_x3 * vdv3
        d_vdv3 = ct_x3 * attn3
        d_prea3 = _dact_v(attn_act, pre_a3) * cutm3 * d_attn3
        dcutm_ref[:, c0 : c0 + kn] = (
            (a_act3 * d_attn3).astype(jnp.float32).sum(axis=-1)
        )
        d_prod3 = (
            jax.lax.dot(
                d_prea3.reshape(rc, h).astype(bf), ones,
                preferred_element_type=jnp.float32,
            ).astype(bf).reshape(r, kn, h)
        )
        qk3 = d_prod3 * q3
        if dk3 is not None:
            d_kj3 = qk3 * dk3
            d_dk3 = qk3 * kj3
            dq_acc = dq_acc + (d_prod3 * kj3 * dk3).astype(jnp.float32).sum(axis=1)
        else:
            d_kj3 = qk3
            d_dk3 = None
            dq_acc = dq_acc + (d_prod3 * kj3).astype(jnp.float32).sum(axis=1)
        if dv3 is not None:
            d_vj3 = d_vdv3 * dv3
            d_dv3 = d_vdv3 * vj3
        else:
            d_vj3 = d_vdv3
            d_dv3 = None
        d_g2 = jnp.concatenate(
            [d_kj3.reshape(rc, h), d_vj3.reshape(rc, h)], axis=-1
        )  # (RC, 2H)
        dxw_acc = dxw_acc + jax.lax.dot_general(
            oh, d_g2,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # ---- distance-filter MLP backward for THIS chunk
        d_ea2 = jnp.zeros((rc, rbf), jnp.float32)
        if has_dk:
            d_prek2 = _dact_v(act, pre_k) * d_dk3.reshape(rc, h)
            d_ea2 = d_ea2 + jax.lax.dot_general(
                d_prek2, wdk_ref[...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dwdk_acc = dwdk_acc + jax.lax.dot_general(
                ea2, d_prek2,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dbdk_acc = dbdk_acc + d_prek2.astype(jnp.float32).sum(
                axis=0, keepdims=True
            )
        if has_dv:
            d_prev2 = _dact_v(act, pre_v) * d_dv3.reshape(rc, h)
            d_ea2 = d_ea2 + jax.lax.dot_general(
                d_prev2, wdv_ref[...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dwdv_acc = dwdv_acc + jax.lax.dot_general(
                ea2, d_prev2,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dbdv_acc = dbdv_acc + d_prev2.astype(jnp.float32).sum(
                axis=0, keepdims=True
            )
        dea_ref[:, c0 : c0 + kn, :] = d_ea2.astype(dea_ref.dtype).reshape(
            r, kn, rbf
        )
    dwdk_ref[...] = dwdk_acc[None]
    dbdk_ref[...] = dbdk_acc[None]
    dwdv_ref[...] = dwdv_acc[None]
    dbdv_ref[...] = dbdv_acc[None]
    dq_ref[...] = dq_acc
    dxw_ref[...] = dxw_acc.astype(dxw_ref.dtype)[None]


# --------------------------------------------------------------------------
# pallas_call wrappers
# --------------------------------------------------------------------------


def _nk(r, k):
    return pl.BlockSpec((r, k), lambda b: (b, 0), memory_space=pltpu.VMEM)


def _run_fwd(cfg, plan, q, ea, cutm, xw, wdk, bdk, wdv, bdv):
    n, k = plan.local.shape
    nb, w = plan.u.shape
    r = n // nb
    h = cfg.h
    rbf = ea.shape[-1]
    kern = functools.partial(
        _fwd_kernel, w=w, kc=cfg.kc, h=h, act=cfg.act, attn_act=cfg.attn_act,
        has_dk=cfg.has_dk, has_dv=cfg.has_dv,
    )
    ones = _ones_block(h, cfg.heads, xw.dtype)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            _nk(r, k),  # local
            pl.BlockSpec((1, w, 2 * h), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, h), lambda b: (b, 0), memory_space=pltpu.VMEM),  # q
            pl.BlockSpec((r * k, rbf), lambda b: (b, 0), memory_space=pltpu.VMEM),
            _nk(r, k),  # cutm
            pl.BlockSpec((rbf, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rbf, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, h), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h), jnp.float32),
        interpret=cfg.interpret,
    )(plan.local, xw, q, ea.reshape(n * k, rbf), cutm, wdk, bdk, wdv, bdv, ones)


def _run_bwd(cfg, plan, q, ea, cutm, xw, wdk, bdk, wdv, bdv, ct_x):
    n, k = plan.local.shape
    nb, w = plan.u.shape
    r = n // nb
    h = cfg.h
    rbf_true = ea.shape[-1]
    rbf = -(-rbf_true // 128) * 128  # lane-pad (see et_message._run_bwd)
    if rbf != rbf_true:
        ea = jnp.pad(ea, ((0, 0), (0, 0), (0, rbf - rbf_true)))
        wdk = jnp.pad(wdk, ((0, rbf - rbf_true), (0, 0)))
        wdv = jnp.pad(wdv, ((0, rbf - rbf_true), (0, 0)))
    kern = functools.partial(
        _bwd_kernel, w=w, kc=cfg.kc, h=h, act=cfg.act, attn_act=cfg.attn_act,
        has_dk=cfg.has_dk, has_dv=cfg.has_dv,
    )
    ones = _ones_block(h, cfg.heads, xw.dtype)
    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            _nk(r, k),  # local
            pl.BlockSpec((1, w, 2 * h), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, h), lambda b: (b, 0), memory_space=pltpu.VMEM),  # q
            pl.BlockSpec((r, k, rbf), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            _nk(r, k),  # cutm
            pl.BlockSpec((rbf, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rbf, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, h), lambda b: (b, 0), memory_space=pltpu.VMEM),  # ct_x
        ],
        out_specs=[
            pl.BlockSpec((r, h), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, k, rbf), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            _nk(r, k),
            pl.BlockSpec((1, w, 2 * h), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rbf, h), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rbf, h), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h), jnp.float32),  # dq
            jax.ShapeDtypeStruct((n, k, rbf), ea.dtype),  # dea (padded)
            jax.ShapeDtypeStruct((n, k), jnp.float32),  # dcutm
            jax.ShapeDtypeStruct((nb, w, 2 * h), xw.dtype),  # dxw partials
            jax.ShapeDtypeStruct((nb, rbf, h), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, h), jnp.float32),
            jax.ShapeDtypeStruct((nb, rbf, h), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, h), jnp.float32),
        ],
        interpret=cfg.interpret,
    )(plan.local, xw, q, ea, cutm, wdk, bdk, wdv, bdv, ones, ct_x)
    dq, dea, dcutm, dxw, dwdk_p, dbdk_p, dwdv_p, dbdv_p = outs
    return (
        dq, dea[:, :, :rbf_true], dcutm, dxw,
        dwdk_p[:, :rbf_true, :], dbdk_p, dwdv_p[:, :rbf_true, :], dbdv_p,
    )


# --------------------------------------------------------------------------
# composable reference (the kernels' math twin)
# --------------------------------------------------------------------------


def _composable_t_reference(cfg, plan, idx, ones, inputs):
    """Plain-JAX twin of _fwd_kernel (bf16 compute, f32 accumulate); the body
    the higher-order rules differentiate — never on the reverse hot path."""
    q, k, v, ea, cutm, wdk, bdk, wdv, bdv = inputs
    h = cfg.h
    bf = q.dtype
    ea2 = ea.reshape(-1, ea.shape[-1])
    dk = dv = None
    if cfg.has_dk:
        pre = jax.lax.dot(ea2, wdk, preferred_element_type=jnp.float32)
        dk = _act_v(cfg.act, pre.astype(bf) + bdk).reshape(ea.shape[:2] + (h,))
    if cfg.has_dv:
        pre = jax.lax.dot(ea2, wdv, preferred_element_type=jnp.float32)
        dv = _act_v(cfg.act, pre.astype(bf) + bdv).reshape(ea.shape[:2] + (h,))
    kj = _ref_edge_gather(cfg, k, idx, plan)
    prod = q[:, None, :] * kj
    if dk is not None:
        prod = prod * dk
    rc = prod.shape[0] * prod.shape[1]
    pre_a = jax.lax.dot(
        prod.reshape(rc, h), ones, preferred_element_type=jnp.float32
    ).astype(bf).reshape(prod.shape)
    attn = _act_v(cfg.attn_act, pre_a) * cutm[..., None].astype(bf)
    vj = _ref_edge_gather(cfg, v, idx, plan)
    if dv is not None:
        vj = vj * dv
    return (vj * attn).astype(jnp.float32).sum(axis=1)


# --------------------------------------------------------------------------
# backward op + tangent op + public op (same sandwich as et_message)
# --------------------------------------------------------------------------


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def _t_bwd_op(cfg, plan, inputs, ct):
    """VJP of the fused T edge phase via the backward Pallas kernel;
    differentiating THIS op runs the composable second-order rule."""
    q, k, v, ea, cutm, wdk, bdk, wdv, bdv = inputs
    h = cfg.h
    src = jnp.concatenate([k, v], axis=-1)  # (N, 2H)
    xw = _table_gather(cfg, src, plan)
    dq, dea, dcutm, dxw, dwdk_p, dbdk_p, dwdv_p, dbdv_p = _run_bwd(
        cfg, plan, q, ea, cutm, xw, wdk, bdk, wdv, bdv,
        ct.astype(jnp.float32),
    )
    d_src = _table_scatter(cfg, dxw, plan, q.shape[0]).astype(q.dtype)
    return (
        dq.astype(q.dtype),
        d_src[:, :h],
        d_src[:, h:],
        dea.reshape(ea.shape).astype(ea.dtype),
        dcutm.astype(cutm.dtype),
        dwdk_p.sum(axis=0).astype(wdk.dtype),
        dbdk_p.sum(axis=0).astype(bdk.dtype),
        dwdv_p.sum(axis=0).astype(wdv.dtype),
        dbdv_p.sum(axis=0).astype(bdv.dtype),
    )


@_t_bwd_op.defjvp
def _t_bwd_op_jvp(cfg, primals, tangents):
    """Second-order rule: tangent rides `_t_bwd_dot` (custom_transpose)
    whose transpose — grad-of-grad force training's hot path — is the fused
    second-order kernel `_t_bwd2_op` (see et_message.py)."""
    from jax.core import ShapedArray

    plan, inputs, ct = primals
    _, d_inputs, d_ct = tangents
    primal_out = _t_bwd_op(cfg, plan, inputs, ct)
    out_types = jax.tree_util.tree_map(
        lambda o: ShapedArray(jnp.shape(o), o.dtype), primal_out
    )
    idx = reconstruct_idx(plan)
    ones = _ones_block(cfg.h, cfg.heads, inputs[0].dtype)
    tangent_out = _t_bwd_dot(cfg)(
        out_types, (plan, idx, ones, inputs, ct), (tuple(d_inputs), d_ct)
    )
    return primal_out, tangent_out


def _t_ref_vjp_fn(cfg, plan, idx, ones, inputs, ct):
    _, vjp = jax.vjp(
        lambda ins: _composable_t_reference(cfg, plan, idx, ones, ins), inputs
    )
    (d,) = vjp(ct)
    return d


def _composable_t_bwd_vjp(cfg, plan, idx, ones, inputs, ct, Z):
    """Composable twin of `_t_bwd2_op` (third-order body, test oracle)."""

    def s_fn(inputs, ct):
        g = _t_ref_vjp_fn(cfg, plan, idx, ones, inputs, ct)
        return sum(
            jnp.sum(gi.astype(jnp.float32) * zi.astype(jnp.float32))
            for gi, zi in zip(g, Z)
        )

    return jax.grad(s_fn, argnums=(0, 1))(inputs, ct)


@functools.lru_cache(maxsize=None)
def _t_bwd_dot(cfg):
    from jax.custom_transpose import custom_transpose

    @custom_transpose
    def dot(res, lin):
        plan, idx, ones, inputs, ct = res
        d_inputs, d_ct = lin
        _, tangent = jax.jvp(
            lambda i, c: _t_ref_vjp_fn(cfg, plan, idx, ones, i, c),
            (inputs, ct), (d_inputs, d_ct),
        )
        return tangent

    @dot.def_transpose
    def dot_t(res, Z):
        plan, idx, ones, inputs, ct = res
        Z = tuple(
            jnp.zeros_like(x) if z is None else z for z, x in zip(Z, inputs)
        )
        return _t_bwd2_op(cfg, plan, inputs, ct, Z)

    return dot


def _t_chunk_fwd_fn(cfg, oh, ones, r, kn, h):
    """One `_fwd_kernel` chunk as a pure function for nested autodiff inside
    the second-order kernel — no slice/concatenate on differentiated values
    (see et_message._chunk_fwd_fn); the (W, 2H) source table arrives
    pre-split into k/v halves."""
    rc = r * kn

    def fwd(xk, xv, q, ea2, cutm_c, wdk, bdk, wdv, bdv):
        bf = xk.dtype
        dk3 = None
        if cfg.has_dk:
            pre = jax.lax.dot(ea2, wdk, preferred_element_type=jnp.float32)
            dk3 = _act_v(cfg.act, pre.astype(bf) + bdk).reshape(r, kn, h)
        dv3 = None
        if cfg.has_dv:
            pre = jax.lax.dot(ea2, wdv, preferred_element_type=jnp.float32)
            dv3 = _act_v(cfg.act, pre.astype(bf) + bdv).reshape(r, kn, h)
        gat = lambda t: jax.lax.dot(
            oh, t, preferred_element_type=jnp.float32
        ).astype(bf).reshape(r, kn, h)
        prod3 = q[:, None, :] * gat(xk)
        if dk3 is not None:
            prod3 = prod3 * dk3
        pre_a = jax.lax.dot(
            prod3.reshape(rc, h), ones, preferred_element_type=jnp.float32
        ).astype(bf)
        attn3 = (
            _act_v(cfg.attn_act, pre_a.reshape(r, kn, h))
            * cutm_c[:, :, None].astype(bf)
        )
        vj3 = gat(xv)
        if dv3 is not None:
            vj3 = vj3 * dv3
        return (vj3 * attn3).astype(jnp.float32).sum(axis=1)

    return fwd


def _t_bwd2_kernel(
    local_ref, xw_ref, q_ref, ea_ref, cutm_ref,
    wdk_ref, bdk_ref, wdv_ref, bdv_ref, ones_ref, ct_ref,
    zq_ref, zxw_ref, zea_ref, zcutm_ref,
    zwdk_ref, zbdk_ref, zwdv_ref, zbdv_ref,
    gq_ref, gea_ref, gcutm_ref, gxw_ref,
    gwdk_ref, gbdk_ref, gwdv_ref, gbdv_ref, gct_ref,
    *, w, kc, h, act, attn_act, has_dk, has_dv,
):
    """Fused VJP-of-VJP of the T edge phase (construction: see
    et_message._bwd2_kernel)."""
    r, k, rbf = ea_ref.shape
    f32 = jnp.float32
    cfg_like = FusedTConfig(
        h=h, heads=1, act=act, attn_act=attn_act, has_dk=has_dk,
        has_dv=has_dv, interpret=False,
    )
    xk_t = xw_ref[0, :, :h]
    xv_t = xw_ref[0, :, h:]
    zxk_t = zxw_ref[0, :, :h].astype(f32)
    zxv_t = zxw_ref[0, :, h:].astype(f32)
    ones = ones_ref[...]
    q = q_ref[...]
    ct = ct_ref[...].astype(f32)
    zq = zq_ref[...].astype(f32)
    zwdk = zwdk_ref[...].astype(f32)
    zbdk = zbdk_ref[...].astype(f32)
    zwdv = zwdv_ref[...].astype(f32)
    zbdv = zbdv_ref[...].astype(f32)
    wdk = wdk_ref[...]
    bdk = bdk_ref[...]
    wdv = wdv_ref[...]
    bdv = bdv_ref[...]
    gq_acc = jnp.zeros((r, h), f32)
    gxk_acc = jnp.zeros((w, h), f32)
    gxv_acc = jnp.zeros((w, h), f32)
    gwdk_acc = jnp.zeros((rbf, h), f32)
    gbdk_acc = jnp.zeros((1, h), f32)
    gwdv_acc = jnp.zeros((rbf, h), f32)
    gbdv_acc = jnp.zeros((1, h), f32)
    gct_acc = jnp.zeros((r, h), f32)
    for c0, kn in _chunks(k, kc):
        rc = r * kn
        cols = jax.lax.broadcasted_iota(jnp.int32, (r, kn, w), 2).astype(f32)
        loc = local_ref[:, c0 : c0 + kn].astype(f32)[:, :, None]
        oh = jnp.where(loc == cols, 1.0, 0.0).reshape(rc, w).astype(xk_t.dtype)
        fwd = _t_chunk_fwd_fn(cfg_like, oh, ones, r, kn, h)
        args = (
            xk_t, xv_t, q,
            ea_ref[:, c0 : c0 + kn, :].reshape(rc, rbf),
            cutm_ref[:, c0 : c0 + kn],
            wdk, bdk, wdv, bdv,
        )
        zea2 = zea_ref[:, c0 : c0 + kn, :].reshape(rc, rbf).astype(f32)
        zcutm_c = zcutm_ref[:, c0 : c0 + kn].astype(f32)
        zs = (zxk_t, zxv_t, zq, zea2, zcutm_c, zwdk, zbdk, zwdv, zbdv)

        def S(a, c):
            _, vjpf = jax.vjp(lambda t: fwd(*t), a)
            (g,) = vjpf(c)
            return sum(
                jnp.sum(gi.astype(f32) * zi) for gi, zi in zip(g, zs)
            )

        ga, gc = jax.grad(S, argnums=(0, 1))(args, ct)
        gxk_acc = gxk_acc + ga[0].astype(f32)
        gxv_acc = gxv_acc + ga[1].astype(f32)
        gq_acc = gq_acc + ga[2].astype(f32)
        gea_ref[:, c0 : c0 + kn, :] = ga[3].astype(gea_ref.dtype).reshape(
            r, kn, rbf
        )
        gcutm_ref[:, c0 : c0 + kn] = ga[4].astype(f32)
        gwdk_acc = gwdk_acc + ga[5].astype(f32)
        gbdk_acc = gbdk_acc + ga[6].astype(f32)
        gwdv_acc = gwdv_acc + ga[7].astype(f32)
        gbdv_acc = gbdv_acc + ga[8].astype(f32)
        gct_acc = gct_acc + gc.astype(f32)
    gq_ref[...] = gq_acc
    gxw_ref[0, :, :h] = gxk_acc.astype(gxw_ref.dtype)
    gxw_ref[0, :, h:] = gxv_acc.astype(gxw_ref.dtype)
    gwdk_ref[...] = gwdk_acc[None]
    gbdk_ref[...] = gbdk_acc[None]
    gwdv_ref[...] = gwdv_acc[None]
    gbdv_ref[...] = gbdv_acc[None]
    gct_ref[...] = gct_acc


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def _t_bwd2_op(cfg, plan, inputs, ct, Z):
    """VJP of `_t_bwd_op` wrt (inputs, ct) via the fused second-order
    kernel.  Z: 9-tuple of cotangents on the backward op's outputs.
    Returns (g_inputs 9-tuple, g_ct)."""
    q, k, v, ea, cutm, wdk, bdk, wdv, bdv = inputs
    z_q, z_k, z_v, z_ea, z_cutm, z_wdk, z_bdk, z_wdv, z_bdv = Z
    h = cfg.h
    n, kk = plan.local.shape
    nb, w = plan.u.shape
    r = n // nb
    src = jnp.concatenate([k, v], axis=-1)
    xw = _table_gather(cfg, src, plan)
    z_src = jnp.concatenate([z_k, z_v], axis=-1).astype(src.dtype)
    z_xw = _table_gather(cfg, z_src, plan)
    rbf_true = ea.shape[-1]
    rbf = -(-rbf_true // 128) * 128
    if rbf != rbf_true:
        pad3 = ((0, 0), (0, 0), (0, rbf - rbf_true))
        padw = ((0, rbf - rbf_true), (0, 0))
        ea = jnp.pad(ea, pad3)
        z_ea = jnp.pad(z_ea, pad3)
        wdk = jnp.pad(wdk, padw)
        wdv = jnp.pad(wdv, padw)
        z_wdk = jnp.pad(z_wdk, padw)
        z_wdv = jnp.pad(z_wdv, padw)
    kc = max(8, cfg.kc // 2)
    kern = functools.partial(
        _t_bwd2_kernel, w=w, kc=kc, h=h, act=cfg.act, attn_act=cfg.attn_act,
        has_dk=cfg.has_dk, has_dv=cfg.has_dv,
    )
    ones = _ones_block(h, cfg.heads, xw.dtype)
    blk = lambda *s: pl.BlockSpec(
        s, lambda b, _nd=len(s): (b,) + (0,) * (_nd - 1), memory_space=pltpu.VMEM
    )
    bcast = lambda *s: pl.BlockSpec(
        s, lambda b: (0,) * len(s), memory_space=pltpu.VMEM
    )
    wspecs = [bcast(rbf, h), bcast(1, h), bcast(rbf, h), bcast(1, h)]
    in_specs = (
        [_nk(r, kk), blk(1, w, 2 * h), blk(r, h), blk(r, kk, rbf), _nk(r, kk)]
        + wspecs
        + [bcast(h, h), blk(r, h)]  # ones, ct
        + [blk(r, h), blk(1, w, 2 * h), blk(r, kk, rbf), _nk(r, kk)]
        + wspecs
    )
    out_specs = (
        [blk(r, h), blk(r, kk, rbf), _nk(r, kk), blk(1, w, 2 * h)]
        + [blk(1, rbf, h), blk(1, 1, h), blk(1, rbf, h), blk(1, 1, h)]
        + [blk(r, h)]
    )
    out_shape = [
        jax.ShapeDtypeStruct((n, h), jnp.float32),
        jax.ShapeDtypeStruct((n, kk, rbf), jnp.float32),
        jax.ShapeDtypeStruct((n, kk), jnp.float32),
        jax.ShapeDtypeStruct((nb, w, 2 * h), xw.dtype),
        jax.ShapeDtypeStruct((nb, rbf, h), jnp.float32),
        jax.ShapeDtypeStruct((nb, 1, h), jnp.float32),
        jax.ShapeDtypeStruct((nb, rbf, h), jnp.float32),
        jax.ShapeDtypeStruct((nb, 1, h), jnp.float32),
        jax.ShapeDtypeStruct((n, h), jnp.float32),
    ]
    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=cfg.interpret,
    )(
        plan.local, xw, q, ea, cutm, wdk, bdk, wdv, bdv, ones,
        ct.astype(jnp.float32),
        z_q, z_xw, z_ea, z_cutm.astype(jnp.float32),
        z_wdk, z_bdk, z_wdv, z_bdv,
    )
    gq, gea, gcutm, gxw, gwdk_p, gbdk_p, gwdv_p, gbdv_p, gct = outs
    g_src = _table_scatter(cfg, gxw, plan, q.shape[0]).astype(q.dtype)
    g_inputs = (
        gq.astype(q.dtype),
        g_src[:, :h],
        g_src[:, h:],
        gea[:, :, :rbf_true].reshape(inputs[3].shape).astype(inputs[3].dtype),
        gcutm.astype(cutm.dtype),
        gwdk_p[:, :rbf_true, :].sum(axis=0).astype(inputs[5].dtype),
        gbdk_p.sum(axis=0).astype(bdk.dtype),
        gwdv_p[:, :rbf_true, :].sum(axis=0).astype(inputs[7].dtype),
        gbdv_p.sum(axis=0).astype(bdv.dtype),
    )
    return g_inputs, gct.astype(ct.dtype)


@_t_bwd2_op.defjvp
def _t_bwd2_op_jvp(cfg, primals, tangents):
    """Third-order rule: composable.  Reached only beyond grad-of-grad."""
    plan, inputs, ct, Z = primals
    _, d_inputs, d_ct, d_Z = tangents
    primal_out = _t_bwd2_op(cfg, plan, inputs, ct, Z)
    idx = reconstruct_idx(plan)
    ones = _ones_block(cfg.h, cfg.heads, inputs[0].dtype)
    _, tangent_out = jax.jvp(
        lambda i, c, z: _composable_t_bwd_vjp(cfg, plan, idx, ones, i, c, z),
        (inputs, ct, Z), (d_inputs, d_ct, d_Z),
    )
    return primal_out, tangent_out


@functools.lru_cache(maxsize=None)
def _t_dot(cfg):
    from jax.custom_transpose import custom_transpose

    @custom_transpose
    def dot(res, d_inputs):
        plan, idx, ones, inputs = res
        _, tangent = jax.jvp(
            lambda ins: _composable_t_reference(cfg, plan, idx, ones, ins),
            (inputs,), (d_inputs,),
        )
        return tangent

    @dot.def_transpose
    def dot_t(res, ct):
        plan, idx, ones, inputs = res
        return _t_bwd_op(cfg, plan, inputs, ct)

    return dot


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def fused_t_messages(cfg, plan, q, k, v, ea, cutm, wdk, bdk, wdv, bdv):
    """Fused T attention edge phase: out (N, H) in f32.

    Args (arrays in the message dtype, normally bf16):
        plan: BlockGatherPlan over the layer's ELL idx.
        q, k, v: (N, H) node projections.
        ea: (N, K, RBF) edge RBF features.
        cutm: (N, K) f32 cosine_cutoff(dist) * mask.
        wdk/bdk/wdv/bdv: distance-filter params ((RBF, H)/(1, H)); zeros-
            shaped dummies when has_dk/has_dv is False.

    Differentiable at every order (et_message.py module docstring).
    """
    src = jnp.concatenate([k, v], axis=-1)  # (N, 2H)
    xw = _table_gather(cfg, src, plan)
    return _run_fwd(cfg, plan, q, ea, cutm, xw, wdk, bdk, wdv, bdv)


@fused_t_messages.defjvp
def _fused_t_messages_jvp(cfg, primals, tangents):
    from jax.core import ShapedArray

    plan, *arrays = primals
    _, *d_arrays = tangents
    out = fused_t_messages(cfg, plan, *arrays)
    out_types = ShapedArray(jnp.shape(out), out.dtype)
    idx = reconstruct_idx(plan)
    ones = _ones_block(cfg.h, cfg.heads, arrays[0].dtype)
    d_out = _t_dot(cfg)(
        out_types, (plan, idx, ones, tuple(arrays)), tuple(d_arrays)
    )
    return out, d_out
