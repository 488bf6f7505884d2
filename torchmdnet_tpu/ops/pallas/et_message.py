"""Pallas TPU kernel: the ET attention edge phase as ONE fused kernel.

The measured floor of the composable ET layer is HBM traffic through its
(N, K, F) edge intermediates: gathered k/v/vec rows, the dk/dv distance
filters, attention, and the message products are each written to and read
back from HBM (PERF.md: ~4.5 ms/layer forward at DHFR; gathers at 28% of
roofline, everything else at 520-760 GB/s — already bandwidth-bound, so the
only way down is moving fewer bytes).

This kernel computes the whole edge phase of one EquivariantMultiHeadAttention
layer (reference torchmd_et.py:314-347: message + aggregate) without ever
materializing an (N, K, F) tensor in HBM.  Per receiver block (R rows):

    load the block's compacted source table xw = [k|v|vec_x|vec_y|vec_z][u]
      (BlockGatherPlan, ops/pallas/onehot_gather.py) into VMEM, then per
      K-chunk entirely on-chip:
        dk/dv  = act(edge_attr @ Wdk/Wdv + b)           (MXU)
        rows   = onehot(local) @ xw                     (MXU, exact gather)
        attn   = attn_act((q * k_j * dk) @ ones_block) * cutoff_mask
        x_m|vw1|vw2 = v_j * dv
        x_acc   += sum_kc x_m * attn                    (f32 accumulators)
        vec_acc += sum_kc vec_j * vw1 * mask + vw2 * dir
    write x_agg (R, H) and vec_agg (R, 3H).

HBM traffic per layer drops to: read edge_attr/cutoff/dir/mask
(~N*K*(RBF+4) bf16) plus the compacted source tables (NB*W*7H — several-fold
fewer rows than the N*K*7H direct gathers), write N*4H.

The backward is a second fused kernel that RECOMPUTES the chunk quantities
from the same inputs (no (N, K, F) residuals exist to store) and emits every
cotangent in one pass; source-row cotangents accumulate on the MXU
(onehot^T @ d_rows -> (W, 7H) f32 per block) and are scattered back
scatter-free through the plan's inverse table.

Differentiability — ALL orders (force training included).  The op is a
custom_jvp / custom_transpose sandwich (the construction jax's own
custom_root uses) instead of a custom_vjp (which forbids grad-of-grad):

    fused_et_messages      custom_jvp;   primal = the forward Pallas kernel
      └ jvp rule           emits _et_dot(primals, tangents)
    _et_dot                custom_transpose; linear in the tangents
      ├ forward body       composable JVP (jax.jvp of _composable_reference)
      │                    — only ever *executed* in true forward-mode use
      └ transpose          _et_bwd_op: the backward Pallas kernel
    _et_bwd_op             custom_jvp;   primal = the backward Pallas kernel
      └ jvp rule           composable (jvp of the composable VJP)

So: forces / MD / energy training (one reverse pass) execute fwd + bwd
Pallas kernels, exactly as before; force-loss training (grad-of-grad)
additionally differentiates the backward via the composable second-order
rule — the inner force evaluation inside each training step still rides the
kernels, and only the outer transposes run composable (the reference needed
a hand-written twice-differentiable native backward for the same workload,
neighbors_cuda.cu:22-24,43-71).  The kernel and the composable reference are
the same math at bf16 precision, so mixed orders agree to bf16 tolerance
(asserted by tests/test_et_fused.py).

Reference semantics matched: torchmd_et.py:314-347 (message + aggregate),
with the ELL/mask conventions of models/et.py.
"""

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchmdnet_tpu.ops.pallas.onehot_gather import BlockGatherPlan

_LOG2 = math.log(2.0)


def _act(name, x):
    if name == "silu":
        return x * jax.nn.sigmoid(x)
    if name == "ssp":
        return jax.nn.softplus(x) - _LOG2
    if name == "tanh":
        return jnp.tanh(x)
    if name == "sigmoid":
        return jax.nn.sigmoid(x)
    raise ValueError(f"unsupported activation for the fused ET kernel: {name}")


def _act_v(name, x):
    """_act computed in f32 (Mosaic cannot lower bf16 transcendentals whose
    internal constants are f32), result cast back to the operand dtype."""
    return _act(name, x.astype(jnp.float32)).astype(x.dtype)


def _dact_v(name, x):
    return _dact(name, x.astype(jnp.float32)).astype(x.dtype)


def _dact(name, x):
    """d/dx of _act(name, x), closed form (the backward kernel recomputes)."""
    if name == "silu":
        s = jax.nn.sigmoid(x)
        return s * (1.0 + x * (1.0 - s))
    if name == "ssp":
        return jax.nn.sigmoid(x)
    if name == "tanh":
        t = jnp.tanh(x)
        return 1.0 - t * t
    if name == "sigmoid":
        s = jax.nn.sigmoid(x)
        return s * (1.0 - s)
    raise ValueError(name)


class FusedETConfig(NamedTuple):
    """Static (hashable) config of the fused edge phase."""

    h: int
    heads: int
    act: str
    attn_act: str
    has_dk: bool
    has_dv: bool
    interpret: bool
    kc: int = 16  # K-chunk size (rows per MXU call = R * kc)
    # Ring edge-partitioning (parallel/edge_partition.py): when ring_axis is
    # set, the plan's ids are GLOBAL, its rows shard-local, and the source-
    # table gather/scatter plus the composable reference's edge gathers run
    # the ring schedule over plan.ring's boundary tables.
    ring_axis: str = None
    ring_d: int = 0


def _table_gather(cfg, src, plan):
    """xw[b, w] = src[plan.u[b, w]] — the fused kernels' only cross-row read.

    Single device: one XLA row gather.  Under ring partitioning: the
    generalized ring schedule over the plan's u-table boundary slots
    (O(N/D) per-device memory; src is this shard's rows, u holds global ids).
    """
    if cfg.ring_axis is not None:
        from torchmdnet_tpu.parallel.edge_partition import ring_rows_gather

        mask = jnp.broadcast_to(
            jnp.arange(plan.u.shape[1], dtype=jnp.int32)[None, :]
            < plan.n_unique[:, None],
            plan.u.shape,
        )
        out = ring_rows_gather(
            src, plan.u, plan.ring.u_slots, plan.ring.u_valid,
            cfg.ring_axis, cfg.ring_d,
        )
        # junk table entries (>= n_unique, id 0) must not leak shard-0 rows
        return jnp.where(mask[..., None], out, 0)
    return src[plan.u]


def _table_scatter(cfg, dxw, plan, n_rows: int):
    """d_src[j] = sum of dxw[b, w] over plan.u[b, w] == j (valid entries).

    Single device: the plan's inverse table (scatter-free).  Under ring: the
    generalized ring reduce routing each block's source-cotangent partials
    back to the owner shard.  Returns f32 rows (callers cast).
    """
    if cfg.ring_axis is not None:
        from torchmdnet_tpu.parallel.edge_partition import ring_rows_transpose

        mask = (
            jnp.arange(plan.u.shape[1], dtype=jnp.int32)[None, :]
            < plan.n_unique[:, None]
        )
        dxw = jnp.where(mask[..., None], dxw, 0)
        return ring_rows_transpose(
            dxw.astype(jnp.float32), plan.u, plan.ring.u_slots,
            plan.ring.u_valid, cfg.ring_axis, cfg.ring_d, n_out=n_rows,
        )
    return _inverse_scatter(dxw, plan)


def _ref_edge_gather(cfg, x, idx, plan):
    """x[idx] inside the composable reference — ring-scheduled under edge
    partitioning (explicit plan.ring arrays, differentiable/transposable at
    every order via the linear_call pair).

    Single device, the gather routes through ell_gather WITH the plan: the
    composable second-order rule is the force-training outer pass's hot
    path, and the one-hot MXU gather + G^T-matmul transpose are its fastest
    implementations for wide bf16 rows (PERF.md) — the rule's cost is pure
    overhead over the kernels, so every saved pass matters."""
    if cfg.ring_axis is not None:
        from torchmdnet_tpu.parallel.edge_partition import ring_rows_gather

        return ring_rows_gather(
            x, idx, plan.ring.e_slots, plan.ring.e_valid,
            cfg.ring_axis, cfg.ring_d,
        )
    from torchmdnet_tpu.ops.neighbors import ell_gather

    return ell_gather(x, idx, plan)


def _chunks(k: int, kc: int):
    """Static chunk starts/sizes covering K (tail chunk may be smaller)."""
    out = []
    c0 = 0
    while c0 < k:
        out.append((c0, min(kc, k - c0)))
        c0 += kc
    return out


def _ones_block(h: int, heads: int, dtype):
    """(H, H) block matrix: 1 where both lanes belong to the same head.

    prod @ ones_block puts each head's lane-sum on every one of its own
    lanes — the per-head attention reduction as one matmul (PERF.md layout
    rule: never carry a trailing head_dim axis)."""
    hd = h // heads
    return jnp.asarray(np.kron(np.eye(heads), np.ones((hd, hd))), dtype)


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------


def _fwd_kernel(
    local_ref, xw_ref, q_ref, ea_ref, cutm_ref, msk_ref,
    d0_ref, d1_ref, d2_ref,
    wdk_ref, bdk_ref, wdv_ref, bdv_ref, ones_ref,
    x_out_ref, vec_out_ref,
    *, w, kc, h, act, attn_act, has_dk, has_dv,
):
    r, k = local_ref.shape
    # ea_ref holds the block's edge features as 2D (R*K, RBF) rows — small
    # lane widths (RBF < 128) only appear in 2D where Mosaic needs no shape
    # cast; all reshapes in this kernel keep the 128-multiple lane dim.
    rk, rbf = ea_ref.shape
    xw = xw_ref[0]  # (W, 7H)
    bf = xw.dtype
    ones = ones_ref[...]
    q3 = q_ref[...][:, None, :]  # (R, 1, H)
    x_acc = jnp.zeros((r, h), jnp.float32)
    v_acc = [jnp.zeros((r, h), jnp.float32) for _ in range(3)]
    # distance filters for the whole block in one matmul each
    ea2 = ea_ref[...]
    dk_f3 = dv_f3 = None
    if has_dk:
        pre = jax.lax.dot(ea2, wdk_ref[...], preferred_element_type=jnp.float32)
        dk_f3 = _act_v(act, pre.astype(bf) + bdk_ref[...]).reshape(r, k, h)
    if has_dv:
        pre = jax.lax.dot(ea2, wdv_ref[...], preferred_element_type=jnp.float32)
        dv_f3 = _act_v(act, pre.astype(bf) + bdv_ref[...]).reshape(r, k, 3 * h)
    for c0, kn in _chunks(k, kc):
        rc = r * kn
        # exact gather rows via one-hot matmul (f32 compare: 3D bools are
        # not lowerable, see onehot_gather.py)
        cols = jax.lax.broadcasted_iota(jnp.int32, (r, kn, w), 2).astype(jnp.float32)
        loc = local_ref[:, c0 : c0 + kn].astype(jnp.float32)[:, :, None]
        oh = jnp.where(loc == cols, 1.0, 0.0).reshape(rc, w).astype(bf)
        g2 = jax.lax.dot(oh, xw, preferred_element_type=jnp.float32).astype(bf)
        # attention: per-head sum of q*k_j*dk via the ones-block matmul
        prod3 = q3 * g2[:, :h].reshape(r, kn, h)
        if dk_f3 is not None:
            prod3 = prod3 * dk_f3[:, c0 : c0 + kn, :]
        pre_a = jax.lax.dot(
            prod3.reshape(rc, h), ones, preferred_element_type=jnp.float32
        ).astype(bf)
        cutm3 = cutm_ref[:, c0 : c0 + kn][:, :, None].astype(bf)
        attn3 = _act_v(attn_act, pre_a.reshape(r, kn, h)) * cutm3
        # value path
        vdv3 = g2[:, h : 4 * h].reshape(r, kn, 3 * h)
        if dv_f3 is not None:
            vdv3 = vdv3 * dv_f3[:, c0 : c0 + kn, :]
        x_m3 = vdv3[:, :, :h]
        x_acc = x_acc + (x_m3 * attn3).astype(jnp.float32).sum(axis=1)
        msk3 = msk_ref[:, c0 : c0 + kn][:, :, None].astype(bf)
        vm1_3 = vdv3[:, :, h : 2 * h] * msk3
        vw2_3 = vdv3[:, :, 2 * h :]
        for c, dref in enumerate((d0_ref, d1_ref, d2_ref)):
            vec_c3 = g2[:, (4 + c) * h : (5 + c) * h].reshape(r, kn, h)
            dir3 = dref[:, c0 : c0 + kn][:, :, None].astype(bf)
            # vw2*dir needs no mask: dir == 0 on self/invalid slots
            msg3 = vec_c3 * vm1_3 + vw2_3 * dir3
            v_acc[c] = v_acc[c] + msg3.astype(jnp.float32).sum(axis=1)
    x_out_ref[...] = x_acc
    for c in range(3):
        vec_out_ref[:, c * h : (c + 1) * h] = v_acc[c]


# --------------------------------------------------------------------------
# backward kernel (recomputes the forward chunk, then backprops it)
# --------------------------------------------------------------------------


def _bwd_kernel(
    local_ref, xw_ref, q_ref, ea_ref, cutm_ref, msk_ref,
    d0_ref, d1_ref, d2_ref,
    wdk_ref, bdk_ref, wdv_ref, bdv_ref, ones_ref,
    ct_x_ref, ct_vec_ref,
    dq_ref, dea_ref, dcutm_ref, dd0_ref, dd1_ref, dd2_ref, dxw_ref,
    dwdk_ref, dbdk_ref, dwdv_ref, dbdv_ref,
    *, w, kc, h, act, attn_act, has_dk, has_dv,
):
    """Fully K-chunked (like tn_message._bwd_kernel): each chunk recomputes
    ITS OWN slice of the dk/dv filter MLPs and backprops them immediately —
    no full-(R*K) activation or filter cotangent lives across the loop.
    The earlier whole-block variant held dk/dv plus their concatenated
    cotangents and capped the usable (R, W) at STMV-scale K; chunking both
    fits larger blocks and runs faster (smaller live sets schedule better —
    measured on the TN kernel: bwd marginal 27.5 -> 17.4 ms at DHFR).

    ``ea``/``dea`` ride as 3D (R, K, RBF128) lane-padded refs (Mosaic
    rejects leading-dim collapses on sub-128 lane dims).
    """
    r, k, rbf = ea_ref.shape
    xw = xw_ref[0]
    bf = xw.dtype
    ones = ones_ref[...]
    q3 = q_ref[...][:, None, :]
    ct_x3 = ct_x_ref[...][:, None, :].astype(bf)  # (R, 1, H)
    ct_vec = ct_vec_ref[...]  # (R, 3H) f32
    dq_acc = jnp.zeros((r, h), jnp.float32)
    dxw_acc = jnp.zeros((w, 7 * h), jnp.float32)
    dwdk_acc = jnp.zeros((rbf, h), jnp.float32)
    dbdk_acc = jnp.zeros((1, h), jnp.float32)
    dwdv_acc = jnp.zeros((rbf, 3 * h), jnp.float32)
    dbdv_acc = jnp.zeros((1, 3 * h), jnp.float32)
    for c0, kn in _chunks(k, kc):
        rc = r * kn
        ea2 = ea_ref[:, c0 : c0 + kn, :].reshape(rc, rbf)
        dk3 = pre_k = None
        if has_dk:
            pre_k = (
                jax.lax.dot(ea2, wdk_ref[...], preferred_element_type=jnp.float32)
                .astype(bf) + bdk_ref[...]
            )  # (RC, H)
            dk3 = _act_v(act, pre_k).reshape(r, kn, h)
        dv3 = pre_v = None
        if has_dv:
            pre_v = (
                jax.lax.dot(ea2, wdv_ref[...], preferred_element_type=jnp.float32)
                .astype(bf) + bdv_ref[...]
            )  # (RC, 3H)
            dv3 = _act_v(act, pre_v).reshape(r, kn, 3 * h)
        # ---- recompute the forward chunk
        cols = jax.lax.broadcasted_iota(jnp.int32, (r, kn, w), 2).astype(jnp.float32)
        loc = local_ref[:, c0 : c0 + kn].astype(jnp.float32)[:, :, None]
        oh = jnp.where(loc == cols, 1.0, 0.0).reshape(rc, w).astype(bf)
        g2 = jax.lax.dot(oh, xw, preferred_element_type=jnp.float32).astype(bf)
        kj3 = g2[:, :h].reshape(r, kn, h)
        vj3 = g2[:, h : 4 * h].reshape(r, kn, 3 * h)
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
        x_m3 = vdv3[:, :, :h]
        msk3 = msk_ref[:, c0 : c0 + kn][:, :, None].astype(bf)
        vm1_3 = vdv3[:, :, h : 2 * h] * msk3
        vw2_3 = vdv3[:, :, 2 * h :]
        # ---- backward through the chunk
        d_attn3 = ct_x3 * x_m3
        d_xm3 = ct_x3 * attn3
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
        qk3 = d_prod3 * q3  # shared factor of d_kj and d_dk
        if dk3 is not None:
            d_kj3 = qk3 * dk3
            d_dk3 = qk3 * kj3
            dq_acc = dq_acc + (d_prod3 * kj3 * dk3).astype(jnp.float32).sum(axis=1)
        else:
            d_kj3 = qk3
            d_dk3 = None
            dq_acc = dq_acc + (d_prod3 * kj3).astype(jnp.float32).sum(axis=1)
        # vector-message backward
        d_vw1_3 = jnp.zeros((r, kn, h), bf)
        d_vw2_3 = jnp.zeros((r, kn, h), bf)
        d_vec3 = []
        for c, (dref, ddref) in enumerate(
            ((d0_ref, dd0_ref), (d1_ref, dd1_ref), (d2_ref, dd2_ref))
        ):
            ctc3 = ct_vec[:, c * h : (c + 1) * h][:, None, :].astype(bf)
            vec_c3 = g2[:, (4 + c) * h : (5 + c) * h].reshape(r, kn, h)
            dir3 = dref[:, c0 : c0 + kn][:, :, None].astype(bf)
            d_vw1_3 = d_vw1_3 + ctc3 * vec_c3 * msk3
            d_vw2_3 = d_vw2_3 + ctc3 * dir3
            d_vec3.append(ctc3 * vm1_3)
            ddref[:, c0 : c0 + kn] = (
                (ctc3 * vw2_3).astype(jnp.float32).sum(axis=-1)
            )
        d_vdv2 = jnp.concatenate(
            [d_xm3.reshape(rc, h), d_vw1_3.reshape(rc, h), d_vw2_3.reshape(rc, h)],
            axis=-1,
        )  # (RC, 3H)
        if dv3 is not None:
            d_vj2 = d_vdv2 * dv3.reshape(rc, 3 * h)
            d_dv2 = d_vdv2 * vj3.reshape(rc, 3 * h)
        else:
            d_vj2 = d_vdv2
            d_dv2 = None
        # source-row cotangents back through the one-hot gather: G^T matmul
        d_g2 = jnp.concatenate(
            [d_kj3.reshape(rc, h), d_vj2] + [d.reshape(rc, h) for d in d_vec3],
            axis=-1,
        )  # (RC, 7H)
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
            d_prev2 = _dact_v(act, pre_v) * d_dv2
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


def _common_in_specs(r, k, rbf, w, f7, h):
    return [
        _nk(r, k),  # local
        pl.BlockSpec((1, w, f7), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r, h), lambda b: (b, 0), memory_space=pltpu.VMEM),  # q
        # ea rides as 2D (N*K, RBF): its sub-128 lane width never meets a
        # reshape that way (Mosaic "unsupported shape cast" otherwise)
        pl.BlockSpec((r * k, rbf), lambda b: (b, 0), memory_space=pltpu.VMEM),
        _nk(r, k),  # cutm
        _nk(r, k),  # msk
        _nk(r, k), _nk(r, k), _nk(r, k),  # dir x/y/z
        # broadcast weight operands
        pl.BlockSpec((rbf, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rbf, 3 * h), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * h), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
    ]


def _run_fwd(cfg: FusedETConfig, plan, q, ea, cutm, msk, dirs, xw, wdk, bdk, wdv, bdv):
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
        in_specs=_common_in_specs(r, k, rbf, w, 7 * h, h),
        out_specs=[
            pl.BlockSpec((r, h), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 3 * h), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h), jnp.float32),
            jax.ShapeDtypeStruct((n, 3 * h), jnp.float32),
        ],
        interpret=cfg.interpret,
    )(
        plan.local, xw, q, ea.reshape(n * k, rbf), cutm, msk,
        dirs[0], dirs[1], dirs[2], wdk, bdk, wdv, bdv, ones,
    )


def _run_bwd(cfg: FusedETConfig, plan, q, ea, cutm, msk, dirs, xw, wdk, bdk, wdv, bdv, ct_x, ct_vec):
    n, k = plan.local.shape
    nb, w = plan.u.shape
    r = n // nb
    h = cfg.h
    # ea/wdk/wdv lane-padded to a 128-multiple RBF (kernel docstring); the
    # caller slices dea/dwdk/dwdv back down
    rbf_true = ea.shape[-1]
    rbf = -(-rbf_true // 128) * 128
    if rbf != rbf_true:
        ea = jnp.pad(ea, ((0, 0), (0, 0), (0, rbf - rbf_true)))
        wdk = jnp.pad(wdk, ((0, rbf - rbf_true), (0, 0)))
        wdv = jnp.pad(wdv, ((0, rbf - rbf_true), (0, 0)))
    f7 = 7 * h
    kern = functools.partial(
        _bwd_kernel, w=w, kc=cfg.kc, h=h, act=cfg.act, attn_act=cfg.attn_act,
        has_dk=cfg.has_dk, has_dv=cfg.has_dv,
    )
    ones = _ones_block(h, cfg.heads, xw.dtype)
    in_specs = [
        _nk(r, k),  # local
        pl.BlockSpec((1, w, f7), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r, h), lambda b: (b, 0), memory_space=pltpu.VMEM),  # q
        pl.BlockSpec((r, k, rbf), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        _nk(r, k),  # cutm
        _nk(r, k),  # msk
        _nk(r, k), _nk(r, k), _nk(r, k),  # dir x/y/z
        pl.BlockSpec((rbf, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rbf, 3 * h), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * h), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, h), lambda b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r, h), lambda b: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r, 3 * h), lambda b: (b, 0), memory_space=pltpu.VMEM),
    ]
    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((r, h), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, k, rbf), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            _nk(r, k),
            _nk(r, k), _nk(r, k), _nk(r, k),  # ddir x/y/z
            pl.BlockSpec((1, w, f7), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rbf, h), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rbf, 3 * h), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3 * h), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h), jnp.float32),  # dq
            jax.ShapeDtypeStruct((n, k, rbf), ea.dtype),  # dea (3D, padded)
            jax.ShapeDtypeStruct((n, k), jnp.float32),  # dcutm
            jax.ShapeDtypeStruct((n, k), jnp.float32),  # ddir x
            jax.ShapeDtypeStruct((n, k), jnp.float32),  # ddir y
            jax.ShapeDtypeStruct((n, k), jnp.float32),  # ddir z
            jax.ShapeDtypeStruct((nb, w, f7), xw.dtype),  # dxw partials
            jax.ShapeDtypeStruct((nb, rbf, h), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, h), jnp.float32),
            jax.ShapeDtypeStruct((nb, rbf, 3 * h), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, 3 * h), jnp.float32),
        ],
        interpret=cfg.interpret,
    )(
        plan.local, xw, q, ea, cutm, msk,
        dirs[0], dirs[1], dirs[2], wdk, bdk, wdv, bdv, ones, ct_x, ct_vec,
    )
    dq, dea, dcutm, dd0, dd1, dd2, dxw, dwdk_p, dbdk_p, dwdv_p, dbdv_p = outs
    return (
        dq, dea[:, :, :rbf_true], dcutm, dd0, dd1, dd2, dxw,
        dwdk_p[:, :rbf_true, :], dbdk_p, dwdv_p[:, :rbf_true, :], dbdv_p,
    )


def _inverse_scatter(dxw, plan: BlockGatherPlan):
    """(NB, W, F) per-block source-cotangent partials -> (N, F), scatter-free
    through the plan's inverse table (same ending as onehot_transpose_sum)."""
    nb, w, f = dxw.shape
    flat = dxw.reshape(nb * w, f)
    slots = plan.inv_blocks * w + plan.inv_pos  # (N, A)
    picked = flat[slots]
    picked = jnp.where(plan.inv_valid[..., None], picked, 0.0)
    return picked.sum(axis=1, dtype=jnp.float32)


# --------------------------------------------------------------------------
# second-order kernel: VJP of the backward kernel (force-loss training's
# outer pass), derived by nested autodiff over the chunk forward
# --------------------------------------------------------------------------


def _chunk_fwd_fn(cfg, oh, ones, r, kn, h):
    """The per-chunk forward as a pure function of its differentiable args —
    the exact math twin of one `_fwd_kernel` chunk iteration (same bf16
    compute / f32 accumulate discipline).  `oh` (the chunk's one-hot gather
    matrix) and `ones` are closed over as non-differentiable constants.

    Used only by the second-order kernel below: instead of hand-deriving the
    VJP-of-VJP, the kernel body applies jax.vjp/jax.grad to THIS function —
    nested autodiff traces to plain jaxpr inside the Pallas kernel, so the
    whole second-order computation stays in VMEM per chunk.

    Mosaic constraint that shapes this function: NO slice or concatenate on
    any value in the differentiated path — the double transpose turns
    slices into `lax.pad` ops Mosaic cannot lower ("vector types must have
    positive constant sizes").  So every packed operand (`xw`, `wdv`,
    `bdv`, the vector cotangent) arrives pre-split into per-component
    arrays (split in the kernel BODY, outside autodiff) and the outputs
    return separately instead of concatenated."""
    rc = r * kn

    def fwd(xk, xva, xvb, xvc, xv0, xv1, xv2, q, ea2, cutm_c, msk_c,
            d0_c, d1_c, d2_c, wdk, bdk, wdva, wdvb, wdvc, bdva, bdvb, bdvc):
        bf = xk.dtype
        dk3 = None
        if cfg.has_dk:
            pre = jax.lax.dot(ea2, wdk, preferred_element_type=jnp.float32)
            dk3 = _act_v(cfg.act, pre.astype(bf) + bdk).reshape(r, kn, h)
        dva3 = dvb3 = dvc3 = None
        if cfg.has_dv:
            parts = []
            for wv, bv in ((wdva, bdva), (wdvb, bdvb), (wdvc, bdvc)):
                pre = jax.lax.dot(ea2, wv, preferred_element_type=jnp.float32)
                parts.append(_act_v(cfg.act, pre.astype(bf) + bv).reshape(r, kn, h))
            dva3, dvb3, dvc3 = parts
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
        x_m3 = gat(xva)
        vm1_3 = gat(xvb)
        vw2_3 = gat(xvc)
        if dva3 is not None:
            x_m3 = x_m3 * dva3
            vm1_3 = vm1_3 * dvb3
            vw2_3 = vw2_3 * dvc3
        x_part = (x_m3 * attn3).astype(jnp.float32).sum(axis=1)
        vm1_3 = vm1_3 * msk_c[:, :, None].astype(bf)
        vec_parts = []
        for xv_c, dc in ((xv0, d0_c), (xv1, d1_c), (xv2, d2_c)):
            msg3 = gat(xv_c) * vm1_3 + vw2_3 * dc[:, :, None].astype(bf)
            vec_parts.append(msg3.astype(jnp.float32).sum(axis=1))
        return x_part, vec_parts[0], vec_parts[1], vec_parts[2]

    return fwd


def _bwd2_kernel(
    local_ref, xw_ref, q_ref, ea_ref, cutm_ref, msk_ref,
    d0_ref, d1_ref, d2_ref,
    wdk_ref, bdk_ref, wdv_ref, bdv_ref, ones_ref,
    ct_x_ref, ct_vec_ref,
    zq_ref, zxw_ref, zea_ref, zcutm_ref, zd0_ref, zd1_ref, zd2_ref,
    zwdk_ref, zbdk_ref, zwdv_ref, zbdv_ref,
    gq_ref, gea_ref, gcutm_ref, gmsk_ref, gd0_ref, gd1_ref, gd2_ref,
    gxw_ref, gwdk_ref, gbdk_ref, gwdv_ref, gbdv_ref,
    gctx_ref, gctvec_ref,
    *, w, kc, h, act, attn_act, has_dk, has_dv,
):
    """Fused VJP-of-VJP: given the backward kernel's inputs plus output
    cotangents Z (one per input-cotangent slot), emit gradients wrt every
    primal input AND wrt (ct_x, ct_vec) — the two halves of
    d<bwd(x, ct), Z>/d(x, ct).  The ct-half is exactly jvp(fwd; Z).

    Per chunk: S = <vjp(chunk_fwd)(ct), Z_chunk>, grads = jax.grad(S) — all
    chunk intermediates (both differentiation levels) live in VMEM; HBM
    traffic stays at O(inputs + Z + outputs), vs the composable second-order
    rule's (N, K, F) edge materializations this kernel replaces (PERF.md r4:
    composable outer pass kept fused force training at 289 vs 235 ms/step).
    """
    r, k, rbf = ea_ref.shape
    cfg_like = FusedETConfig(
        h=h, heads=1, act=act, attn_act=attn_act, has_dk=has_dk,
        has_dv=has_dv, interpret=False,
    )
    f32 = jnp.float32
    # every packed operand is split OUTSIDE the differentiated chunk
    # function (see _chunk_fwd_fn: double-transposed slices become pads
    # Mosaic cannot lower), and the splits are REF-level sliced loads —
    # value-level slices carry lane offsets Mosaic's broadcast rejects
    # ("Invalid input layout" on vpad offset 256)
    xparts = tuple(xw_ref[0, :, c * h : (c + 1) * h] for c in range(7))
    zxparts = tuple(
        zxw_ref[0, :, c * h : (c + 1) * h].astype(f32) for c in range(7)
    )
    wslices = tuple(slice(c * h, (c + 1) * h) for c in range(3))
    wdv_p = tuple(wdv_ref[:, s] for s in wslices)
    bdv_p = tuple(bdv_ref[:, s] for s in wslices)
    zwdv_p = tuple(zwdv_ref[:, s].astype(f32) for s in wslices)
    zbdv_p = tuple(zbdv_ref[:, s].astype(f32) for s in wslices)
    ones = ones_ref[...]
    q = q_ref[...]
    ct_x = ct_x_ref[...].astype(f32)
    ct_v = tuple(ct_vec_ref[:, s].astype(f32) for s in wslices)
    zq = zq_ref[...].astype(f32)
    zwdk = zwdk_ref[...].astype(f32)
    zbdk = zbdk_ref[...].astype(f32)
    wdk = wdk_ref[...]
    bdk = bdk_ref[...]
    gq_acc = jnp.zeros((r, h), f32)
    gx_acc = [jnp.zeros((w, h), f32) for _ in range(7)]
    gwdk_acc = jnp.zeros((rbf, h), f32)
    gbdk_acc = jnp.zeros((1, h), f32)
    gwdv_acc = [jnp.zeros((rbf, h), f32) for _ in range(3)]
    gbdv_acc = [jnp.zeros((1, h), f32) for _ in range(3)]
    gctx_acc = jnp.zeros((r, h), f32)
    gctv_acc = [jnp.zeros((r, h), f32) for _ in range(3)]
    for c0, kn in _chunks(k, kc):
        rc = r * kn
        cols = jax.lax.broadcasted_iota(jnp.int32, (r, kn, w), 2).astype(f32)
        loc = local_ref[:, c0 : c0 + kn].astype(f32)[:, :, None]
        oh = jnp.where(loc == cols, 1.0, 0.0).reshape(rc, w).astype(
            xparts[0].dtype
        )
        fwd = _chunk_fwd_fn(cfg_like, oh, ones, r, kn, h)
        args = xparts + (
            q,
            ea_ref[:, c0 : c0 + kn, :].reshape(rc, rbf),
            cutm_ref[:, c0 : c0 + kn],
            msk_ref[:, c0 : c0 + kn],
            d0_ref[:, c0 : c0 + kn],
            d1_ref[:, c0 : c0 + kn],
            d2_ref[:, c0 : c0 + kn],
            wdk, bdk,
        ) + wdv_p + bdv_p
        zea2 = zea_ref[:, c0 : c0 + kn, :].reshape(rc, rbf).astype(f32)
        zcutm_c = zcutm_ref[:, c0 : c0 + kn].astype(f32)
        zd_c = tuple(
            zref[:, c0 : c0 + kn].astype(f32)
            for zref in (zd0_ref, zd1_ref, zd2_ref)
        )
        # Z per arg slot, None where the first-order op zeroes the
        # cotangent (msk) so it never contracts
        zs = zxparts + (
            zq, zea2, zcutm_c, None, zd_c[0], zd_c[1], zd_c[2], zwdk, zbdk,
        ) + zwdv_p + zbdv_p

        def S(a, cts):
            _, vjpf = jax.vjp(lambda t: fwd(*t), a)
            (g,) = vjpf(cts)
            return sum(
                jnp.sum(gi.astype(f32) * zi)
                for gi, zi in zip(g, zs)
                if zi is not None
            )

        ga, gc = jax.grad(S, argnums=(0, 1))(args, (ct_x,) + ct_v)
        for c in range(7):
            gx_acc[c] = gx_acc[c] + ga[c].astype(f32)
        gq_acc = gq_acc + ga[7].astype(f32)
        gea_ref[:, c0 : c0 + kn, :] = ga[8].astype(gea_ref.dtype).reshape(
            r, kn, rbf
        )
        gcutm_ref[:, c0 : c0 + kn] = ga[9].astype(f32)
        gmsk_ref[:, c0 : c0 + kn] = ga[10].astype(f32)
        gd0_ref[:, c0 : c0 + kn] = ga[11].astype(f32)
        gd1_ref[:, c0 : c0 + kn] = ga[12].astype(f32)
        gd2_ref[:, c0 : c0 + kn] = ga[13].astype(f32)
        gwdk_acc = gwdk_acc + ga[14].astype(f32)
        gbdk_acc = gbdk_acc + ga[15].astype(f32)
        for c in range(3):
            gwdv_acc[c] = gwdv_acc[c] + ga[16 + c].astype(f32)
            gbdv_acc[c] = gbdv_acc[c] + ga[19 + c].astype(f32)
        gctx_acc = gctx_acc + gc[0].astype(f32)
        for c in range(3):
            gctv_acc[c] = gctv_acc[c] + gc[1 + c].astype(f32)
    gq_ref[...] = gq_acc
    for c in range(7):
        gxw_ref[0, :, c * h : (c + 1) * h] = gx_acc[c].astype(gxw_ref.dtype)
    gwdk_ref[...] = gwdk_acc[None]
    gbdk_ref[...] = gbdk_acc[None]
    for c in range(3):
        gwdv_ref[0, :, c * h : (c + 1) * h] = gwdv_acc[c]
        gbdv_ref[0, :, c * h : (c + 1) * h] = gbdv_acc[c]
    gctx_ref[...] = gctx_acc
    for c in range(3):
        gctvec_ref[:, c * h : (c + 1) * h] = gctv_acc[c]


def _run_bwd2(
    cfg: FusedETConfig, plan, q, ea, cutm, msk, dirs, xw, wdk, bdk, wdv, bdv,
    ct_x, ct_vec, zq, zxw, zea, zcutm, zdirs, zwdk, zbdk, zwdv, zbdv,
):
    n, k = plan.local.shape
    nb, w = plan.u.shape
    r = n // nb
    h = cfg.h
    rbf_true = ea.shape[-1]
    rbf = -(-rbf_true // 128) * 128
    if rbf != rbf_true:
        pad3 = ((0, 0), (0, 0), (0, rbf - rbf_true))
        padw = ((0, rbf - rbf_true), (0, 0))
        ea = jnp.pad(ea, pad3)
        zea = jnp.pad(zea, pad3)
        wdk = jnp.pad(wdk, padw)
        wdv = jnp.pad(wdv, padw)
        zwdk = jnp.pad(zwdk, padw)
        zwdv = jnp.pad(zwdv, padw)
    f7 = 7 * h
    # the nested-autodiff chunk body roughly triples the backward kernel's
    # per-chunk live set; halve the K-chunk to keep it inside scoped VMEM
    # (r5 sweep: kc=16 measured within ~1% of kc=8 on 8x256 DHFR force
    # training — not worth the larger live set at bigger H)
    kc = max(8, cfg.kc // 2)
    kern = functools.partial(
        _bwd2_kernel, w=w, kc=kc, h=h, act=cfg.act, attn_act=cfg.attn_act,
        has_dk=cfg.has_dk, has_dv=cfg.has_dv,
    )
    ones = _ones_block(h, cfg.heads, xw.dtype)
    bcast = lambda *s: pl.BlockSpec(
        s, lambda b: (0,) * len(s), memory_space=pltpu.VMEM
    )
    blk = lambda *s: pl.BlockSpec(
        s, lambda b, _nd=len(s): (b,) + (0,) * (_nd - 1), memory_space=pltpu.VMEM
    )
    in_specs = [
        _nk(r, k),  # local
        blk(1, w, f7),  # xw
        blk(r, h),  # q
        blk(r, k, rbf),  # ea
        _nk(r, k), _nk(r, k),  # cutm, msk
        _nk(r, k), _nk(r, k), _nk(r, k),  # dir x/y/z
        bcast(rbf, h), bcast(1, h), bcast(rbf, 3 * h), bcast(1, 3 * h),
        bcast(h, h),  # ones
        blk(r, h), blk(r, 3 * h),  # ct_x, ct_vec
        blk(r, h),  # zq
        blk(1, w, f7),  # zxw
        blk(r, k, rbf),  # zea
        _nk(r, k),  # zcutm
        _nk(r, k), _nk(r, k), _nk(r, k),  # zdir x/y/z
        bcast(rbf, h), bcast(1, h), bcast(rbf, 3 * h), bcast(1, 3 * h),
    ]
    out_specs = [
        blk(r, h),  # gq
        blk(r, k, rbf),  # gea
        _nk(r, k), _nk(r, k),  # gcutm, gmsk
        _nk(r, k), _nk(r, k), _nk(r, k),  # gdir x/y/z
        blk(1, w, f7),  # gxw partials
        blk(1, rbf, h), blk(1, 1, h), blk(1, rbf, 3 * h), blk(1, 1, 3 * h),
        blk(r, h), blk(r, 3 * h),  # gctx, gctvec
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n, h), jnp.float32),
        jax.ShapeDtypeStruct((n, k, rbf), jnp.float32),
        jax.ShapeDtypeStruct((n, k), jnp.float32),
        jax.ShapeDtypeStruct((n, k), jnp.float32),
        jax.ShapeDtypeStruct((n, k), jnp.float32),
        jax.ShapeDtypeStruct((n, k), jnp.float32),
        jax.ShapeDtypeStruct((n, k), jnp.float32),
        jax.ShapeDtypeStruct((nb, w, f7), xw.dtype),
        jax.ShapeDtypeStruct((nb, rbf, h), jnp.float32),
        jax.ShapeDtypeStruct((nb, 1, h), jnp.float32),
        jax.ShapeDtypeStruct((nb, rbf, 3 * h), jnp.float32),
        jax.ShapeDtypeStruct((nb, 1, 3 * h), jnp.float32),
        jax.ShapeDtypeStruct((n, h), jnp.float32),
        jax.ShapeDtypeStruct((n, 3 * h), jnp.float32),
    ]
    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=cfg.interpret,
    )(
        plan.local, xw, q, ea, cutm, msk, dirs[0], dirs[1], dirs[2],
        wdk, bdk, wdv, bdv, ones, ct_x, ct_vec,
        zq, zxw, zea, zcutm, zdirs[0], zdirs[1], zdirs[2],
        zwdk, zbdk, zwdv, zbdv,
    )
    (gq, gea, gcutm, gmsk, gd0, gd1, gd2, gxw, gwdk_p, gbdk_p, gwdv_p,
     gbdv_p, gctx, gctvec) = outs
    return (
        gq, gea[:, :, :rbf_true], gcutm, gmsk, gd0, gd1, gd2, gxw,
        gwdk_p[:, :rbf_true, :], gbdk_p, gwdv_p[:, :rbf_true, :], gbdv_p,
        gctx, gctvec,
    )


# --------------------------------------------------------------------------
# composable reference (the kernels' math twin, used for higher-order rules
# and as the test oracle)
# --------------------------------------------------------------------------


def reconstruct_idx(plan: BlockGatherPlan):
    """The ELL neighbor idx the plan was built from: idx[i, k] =
    u[i // R, local[i, k]] (exact absent plan overflow, which is flagged)."""
    n, k = plan.local.shape
    r = plan.block_rows
    rows = jnp.arange(n, dtype=jnp.int32) // r
    return plan.u[rows[:, None], plan.local]


def _composable_reference(cfg, plan, idx, ones, inputs):
    """Plain-JAX twin of _fwd_kernel: same math, same bf16-compute /
    f32-accumulate discipline, composable ops only.  Never executed on the
    reverse-mode hot path — it is the body the higher-order autodiff rules
    differentiate (and the forward-mode body).

    ``idx``/``ones`` arrive as explicit arguments (not built in-body):
    the custom_transpose forward body must not create array constants —
    they become constvars its staging cannot re-associate ("Too many
    leaves for PyTreeDef").  The same rule is why the ring boundary tables
    ride inside ``plan.ring`` instead of being read from the ring context.
    """
    (q, k, v, vec0, vec1, vec2, ea, cutm, msk, dir0, dir1, dir2,
     wdk, bdk, wdv, bdv) = inputs
    h = cfg.h
    bf = q.dtype
    ea2 = ea.reshape(-1, ea.shape[-1])
    dk = dv = None
    if cfg.has_dk:
        pre = jax.lax.dot(ea2, wdk, preferred_element_type=jnp.float32)
        dk = _act_v(cfg.act, pre.astype(bf) + bdk).reshape(ea.shape[:2] + (h,))
    if cfg.has_dv:
        pre = jax.lax.dot(ea2, wdv, preferred_element_type=jnp.float32)
        dv = _act_v(cfg.act, pre.astype(bf) + bdv).reshape(ea.shape[:2] + (3 * h,))
    kj = _ref_edge_gather(cfg, k, idx, plan)
    prod = q[:, None, :] * kj
    if dk is not None:
        prod = prod * dk
    rc = prod.shape[0] * prod.shape[1]
    pre_a = jax.lax.dot(
        prod.reshape(rc, h), ones, preferred_element_type=jnp.float32
    ).astype(bf).reshape(prod.shape)
    attn = _act_v(cfg.attn_act, pre_a) * cutm[..., None].astype(bf)
    vdv = _ref_edge_gather(cfg, v, idx, plan)
    if dv is not None:
        vdv = vdv * dv
    x_m = vdv[..., :h]
    vw1 = vdv[..., h : 2 * h] * msk[..., None].astype(bf)
    vw2 = vdv[..., 2 * h :]
    x_agg = (x_m * attn).astype(jnp.float32).sum(axis=1)
    vec_parts = []
    for c, (vec_c, dir_c) in enumerate(
        ((vec0, dir0), (vec1, dir1), (vec2, dir2))
    ):
        msg = _ref_edge_gather(cfg, vec_c, idx, plan) * vw1 + vw2 * dir_c[
            ..., None
        ].astype(bf)
        vec_parts.append(msg.astype(jnp.float32).sum(axis=1))
    return x_agg, jnp.concatenate(vec_parts, axis=-1)


# --------------------------------------------------------------------------
# backward op: the Pallas backward kernel as its own differentiable-once op
# --------------------------------------------------------------------------


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def _et_bwd_op(cfg, plan, inputs, ct):
    """VJP of the fused edge phase, computed by the backward Pallas kernel.

    inputs: the 16-tuple of fused_et_messages array args; ct: (ct_x, ct_vec).
    Returns the 16-tuple of input cotangents (zeros for the 0/1 mask).
    Differentiating THIS op (force-loss training's outer pass) runs the
    composable second-order rule below.
    """
    (q, k, v, vec0, vec1, vec2, ea, cutm, msk, dir0, dir1, dir2,
     wdk, bdk, wdv, bdv) = inputs
    ct_x, ct_vec = ct
    h = cfg.h
    src = jnp.concatenate([k, v, vec0, vec1, vec2], axis=-1)  # (N, 7H)
    # regather the (NB, W, 7H) table instead of storing it as a residual —
    # at STMV scale the per-layer xw is ~GBs
    xw = _table_gather(cfg, src, plan)
    outs = _run_bwd(
        cfg, plan, q, ea, cutm, msk, (dir0, dir1, dir2), xw,
        wdk, bdk, wdv, bdv,
        ct_x.astype(jnp.float32), ct_vec.astype(jnp.float32),
    )
    dq, dea, dcutm, dd0, dd1, dd2, dxw, dwdk_p, dbdk_p, dwdv_p, dbdv_p = outs
    d_src = _table_scatter(cfg, dxw, plan, q.shape[0]).astype(q.dtype)  # (N, 7H)
    return (
        dq.astype(q.dtype),
        d_src[:, :h],
        d_src[:, h : 4 * h],
        d_src[:, 4 * h : 5 * h],
        d_src[:, 5 * h : 6 * h],
        d_src[:, 6 * h :],
        dea.reshape(ea.shape).astype(ea.dtype),
        dcutm.astype(cutm.dtype),
        jnp.zeros_like(msk),  # 0/1 mask data: no meaningful gradient
        dd0.astype(dir0.dtype),
        dd1.astype(dir1.dtype),
        dd2.astype(dir2.dtype),
        dwdk_p.sum(axis=0).astype(wdk.dtype),
        dbdk_p.sum(axis=0).astype(bdk.dtype),
        dwdv_p.sum(axis=0).astype(wdv.dtype),
        dbdv_p.sum(axis=0).astype(bdv.dtype),
    )


@_et_bwd_op.defjvp
def _et_bwd_op_jvp(cfg, primals, tangents):
    """Second-order rule: the tangent rides `_et_bwd_dot`, a custom_transpose
    linear in (d_inputs, d_ct) whose forward body is the composable
    jvp-of-vjp (only executed in true forward-over-reverse use,
    force_grad_mode='jvp') and whose TRANSPOSE — the hot path of
    grad-of-grad force training — is the fused second-order kernel
    `_et_bwd2_op`.  The primal still runs the Pallas bwd kernel: inside a
    force-training step that is the inner force pass."""
    plan, inputs, ct = primals
    _, d_inputs, d_ct = tangents
    from jax.core import ShapedArray

    primal_out = _et_bwd_op(cfg, plan, inputs, ct)
    out_types = jax.tree_util.tree_map(
        lambda o: ShapedArray(jnp.shape(o), o.dtype), primal_out
    )
    idx = reconstruct_idx(plan)
    ones = _ones_block(cfg.h, cfg.heads, inputs[0].dtype)
    tangent_out = _et_bwd_dot(cfg)(
        out_types, (plan, idx, ones, inputs, ct),
        (tuple(d_inputs), tuple(d_ct)),
    )
    return primal_out, tangent_out


def _ref_vjp_fn(cfg, plan, idx, ones, inputs, ct):
    """The composable VJP with the kernel's mask-cotangent convention (msk is
    0/1 data — its cotangent slot is zeroed, disconnecting it from autodiff
    exactly like `_et_bwd_op` does)."""
    _, vjp = jax.vjp(
        lambda ins: _composable_reference(cfg, plan, idx, ones, ins), inputs
    )
    (d,) = vjp(ct)
    return d[:8] + (jnp.zeros_like(inputs[8]),) + d[9:]


def _composable_bwd_vjp(cfg, plan, idx, ones, inputs, ct, Z):
    """Composable twin of `_et_bwd2_op`: grad over (inputs, ct) of
    <ref_vjp(inputs, ct), Z>.  The third-order rule's body and the second-
    order kernel's test oracle."""

    def s_fn(inputs, ct):
        g = _ref_vjp_fn(cfg, plan, idx, ones, inputs, ct)
        return sum(
            jnp.sum(gi.astype(jnp.float32) * zi.astype(jnp.float32))
            for gi, zi in zip(g, Z)
        )

    return jax.grad(s_fn, argnums=(0, 1))(inputs, ct)


@functools.lru_cache(maxsize=None)
def _et_bwd_dot(cfg):
    from jax.custom_transpose import custom_transpose

    @custom_transpose
    def dot(res, lin):
        plan, idx, ones, inputs, ct = res
        d_inputs, d_ct = lin
        _, tangent = jax.jvp(
            lambda i, c: _ref_vjp_fn(cfg, plan, idx, ones, i, c),
            (inputs, ct), (d_inputs, d_ct),
        )
        return tangent

    @dot.def_transpose
    def dot_t(res, Z):
        plan, idx, ones, inputs, ct = res
        Z = tuple(
            jnp.zeros_like(x) if z is None else z for z, x in zip(Z, inputs)
        )
        return _et_bwd2_op(cfg, plan, inputs, ct, Z)

    return dot


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def _et_bwd2_op(cfg, plan, inputs, ct, Z):
    """VJP of `_et_bwd_op` wrt (inputs, ct), computed by the fused
    second-order Pallas kernel.

    Z: 16-tuple of cotangents on the backward op's outputs (one per
    input-cotangent slot; the msk slot is ignored — that output is zeros).
    Returns (g_inputs 16-tuple, g_ct 2-tuple).  The g_ct half equals
    jvp(fused_forward; Z) — both halves fall out of the same per-chunk
    nested-autodiff contraction.
    """
    (q, k, v, vec0, vec1, vec2, ea, cutm, msk, dir0, dir1, dir2,
     wdk, bdk, wdv, bdv) = inputs
    ct_x, ct_vec = ct
    (z_q, z_k, z_v, z_vec0, z_vec1, z_vec2, z_ea, z_cutm, _z_msk,
     z_dir0, z_dir1, z_dir2, z_wdk, z_bdk, z_wdv, z_bdv) = Z
    h = cfg.h
    src = jnp.concatenate([k, v, vec0, vec1, vec2], axis=-1)  # (N, 7H)
    xw = _table_gather(cfg, src, plan)
    # Z on the scattered source-cotangents routes back through the
    # scatter's adjoint: the same table gather
    z_src = jnp.concatenate(
        [z_k, z_v, z_vec0, z_vec1, z_vec2], axis=-1
    ).astype(src.dtype)
    z_xw = _table_gather(cfg, z_src, plan)
    outs = _run_bwd2(
        cfg, plan, q, ea, cutm, msk, (dir0, dir1, dir2), xw,
        wdk, bdk, wdv, bdv,
        ct_x.astype(jnp.float32), ct_vec.astype(jnp.float32),
        z_q, z_xw, z_ea, z_cutm, (z_dir0, z_dir1, z_dir2),
        z_wdk, z_bdk, z_wdv, z_bdv,
    )
    (gq, gea, gcutm, gmsk, gd0, gd1, gd2, gxw, gwdk_p, gbdk_p, gwdv_p,
     gbdv_p, gctx, gctvec) = outs
    g_src = _table_scatter(cfg, gxw, plan, q.shape[0]).astype(q.dtype)
    g_inputs = (
        gq.astype(q.dtype),
        g_src[:, :h],
        g_src[:, h : 4 * h],
        g_src[:, 4 * h : 5 * h],
        g_src[:, 5 * h : 6 * h],
        g_src[:, 6 * h :],
        gea.reshape(ea.shape).astype(ea.dtype),
        gcutm.astype(cutm.dtype),
        gmsk.astype(msk.dtype),
        gd0.astype(dir0.dtype),
        gd1.astype(dir1.dtype),
        gd2.astype(dir2.dtype),
        gwdk_p.sum(axis=0).astype(wdk.dtype),
        gbdk_p.sum(axis=0).astype(bdk.dtype),
        gwdv_p.sum(axis=0).astype(wdv.dtype),
        gbdv_p.sum(axis=0).astype(bdv.dtype),
    )
    g_ct = (gctx.astype(ct_x.dtype), gctvec.astype(ct_vec.dtype))
    return g_inputs, g_ct


@_et_bwd2_op.defjvp
def _et_bwd2_op_jvp(cfg, primals, tangents):
    """Third-order rule: composable (jvp of the composable VJP-of-VJP).
    Reached only beyond grad-of-grad — kept for all-orders closure."""
    plan, inputs, ct, Z = primals
    _, d_inputs, d_ct, d_Z = tangents
    primal_out = _et_bwd2_op(cfg, plan, inputs, ct, Z)
    idx = reconstruct_idx(plan)
    ones = _ones_block(cfg.h, cfg.heads, inputs[0].dtype)
    _, tangent_out = jax.jvp(
        lambda i, c, z: _composable_bwd_vjp(cfg, plan, idx, ones, i, c, z),
        (inputs, ct, Z), (d_inputs, d_ct, d_Z),
    )
    return primal_out, tangent_out


# --------------------------------------------------------------------------
# tangent op: linear in the tangents, transpose = the backward kernel
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _et_dot(cfg):
    from jax.custom_transpose import custom_transpose

    @custom_transpose
    def dot(res, d_inputs):
        plan, idx, ones, inputs = res
        _, tangent = jax.jvp(
            lambda ins: _composable_reference(cfg, plan, idx, ones, ins),
            (inputs,), (d_inputs,),
        )
        return tangent

    @dot.def_transpose
    def dot_t(res, ct):
        plan, idx, ones, inputs = res
        return _et_bwd_op(cfg, plan, inputs, ct)

    return dot


# --------------------------------------------------------------------------
# public op
# --------------------------------------------------------------------------


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def fused_et_messages(
    cfg, plan, q, k, v, vec0, vec1, vec2, ea, cutm, msk, dir0, dir1, dir2,
    wdk, bdk, wdv, bdv,
):
    """Fused ET edge phase: (x_agg (N, H), vec_agg (N, 3H)) in f32.

    Args (all arrays one message dtype, normally bf16):
        cfg: FusedETConfig (static).
        plan: BlockGatherPlan over the layer's ELL neighbor idx.
        q, k: (N, H) node projections; v: (N, 3H); vec0..2: (N, H) the xyz
            components of the running vector features.
        ea: (N, K, RBF) edge RBF features.
        cutm: (N, K) cosine_cutoff(dist) * mask; msk: (N, K) 1.0/0.0 mask.
        dir0..2: (N, K) edge direction components (zero on self/invalid).
        wdk/bdk/wdv/bdv: distance-filter MLP params, bdk/bdv shaped (1, F);
            pass zeros-shaped dummies when cfg.has_dk/has_dv is False.

    Differentiable at every order (see module docstring): one reverse pass
    (forces, energy training) runs the fwd+bwd Pallas kernels; grad-of-grad
    (force-loss training) runs the composable second-order rule for the
    outer pass while the inner force evaluation stays fused.
    """
    src = jnp.concatenate([k, v, vec0, vec1, vec2], axis=-1)  # (N, 7H)
    # (NB, W, 7H) — the only HBM gather of the edge phase (ring-scheduled
    # over boundary sources under edge partitioning)
    xw = _table_gather(cfg, src, plan)
    return _run_fwd(
        cfg, plan, q, ea, cutm, msk, (dir0, dir1, dir2), xw, wdk, bdk, wdv, bdv
    )


@fused_et_messages.defjvp
def _fused_et_messages_jvp(cfg, primals, tangents):
    from jax.core import ShapedArray

    plan, *arrays = primals
    _, *d_arrays = tangents
    out = fused_et_messages(cfg, plan, *arrays)
    out_types = jax.tree_util.tree_map(
        lambda o: ShapedArray(jnp.shape(o), o.dtype), out
    )
    # idx/ones ride as explicit residuals: the custom_transpose body must
    # not create array constants (see _composable_reference)
    idx = reconstruct_idx(plan)
    ones = _ones_block(cfg.h, cfg.heads, arrays[0].dtype)
    d_out = _et_dot(cfg)(
        out_types, (plan, idx, ones, tuple(arrays)), tuple(d_arrays)
    )
    return out, d_out
