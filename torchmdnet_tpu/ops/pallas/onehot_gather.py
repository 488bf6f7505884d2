"""Pallas TPU kernel: neighbor-feature gather as a block-compacted one-hot matmul.

XLA's row gather is the measured floor of every message-passing layer
(PERF.md: ~2 ns/row regardless of width, ~28% of v5e HBM bandwidth on the
wide ET gathers; Mosaic's in-kernel dynamic_gather is limited to one vreg
along the gather dim, so a Pallas gather loop cannot beat it).  This module
routes the gather through the MXU instead:

    1. Receivers are processed in blocks of R consecutive rows.  For
       spatially coherent row order (the cell list sorts atoms by cell), the
       sources referenced by one block form a small set: measured max ~640
       unique sources per 64-row block at protein density with K=80,
       *independent of system size* (surface effect) — see
       benchmarks/exp_gather.py.
    2. make_block_gather_plan() compacts each block's sources into a unique
       table u (NB, W) and rewrites idx to positions in that table
       (one sort per neighbor rebuild, shared by every layer).
    3. x[u] pre-gathers (NB, W, F) — W/K-fold fewer gathered rows than x[idx].
    4. The Pallas kernel builds the (R*Kc, W) one-hot selection matrix on the
       VPU (an iota compare — never materialized in HBM) and multiplies it
       with the block's source table on the MXU, emitting exact x rows
       (one-hot matmul is exact in any dtype: each output sums one x value
       and W-1 true zeros).

The kernel replaces a HBM-random-access bound op with a compute op whose
matmul units are otherwise idle during message passing.  It is profitable in
bf16 (MXU-native); in f32 the MXU runs at ~1/4 rate and the XLA gather
usually stays ahead — callers should route through it for bf16_messages
paths (see ops/neighbors.py:ell_gather integration).
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class RingTablePlan(NamedTuple):
    """Ring boundary schedules attached to a BlockGatherPlan under edge
    partitioning (parallel/edge_partition.py).  All ids in the owning plan
    are then GLOBAL while its rows are shard-local:

    - ``u_slots``/``u_valid``: make_ring_plan over the (NB_l, W) unique-
      source table ``u`` (n_source_local = atoms per shard) — drives the
      xw source-table gather and the dxw transpose of the fused kernels;
    - ``e_slots``/``e_valid``: the MODEL neighbor list's own ring plan
      (same arrays as RingInfo.slots/valid) — drives the composable
      reference's edge gathers in the higher-order rules.
    """

    u_slots: jnp.ndarray  # (D, Bu) int32 flat slots into (NB_l * W,)
    u_valid: jnp.ndarray  # (D, Bu) bool
    e_slots: jnp.ndarray  # (D, B) int32 flat slots into (N_l * K,)
    e_valid: jnp.ndarray  # (D, B) bool


class BlockGatherPlan(NamedTuple):
    """Per-block source compaction of an ELL neighbor list.

    Built once per neighbor rebuild; reused by every layer and both
    differentiation orders (the plan depends only on idx).
    """

    u: jnp.ndarray  # (NB, W) int32: unique source ids per receiver block
    local: jnp.ndarray  # (N, K) int32: position of idx[i, k] in u[i // R]
    n_unique: jnp.ndarray  # (NB,) int32
    overflow: jnp.ndarray  # () int32: total sources that did not fit (0 == exact)
    # inverse table for the transpose: source j's partial sums live in
    # P[inv_blocks[j, a], inv_pos[j, a]] for a < its block count
    inv_blocks: jnp.ndarray  # (N, A) int32
    inv_pos: jnp.ndarray  # (N, A) int32
    inv_valid: jnp.ndarray  # (N, A) bool
    inv_overflow: jnp.ndarray  # () int32: sources in more than A blocks
    # edge-partitioned execution only: ring boundary schedules (ids above are
    # then global, rows local); None on single-device plans
    ring: "RingTablePlan" = None

    @property
    def block_rows(self) -> int:
        return self.local.shape[0] // self.u.shape[0]

    @property
    def width(self) -> int:
        return self.u.shape[1]


def make_block_gather_plan(
    idx, *, block_rows: int = 32, width: int = 512, inv_capacity: int = 16
) -> BlockGatherPlan:
    """Compact each R-row block's sources into a W-entry unique table.

    Args:
        idx: (N, K) int32 source ids (every slot valid as a *gather* — masked
            ELL slots point at their own row, ops/neighbors.py).  N % R == 0.
        block_rows: R, receivers per block.
        width: W, unique-source capacity per block (multiple of 128).  Must
            cover the densest block; overflow is counted and must be treated
            as a capacity error by the caller (same contract as the neighbor
            list's own caps).
    """
    n, k = idx.shape
    r, w = block_rows, width
    assert n % r == 0, f"N={n} must be a multiple of block_rows={r}"
    assert w % 128 == 0, "width must be lane-aligned (multiple of 128)"
    nb = n // r
    s = idx.reshape(nb, r * k)
    perm = jnp.argsort(s, axis=1)
    ssorted = jnp.take_along_axis(s, perm, axis=1)
    is_new = jnp.concatenate(
        [jnp.ones((nb, 1), bool), ssorted[:, 1:] != ssorted[:, :-1]], axis=1
    )
    rank = jnp.cumsum(is_new, axis=1) - 1  # (nb, r*k)
    n_unique = (rank[:, -1] + 1).astype(jnp.int32)
    overflow = jnp.maximum(n_unique - w, 0).sum()
    rank_c = jnp.minimum(rank, w - 1).astype(jnp.int32)
    # all slots of one rank-run share the same source value, so an
    # unconditional scatter fills u without needing the is_new mask
    rows = jnp.arange(nb, dtype=jnp.int32)[:, None]
    u = jnp.zeros((nb, w), jnp.int32).at[rows, rank_c].set(ssorted.astype(jnp.int32))
    local = jnp.zeros((nb, r * k), jnp.int32).at[rows, perm].set(rank_c)

    # ---- inverse table: which (block, w) slots hold each source's partials.
    # A source appears in a block's table iff a neighbor of it lives there,
    # so its block count is a small constant at spatial locality (the K
    # neighbors span ~K/R + surface blocks).
    a_cap = max(8, inv_capacity)
    m = nb * w
    tgt = u.reshape(m)
    entry_valid = (
        jnp.arange(w, dtype=jnp.int32)[None, :] < jnp.minimum(n_unique, w)[:, None]
    ).reshape(m)
    tkey = jnp.where(entry_valid, tgt, n).astype(jnp.int32)
    torder = jnp.argsort(tkey, stable=True).astype(jnp.int32)
    skey = tkey[torder]
    t_new = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    first_at = jnp.where(t_new, jnp.arange(m, dtype=jnp.int32), 0)
    group_start = jax.lax.cummax(first_at)
    apos = jnp.arange(m, dtype=jnp.int32) - group_start
    in_range = entry_valid[torder] & (apos < a_cap)
    inv_overflow = (entry_valid[torder] & (apos >= a_cap)).sum()
    row_t = jnp.where(in_range, skey, n)  # row n == dump slot
    col_t = jnp.where(in_range, apos, 0)
    inv_blocks = (
        jnp.zeros((n + 1, a_cap), jnp.int32)
        .at[row_t, col_t].set(torder // w)[: n]
    )
    inv_pos = (
        jnp.zeros((n + 1, a_cap), jnp.int32)
        .at[row_t, col_t].set(torder % w)[: n]
    )
    inv_valid = (
        jnp.zeros((n + 1, a_cap), bool).at[row_t, col_t].set(in_range)[: n]
    )
    return BlockGatherPlan(
        u,
        local.reshape(n, k),
        n_unique,
        overflow.astype(jnp.int32),
        inv_blocks,
        inv_pos,
        inv_valid,
        inv_overflow.astype(jnp.int32),
    )


def _pick_kc(k: int, r: int, max_rows: int = 1024) -> int:
    """Largest divisor of K whose (R*Kc) one-hot row count stays VMEM-friendly."""
    best = 1
    for kc in range(1, k + 1):
        if k % kc == 0 and r * kc <= max_rows:
            best = kc
    return best


def _gather_kernel(local_ref, xw_ref, out_ref, *, w: int, kc: int):
    # Mosaic block shapes must be (8, 128)-aligned or full-dim, so blocks
    # span the full K axis and the one-hot chunks loop inside the kernel
    # (VMEM slices have no alignment constraint).  All reshapes keep the
    # lane (last) dim intact — Mosaic rejects lane-changing shape casts —
    # and the one-hot build uses f32 select arithmetic like compaction.py
    # (3D bool intermediates are not lowerable).
    r, k = local_ref.shape
    f = out_ref.shape[-1]
    xw = xw_ref[0]  # (W, F)
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, kc, w), 2).astype(jnp.float32)
    for c0 in range(0, k, kc):
        loc = local_ref[:, c0 : c0 + kc].astype(jnp.float32)[:, :, None]
        onehot = jnp.where(loc == cols, 1.0, 0.0)  # (R, Kc, W) f32
        onehot = onehot.reshape(r * kc, w).astype(xw.dtype)
        out = jax.lax.dot(onehot, xw, preferred_element_type=jnp.float32)
        out_ref[:, c0 : c0 + kc, :] = out.astype(out_ref.dtype).reshape(r, kc, f)


def onehot_gather(x, plan: BlockGatherPlan, *, interpret: bool = None):
    """out[i, k] = x[idx[i, k]] via per-block one-hot MXU matmuls.

    Exact (bitwise) replacement for the forward of ell_gather when the plan
    has no overflow.  x: (N, F) with F a multiple of 128.
    """
    if interpret is None:  # run the kernel in interpret mode off-TPU (tests)
        interpret = jax.devices()[0].platform != "tpu"
    n, k = plan.local.shape
    nb, w = plan.u.shape
    r = n // nb
    f = x.shape[-1]
    kc = _pick_kc(k, r)
    xw = x[plan.u]  # (NB, W, F): the only HBM gather, W/K-fold fewer rows
    out = pl.pallas_call(
        functools.partial(_gather_kernel, w=w, kc=kc),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((r, k), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, f), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (r, k, f), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, k, f), x.dtype),
        interpret=interpret,
    )(plan.local, xw)
    return out


def _transpose_kernel(local_ref, g_ref, p_ref, *, w: int, kc: int):
    # P_b = onehot_b^T @ g_b: contract over the slot-row axis with a
    # lhs-transposed dot (MXU handles either orientation); the one-hot is
    # rebuilt per chunk exactly as in the forward kernel.
    r, k = local_ref.shape
    f = g_ref.shape[-1]
    acc = jnp.zeros((w, f), jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, kc, w), 2).astype(jnp.float32)
    for c0 in range(0, k, kc):
        loc = local_ref[:, c0 : c0 + kc].astype(jnp.float32)[:, :, None]
        onehot = jnp.where(loc == cols, 1.0, 0.0).reshape(r * kc, w)
        g = g_ref[:, c0 : c0 + kc, :].reshape(r * kc, f)
        acc = acc + jax.lax.dot_general(
            onehot.astype(g.dtype),
            g,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    p_ref[...] = acc.reshape(1, w, f)


def _pick_fc(f: int, limit: int = 512) -> int:
    """Largest lane-aligned divisor of F within the VMEM-friendly limit."""
    if f <= limit:
        return f
    best = 128
    for fc in range(128, limit + 1, 128):
        if f % fc == 0:
            best = fc
    return best


def onehot_transpose_sum(g, plan: BlockGatherPlan, *, interpret: bool = None):
    """dh[j] = sum of g[i, k] over all slots with idx[i, k] == j, via per-block
    G^T matmuls + the plan's inverse table (scatter-free).

    The transpose of onehot_gather: each block reduces its slots into (W, F)
    partials on the MXU (f32 accumulation); source j then gathers its <=A
    block partials and sums them.  Replaces the argsort-path transpose's
    N*K-row gather with N*A rows (A ~ 16).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    n, k = plan.local.shape
    nb, w = plan.u.shape
    r = n // nb
    f = g.shape[-1]
    g3 = g.reshape(n, k, f)
    kc = _pick_kc(k, r)
    fc = _pick_fc(f)  # wide F runs as extra grid steps to fit scoped VMEM
    partials = pl.pallas_call(
        functools.partial(_transpose_kernel, w=w, kc=kc),
        grid=(nb, f // fc),
        in_specs=[
            pl.BlockSpec((r, k), lambda b, c: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (r, k, fc), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, w, fc), lambda b, c: (b, 0, c), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nb, w, f), jnp.float32),
        interpret=interpret,
    )(plan.local, g3)
    flat = partials.reshape(nb * w, f)
    slots = plan.inv_blocks * w + plan.inv_pos  # (N, A)
    picked = flat[slots]  # (N, A, F)
    picked = jnp.where(plan.inv_valid[..., None], picked, 0.0)
    return picked.sum(axis=1).astype(g.dtype)


def suggest_plan_shape(idx, *, block_rows: int = 16, headroom: float = 1.25):
    """Setup-time probe: tight static (R, W, A) gather-plan capacities.

    Every fused-kernel matmul carries the plan width W: the one-hot
    selection matrices are (R*Kc, W) and the source tables (W, F), so FLOPs
    scale LINEARLY with W in all three kernels (fwd/bwd/bwd2) — measured on
    DHFR force training, the default W=512/R=32 runs 188.6 ms/step where the
    probed W=256/R=16 runs 110.9 (PERF.md r4).  The safe default must cover
    the densest block of ANY system, so it over-provisions most; this probe
    (same contract as ``cell_list.suggest_cell_capacity``) sizes W and the
    inverse-table capacity A from one CONCRETE neighbor list (setup / first
    batch — NumPy math, no device traffic).  Capacity drift on later batches
    stays loudly detected: plan overflow feeds the trainer's per-batch
    surveillance and ``NeighborList.raise_on_overflow``.

    Args:
        idx: (N, K) concrete ELL neighbor ids (masked slots self-point).
        block_rows: preferred R; halved (min 8) until it divides N, like
            ``Potential.neighbors``.  R=16 measures best at protein density
            (smaller R narrows W; below 16 the per-block grid overhead and
            repeated source loads win, PERF.md r4 sweep).
        headroom: margin over the observed max occupancy (MD/training:
            atoms drift between rebuilds; 1.0 is exact for static benches).

    Returns:
        (block_rows, width, inv_capacity) ready for
        ``make_block_gather_plan`` / ``Potential.neighbors`` — or ``None``
        when no block_rows <= 8 divides N, mirroring the
        ``Potential.neighbors`` contract (which silently skips plan
        attachment in the same situation; the fused model path then fails
        loudly at apply if a plan was actually required).
    """
    import numpy as np

    idx = np.asarray(idx)
    n, k = idx.shape
    r = block_rows
    while r > 8 and n % r != 0:
        r //= 2
    if n % r != 0:
        return None
    nb = n // r
    s = np.sort(idx.reshape(nb, r * k), axis=1)
    new = np.concatenate(
        [np.ones((nb, 1), bool), s[:, 1:] != s[:, :-1]], axis=1
    )
    max_unique = int(new.sum(axis=1).max())
    width = max(128, -(-int(max_unique * headroom) // 128) * 128)
    # blocks per source -> inverse-table capacity A
    pairs = np.unique(
        idx.reshape(nb, r * k).astype(np.int64)
        + np.arange(nb, dtype=np.int64)[:, None] * n
    )
    max_blocks = int(np.bincount(pairs % n, minlength=n).max())
    inv_capacity = max(8, -(-int(max_blocks * headroom) // 4) * 4)
    return r, width, inv_capacity
