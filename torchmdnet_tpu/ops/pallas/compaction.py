"""Pallas TPU kernel: fused neighbor search + stream compaction.

Replaces the XLA pipeline ``d2 matrix -> mask -> top_k(k)`` whose selection
cost scales with k (jax.lax.top_k does O(k) passes; ~70% of brute neighbor
search time at protein sizes) with a single streaming pass:

For each 8-row tile of atoms the kernel sweeps the column space in 128-lane
tiles, computes squared distances and the validity mask on the fly (VPU), and
inserts the column indices of valid pairs into their output slots with a
one-hot select-accumulate — the TPU idiom for a monotone scatter.  Output
slots are ascending-j ordered and bitwise identical to the top_k path.
Running per-row counts live in VMEM scratch; true neighbor counts (before
the K cap) come out for overflow checking.

Determinism: column tiles are visited in order and the insert position is a
prefix count, so results do not depend on scheduling (contrast the
reference's atomicAdd slot allocation, neighbors/common.cuh:106-116).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8  # sublane tile
_COLS = 128  # lane tile


def _kernel(
    pos_t_ref,  # (4, Npad) f32: x, y, z rows + batch id row
    valid_atom_ref,  # (1, Npad) f32: 1.0 for real atoms
    row_ref,  # (ROWS, 8) f32 block: [x, y, z, batch, valid, 0, 0, 0] per row
    slots_ref,  # out (ROWS, K) f32 accumulated column indices
    smask_ref,  # out (ROWS, K) f32 slot validity (0/1)
    count_ref,  # out (ROWS, 128) f32: true neighbor count in col 0
    *,
    n_pad: int,
    k: int,
    cutoff_lower: float,
    cutoff_upper: float,
):
    r0 = pl.program_id(0) * _ROWS

    row_x = row_ref[:, 0:1]  # (ROWS, 1)
    row_y = row_ref[:, 1:2]
    row_z = row_ref[:, 2:3]
    row_batch = row_ref[:, 3:4]
    row_valid = row_ref[:, 4:5]
    row_ids = (r0 + jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _COLS), 0)).astype(jnp.float32)

    # (ROWS, K, COLS) slot index grid: columns stay on the lane axis so the
    # 3D one-hot tiles as clean (K, 128) blocks per row
    slot_grid = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, k, _COLS), 1).astype(
        jnp.float32
    )

    def body(ct, carry):
        slots, smask, count = carry
        c0 = pl.multiple_of(ct * _COLS, _COLS)
        col_x = pos_t_ref[0:1, pl.ds(c0, _COLS)]  # (1, COLS)
        col_y = pos_t_ref[1:2, pl.ds(c0, _COLS)]
        col_z = pos_t_ref[2:3, pl.ds(c0, _COLS)]
        col_batch = pos_t_ref[3:4, pl.ds(c0, _COLS)]
        col_valid = valid_atom_ref[0:1, pl.ds(c0, _COLS)]

        dxx = row_x - col_x  # (ROWS, COLS) via broadcast
        dyy = row_y - col_y
        dzz = row_z - col_z
        d2 = dxx * dxx + dyy * dyy + dzz * dzz

        col_ids = (c0 + jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _COLS), 1)).astype(jnp.float32)
        valid = (
            (d2 < cutoff_upper * cutoff_upper)
            & (d2 >= cutoff_lower * cutoff_lower)
            & (row_batch == col_batch)
            & (row_valid > 0)
            & (col_valid > 0)
            & (col_ids != row_ids)
        )

        validf = valid.astype(jnp.float32)
        # exclusive prefix sum over lanes as an MXU matmul with a strict
        # lower-triangular ones matrix (Mosaic has no cumsum primitive)
        l_ids = jax.lax.broadcasted_iota(jnp.int32, (_COLS, _COLS), 0)
        s_ids = jax.lax.broadcasted_iota(jnp.int32, (_COLS, _COLS), 1)
        tril_strict = (l_ids < s_ids).astype(jnp.float32)
        prefix = jnp.dot(validf, tril_strict, preferred_element_type=jnp.float32)
        s_pos = count + prefix  # (ROWS, COLS) target slot per lane

        # one-hot insert: slot s of row r receives the column id of the lane
        # whose s_pos == s (unique by construction); all-f32 arithmetic (3D
        # bool intermediates are not lowerable on TPU), reduced over lanes
        hit = jnp.where(
            s_pos[:, None, :] == slot_grid, validf[:, None, :], 0.0
        )  # (ROWS, K, COLS) f32
        slots = slots + (hit * col_ids[:, None, :]).sum(axis=2)
        smask = smask + hit.sum(axis=2)

        new_count = count + validf.sum(axis=1, keepdims=True)
        return slots, smask, new_count

    slots0 = jnp.zeros((_ROWS, k), jnp.float32)
    smask0 = jnp.zeros((_ROWS, k), jnp.float32)
    count0 = jnp.zeros((_ROWS, 1), jnp.float32)
    slots, smask, count = jax.lax.fori_loop(
        0, n_pad // _COLS, body, (slots0, smask0, count0)
    )

    slots_ref[...] = slots
    smask_ref[...] = smask
    count_ref[...] = jnp.broadcast_to(count, (_ROWS, _COLS))


def compact_neighbors_pallas(
    pos,
    batch,
    atom_mask,
    *,
    k: int,
    cutoff_lower: float = 0.0,
    cutoff_upper: float = 5.0,
    interpret: bool = False,
):
    """Fused brute neighbor search returning (idx (N,K) i32, mask, n_neighbors).

    Equivalent to the XLA brute path without self-loops; ascending neighbor
    order.  No PBC (the cell strategy covers periodic systems).
    """
    n = pos.shape[0]
    n_pad = -(-n // _COLS) * _COLS
    f32pos = pos.astype(jnp.float32)
    # pack transposed positions + batch id; pad columns as invalid
    pos_t = jnp.zeros((4, n_pad), jnp.float32)
    pos_t = pos_t.at[:3, :n].set(f32pos.T)
    # padding atoms pushed far away so even d2==0 checks stay clean
    pos_t = pos_t.at[0, n:].set(1e30)
    pos_t = pos_t.at[3, :n].set(batch.astype(jnp.float32))
    pos_t = pos_t.at[3, n:].set(-1.0)
    valid_atom = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(
        atom_mask.astype(jnp.float32)
    )
    row_data = jnp.zeros((n_pad, 8), jnp.float32)
    row_data = row_data.at[:n, :3].set(f32pos)
    row_data = row_data.at[n:, 0].set(1e30)
    row_data = row_data.at[:n, 3].set(batch.astype(jnp.float32))
    row_data = row_data.at[n:, 3].set(-1.0)
    row_data = row_data.at[:n, 4].set(atom_mask.astype(jnp.float32))

    grid = (n_pad // _ROWS,)
    kernel = functools.partial(
        _kernel,
        n_pad=n_pad,
        k=k,
        cutoff_lower=float(cutoff_lower),
        cutoff_upper=float(cutoff_upper),
    )
    slots, smask, count = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_ROWS, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, _COLS), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, _COLS), jnp.float32),
        ],
        interpret=interpret,
    )(pos_t, valid_atom, row_data)

    slots = slots[:n]
    mask = smask[:n] > 0
    idx = slots.astype(jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, k), 0)
    idx = jnp.where(mask, idx, rows)
    n_neighbors = count[:n, 0].astype(jnp.int32)
    return idx, mask, n_neighbors
