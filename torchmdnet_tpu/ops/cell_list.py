"""Cell-list neighbor search: O(N) replacement for the brute O(N^2) strategy.

TPU-native re-design of the reference's CUDA cell strategy
(torchmdnet/neighbors/neighbors_cuda_cell.cuh: label -> sort-by-cell ->
cell-offsets -> 27-cell traversal).  Two implementations:

1. ``neighbor_list_cell`` (default, per-CELL tiles): atoms are binned into a
   dense dynamic grid, sorted by cell key, and given compact cell ranks
   (0..C-1) with a single scan — no atomics, fully deterministic.  A
   direct-mapped table (grid-cell -> rank) makes neighbor-cell lookup ONE
   gather.  Candidates are then enumerated **per cell, not per atom**: each
   cell gathers its 27 neighbor cells' atoms once, and all <=M atoms of the
   cell share that tile.  This cuts the gathered candidate rows by ~the mean
   cell occupancy (~8-12x for protein-density systems) versus the per-atom
   formulation — gathers are row-count-bound on TPU, so this is the dominant
   cost at 30k atoms.  Static shapes: capacity per cell ``cell_capacity``,
   cell count ``max_cells``, grid size ``max_dense_cells``; every overflow is
   detected and reported (reference check_errors, utils.py:251-257).

2. ``neighbor_list_cell_hash`` (fallback): the round-1 hash-bucketed variant
   with no bound on the spatial extent (hash collisions only add candidates
   the distance filter rejects).  Use when the system's extent exceeds
   ``max_dense_cells`` grid cells.

Compaction keeps the k smallest candidate ids per row — deterministic and
identical to the brute strategy's (ascending neighbor index per atom); the
CUDA reference used atomicAdd slot allocation and was order-nondeterministic
(common.cuh:106-116).  On TPU it runs as a Pallas min-extraction kernel
(ops/pallas/select_topk.py) — k VPU passes on VMEM tiles, ~2x faster than
the XLA bitonic sort at cell-tile widths.  Tile enumeration gathers whole
CELLS as single wide rows (two-level row gather) and the distance filter
runs per ATOM on (N, 27M) — no per-slot padding work; with a setup-time
occupancy probe (``suggest_cell_capacity``) the DHFR build is 0.63 ms vs
1.73 ms for the r2 formulation (PERF.md).

PBC: rectangular boxes only (the reference cell strategy has the same
restriction, neighbors_cuda_cell.cuh:14-28); positions are wrapped into the
box before binning and candidate displacements use minimum image.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from torchmdnet_tpu.ops.neighbors import NeighborList

# Standard spatial-hashing primes (Teschner et al. 2003) — hash fallback only.
_P1, _P2, _P3, _P4 = 73856093, 19349663, 83492791, 126271


def _hash_cells(cx, cy, cz, mol, num_buckets):
    h = (
        cx.astype(jnp.int32) * _P1
        ^ cy.astype(jnp.int32) * _P2
        ^ cz.astype(jnp.int32) * _P3
        ^ mol.astype(jnp.int32) * _P4
    )
    return jnp.abs(h) & (num_buckets - 1)


def _compact_topk(key, n, k, loop, atom_mask, use_select_kernel=False):
    """Shared final compaction: per-row ascending top-k of candidate ids.

    key: (N, C) int32, candidate id where valid else n.

    use_select_kernel routes through the Pallas min-extraction kernel
    (ops/pallas/select_topk.py) — bitwise-identical, 2.2x faster than the
    XLA sort at cell-tile widths and k<=64 (k=32: 0.19 vs 0.42 ms at DHFR
    width 648); its k passes cross over the sort around k~80 at VMEM-
    resident widths, so larger k keeps the sort THERE — but once the
    (N, W) key array is HBM-resident the XLA bitonic sort collapses to
    ~27 GB/s (r5 STMV trace: 6.1 ms) while the kernel's VMEM-tile passes
    keep their throughput, so big systems route the kernel at any k
    (k=80 STMV: 5.4 vs 6.1 ms).  The cell strategy enables it (its width
    27*cell_capacity is N-independent), brute (width N) keeps the sort.
    """
    k_eff = min(k, key.shape[1])
    hbm_resident = key.shape[0] * key.shape[1] * 4 > (16 << 20)
    if use_select_kernel and (k_eff <= 64 or hbm_resident):
        from torchmdnet_tpu.ops.pallas.select_topk import select_topk

        idx = select_topk(key, k_eff, n)
    else:
        neg_top, _ = jax.lax.top_k(-key, k_eff)
        idx = -neg_top
    mask = idx < n
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, k_eff), 0)
    idx = jnp.where(mask, idx, rows)
    if k_eff < k:
        pad = k - k_eff
        idx = jnp.concatenate(
            [idx, jnp.repeat(jnp.arange(n, dtype=idx.dtype)[:, None], pad, axis=1)],
            axis=1,
        )
        mask = jnp.concatenate([mask, jnp.zeros((n, pad), bool)], axis=1)
    if loop:
        self_idx = jnp.arange(n, dtype=idx.dtype)[:, None]
        idx = jnp.concatenate([self_idx, idx], axis=1)
        mask = jnp.concatenate([atom_mask[:, None], mask], axis=1)
    return idx.astype(jnp.int32), mask


def _min_image_components(dx, dy, dz, box):
    """Sequential triclinic round-subtract in c, b, a order (rect: per-axis)."""
    b = box
    s = jnp.round(dz / b[2, 2])
    dx, dy, dz = dx - s * b[2, 0], dy - s * b[2, 1], dz - s * b[2, 2]
    s = jnp.round(dy / b[1, 1])
    dx, dy = dx - s * b[1, 0], dy - s * b[1, 1]
    s = jnp.round(dx / b[0, 0])
    dx = dx - s * b[0, 0]
    return dx, dy, dz


@partial(
    jax.jit,
    static_argnames=(
        "k",
        "cutoff_lower",
        "cutoff_upper",
        "loop",
        "use_box",
        "cell_capacity",
        "max_cells",
        "max_dense_cells",
    ),
)
def _neighbor_list_cell_tiles(
    pos,
    batch,
    atom_mask,
    box,
    *,
    k: int,
    cutoff_lower: float,
    cutoff_upper: float,
    loop: bool,
    use_box: bool,
    cell_capacity: int,
    max_cells: int,
    max_dense_cells: int,
):
    n = pos.shape[0]
    f32pos = (
        pos.astype(jnp.float32)
        if pos.dtype in (jnp.float16, jnp.bfloat16)
        else pos
    )
    m = cell_capacity
    c_max = max_cells
    dense = max_dense_cells
    iota_n = jnp.arange(n, dtype=jnp.int32)

    # --- bin atoms into the dynamic grid ------------------------------------
    if use_box:
        diag = jnp.diagonal(box).astype(f32pos.dtype)
        wrapped = f32pos - jnp.floor(f32pos / diag) * diag
        ext = jnp.maximum(jnp.floor(diag / cutoff_upper).astype(jnp.int32), 1)
        cc = jnp.floor(wrapped / cutoff_upper).astype(jnp.int32)
        cc = jnp.clip(cc, 0, ext - 1)  # guard atoms exactly at the edge
    else:
        origin = jnp.min(
            jnp.where(atom_mask[:, None], f32pos, jnp.inf), axis=0, keepdims=True
        )
        cc = jnp.floor((f32pos - origin) / cutoff_upper).astype(jnp.int32)
        cc = jnp.where(atom_mask[:, None], cc, 0)
        ext = jnp.max(cc, axis=0) + 1  # (3,)

    # Grid-capacity check in float (exact far past any usable `dense`); an
    # int32 product could silently wrap for pathological extents.
    total_f = ext[0].astype(jnp.float32) * ext[1] * ext[2]
    grid_overflow = total_f > jnp.float32(dense)

    # dense key = (cx*ey + cy)*ez + cz, clamped in-bounds (results are
    # discarded under grid_overflow anyway — the host raises).
    def dense_key(c0, c1, c2):
        key = (c0 * ext[1] + c1) * ext[2] + c2
        return jnp.clip(key, 0, dense - 1)

    key = dense_key(cc[:, 0], cc[:, 1], cc[:, 2])
    key = jnp.where(atom_mask, key, dense)  # padding atoms sort last

    # --- sort by cell; compact cell ranks + in-cell slots with scans --------
    order = jnp.argsort(key).astype(jnp.int32)  # stable: cell asc, atom asc
    skey = key[order]
    is_first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    first_idx = jax.lax.cummax(jnp.where(is_first, iota_n, -1))
    slot = iota_n - first_idx
    rank = jnp.cumsum(is_first).astype(jnp.int32) - 1
    valid_atom = skey < dense
    c_used = jnp.sum(is_first & valid_atom)
    cap_overflow = jnp.any((slot >= m) & valid_atom)
    rank_overflow = c_used > c_max
    overflow = grid_overflow | cap_overflow | rank_overflow

    # --- cell table (C, M): atom ids, sentinel n ----------------------------
    ok = valid_atom & (rank < c_max) & (slot < m)
    tpos = jnp.where(ok, rank * m + slot, c_max * m)
    table = jnp.full((c_max * m + 1,), n, dtype=jnp.int32)
    table = table.at[tpos].set(order, mode="drop")
    table = table[: c_max * m].reshape(c_max, m)

    # per-cell coords + direct-mapped (grid cell -> rank) lookup table
    rpos = jnp.where(is_first & ok, rank, c_max)
    ccell = (
        jnp.full((c_max + 1, 3), -1, jnp.int32)
        .at[rpos]
        .set(cc[order], mode="drop")[:c_max]
    )
    dense_map = jnp.full((dense + 1,), c_max, jnp.int32)
    dense_map = dense_map.at[jnp.where(is_first & ok, skey, dense)].set(
        rpos, mode="drop"
    )

    # --- 27 neighbor cells per CELL (one gather) -----------------------------
    offs = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-1, 2), jnp.arange(-1, 2), jnp.arange(-1, 2), indexing="ij"
        ),
        axis=-1,
    ).reshape(27, 3).astype(jnp.int32)
    ncc = ccell[:, None, :] + offs[None, :, :]  # (C, 27, 3)
    if use_box:
        ncc = jnp.mod(ncc, ext[None, None, :])
        in_grid = jnp.ones(ncc.shape[:2], bool)
    else:
        in_grid = jnp.all((ncc >= 0) & (ncc < ext[None, None, :]), axis=-1)
    in_grid = in_grid & (ccell[:, None, 0] >= 0)  # unused cells -> all miss
    nkey = jnp.where(
        in_grid, dense_key(ncc[..., 0], ncc[..., 1], ncc[..., 2]), dense
    )
    nrank = dense_map[nkey]  # (C, 27), c_max == miss
    # dedupe wrapped duplicates (boxes with <3 cells per dim)
    nrank = jnp.sort(nrank, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((c_max, 1), bool), nrank[:, 1:] == nrank[:, :-1]], axis=1
    )
    nrank = jnp.where(dup, c_max, nrank)

    # --- candidate tiles: (C, 27M) atom ids, shared by the cell's atoms -----
    table_p = jnp.concatenate([table, jnp.full((1, m), n, jnp.int32)], axis=0)
    cand = table_p[nrank].reshape(c_max, 27 * m)  # (C, 27M)

    # --- candidate field tiles + per-ATOM filter -----------------------------
    # Two formulations, picked by the static tile footprint:
    #
    # AoS (small systems): per-atom fields packed into ONE gathered row
    # (PERF: row gathers are row-count-bound; scalar gathers cost ~4x more
    # per field), folded to (C, M*5) cell rows, expanded by a (C, 27)-row
    # gather, interleave-reshaped to (C, 27M, 5).  Measured best at DHFR
    # scale, where the tiles live in scoped VMEM and the interleave is a
    # cheap lane shuffle (the r4 floor study killed SoA there: 0.836 vs
    # 0.606 ms — five separate tile merges beat one interleave only when
    # the buffers leave VMEM).
    #
    # SoA (large systems): the SAME two-level whole-cell-row structure per
    # FIELD PLANE (x, y, z, meta) — four (C, M) -> (C, 27M) -> (N, 27M)
    # chains with no AoS interleave and no strided component slices.  At
    # STMV the AoS path's (C, 27M, 5) interleave-reshape and its
    # (N, 27M, 5) AoS->SoA relayout copies run HBM-resident at ~50 GB/s
    # (7.4 of 20.3 ms, r5 trace); the planes avoid them entirely.
    # ``meta`` folds batch id + atom validity into one plane: batch id for
    # real atoms, -1 for padded/missing (batch ids are >= 0, so
    # ``ameta == batch`` covers both checks).
    #
    # The boundary: the AoS tile (C, 27M, 5) f32 beyond scoped-VMEM scale.
    soa = c_max * 27 * m * 5 * 4 > (16 << 20)
    bdt = batch.astype(f32pos.dtype)
    atom_rank = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.where(ok, rank, c_max)
    )
    cand_p = jnp.concatenate(
        [cand, jnp.full((1, 27 * m), n, jnp.int32)], axis=0
    )
    acand = cand_p[atom_rank]  # (N, 27M)
    if soa:
        meta = jnp.where(atom_mask, bdt, -1.0)  # (N,)
        aplanes = []
        for field, pad in (
            (f32pos[:, 0], 0.0),
            (f32pos[:, 1], 0.0),
            (f32pos[:, 2], 0.0),
            (meta, -1.0),
        ):
            fp = jnp.concatenate(
                [field, jnp.asarray([pad], f32pos.dtype)]
            )  # (N+1,)
            cells = fp[table]  # (C, M)
            cells = jnp.concatenate(
                [cells, jnp.full((1, m), pad, f32pos.dtype)], axis=0
            )
            tile = cells[nrank].reshape(c_max, 27 * m)  # (C, 27M)
            tile = jnp.concatenate(
                [tile, jnp.full((1, 27 * m), pad, f32pos.dtype)], axis=0
            )
            aplanes.append(tile[atom_rank])  # (N, 27M)
        ax, ay, az, ameta = aplanes
        dx = ax - f32pos[:, None, 0]
        dy = ay - f32pos[:, None, 1]
        dz = az - f32pos[:, None, 2]
        if use_box:
            dx, dy, dz = _min_image_components(
                dx, dy, dz, box.astype(f32pos.dtype)
            )
        d2 = dx * dx + dy * dy + dz * dz
        valid = (
            (acand < n)
            & (ameta == bdt[:, None])
            & (acand != iota_n[:, None])
            & atom_mask[:, None]
            & (d2 < cutoff_upper * cutoff_upper)
            & (d2 >= cutoff_lower * cutoff_lower)
        )
    else:
        packed = jnp.concatenate(
            [f32pos, bdt[:, None], atom_mask.astype(f32pos.dtype)[:, None]],
            axis=1,
        )  # (N, 5)
        packed = jnp.concatenate(
            [packed, jnp.asarray([[0.0, 0.0, 0.0, -1.0, 0.0]], f32pos.dtype)],
            axis=0,
        )
        packed_cells = packed[table].reshape(c_max, m * 5)  # (C, M*5)
        packed_cells = jnp.concatenate(
            [
                packed_cells,
                jnp.tile(
                    jnp.asarray([[0.0, 0.0, 0.0, -1.0, 0.0]], f32pos.dtype),
                    (1, m),
                ),
            ],
            axis=0,
        )  # + pad row for nrank == c_max misses
        pj = packed_cells[nrank].reshape(c_max, 27 * m, 5)  # (C, 27M, 5)

        # The filter used to run on the full (C, M, 27M) slot grid, but only
        # N of the C*M slots hold real atoms (25-40% at default capacities) —
        # the rest was wasted VPU/HBM work.  Instead each atom row-gathers
        # its cell's tile (wide rows are byte-bound, ~roofline) and the
        # filter runs on exactly (N, 27M).
        pj_p = jnp.concatenate(
            [pj, jnp.zeros((1, 27 * m, 5), f32pos.dtype)], axis=0
        )
        apj = pj_p[atom_rank]  # (N, 27M, 5)

        dx = apj[..., 0] - f32pos[:, None, 0]
        dy = apj[..., 1] - f32pos[:, None, 1]
        dz = apj[..., 2] - f32pos[:, None, 2]
        if use_box:
            dx, dy, dz = _min_image_components(
                dx, dy, dz, box.astype(f32pos.dtype)
            )
        d2 = dx * dx + dy * dy + dz * dz
        valid = (
            (acand < n)
            & (apj[..., 4] > 0)
            & (apj[..., 3] == bdt[:, None])
            & (acand != iota_n[:, None])
            & atom_mask[:, None]
            & (d2 < cutoff_upper * cutoff_upper)
            & (d2 >= cutoff_lower * cutoff_lower)
        )
    n_neighbors = jnp.sum(valid, axis=1).astype(jnp.int32)
    akeys = jnp.where(valid, acand, n)  # (N, 27M)

    idx, mask = _compact_topk(akeys, n, k, loop, atom_mask, use_select_kernel=True)
    return idx, mask, n_neighbors, overflow


@partial(
    jax.jit,
    static_argnames=(
        "k",
        "cutoff_lower",
        "cutoff_upper",
        "loop",
        "use_box",
        "cell_capacity",
        "num_buckets",
    ),
)
def _neighbor_list_cell_hash(
    pos,
    batch,
    atom_mask,
    box,
    *,
    k: int,
    cutoff_lower: float,
    cutoff_upper: float,
    loop: bool,
    use_box: bool,
    cell_capacity: int,
    num_buckets: int,
):
    n = pos.shape[0]
    f32pos = (
        pos.astype(jnp.float32)
        if pos.dtype in (jnp.float16, jnp.bfloat16)
        else pos
    )
    m = cell_capacity
    c_buckets = num_buckets

    if use_box:
        diag = jnp.diagonal(box).astype(f32pos.dtype)
        wrapped = f32pos - jnp.floor(f32pos / diag) * diag
        ncells = jnp.maximum(jnp.floor(diag / cutoff_upper).astype(jnp.int32), 1)
        cc = jnp.floor(wrapped / cutoff_upper).astype(jnp.int32)
        cc = jnp.minimum(cc, ncells - 1)  # guard atoms exactly at the edge
    else:
        origin = jnp.min(
            jnp.where(atom_mask[:, None], f32pos, jnp.inf), axis=0, keepdims=True
        )
        cc = jnp.floor((f32pos - origin) / cutoff_upper).astype(jnp.int32)
        ncells = None

    h_atom = _hash_cells(cc[:, 0], cc[:, 1], cc[:, 2], batch, c_buckets)
    h_atom = jnp.where(atom_mask, h_atom, c_buckets)  # padding -> dropped

    # --- build bucket table (C, M) via sort + rank + deterministic scatter ---
    order = jnp.argsort(h_atom)  # stable: ascending bucket, ascending atom id
    sorted_h = h_atom[order]
    first_of_bucket = jnp.searchsorted(sorted_h, sorted_h, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first_of_bucket.astype(jnp.int32)
    bucket_overflow = jnp.any((rank >= m) & (sorted_h < c_buckets))
    flat = jnp.where(
        (rank < m) & (sorted_h < c_buckets), sorted_h * m + rank, c_buckets * m
    )
    table = jnp.full((c_buckets * m,), n, dtype=jnp.int32)
    table = table.at[flat].set(order.astype(jnp.int32), mode="drop")
    table = table.reshape(c_buckets, m)

    # --- candidate enumeration: 27 neighbor cells per atom -------------------
    offs = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-1, 2), jnp.arange(-1, 2), jnp.arange(-1, 2), indexing="ij"
        ),
        axis=-1,
    ).reshape(27, 3)
    ncc = cc[:, None, :] + offs[None, :, :]  # (N, 27, 3)
    if use_box:
        ncc = jnp.mod(ncc, ncells[None, None, :])
    hb = _hash_cells(ncc[..., 0], ncc[..., 1], ncc[..., 2], batch[:, None], c_buckets)
    # dedupe buckets that collide among the 27 (sort + mask equal-adjacent)
    hb = jnp.sort(hb, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((n, 1), bool), hb[:, 1:] == hb[:, :-1]], axis=1
    )
    cand = table[hb]  # (N, 27, M)
    cand = jnp.where(dup[:, :, None], n, cand).reshape(n, 27 * m)

    # --- distance filter over candidates ------------------------------------
    # Pack positions + molecule id + validity into ONE gathered row: narrow
    # scalar gathers cost ~4x a row gather on TPU, and we need all five
    # fields per candidate anyway.
    packed = jnp.concatenate(
        [
            f32pos,
            batch.astype(f32pos.dtype)[:, None],
            atom_mask.astype(f32pos.dtype)[:, None],
        ],
        axis=1,
    )  # (N, 5)
    packed = jnp.concatenate(
        [packed, jnp.asarray([[0.0, 0.0, 0.0, -1.0, 0.0]], f32pos.dtype)], axis=0
    )
    pj = packed[cand]  # (N, 27M, 5)
    cand_batch = pj[..., 3]
    cand_valid_atom = pj[..., 4] > 0
    dx = pj[..., 0] - f32pos[:, None, 0]
    dy = pj[..., 1] - f32pos[:, None, 1]
    dz = pj[..., 2] - f32pos[:, None, 2]
    if use_box:
        dx, dy, dz = _min_image_components(dx, dy, dz, box.astype(f32pos.dtype))
    d2 = dx * dx + dy * dy + dz * dz
    valid = (
        (cand < n)
        & cand_valid_atom
        & (cand_batch == batch.astype(f32pos.dtype)[:, None])
        & (cand != jnp.arange(n, dtype=cand.dtype)[:, None])
        & (d2 < cutoff_upper * cutoff_upper)
        & (d2 >= cutoff_lower * cutoff_lower)
        & atom_mask[:, None]
    )
    n_neighbors = jnp.sum(valid, axis=1).astype(jnp.int32)

    key = jnp.where(valid, cand, n)
    idx, mask = _compact_topk(key, n, k, loop, atom_mask, use_select_kernel=True)
    return idx, mask, n_neighbors, bucket_overflow


def wants_cell_probe(num_atoms, num_mol=1) -> bool:
    """The ONE large-molecule gate for the setup-time occupancy probe.

    The cell strategy (and therefore the probe) pays off when the batch holds
    large molecules: >= 2048 atoms total and >= 512 atoms per molecule (below
    that, brute's O(N^2) tiles are cheaper than cell setup and the default
    capacity is harmless).  Trainer.fit, OptimizedPotential, md.Simulation
    and the training benchmark all call THIS predicate — keep the heuristic
    here, next to ``suggest_cell_capacity``, so it cannot drift between call
    sites.
    """
    num_atoms = int(num_atoms)
    return num_atoms >= 2048 and num_atoms / max(1, int(num_mol)) >= 512


def suggest_cell_capacity(
    pos,
    atom_mask=None,
    *,
    cutoff_upper: float,
    box=None,
    headroom: float = 1.1,
    floor: int = 8,
) -> int:
    """Setup-time probe: tight static ``cell_capacity`` for these positions.

    The cell-tile costs (candidate gather, distance filter, selection) all
    scale with 27*cell_capacity, and the safe default (32) is ~50% padding at
    protein density (max occupancy ~21 for DHFR).  Call once with CONCRETE
    positions (setup / first batch — NumPy math, no device traffic) and pass
    the result to the cell strategy; occupancy overflow stays loudly
    detected, so a probe invalidated by large density drift fails the build
    instead of truncating.

    Args:
        headroom: multiplicative margin over the observed max occupancy
            (MD: atoms drift between rebuilds; 1.0 is exact for static
            benchmarking).
    """
    import numpy as np

    # Bin in the SAME dtype the build will use (_neighbor_list_cell_tiles
    # keeps f64 inputs in f64, everything else runs f32): a higher-precision
    # probe can bin an edge atom into a different cell than the build does.
    p = np.asarray(pos)
    if p.dtype != np.float64:
        p = p.astype(np.float32)
    if atom_mask is not None:
        p = p[np.asarray(atom_mask)]
    cut = p.dtype.type(cutoff_upper)
    if box is not None:
        # Mirror the build's box branch exactly: the grid has
        # ext = floor(diag/cutoff) cells per dim (clamped >= 1) and clips
        # cell coords into [0, ext-1], merging the boundary remainder slab
        # (width diag - ext*cutoff, up to ~1 cell) into the LAST cell of each
        # dim — those cells hold up to ~2x (8x in the corner) the atoms of a
        # width-cutoff cell, so an unclipped probe under-provisions and the
        # first build raises cell_overflow spuriously.
        diag = np.diagonal(np.asarray(box)).astype(p.dtype)
        p = p - np.floor(p / diag) * diag
        ext = np.maximum(np.floor(diag / cut).astype(np.int64), 1)
        cc = np.clip(np.floor(p / cut).astype(np.int64), 0, ext - 1)
    else:
        p = p - p.min(axis=0)
        cc = np.floor(p / cut).astype(np.int64)
        ext = cc.max(axis=0) + 1
    key = (cc[:, 0] * ext[1] + cc[:, 1]) * ext[2] + cc[:, 2]
    occ = int(np.bincount(key).max()) if key.size else 1
    return max(int(floor), int(np.ceil(occ * float(headroom))))


def suggest_max_cells(
    pos,
    atom_mask=None,
    *,
    cutoff_upper: float,
    box=None,
    headroom: float = 1.2,
) -> int:
    """Setup-time probe: tight static ``max_cells`` for these positions.

    The strategy default (N//8) assumes mean occupancy >= 8, which sparse or
    hollow systems (solvated capsids, low-density shells — STMV measures
    6.7 atoms/cell at cutoff 5) violate, tripping rank_overflow.  Same
    binning as :func:`suggest_cell_capacity`; returns the OCCUPIED cell
    count with drift headroom (rounded like the strategy, multiples of 8).
    """
    import numpy as np

    p = np.asarray(pos)
    if p.dtype != np.float64:
        p = p.astype(np.float32)
    if atom_mask is not None:
        p = p[np.asarray(atom_mask)]
    cut = p.dtype.type(cutoff_upper)
    if box is not None:
        diag = np.diagonal(np.asarray(box)).astype(p.dtype)
        p = p - np.floor(p / diag) * diag
        ext = np.maximum(np.floor(diag / cut).astype(np.int64), 1)
        cc = np.clip(np.floor(p / cut).astype(np.int64), 0, ext - 1)
    else:
        p = p - p.min(axis=0)
        cc = np.floor(p / cut).astype(np.int64)
        ext = cc.max(axis=0) + 1
    key = (cc[:, 0] * ext[1] + cc[:, 1]) * ext[2] + cc[:, 2]
    occupied = int(np.unique(key).size) if key.size else 1
    return -(-max(256, int(np.ceil(occupied * float(headroom)))) // 8) * 8


def neighbor_list_cell(
    pos,
    batch=None,
    atom_mask=None,
    *,
    k: int,
    cutoff_lower: float = 0.0,
    cutoff_upper: float = 5.0,
    loop: bool = False,
    box: Optional[jnp.ndarray] = None,
    cell_capacity: int = 32,
    max_cells: Optional[int] = None,
    max_dense_cells: int = 1 << 18,
    hash_strategy: bool = False,
    num_buckets: Optional[int] = None,
) -> NeighborList:
    """Cell-list neighbor search with the same semantics as neighbor_list.

    Args:
        cell_capacity: static max atoms per grid cell; overflow is reported
            via ``NeighborList.cell_overflow`` (check on host like the
            reference's check_errors, utils.py:251-257).
        max_cells: static max *occupied* cells (default max(256, N//8),
            rounded up to a multiple of 8 — i.e. assumes mean occupancy >= 8,
            true for condensed-phase systems where the cell strategy wins;
            sparse systems should raise it or use brute/hash).  The per-cell
            candidate-gather cost scales with this: at 30k atoms, N//8 is
            ~17 ms vs ~37 ms at N//4 (PERF.md).
        max_dense_cells: static size of the direct-mapped grid->rank table;
            the system's bounding grid (prod of cells per dim) must fit.
        hash_strategy: use the extent-unbounded hash-bucket fallback.
        num_buckets: hash fallback only; static table size (power of two),
            default the smallest power of two >= 4N.
    """
    n = pos.shape[0]
    if batch is None:
        batch = jnp.zeros((n,), dtype=jnp.int32)
    if atom_mask is None:
        atom_mask = jnp.ones((n,), dtype=bool)
    use_box = box is not None
    if box is None:
        box = jnp.eye(3, dtype=pos.dtype)
    if hash_strategy:
        if num_buckets is None:
            num_buckets = 1 << max(4, (4 * n - 1).bit_length())
        idx, mask, n_neighbors, overflow = _neighbor_list_cell_hash(
            pos,
            batch,
            atom_mask,
            box,
            k=int(k),
            cutoff_lower=float(cutoff_lower),
            cutoff_upper=float(cutoff_upper),
            loop=bool(loop),
            use_box=use_box,
            cell_capacity=int(cell_capacity),
            num_buckets=int(num_buckets),
        )
    else:
        if max_cells is None:
            max_cells = max(256, -(-n // 8))
        max_cells = -(-int(max_cells) // 8) * 8
        idx, mask, n_neighbors, overflow = _neighbor_list_cell_tiles(
            pos,
            batch,
            atom_mask,
            box,
            k=int(k),
            cutoff_lower=float(cutoff_lower),
            cutoff_upper=float(cutoff_upper),
            loop=bool(loop),
            use_box=use_box,
            cell_capacity=int(cell_capacity),
            max_cells=int(max_cells),
            max_dense_cells=int(max_dense_cells),
        )
    return NeighborList(
        idx=idx,
        mask=mask,
        n_neighbors=n_neighbors,
        self_loops=loop,
        cell_overflow=overflow,
    )
