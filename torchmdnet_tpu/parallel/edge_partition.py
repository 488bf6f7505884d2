"""Edge-partitioned execution of large molecular graphs across devices.

The scaling axis the reference never had (SURVEY.md section 5, long-context
analog): shard the padded ELL edge list of a (batched) graph across chips and
combine partial aggregates over ICI.

With the ELL layout, partitioning the ATOM axis partitions the edges with it:
device d owns rows [d*N/D, (d+1)*N/D) of idx/mask — every edge whose RECEIVER
lives on d.  One message-passing layer is then:

    1. all-gather the (N_local, H) source features over the 'edge' axis
       (boundary atom exchange; rides ICI),
    2. local dense gather + edge math + masked sum over K (no communication:
       each edge's receiver is local),
    3. partial per-molecule reductions psum'd at the readout.

Two implementations are provided:

- the GSPMD path (:func:`shard_batch_by_atoms` + a jitted model call): XLA
  inserts exactly the collectives above from sharding annotations — this is
  the production path, composes with data parallelism and works for every
  model in the framework;
- an explicit shard_map reference (:func:`sharded_gather_aggregate`) showing
  the collective schedule XLA should (and does) produce, used by tests;
- a ring-scheduled variant (:func:`make_ring_plan` +
  :func:`ring_gather_aggregate`) that never materializes the full (N, H)
  feature table on any device: source features travel the ring chunk by
  chunk via ``ppermute`` while each hop's boundary messages are computed
  from a precompacted per-owner edge schedule, so ICI transfers overlap
  with local compute and per-device memory stays O(N/D).
"""

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from torchmdnet_tpu.data.batch import AtomicBatch


def shard_batch_by_atoms(batch: AtomicBatch, mesh: Mesh, axis: str = "dp"):
    """Place the atom-indexed arrays of a batch on an atom-sharded layout.

    Requires the padded atom count to be divisible by the mesh axis size
    (PaddedLoader capacities are rounded to multiples of 8; pass
    ``num_atoms_pad`` divisible by the axis when building loaders for
    sharded execution).
    """
    n_shards = mesh.shape[axis]
    n = batch.num_atoms
    assert n % n_shards == 0, (
        f"padded atom count {n} must divide over {n_shards} shards"
    )

    def put(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == n:
            return jax.device_put(leaf, NamedSharding(mesh, P(axis)))
        if hasattr(leaf, "ndim"):
            return jax.device_put(leaf, NamedSharding(mesh, P()))
        return leaf

    return jax.tree_util.tree_map(put, batch)


def edge_sharded_apply(model, params, batch: AtomicBatch, mesh: Mesh, axis: str = "dp"):
    """Energy+forces of one (large) batch with atoms sharded over ``axis``.

    The reduction over molecules and the force scatter stay correct because
    molecule ids are global; XLA turns the cross-shard feature gathers into
    all-gathers and the segment sums into psums over ICI.
    """
    sharded = shard_batch_by_atoms(batch, mesh, axis)
    with mesh:
        fn = jax.jit(lambda p, b: model.apply(p, b))
        return fn(params, sharded)


def sharded_gather_aggregate(x, idx, mask, w, mesh: Mesh, axis: str = "dp"):
    """Explicit shard_map reference of one edge-partitioned aggregation:

        out[i] = sum_k mask[i, k] * x[idx[i, k]] * w[i, k]

    with rows (receivers) sharded over ``axis``.  Inside the shard:
    all_gather(x) -> local gather -> masked weighted sum.  Must equal the
    single-device computation bit-for-bit up to float addition order.

    Args:
        x: (N, H) source features, sharded on rows.
        idx: (N, K) int32 global neighbor ids, sharded on rows.
        mask: (N, K) bool, sharded on rows.
        w: (N, K) edge weights, sharded on rows.
    """
    def local(x_local, idx_local, mask_local, w_local):
        x_full = jax.lax.all_gather(x_local, axis, tiled=True)  # (N, H)
        msg = x_full[idx_local] * w_local[..., None]
        msg = jnp.where(mask_local[..., None], msg, 0.0)
        return msg.sum(axis=1)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )(x, idx, mask, w)


def make_ring_plan(idx, mask, mesh: Mesh, axis: str = "dp", boundary_capacity: int = 256):
    """Precompute each shard's boundary-edge schedule for :func:`ring_gather_aggregate`.

    With atoms (receivers) block-sharded over ``axis``, an edge is *internal*
    when its source lives on the same shard as its receiver and *boundary*
    otherwise.  Spatially sorted neighbor lists (the cell-list strategy sorts
    atoms by cell) make boundary edges a surface term — a small fraction of
    the N*K slots — so they compact into a fixed ``(D, boundary_capacity)``
    table grouped by source owner.  The plan depends only on the neighbor
    list, so it is built once per neighbor rebuild and reused across layers
    and MD steps.

    Args:
        idx: (N, K) int32 global source ids, row-sharded over ``axis``.
        mask: (N, K) bool edge validity, row-sharded.
        boundary_capacity: max boundary slots per (shard, source-owner) pair.

    Returns:
        (plan_slots, plan_valid, n_dropped): per-shard (D, B) slot ids into
        the flattened local (N_local*K,) edge arrays, their validity, and the
        per-shard count of boundary edges that did not fit (0 == exact; the
        caller must treat any nonzero as a capacity error, mirroring the
        neighbor-list overflow contract of ops/neighbors.py).
    """
    n_shards = mesh.shape[axis]
    n_local = idx.shape[0] // n_shards
    k = idx.shape[1]
    m = n_local * k
    b = boundary_capacity

    def local(idx_l, mask_l):
        me = jax.lax.axis_index(axis)
        flat_idx = idx_l.reshape(-1)
        owner = flat_idx // n_local
        boundary = mask_l.reshape(-1) & (owner != me)
        # stable group-by-owner: one argsort, then fixed-capacity windows
        key = jnp.where(boundary, owner, n_shards).astype(jnp.int32)
        order = jnp.argsort(key, stable=True).astype(jnp.int32)
        counts = jnp.bincount(key, length=n_shards + 1)[:n_shards]
        starts = jnp.concatenate(
            [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]]
        )
        pos = starts[:, None] + jnp.arange(b, dtype=counts.dtype)[None, :]
        valid = jnp.arange(b)[None, :] < jnp.minimum(counts, b)[:, None]
        slots = order[jnp.clip(pos, 0, m - 1)]
        slots = jnp.where(valid, slots, 0)
        n_dropped = jnp.maximum(counts - b, 0).sum()[None]
        return slots, valid, n_dropped

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
    )(idx, mask)


def ring_gather_aggregate(
    x, idx, mask, w, plan, mesh: Mesh, axis: str = "dp"
):
    """Ring-scheduled edge-partitioned aggregation:

        out[i] = sum_k mask[i, k] * x[idx[i, k]] * w[i, k]

    equal to :func:`sharded_gather_aggregate` (up to float addition order)
    but with O(N/D) per-device memory and comm/compute overlap instead of a
    full all-gather:

        hop 0:  compute all INTERNAL edges from the resident chunk (the bulk
                of the work at cell-list locality) while ``ppermute`` ships
                the chunk to the next shard over ICI;
        hop t:  compute the compacted boundary messages sourced from the
                chunk that just arrived (plan row ``(me - t) mod D``) while
                the next ``ppermute`` is already in flight.

    Each hop's collective and compute are data-independent, so XLA's async
    collective-permute overlaps them; total bytes moved equal the all-gather
    (D-1 chunk hops) but peak memory never exceeds two chunks.

    Args:
        plan: output of :func:`make_ring_plan` on the same (idx, mask).
    """
    plan_slots, plan_valid, _ = plan
    n_shards = mesh.shape[axis]
    n_local = idx.shape[0] // n_shards
    k = idx.shape[1]
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def local(x_l, idx_l, mask_l, w_l, slots, valid):
        me = jax.lax.axis_index(axis)
        lo = me * n_local
        internal = mask_l & (idx_l // n_local == me)
        li = jnp.where(internal, idx_l - lo, 0)
        acc = jnp.where(
            internal[..., None], x_l[li] * w_l[..., None], 0.0
        ).sum(axis=1)

        flat_idx = idx_l.reshape(-1)
        flat_w = w_l.reshape(-1)
        chunk = x_l
        for t in range(1, n_shards):
            chunk = jax.lax.ppermute(chunk, axis, perm)
            o = jnp.mod(me - t, n_shards)
            s = slots[o]
            v = valid[o]
            src = flat_idx[s] - o * n_local
            msg = chunk[jnp.clip(src, 0, n_local - 1)] * flat_w[s][:, None]
            msg = jnp.where(v[:, None], msg, 0.0)
            acc = acc + jax.ops.segment_sum(msg, s // k, num_segments=n_local)
        return acc

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )(x, idx, mask, w, plan_slots, plan_valid)


def two_stage_molecular_reduce(per_atom, batch_ids, num_mol: int, mesh: Mesh, axis: str = "dp"):
    """Edge-partitioned readout: local partial segment-sum + psum.

    The shard_map analog of the reference's DDP loss reduction, but over the
    molecule axis of a single sharded batch: each shard reduces its local
    atoms into a full (num_mol,) vector of partials, then a psum over ICI
    combines them.
    """
    def local(per_atom_local, ids_local):
        partial_sums = jax.ops.segment_sum(
            per_atom_local, ids_local, num_segments=num_mol + 1
        )
        return jax.lax.psum(partial_sums, axis)[:num_mol]

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
    )(per_atom, batch_ids)
