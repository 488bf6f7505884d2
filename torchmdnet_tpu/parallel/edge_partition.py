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
  the collective schedule XLA should (and does) produce, used by tests and as
  the seed for a future Pallas ring variant that overlaps the all-gather with
  local aggregation.
"""

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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
    from jax.experimental.shard_map import shard_map

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


def two_stage_molecular_reduce(per_atom, batch_ids, num_mol: int, mesh: Mesh, axis: str = "dp"):
    """Edge-partitioned readout: local partial segment-sum + psum.

    The shard_map analog of the reference's DDP loss reduction, but over the
    molecule axis of a single sharded batch: each shard reduces its local
    atoms into a full (num_mol,) vector of partials, then a psum over ICI
    combines them.
    """
    from jax.experimental.shard_map import shard_map

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
