"""Multi-host (multi-process) execution.

The reference trains multi-node out of the box via Lightning DDP with an
env-var rendezvous — NODE_RANK / MASTER_ADDR / MASTER_PORT plus --num-nodes
(reference scripts/train.py:176-180, README.md:64-86).  The TPU-native
equivalent is one Python process per host:

1. :func:`initialize_distributed` calls ``jax.distributed.initialize`` from
   the same env vars, after which ``jax.devices()`` spans every host and a
   Mesh built over it rides ICI within a slice / DCN across slices;
2. each host's loader reads only its slice of every global batch
   (``PaddedLoader(process_rank=..., process_count=...)``) — the analog of
   DDP's DistributedSampler;
3. :func:`global_batch_from_local` assembles the per-host shards into global
   jax Arrays laid out on the mesh, so one jitted train step runs SPMD on
   every host with XLA inserting the gradient psums DDP's allreduce performed.

Unlike the reference (which hard-fails on heterogeneous nodes,
README.md:84-86), process/device counts are validated loudly here.
"""

import os
from typing import Optional

import numpy as np


def initialize_distributed(num_nodes: int = 1, *, coordinator: Optional[str] = None,
                           port: Optional[str] = None, rank: Optional[int] = None):
    """Call ``jax.distributed.initialize`` using reference-style env vars.

    No-op for single-node runs (num_nodes <= 1 and no MASTER_ADDR set), so
    the CLI path is identical on one host.  Env vars (reference
    README.md:70-81):

    - ``MASTER_ADDR`` / ``MASTER_PORT``: coordinator host/port (required on
      every node when num_nodes > 1);
    - ``NODE_RANK``: this process's rank in [0, num_nodes).

    Explicit keyword arguments override the env vars (used by tests).
    Returns (process_index, process_count).
    """
    import jax

    addr = coordinator or os.environ.get("MASTER_ADDR")
    if num_nodes <= 1 and addr is None:
        return 0, 1
    if addr is None:
        raise ValueError(
            "--num-nodes > 1 requires MASTER_ADDR (and usually MASTER_PORT/"
            "NODE_RANK) in the environment, like the reference's DDP launch."
        )
    port = port or os.environ.get("MASTER_PORT", "12355")
    rank = int(os.environ.get("NODE_RANK", "0") if rank is None else rank)
    jax.distributed.initialize(
        coordinator_address=f"{addr}:{port}",
        num_processes=int(num_nodes),
        process_id=rank,
    )
    return jax.process_index(), jax.process_count()


def process_info():
    """(process_index, process_count); (0, 1) when not distributed."""
    import jax

    return jax.process_index(), jax.process_count()


def global_batch_from_local(batch, mesh, axis: str = "dp"):
    """Assemble a global, mesh-sharded batch from this process's local shard.

    Every array leaf is laid out row-sharded over ``axis`` (atom- and
    molecule-indexed arrays alike, matching the single-process GSPMD path);
    each process contributes the rows its loader produced
    (``jax.make_array_from_process_local_data``).  Global row counts are
    local rows x process_count, so loader capacities must divide evenly —
    DataModule rounds them to a multiple of the device count.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(leaf):
        if leaf is None or not hasattr(leaf, "ndim"):
            return leaf
        arr = np.asarray(leaf)
        if arr.ndim == 0:
            return jax.device_put(arr, NamedSharding(mesh, P()))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(axis)), arr
        )

    return jax.tree_util.tree_map(put, batch)


def global_from_host_identical(tree, mesh, axis: str = "dp", n_rows=None):
    """Row-shard HOST-IDENTICAL arrays over a (possibly multi-process) mesh.

    Edge-partitioned training loads the SAME full batch on every process
    (one large molecule; sample-sharding it like DP would be wrong), then
    shards its ATOM rows over the mesh.  ``jax.device_put`` cannot place a
    host-local array on a sharding spanning other processes' devices, so
    each leaf is assembled via ``jax.make_array_from_callback`` — every
    process serves exactly the row slices its local devices own, which is
    valid because the host arrays are bitwise identical (same loader, same
    seed, deterministic spatial_sort).

    Layout matches :func:`edge_partition.shard_batch_by_atoms`: arrays whose
    leading dim holds the sharded rows get P(axis), everything else
    (molecule-indexed arrays, scalars) is replicated.  ``n_rows`` is the
    sharded row count — for an AtomicBatch it defaults to ``batch.num_atoms``;
    pass it explicitly for bare array trees (None shards every ndim>=1 leaf).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if n_rows is None and hasattr(tree, "num_atoms"):
        n_rows = int(tree.num_atoms)
    row_sharding = NamedSharding(mesh, P(axis))
    rep_sharding = NamedSharding(mesh, P())

    def put(leaf):
        if leaf is None or not hasattr(leaf, "ndim"):
            return leaf
        arr = np.asarray(leaf)
        shard_rows = arr.ndim >= 1 and (n_rows is None or arr.shape[0] == n_rows)
        sharding = row_sharding if shard_rows else rep_sharding
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    return jax.tree_util.tree_map(put, tree)


def replicate_to_mesh(tree, mesh):
    """Replicate a (host-identical) pytree onto every device of the mesh.

    Multi-process jit requires every input to be a global Array; parameters
    and optimizer state are identical on all hosts (same seeded init), so a
    replicated device_put is valid and XLA keeps them in sync thereafter.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())

    def put(leaf):
        if leaf is None or not hasattr(leaf, "ndim"):
            return leaf
        return jax.device_put(leaf, sharding)

    return jax.tree_util.tree_map(put, tree)


def barrier(name: str = "barrier"):
    """Block until every process reaches this point (checkpoint hand-off)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
