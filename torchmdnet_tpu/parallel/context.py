"""Edge-partitioned execution context.

When a model runs inside :func:`torchmdnet_tpu.parallel.edge_partition.ring_apply`
(atom rows sharded over a mesh axis, O(N/D) per-device memory), the model code
itself is UNCHANGED — the primitives all cross-atom data movement flows
through consult this context during tracing:

- ``ops.neighbors.ell_gather``   -> ring-scheduled cross-shard gather
  (``ring_ell_gather``): source chunks travel the ring via ppermute while
  boundary rows are emitted from a precompacted per-owner plan;
- ``ops.segment.segment_reduce`` -> two-stage molecular readout
  (local partial segment reduce + psum over the ring axis);
- ``ops.neighbors.neighbor_list`` -> returns the matching PREBUILT global
  list (sharded rows, global ids) from :attr:`RingInfo.prior_lists` — pair
  priors (ZBL/D2/Coulomb) build their internal lists through this hook, so
  they run unmodified under ring partitioning (their list is built globally
  outside the shard_map, like the model's).

The scope is set only WHILE TRACING the shard_map body (tracing is
synchronous), so this is not runtime-mutable global state; it is the
mechanism that lets every model/prior/head compose with edge partitioning
without threading a parallelism argument through the whole module tree.
"""

from contextlib import contextmanager
from typing import NamedTuple, Optional, Tuple

_RING: Optional["RingInfo"] = None


class RingListEntry(NamedTuple):
    """One prebuilt neighbor list + its ring plan, local to this shard.

    ``sig`` is the static build signature (k, cutoff_lower, cutoff_upper,
    loop) the owning prior called ``neighbor_list`` with; ``idx``/``mask``/
    ``n_neighbors`` are this shard's rows carrying GLOBAL atom ids; ``slots``/
    ``valid`` the per-owner boundary schedule (make_ring_plan) for this list.
    """

    sig: tuple
    idx: object
    mask: object
    n_neighbors: object
    slots: object
    valid: object


class RingInfo(NamedTuple):
    """Per-shard ring schedule, valid inside one shard_map trace.

    Attributes:
        axis: mesh axis name the atom rows are sharded over.
        n_shards: static ring size D.
        slots: (D, B) int32 — per source-owner, the flat local edge-slot ids
            whose source atom lives on that owner (make_ring_plan) for the
            MODEL's neighbor list.
        valid: (D, B) bool slot validity.
        k_full: static K the slot ids were built for; gathers on the
            self-loop-dropped sublist (K-1 columns) remap them.
        prior_lists: RingListEntry per pair-prior internal list, matched by
            object identity of the idx array (ell_gather) or by build
            signature (the neighbor_list hook).
    """

    axis: str
    n_shards: int
    slots: object
    valid: object
    k_full: int
    prior_lists: Tuple[RingListEntry, ...] = ()

    def match_gather(self, idx):
        """The (slots, valid, k_full) plan for a gather on ``idx``: a prior's
        own plan when idx IS that prior's injected idx array, else the
        model-list plan (remapped by the caller for self-loop drops)."""
        for entry in self.prior_lists:
            if idx is entry.idx:
                return entry.slots, entry.valid, entry.idx.shape[1]
        return self.slots, self.valid, self.k_full

    def match_build(self, sig):
        for entry in self.prior_lists:
            if entry.sig == sig:
                return entry
        return None


def ring_info() -> Optional[RingInfo]:
    return _RING


@contextmanager
def ring_scope(info: RingInfo):
    global _RING
    prev, _RING = _RING, info
    try:
        yield
    finally:
        _RING = prev
