"""Edge-partitioned execution context.

When a model runs inside :func:`torchmdnet_tpu.parallel.edge_partition.ring_apply`
(atom rows sharded over a mesh axis, O(N/D) per-device memory), the model code
itself is UNCHANGED — the two primitives all cross-atom data movement flows
through consult this context during tracing:

- ``ops.neighbors.ell_gather``   -> ring-scheduled cross-shard gather
  (``ring_ell_gather``): source chunks travel the ring via ppermute while
  boundary rows are emitted from a precompacted per-owner plan;
- ``ops.segment.segment_reduce`` -> two-stage molecular readout
  (local partial segment reduce + psum over the ring axis).

The scope is set only WHILE TRACING the shard_map body (tracing is
synchronous), so this is not runtime-mutable global state; it is the
mechanism that lets every model/prior/head compose with edge partitioning
without threading a parallelism argument through the whole module tree.
"""

from contextlib import contextmanager
from typing import NamedTuple, Optional

_RING: Optional["RingInfo"] = None


class RingInfo(NamedTuple):
    """Per-shard ring schedule, valid inside one shard_map trace.

    Attributes:
        axis: mesh axis name the atom rows are sharded over.
        n_shards: static ring size D.
        slots: (D, B) int32 — per source-owner, the flat local edge-slot ids
            whose source atom lives on that owner (make_ring_plan).
        valid: (D, B) bool slot validity.
        k_full: static K the slot ids were built for; gathers on the
            self-loop-dropped sublist (K-1 columns) remap them.
    """

    axis: str
    n_shards: int
    slots: object
    valid: object
    k_full: int


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
