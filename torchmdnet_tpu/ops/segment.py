"""Segment (per-molecule) reductions.

Replaces the reference's torch_scatter.scatter reduce over the batch vector
(output_modules.py:27-43).  Segment ids are static-capacity: padding atoms
carry id == num_segments - 1 (a trash row the caller slices off) or any id in
range; the reduction itself is dense and deterministic.
"""

import jax
import jax.numpy as jnp


def segment_reduce(x, segment_ids, num_segments: int, op: str = "sum"):
    """Reduce per-atom values into per-segment (per-molecule) values.

    Args:
        x: (N, ...) per-atom values.
        segment_ids: (N,) int32 in [0, num_segments).
        num_segments: static segment capacity.
        op: 'sum' | 'add' | 'mean' | 'max'.

    Under ring edge-partitioning (parallel/context.py) x holds only this
    shard's atoms (ids stay global): the reduction becomes a local partial
    reduce + psum/pmax over the ring axis, replicated on every shard.
    """
    from torchmdnet_tpu.parallel.context import ring_info

    info = ring_info()
    if info is not None:
        from torchmdnet_tpu.parallel.edge_partition import ring_segment_reduce

        return ring_segment_reduce(x, segment_ids, num_segments, op, info.axis)
    if op in ("sum", "add"):
        return jax.ops.segment_sum(x, segment_ids, num_segments=num_segments)
    if op == "mean":
        total = jax.ops.segment_sum(x, segment_ids, num_segments=num_segments)
        count = jax.ops.segment_sum(
            jnp.ones((x.shape[0],), dtype=x.dtype), segment_ids, num_segments=num_segments
        )
        count = jnp.maximum(count, 1.0)
        return total / count.reshape((num_segments,) + (1,) * (x.ndim - 1))
    if op == "max":
        return jax.ops.segment_max(x, segment_ids, num_segments=num_segments)
    raise ValueError(f"Unknown reduce op: {op}")
