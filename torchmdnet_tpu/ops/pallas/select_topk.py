"""Pallas TPU kernel: k-smallest selection by iterative min-extraction.

The neighbor-list compaction keeps the k smallest candidate atom ids per row
(ascending — the deterministic order the brute strategy defines; reference
semantics: torchmdnet/neighbors/neighbors_cuda_brute.cuh truncates at
max_num_neighbors).  XLA lowers ``jax.lax.top_k`` to a full bitonic sort of
the (N, W) key matrix — measured 0.38 ms at DHFR (W=648, k=32), 34 GB/s,
~45% of the whole cell-list build and far from any roofline.

Selection does asymptotically more "work" (k passes of a W-wide min) but
every pass is a lane-axis VPU reduce on a VMEM-resident tile: k*N*W ~ 52M
VPU ops at DHFR against the sort's ~log^2(W) cross-lane stages and HBM
round-trips.  Each of the k passes extracts the row minimum, emits it, and
retires it with a select — keys are unique per row (an atom id appears in
exactly one grid cell) so exactly one slot retires per pass; the invalid
sentinel (>= any id) repeats harmlessly since the emitted value is already
the sentinel.  Output is bitwise identical to the top_k path.

Wins require k*W small enough that the VPU passes beat the sort; the brute
strategy's W == N grows quadratically, so this kernel is routed only from
the cell strategy (W = 27 * cell_capacity, constant in N).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(keys_ref, out_ref, *, k: int, sentinel: int):
    keys = keys_ref[...]  # (R, W) int32
    r = keys.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, k), 1)

    def body(j, carry):
        keys, out = carry
        m = jnp.min(keys, axis=1, keepdims=True)  # (R, 1)
        out = jnp.where(cols == j, m, out)
        keys = jnp.where(keys == m, sentinel, keys)
        return keys, out

    out0 = jnp.full((r, k), sentinel, jnp.int32)
    _, out = jax.lax.fori_loop(0, k, body, (keys, out0))
    out_ref[...] = out


def select_topk(keys, k: int, sentinel: int, *, interpret: bool = None):
    """Per-row k smallest entries of ``keys``, ascending.

    Args:
        keys: (N, W) int32; entries to ignore must hold ``sentinel``.
        sentinel: value strictly greater than any real entry (and emitted in
            slots past a row's valid count).

    Returns:
        (N, k) int32 — ascending; trailing slots ``sentinel``-filled.
    """
    if interpret is None:  # run the kernel in interpret mode off-TPU (tests)
        interpret = jax.devices()[0].platform != "tpu"
    n, w = keys.shape
    r = 256
    n_pad = -(-n // r) * r
    if n_pad != n:
        keys = jnp.concatenate(
            [keys, jnp.full((n_pad - n, w), sentinel, jnp.int32)], axis=0
        )
    out = pl.pallas_call(
        functools.partial(_kernel, k=int(k), sentinel=int(sentinel)),
        grid=(n_pad // r,),
        in_specs=[
            pl.BlockSpec((r, w), lambda b: (b, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((r, k), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, k), jnp.int32),
        interpret=interpret,
    )(keys)
    return out[:n]
