"""Inference-time optimization (reference torchmdnet/optimize.py analog).

The reference's ``optimize(model)`` swaps GN internals for NNPOps fused CUDA
kernels (optimize.py:76-88) under config restrictions.  On TPU the compiler
does the fusing; what ``optimize`` contributes here is the serving-shape
discipline around it:

- one cached executable per (atom-capacity, box) signature with donated
  position buffers (the CUDA-graph-replay analog),
- the split neighbor/network program structure for large systems (one XLA
  program per stage; the fused 30k-atom program is slower AND slow to
  compile),
- optional Verlet-skin neighbor reuse across calls (``skin`` > 0): the
  neighbor list is rebuilt every ``rebuild_every`` calls with cutoff+skin
  and re-masked to the true cutoff on every call (NeighborList.refine),
  exact while no atom moves more than skin/2 between rebuilds; the actual
  displacement bound is tracked ON DEVICE and exposed as the lazily
  fetchable ``stale`` property (a per-call host fetch would cost a full
  tunnel round trip, PERF.md),
- no host work per call beyond dispatch (results stay on device).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from torchmdnet_tpu.data.batch import AtomicBatch
from torchmdnet_tpu.models.potential import Potential, create_model

# systems at or above this atom count get the split neighbor/network programs
_SPLIT_THRESHOLD = 6144


class OptimizedPotential:
    """Latency-optimized energy/force evaluator for a fixed batch signature.

    Args:
        skin: Verlet-skin width (Angstrom); 0 disables neighbor reuse.
        rebuild_every: calls between neighbor rebuilds when skin > 0.  Pick
            skin >= 2 * rebuild_every * (max per-step displacement); check
            the ``stale`` property periodically to validate the choice.
    """

    def __init__(
        self,
        model: Potential,
        params,
        example: AtomicBatch,
        box=None,
        skin: float = 0.0,
        rebuild_every: int = 20,
        neighbor_kwargs: Optional[dict] = None,
    ):
        self.model = model
        self.params = params
        self.box = box
        self._template = example
        n = example.num_atoms
        self.skin = float(skin)
        self.rebuild_every = int(rebuild_every)
        self.split = n >= _SPLIT_THRESHOLD or self.skin > 0.0
        self._calls_since_rebuild = 0
        self._nbl = None
        self._stale = jnp.zeros((), bool)
        lo = model.args.get("cutoff_lower", 0.0)
        hi = model.args.get("cutoff_upper", 5.0)

        # Setup-time cell-capacity probe (as in md.Simulation / Trainer.fit):
        # size the static cell tiles from the example's observed occupancy;
        # callers can still pin cell_capacity explicitly, and drift-induced
        # overflow surfaces through ``stale`` like every other capacity.
        neighbor_kwargs = dict(neighbor_kwargs or {})
        from torchmdnet_tpu.ops.cell_list import (
            suggest_cell_capacity,
            suggest_max_cells,
            wants_cell_probe,
        )

        if (
            "cell_capacity" not in neighbor_kwargs
            and neighbor_kwargs.get("strategy", "auto") in ("auto", "cell")
            and wants_cell_probe(example.num_atoms, example.num_mol)
        ):
            neighbor_kwargs["cell_capacity"] = suggest_cell_capacity(
                example.pos,
                example.atom_mask,
                cutoff_upper=hi + self.skin,
                box=box,
                headroom=1.3,
            )
            neighbor_kwargs.setdefault(
                "max_cells",
                suggest_max_cells(
                    example.pos,
                    example.atom_mask,
                    cutoff_upper=hi + self.skin,
                    box=box,
                ),
            )

        # Setup-time gather-plan shape probe (as in Trainer.fit / md.py /
        # bench.py): the fused kernels' MXU work is linear in the plan width
        # W, and fixed defaults leave 1.4-1.5x at STMV scale (PERF.md r5).
        # Probed on the REAL skin list this executor will serve.
        if neighbor_kwargs.get("gather_plan") and not neighbor_kwargs.get(
            "plan_width"
        ):
            from torchmdnet_tpu.ops.pallas.onehot_gather import (
                suggest_plan_shape,
            )

            probe_nbl = model.neighbors(
                example, box=box, skin=self.skin,
                **{k: v for k, v in neighbor_kwargs.items()
                   if k in ("strategy", "cell_capacity", "max_cells")},
            )
            shape = suggest_plan_shape(
                jax.device_get(probe_nbl.idx),
                block_rows=int(neighbor_kwargs.get("plan_block_rows") or 16),
                headroom=1.15,
            )
            if shape is not None:
                r, w, a = shape
                neighbor_kwargs["plan_block_rows"] = r
                neighbor_kwargs["plan_width"] = w
                neighbor_kwargs.setdefault("plan_inv_capacity", a)

        from torchmdnet_tpu.ops.pallas import jit_vmem_retry
        if self.split:
            # neighbor_kwargs forwards strategy/capacity/gather_plan options
            # (gather_plan=True + spatially sorted atoms routes gathers
            # through the one-hot MXU kernels; with fused_attention models it
            # feeds the fused edge-phase kernel)
            self._nbl_fn = jax.jit(
                lambda pos: model.neighbors(
                    example.replace(pos=pos), box=box, skin=self.skin,
                    **(neighbor_kwargs or {}),
                )
            )

            @jit_vmem_retry
            def refine_step(params, pos, ref_pos, nbl, stale):
                nbl_r = nbl.refine(pos, lo, hi, box)
                drift2 = jnp.max(
                    jnp.where(
                        example.atom_mask,
                        jnp.sum((pos - ref_pos) ** 2, axis=-1),
                        0.0,
                    )
                )
                bad = drift2 > jnp.asarray((0.5 * self.skin) ** 2, drift2.dtype)
                bad = bad | nbl.overflow()
                if nbl.cell_overflow is not None:
                    bad = bad | nbl.cell_overflow
                if nbl.gather_plan is not None:
                    # atoms drifting from the setup-time spatial sort can
                    # outgrow the plan capacities (as in md.py)
                    bad = bad | (nbl.gather_plan.overflow > 0)
                    bad = bad | (nbl.gather_plan.inv_overflow > 0)
                y, neg_dy = model.energy_and_forces(
                    params, example.replace(pos=pos), box=box, nbl=nbl_r
                )
                return y, neg_dy, stale | bad

            self._refine_step = refine_step

            @jit_vmem_retry
            def step(params, pos, nbl):
                return model.energy_and_forces(
                    params, example.replace(pos=pos), box=box, nbl=nbl
                )

            self._step = step
        else:
            # NOTE: pos is deliberately NOT donated — callers routinely pass
            # a buffer they still hold (donation would delete it under them),
            # and the allocation it saves is one (N, 3) array.
            @jit_vmem_retry
            def step(params, pos):
                return model.energy_and_forces(
                    params, example.replace(pos=pos), box=box
                )

            self._step = step

    @property
    def stale(self) -> bool:
        """True if skin reuse may have missed neighbor pairs since the last
        reset (displacement > skin/2 between rebuilds, or capacity
        overflow).  Fetches one scalar (one round trip)."""
        return bool(np.asarray(self._stale))

    def reset_stale(self):
        self._stale = jnp.zeros((), bool)

    def __call__(self, pos):
        pos = jnp.asarray(pos, self._template.pos.dtype).reshape(
            self._template.pos.shape
        )
        if not self.split:
            return self._step(self.params, pos)
        if self.skin <= 0.0:
            nbl = self._nbl_fn(pos)
            return self._step(self.params, pos, nbl)
        if self._nbl is None or self._calls_since_rebuild >= self.rebuild_every:
            self._nbl = self._nbl_fn(pos)
            self._ref_pos = pos
            self._calls_since_rebuild = 0
        y, neg_dy, self._stale = self._refine_step(
            self.params, pos, self._ref_pos, self._nbl, self._stale
        )
        self._calls_since_rebuild += 1
        return y, neg_dy


def optimize(
    model: Potential,
    params,
    example: AtomicBatch,
    box: Optional[jnp.ndarray] = None,
    skin: float = 0.0,
    rebuild_every: int = 20,
    neighbor_kwargs: Optional[dict] = None,
) -> OptimizedPotential:
    """Return a latency-optimized evaluator bound to ``example``'s shapes.

    Unlike the reference (which restricts to GN + gauss/ssp configs,
    optimize.py:15-47), every model/config is supported — XLA performs the
    kernel fusion that NNPOps hand-wrote.
    """
    model.derivative = True
    return OptimizedPotential(
        model, params, example, box=box, skin=skin,
        rebuild_every=rebuild_every, neighbor_kwargs=neighbor_kwargs,
    )
