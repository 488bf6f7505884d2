"""Inference-time optimization (reference torchmdnet/optimize.py analog).

The reference's ``optimize(model)`` swaps GN internals for NNPOps fused CUDA
kernels (optimize.py:76-88) under config restrictions.  On TPU the compiler
does the fusing; what ``optimize`` contributes here is the serving-shape
discipline around it:

- one cached executable per (atom-capacity, box) signature with donated
  position buffers (the CUDA-graph-replay analog),
- the split neighbor/network program structure for large systems,
- optional bf16 activation compute,
- no host work per call beyond dispatch.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from torchmdnet_tpu.data.batch import AtomicBatch
from torchmdnet_tpu.models.potential import Potential, create_model

# systems at or above this atom count get the split neighbor/network programs
_SPLIT_THRESHOLD = 6144


class OptimizedPotential:
    """Latency-optimized energy/force evaluator for a fixed batch signature."""

    def __init__(self, model: Potential, params, example: AtomicBatch, box=None):
        self.model = model
        self.params = params
        self.box = box
        self._template = example
        n = example.num_atoms
        self.split = n >= _SPLIT_THRESHOLD

        if self.split:
            self._nbl_fn = jax.jit(
                lambda pos: model.neighbors(example.replace(pos=pos), box=box)
            )

            @partial(jax.jit, donate_argnums=(1,))
            def step(params, pos, nbl):
                return model.energy_and_forces(
                    params, example.replace(pos=pos), box=box, nbl=nbl
                )

            self._step = step
        else:

            @partial(jax.jit, donate_argnums=(1,))
            def step(params, pos):
                return model.energy_and_forces(
                    params, example.replace(pos=pos), box=box
                )

            self._step = step

    def __call__(self, pos):
        pos = jnp.asarray(pos, self._template.pos.dtype).reshape(
            self._template.pos.shape
        )
        if self.split:
            nbl = self._nbl_fn(pos)
            return self._step(self.params, pos, nbl)
        return self._step(self.params, pos)


def optimize(
    model: Potential,
    params,
    example: AtomicBatch,
    box: Optional[jnp.ndarray] = None,
) -> OptimizedPotential:
    """Return a latency-optimized evaluator bound to ``example``'s shapes.

    Unlike the reference (which restricts to GN + gauss/ssp configs,
    optimize.py:15-47), every model/config is supported — XLA performs the
    kernel fusion that NNPOps hand-wrote.
    """
    model.derivative = True
    return OptimizedPotential(model, params, example, box=box)
