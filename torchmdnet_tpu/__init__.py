"""TorchMD-NET TPU: a TPU-native (JAX/XLA/Pallas) framework for neural network potentials.

A from-scratch re-design of the capabilities of TorchMD-NET (reference:
/root/reference, raimis/torchmd-net) for TPU hardware:

- Static-shape, densely padded "ELL" neighbor lists (N atoms x K slots) so that
  every message-passing op is a dense gather -> elementwise/MXU math -> sum over
  K.  No dynamic shapes anywhere under jit.
- Forces via ``jax.value_and_grad`` of a pure energy function (grad-of-grad for
  force training is native; the reference needed a hand-written
  twice-differentiable CUDA backward, neighbors_cuda.cu:43-71).
- Data parallel + edge-partitioned scaling over a ``jax.sharding.Mesh``.

Public API mirrors the reference's (torchmdnet/models/model.py):
``create_model``, ``load_model``, and per-model classes.
"""

__version__ = "0.1.0"

from torchmdnet_tpu.models.potential import create_model, load_model  # noqa: F401
