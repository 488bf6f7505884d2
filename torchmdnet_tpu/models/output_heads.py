"""Output heads (the reference's output_modules.py).

Each head is a flax module with ``pre_reduce(x, v, z, pos, batch_ids)`` and
``post_reduce(y)`` methods; reduction itself (segment sum/mean over molecule
ids) lives in the composition layer (potential.py) because it owns the static
molecule capacity.  ``allow_prior_model`` gating matches the reference
(output_modules.py:14, model.py:204-211).

Center-of-mass computations use a trash-segment-safe division so padded
batches stay NaN-free in both value and gradients.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from torchmdnet_tpu.constants import ATOMIC_MASSES
from torchmdnet_tpu.models.blocks import GatedEquivariantBlock, XavierDense
from torchmdnet_tpu.ops.activations import act_fn_mapping
from torchmdnet_tpu.ops.segment import segment_reduce

__all__ = ["Scalar", "DipoleMoment", "ElectronicSpatialExtent"]


def _center_of_mass(z, pos, batch_ids, num_segments):
    """Per-molecule center of mass, gathered back per atom (NaN-safe)."""
    mass = jnp.asarray(ATOMIC_MASSES, dtype=pos.dtype)[z][:, None]  # (N, 1)
    m_pos = segment_reduce(mass * pos, batch_ids, num_segments, "sum")
    m_tot = segment_reduce(mass, batch_ids, num_segments, "sum")
    c = jnp.where(m_tot > 0, m_pos / jnp.where(m_tot > 0, m_tot, 1.0), 0.0)
    return c[batch_ids]  # (N, 3)


class Scalar(nn.Module):
    """MLP head: H -> H/2 -> 1 (output_modules.py:49-77)."""

    hidden_channels: int
    activation: str = "silu"
    allow_prior_model: bool = True
    reduce_op: str = "sum"
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.lin1 = XavierDense(self.hidden_channels // 2, dtype=self.dtype)
        self.lin2 = XavierDense(1, dtype=self.dtype)

    def _mlp(self, x):
        return self.lin2(act_fn_mapping[self.activation](self.lin1(x)))

    def pre_reduce(self, x, v, z, pos, batch_ids):
        return self._mlp(x)

    def post_reduce(self, y):
        return y


class EquivariantScalar(nn.Module):
    """Two gated equivariant blocks (output_modules.py:80-115)."""

    hidden_channels: int
    activation: str = "silu"
    allow_prior_model: bool = True
    reduce_op: str = "sum"
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        act = act_fn_mapping[self.activation]
        self.block1 = GatedEquivariantBlock(
            self.hidden_channels,
            self.hidden_channels // 2,
            activation=act,
            scalar_activation=True,
            dtype=self.dtype,
        )
        self.block2 = GatedEquivariantBlock(
            self.hidden_channels // 2, 1, activation=act, dtype=self.dtype
        )

    def _blocks(self, x, v):
        x, v = self.block1(x, v)
        x, v = self.block2(x, v)
        return x, v

    def pre_reduce(self, x, v, z, pos, batch_ids):
        x, v = self._blocks(x, v)
        # + 0 * v.sum() in the reference only forces DDP gradient coverage
        # (output_modules.py:114-115); value-identical here.
        return x + 0.0 * v.sum()

    def post_reduce(self, y):
        return y


class DipoleMoment(Scalar):
    """COM-referenced dipole with norm post-reduce (output_modules.py:118-136)."""

    allow_prior_model: bool = False  # noqa

    def pre_reduce(self, x, v, z, pos, batch_ids):
        x = self._mlp(x)
        c = _center_of_mass(z, pos, batch_ids, int(batch_ids.shape[0]) + 1)
        return x * (pos - c)

    def post_reduce(self, y):
        return jnp.linalg.norm(y, axis=-1, keepdims=True)


class EquivariantDipoleMoment(EquivariantScalar):
    """output_modules.py:139-158."""

    allow_prior_model: bool = False  # noqa

    def pre_reduce(self, x, v, z, pos, batch_ids):
        x, v = self._blocks(x, v)
        c = _center_of_mass(z, pos, batch_ids, int(batch_ids.shape[0]) + 1)
        return x * (pos - c) + v.squeeze(-1)

    def post_reduce(self, y):
        return jnp.linalg.norm(y, axis=-1, keepdims=True)


class ElectronicSpatialExtent(nn.Module):
    """<R^2>-style head (output_modules.py:161-191)."""

    hidden_channels: int
    activation: str = "silu"
    allow_prior_model: bool = False
    reduce_op: str = "sum"
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.lin1 = XavierDense(self.hidden_channels // 2, dtype=self.dtype)
        self.lin2 = XavierDense(1, dtype=self.dtype)

    def pre_reduce(self, x, v, z, pos, batch_ids):
        x = self.lin2(act_fn_mapping[self.activation](self.lin1(x)))
        c = _center_of_mass(z, pos, batch_ids, int(batch_ids.shape[0]) + 1)
        d = pos - c
        return jnp.sum(d * d, axis=-1, keepdims=True) * x

    def post_reduce(self, y):
        return y


class EquivariantElectronicSpatialExtent(ElectronicSpatialExtent):
    pass


class EquivariantVectorOutput(EquivariantScalar):
    """Returns the per-atom vector channel (output_modules.py:198-207)."""

    allow_prior_model: bool = False
    reduce_op: str = "sum"

    def pre_reduce(self, x, v, z, pos, batch_ids):
        x, v = self._blocks(x, v)
        return v.squeeze(-1)

    def post_reduce(self, y):
        return y


head_class_mapping = {
    "Scalar": Scalar,
    "EquivariantScalar": EquivariantScalar,
    "DipoleMoment": DipoleMoment,
    "EquivariantDipoleMoment": EquivariantDipoleMoment,
    "ElectronicSpatialExtent": ElectronicSpatialExtent,
    "EquivariantElectronicSpatialExtent": EquivariantElectronicSpatialExtent,
    "EquivariantVectorOutput": EquivariantVectorOutput,
}
