"""Radial basis function expansions.

TPU-native re-implementations of the reference RBFs:
- GaussianSmearing   (torchmdnet/models/utils.py:272-300)
- ExpNormalSmearing  (torchmdnet/models/utils.py:303-344, PhysNet-style)

Both are flax modules so that ``trainable=True`` registers the shape parameters
as learnable, matching the reference's nn.Parameter-vs-buffer switch.  The RBF
is applied to an arbitrary-shaped distance array and appends a trailing
``num_rbf`` axis (the reference operates on flat edge vectors; here distances
are usually (N, K) so the output is (N, K, num_rbf)).
"""

import math

import flax.linen as nn
import jax.numpy as jnp

from torchmdnet_tpu.ops.cutoff import cosine_cutoff


class GaussianSmearing(nn.Module):
    cutoff_lower: float = 0.0
    cutoff_upper: float = 5.0
    num_rbf: int = 50
    trainable: bool = True
    dtype: jnp.dtype = jnp.float32

    def _initial_params(self):
        offset = jnp.linspace(
            self.cutoff_lower, self.cutoff_upper, self.num_rbf, dtype=jnp.float32
        )
        coeff = -0.5 / (offset[1] - offset[0]) ** 2
        return offset, jnp.asarray(coeff, dtype=jnp.float32)

    @nn.compact
    def __call__(self, dist):
        offset0, coeff0 = self._initial_params()
        if self.trainable:
            offset = self.param("offset", lambda rng: offset0)
            coeff = self.param("coeff", lambda rng: coeff0)
        else:
            offset, coeff = offset0, coeff0
        offset = jnp.asarray(offset, self.dtype)
        coeff = jnp.asarray(coeff, self.dtype)
        d = dist[..., None] - offset
        return jnp.exp(coeff * d * d)


class ExpNormalSmearing(nn.Module):
    cutoff_lower: float = 0.0
    cutoff_upper: float = 5.0
    num_rbf: int = 50
    trainable: bool = True
    dtype: jnp.dtype = jnp.float32

    def _initial_params(self):
        start_value = math.exp(-self.cutoff_upper + self.cutoff_lower)
        means = jnp.linspace(start_value, 1.0, self.num_rbf, dtype=jnp.float32)
        betas = jnp.full(
            (self.num_rbf,),
            (2.0 / self.num_rbf * (1.0 - start_value)) ** -2,
            dtype=jnp.float32,
        )
        return means, betas

    @nn.compact
    def __call__(self, dist):
        means0, betas0 = self._initial_params()
        if self.trainable:
            means = self.param("means", lambda rng: means0)
            betas = self.param("betas", lambda rng: betas0)
        else:
            means, betas = means0, betas0
        means = jnp.asarray(means, self.dtype)
        betas = jnp.asarray(betas, self.dtype)
        alpha = 5.0 / (self.cutoff_upper - self.cutoff_lower)
        d = dist[..., None]
        # NOTE: the reference's cutoff for expnorm always uses lower bound 0
        # (utils.py:311: CosineCutoff(0, cutoff_upper)).
        c = cosine_cutoff(d, 0.0, self.cutoff_upper)
        return c * jnp.exp(
            -betas * (jnp.exp(alpha * (-d + self.cutoff_lower)) - means) ** 2
        )


rbf_class_mapping = {"gauss": GaussianSmearing, "expnorm": ExpNormalSmearing}
