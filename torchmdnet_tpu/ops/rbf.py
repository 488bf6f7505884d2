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

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from torchmdnet_tpu.ops.cutoff import cosine_cutoff


def _torch_linspace(start, end, num, dtype):
    """Bit-exact equivalent of ``torch.linspace(start, end, num, dtype)``.

    torch fills linspace from BOTH ends (forward from ``start`` for the first
    half, backward from ``end`` for the rest), which rounds differently from
    ``np.linspace``/``jnp.linspace`` in the upper half.  The RBF shape
    constants must match the reference's buffers bit-for-bit for golden
    parity (verified against torch across dtypes/sizes in
    tests/test_golden_reference.py).
    """
    start = np.asarray(start, dtype)
    end = np.asarray(end, dtype)
    step = np.asarray((np.float64(end) - np.float64(start)) / (num - 1), dtype)
    i = np.arange(num)
    lo = (start + i * step).astype(dtype)
    hi = (end - (num - 1 - i) * step).astype(dtype)
    return np.where(i < num // 2, lo, hi).astype(dtype)


class GaussianSmearing(nn.Module):
    cutoff_lower: float = 0.0
    cutoff_upper: float = 5.0
    num_rbf: int = 50
    trainable: bool = True
    dtype: jnp.dtype = jnp.float32
    # dtype the shape constants are *computed* in before being cast to the
    # compute dtype.  None -> self.dtype.  The reference computes them in the
    # dtype handed to the RBF constructor (utils.py:289), which GN/T pass
    # through (torchmd_gn.py:113, torchmd_t.py:105) but ET and TensorNet omit
    # (torchmd_et.py:114-116, tensornet.py:145-147) — so those two carry
    # float32-valued constants even in fp64 mode.  Golden parity reproduces
    # that quirk via buffer_dtype=float32 at the ET/TensorNet call sites.
    buffer_dtype: jnp.dtype = None

    def _initial_params(self):
        bdt = np.dtype(self.buffer_dtype or self.dtype)
        offset = _torch_linspace(self.cutoff_lower, self.cutoff_upper, self.num_rbf, bdt)
        coeff = -np.asarray(0.5, bdt) / (offset[1] - offset[0]) ** 2
        return jnp.asarray(offset), jnp.asarray(coeff, dtype=bdt)

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
    buffer_dtype: jnp.dtype = None  # see GaussianSmearing.buffer_dtype

    def _initial_params(self):
        # constants computed in buffer_dtype like the reference's buffers
        # (utils.py:326-332: exp/linspace/tensor(..., dtype=self.dtype))
        bdt = np.dtype(self.buffer_dtype or self.dtype)
        start_value = np.exp(
            np.asarray(-self.cutoff_upper + self.cutoff_lower, bdt)
        )
        means = _torch_linspace(start_value, 1.0, self.num_rbf, bdt)
        betas = np.full(
            (self.num_rbf,),
            (np.asarray(2.0 / self.num_rbf, bdt) * (1 - start_value)) ** -2,
            dtype=bdt,
        )
        return jnp.asarray(means), jnp.asarray(betas)

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
