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
    """Bit-exact equivalent of ``torch.linspace(start, end, num, dtype)`` for
    float32/float64 (fuzz-verified against torch CPU in
    tests/test_rbfs.py::test_torch_linspace_bit_exact).

    torch's CPU kernel computes ``step = (end - start) / (num - 1)`` in the
    TARGET dtype and fills from both ends with FMA-contracted arithmetic:
    ``fma(step, i, start)`` for the first half and ``fma(-step, num-1-i, end)``
    for the rest (aten RangeFactories ``linspace_kernel``).  ``np.linspace``
    rounds differently (no fma, single-end fill), so the reference's RBF shape
    buffers need this exact reproduction for golden parity.  Transcendental
    *inputs* (e.g. ExpNormalSmearing's ``exp(-cutoff)``) may still carry a
    <=1 ulp np-vs-torch difference where SLEEF is not correctly rounded;
    golden tolerances account for that.
    """
    dtype = np.dtype(dtype)
    if num == 1:
        return np.asarray([start], dtype)
    if dtype == np.float32:
        s, e = np.float32(start), np.float32(end)
        step = np.float32((e - s) / np.float32(num - 1))
        # emulated single-rounding f32 fma: the f64 product of f32 inputs is
        # exact, so one final cast rounds once
        i = np.arange(num, dtype=np.float64)
        lo = (np.float64(step) * i + np.float64(s)).astype(np.float32)
        hi = (np.float64(-step) * (num - 1 - i) + np.float64(e)).astype(np.float32)
        return np.where(np.arange(num) < num // 2, lo, hi)
    if dtype == np.float64:
        from fractions import Fraction

        # exact f64 fma via rational arithmetic (init-time constants only)
        s, e = float(start), float(end)
        step = (e - s) / float(num - 1)
        half = num // 2
        out = np.empty(num, np.float64)
        for i in range(num):
            out[i] = float(
                Fraction(step) * i + Fraction(s)
                if i < half
                else Fraction(-step) * (num - 1 - i) + Fraction(e)
            )
        return out
    # low-precision dtypes are never golden-compared; plain linspace
    return np.linspace(float(start), float(end), num).astype(dtype)


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
            # Trainable RBF params live in the MODEL dtype: the reference
            # upcasts nn.Parameters via model.to(dtype) (model.py:201), so
            # fp64 training trains them in f64; only non-trainable buffers
            # keep the buffer_dtype quirk.
            offset = self.param("offset", lambda rng: offset0.astype(self.dtype))
            coeff = self.param("coeff", lambda rng: coeff0.astype(self.dtype))
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
        # torch.exp's f32 kernel returns the f64 result rounded once; np.exp's
        # f32 kernel does not — compute in f64 and round to the buffer dtype
        # (<=1 ulp residual where SLEEF is not correctly rounded; golden
        # tolerances absorb it).
        start_value = np.asarray(
            np.exp(np.float64(-self.cutoff_upper + self.cutoff_lower)), bdt
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
            # see GaussianSmearing: trainable params live in the model dtype
            means = self.param("means", lambda rng: means0.astype(self.dtype))
            betas = self.param("betas", lambda rng: betas0.astype(self.dtype))
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
