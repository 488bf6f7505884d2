"""Shared NN building blocks.

TPU-native equivalents of the reference's shared layers
(torchmdnet/models/utils.py): NeighborEmbedding and GatedEquivariantBlock,
re-expressed over the dense ELL neighbor format, plus weight initializers that
reproduce the reference's init *distributions* (xavier-uniform with zero bias
where the reference calls nn.init.xavier_uniform_, and torch's default Linear
init elsewhere) so trained-model statistics are comparable.
"""

import math
from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import variance_scaling

from torchmdnet_tpu.ops.cutoff import cosine_cutoff
from torchmdnet_tpu.ops.neighbors import NeighborList, ell_gather, safe_norm

# --- initializers -----------------------------------------------------------

# torch nn.init.xavier_uniform_: U(+-sqrt(6/(fan_in+fan_out))).
xavier_uniform = nn.initializers.xavier_uniform()
zeros = nn.initializers.zeros

# torch nn.Linear.reset_parameters default: kaiming_uniform(a=sqrt(5)) on the
# weight == U(+-1/sqrt(fan_in)); bias U(+-1/sqrt(fan_in)).
torch_linear_kernel = variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_linear_bias(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(rng, shape, dtype=jnp.float32):
        return nn.initializers.uniform(scale=2 * bound)(rng, shape, dtype) - bound

    return init


# torch nn.Embedding default init: N(0, 1).
embed_normal = nn.initializers.normal(stddev=1.0)


def XavierDense(features: int, use_bias: bool = True, dtype=None, name=None):
    """Dense layer matching the reference's xavier_uniform_ + zero-bias init.

    ``name`` pins the flax auto-name when a branch must reproduce another
    branch's parameter tree (see et.py's fused_attention path)."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=xavier_uniform,
        bias_init=zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def TorchDefaultDense(features: int, in_features: int, use_bias: bool = True, dtype=None, name=None):
    """Dense layer matching torch nn.Linear's default reset_parameters."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=torch_linear_kernel,
        bias_init=torch_linear_bias(in_features),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def LayerNorm(dtype=None):
    """LayerNorm with torch's epsilon (1e-5; flax defaults to 1e-6)."""
    return nn.LayerNorm(epsilon=1e-5, dtype=dtype, param_dtype=jnp.float32)


def Embedding(num_embeddings: int, features: int, dtype=None):
    return nn.Embed(
        num_embeddings,
        features,
        embedding_init=embed_normal,
        dtype=dtype,
        param_dtype=jnp.float32,
    )


class DenseParams(nn.Module):
    """Parameter-only stand-in for an nn.Dense layer.

    Fused Pallas kernels (ops/pallas/{et,tn}_message.py) consume layer
    weights directly instead of calling the Dense module; this declares the
    same {kernel, bias} params with the same inits under an explicitly
    pinned "Dense_i" name, so the fused and composable branches produce
    IDENTICAL parameter trees and checkpoints interchange.
    """

    features: int
    in_features: int
    kernel_init: object = xavier_uniform
    bias_init: object = zeros

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", self.kernel_init, (self.in_features, self.features), jnp.float32
        )
        bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        return kernel, bias


# --- blocks -----------------------------------------------------------------


class NeighborEmbedding(nn.Module):
    """Initial neighborhood-type embedding (eq. 3 of the ET paper).

    ELL re-expression of the reference's message-passing layer
    (torchmdnet/models/utils.py:43-108): gathers neighbor type-embeddings,
    weights them with an RBF-projected distance filter under the cosine
    cutoff, sums over neighbor slots, and mixes with the per-atom features.
    Self-loops are excluded (utils.py:91-96).
    """

    hidden_channels: int
    num_rbf: int
    cutoff_lower: float
    cutoff_upper: float
    max_z: int = 100
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z, x, nbl: NeighborList, dist, edge_attr):
        nbl = nbl.without_self_loops()
        k = nbl.k
        dist = dist[:, -k:] if dist.shape[1] != k else dist
        edge_attr = edge_attr[:, -k:] if edge_attr.shape[1] != k else edge_attr

        c = cosine_cutoff(dist, self.cutoff_lower, self.cutoff_upper)
        w = XavierDense(self.hidden_channels, dtype=self.dtype)(edge_attr)
        w = w * c[..., None]

        x_neighbors = Embedding(self.max_z, self.hidden_channels, dtype=self.dtype)(z)
        msg = ell_gather(x_neighbors, nbl.idx, nbl.gather_plan) * w  # (N, K, H)
        msg = jnp.where(nbl.mask[..., None], msg, 0.0)
        agg = msg.sum(axis=1)

        out = XavierDense(self.hidden_channels, dtype=self.dtype)(
            jnp.concatenate([x, agg], axis=-1)
        )
        return out


class GatedEquivariantBlock(nn.Module):
    """Gated equivariant block (Schuett et al. 2021).

    Equivalent of reference utils.py:456-522.  The zero-vector NaN guard is
    handled by safe_norm (double-where), which keeps all gradient orders
    finite without the reference's warning-and-mask dance (utils.py:499-512).
    """

    hidden_channels: int
    out_channels: int
    intermediate_channels: Optional[int] = None
    activation: Callable = nn.silu
    scalar_activation: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, v):
        inter = (
            self.hidden_channels
            if self.intermediate_channels is None
            else self.intermediate_channels
        )
        vec1_buffer = XavierDense(self.hidden_channels, use_bias=False, dtype=self.dtype)(v)
        vec1 = safe_norm(vec1_buffer, axis=-2)  # (N, H): norm over the xyz axis
        vec2 = XavierDense(self.out_channels, use_bias=False, dtype=self.dtype)(v)

        h = jnp.concatenate([x, vec1], axis=-1)
        h = XavierDense(inter, dtype=self.dtype)(h)
        h = self.activation(h)
        h = XavierDense(self.out_channels * 2, dtype=self.dtype)(h)
        x_out, gate = jnp.split(h, 2, axis=-1)
        v_out = gate[:, None, :] * vec2
        if self.scalar_activation:
            x_out = self.activation(x_out)
        return x_out, v_out
