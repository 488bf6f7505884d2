"""Invariant graph Transformer representation model.

TPU-native re-design of the reference TorchMD_T
(torchmdnet/models/torchmd_t.py): per-edge multi-head attention with
RBF-projected distance filters on keys/values, cosine-cutoff-weighted
activations, over the dense ELL neighbor format.  Self-loops included
(reference Distance loop=True, torchmd_t.py:102-104).
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from torchmdnet_tpu.models.blocks import Embedding, LayerNorm, NeighborEmbedding, XavierDense
from torchmdnet_tpu.ops.activations import act_fn_mapping
from torchmdnet_tpu.ops.cutoff import cosine_cutoff
from torchmdnet_tpu.ops.neighbors import (
    NeighborList,
    edge_geometry_components,
    ell_gather,
    neighbor_list,
)
from torchmdnet_tpu.ops.rbf import rbf_class_mapping


class MultiHeadAttention(nn.Module):
    """One attention layer (reference torchmd_t.py:185-283) in ELL form."""

    hidden_channels: int
    num_rbf: int
    distance_influence: str
    num_heads: int
    activation: str
    attn_activation: str
    cutoff_lower: float
    cutoff_upper: float
    bf16_messages: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, nbl: NeighborList, dist, edge_attr):
        n = x.shape[0]
        h = self.hidden_channels
        heads = self.num_heads
        hd = h // heads
        act = act_fn_mapping[self.activation]
        attn_act = act_fn_mapping[self.attn_activation]

        # bf16 edge intermediates with f32 K-accumulation (see et.py)
        mp_dtype = jnp.bfloat16 if self.bf16_messages else self.dtype
        acc_dtype = x.dtype
        ecast = (lambda t: t.astype(jnp.bfloat16)) if self.bf16_messages else (lambda t: t)

        x = LayerNorm(dtype=self.dtype)(x)
        q = XavierDense(h, dtype=self.dtype)(x)  # (N, H)
        k = XavierDense(h, dtype=self.dtype)(x)  # (N, H)
        v = XavierDense(h, dtype=self.dtype)(x)  # (N, H)

        # TPU layout: keep every per-edge tensor (..., H)-trailing; per-head
        # attention sums via one block-of-ones matmul (see et.py for the
        # rationale — a (heads, hd=16)-trailing layout pads lanes 8x).
        ones_block = jnp.asarray(
            np.kron(np.eye(heads), np.ones((hd, hd))),
            mp_dtype if mp_dtype is not None else x.dtype,
        )

        dk = None
        if self.distance_influence in ("keys", "both"):
            dk = act(XavierDense(h, dtype=mp_dtype)(edge_attr))  # (N, K, H)
        dv = None
        if self.distance_influence in ("values", "both"):
            dv = act(XavierDense(h, dtype=mp_dtype)(edge_attr))  # (N, K, H)

        k_j = ell_gather(ecast(k), nbl.idx, nbl.gather_plan)
        prod = ecast(q)[:, None, :] * k_j
        if dk is not None:
            prod = prod * dk
        attn = prod @ ones_block  # (N, K, H); lane l = its head's sum
        attn = attn_act(attn) * ecast(
            cosine_cutoff(dist, self.cutoff_lower, self.cutoff_upper)
        )[..., None]
        attn = jnp.where(nbl.mask[..., None], attn, 0.0)

        v_j = ell_gather(ecast(v), nbl.idx, nbl.gather_plan)
        if dv is not None:
            v_j = v_j * dv
        msg = v_j * attn  # (N, K, H)
        out = msg.sum(axis=1, dtype=acc_dtype)
        return XavierDense(h, dtype=self.dtype)(out)


class TorchMD_T(nn.Module):
    """Transformer (reference torchmd_t.py:14-182)."""

    hidden_channels: int = 128
    num_layers: int = 6
    num_rbf: int = 50
    rbf_type: str = "expnorm"
    trainable_rbf: bool = True
    activation: str = "silu"
    attn_activation: str = "silu"
    neighbor_embedding: bool = True
    num_heads: int = 8
    distance_influence: str = "both"
    cutoff_lower: float = 0.0
    cutoff_upper: float = 5.0
    max_z: int = 100
    max_num_neighbors: int = 32
    remat: bool = False  # see graph_network.TorchMD_GN.remat
    bf16_messages: bool = False  # bf16 edge intermediates, f32 accumulation
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z, pos, batch, atom_mask=None, q=None, s=None, box=None, nbl=None):
        assert self.distance_influence in ("keys", "values", "both", "none")
        assert self.hidden_channels % self.num_heads == 0

        x = Embedding(self.max_z, self.hidden_channels, dtype=self.dtype)(z)

        if nbl is None:
            nbl = neighbor_list(
                pos,
                batch,
                atom_mask,
                k=self.max_num_neighbors,
                cutoff_lower=self.cutoff_lower,
                cutoff_upper=self.cutoff_upper,
                loop=True,
                box=box,
            )
        assert nbl.self_loops == True
        _, dist = edge_geometry_components(pos, nbl, box=box)
        edge_attr = rbf_class_mapping[self.rbf_type](
            self.cutoff_lower,
            self.cutoff_upper,
            self.num_rbf,
            self.trainable_rbf,
            dtype=self.dtype,
        )(dist)

        if self.neighbor_embedding:
            ne_cls = (
                nn.remat(NeighborEmbedding) if self.remat else NeighborEmbedding
            )
            x = ne_cls(
                self.hidden_channels,
                self.num_rbf,
                self.cutoff_lower,
                self.cutoff_upper,
                self.max_z,
                dtype=self.dtype,
                name="NeighborEmbedding_0",
            )(z, x, nbl, dist, edge_attr)

        layer_cls = nn.remat(MultiHeadAttention) if self.remat else MultiHeadAttention
        for li in range(self.num_layers):
            # explicit name keeps the param tree identical with/without remat
            x = x + layer_cls(
                self.hidden_channels,
                self.num_rbf,
                self.distance_influence,
                self.num_heads,
                self.activation,
                self.attn_activation,
                self.cutoff_lower,
                self.cutoff_upper,
                bf16_messages=self.bf16_messages,
                dtype=self.dtype,
                name=f"MultiHeadAttention_{li}",
            )(x, nbl, dist, edge_attr)
        x = LayerNorm(dtype=self.dtype)(x)

        return x, None
