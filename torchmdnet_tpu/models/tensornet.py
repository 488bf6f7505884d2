"""TensorNet representation model (Cartesian rank-2 tensor features).

TPU-native re-design of the reference TensorNet (torchmdnet/models/tensornet.py,
arXiv:2306.06482).  Feature layout is channel-LAST: X has shape (N, 3, 3, H)
(the reference uses (N, H, 3, 3)), so the hidden axis H sits on the TPU lane
dimension and channel-mixing linears are plain trailing-axis matmuls with no
permutes (the reference permutes around every linear, tensornet.py:388-390).

Semantics match the reference *dynamic-shapes* path: masked/padded edges
contribute exactly zero.  (The reference's static_shapes mode re-points padded
edges at atom 0, which adds spurious self-edge contributions to atom 0,
tensornet.py:214-221; the ELL mask avoids that corruption while staying fully
static.)

Edge vector convention: receiver i = edge_index[0], source j = edge_index[1],
edge_vec = pos_i - pos_j (tensornet.py:209-226), i.e. the NEGATIVE of
edge_geometry's delta.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from torchmdnet_tpu.models.blocks import (
    Embedding,
    LayerNorm,
    TorchDefaultDense,
)
from torchmdnet_tpu.ops.activations import act_fn_mapping
from torchmdnet_tpu.ops.cutoff import cosine_cutoff
from torchmdnet_tpu.ops.neighbors import (
    edge_geometry_components,
    ell_gather,
    neighbor_list,
)
from torchmdnet_tpu.ops.rbf import rbf_class_mapping


def vector_to_skewtensor(vector):
    """Skew-symmetric tensor from a vector; (..., 3) -> (..., 3, 3).

    Reference tensornet.py:16-34.
    """
    x, y, z = vector[..., 0], vector[..., 1], vector[..., 2]
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def vector_to_symtensor(vector):
    """Traceless symmetric part of the outer product v v^T (tensornet.py:38-44)."""
    outer = vector[..., :, None] * vector[..., None, :]
    eye = jnp.eye(3, dtype=vector.dtype)
    trace = jnp.trace(outer, axis1=-2, axis2=-1)[..., None, None] / 3.0
    return 0.5 * (outer + jnp.swapaxes(outer, -2, -1)) - trace * eye


def decompose_tensor(t):
    """Split (..., 3, 3, H) into irreps I (trace), A (skew), S (sym-traceless).

    Reference tensornet.py:48-54 (channel axis moved last).
    """
    eye = jnp.eye(3, dtype=t.dtype)[:, :, None]
    trace = (t[..., 0, 0, :] + t[..., 1, 1, :] + t[..., 2, 2, :])[..., None, None, :] / 3.0
    i_part = trace * eye
    a_part = 0.5 * (t - jnp.swapaxes(t, -3, -2))
    s_part = 0.5 * (t + jnp.swapaxes(t, -3, -2)) - i_part
    return i_part, a_part, s_part


def tensor_norm(t):
    """Frobenius norm^2 over the 3x3 axes: (..., 3, 3, H) -> (..., H)."""
    return (t * t).sum(axis=(-3, -2))


def tensor_matmul(a, b):
    """3x3 matrix product per channel: (..., 3, 3, H) x (..., 3, 3, H)."""
    return jnp.einsum("...abh,...bch->...ach", a, b)


class TensorEmbedding(nn.Module):
    """Edge-tensor embedding (reference tensornet.py:237-326)."""

    hidden_channels: int
    num_rbf: int
    activation: str
    cutoff_lower: float
    cutoff_upper: float
    max_z: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z, nbl, dist, edge_dir, edge_attr):
        h = self.hidden_channels
        act = act_fn_mapping[self.activation]

        c = cosine_cutoff(dist, self.cutoff_lower, self.cutoff_upper)[..., None]
        w1 = TorchDefaultDense(h, self.num_rbf, dtype=self.dtype)(edge_attr) * c
        w2 = TorchDefaultDense(h, self.num_rbf, dtype=self.dtype)(edge_attr) * c
        w3 = TorchDefaultDense(h, self.num_rbf, dtype=self.dtype)(edge_attr) * c

        # Edge irrep tensors built straight from the (N, K) direction
        # components into channel-last (N, K, 3, 3, H) — the 3x3 axes sit in
        # the middle so H stays on the TPU lane dimension.
        ex, ey, ez = edge_dir
        zero = jnp.zeros_like(w1)

        def e33(rows):
            return jnp.stack(
                [jnp.stack(r, axis=-2) for r in rows], axis=-3
            )  # (N, K, 3, 3, H)

        iij = e33(
            [[w1, zero, zero], [zero, w1, zero], [zero, zero, w1]]
        )
        exw, eyw, ezw = ex[..., None] * w2, ey[..., None] * w2, ez[..., None] * w2
        aij = e33(
            [[zero, -ezw, eyw], [ezw, zero, -exw], [-eyw, exw, zero]]
        )
        v2 = (ex * ex + ey * ey + ez * ez)[..., None] / 3.0
        sxx = (ex * ex)[..., None] - v2
        syy = (ey * ey)[..., None] - v2
        szz = (ez * ez)[..., None] - v2
        sxy = (ex * ey)[..., None]
        sxz = (ex * ez)[..., None]
        syz = (ey * ez)[..., None]
        sij = e33(
            [
                [sxx * w3, sxy * w3, sxz * w3],
                [sxy * w3, syy * w3, syz * w3],
                [sxz * w3, syz * w3, szz * w3],
            ]
        )

        zemb = Embedding(self.max_z, h, dtype=self.dtype)(z)  # (N, H)
        zij = TorchDefaultDense(h, 2 * h, dtype=self.dtype)(
            jnp.concatenate(
                [
                    jnp.broadcast_to(zemb[:, None, :], (z.shape[0], nbl.k, h)),
                    ell_gather(zemb, nbl.idx),
                ],
                axis=-1,
            )
        )  # (N, K, H)
        gate = jnp.where(nbl.mask[..., None], zij, 0.0)[..., None, None, :]

        i_n = (gate * iij).sum(axis=1)  # (N, 3, 3, H)
        a_n = (gate * aij).sum(axis=1)
        s_n = (gate * sij).sum(axis=1)

        norm = LayerNorm(dtype=self.dtype)(tensor_norm(i_n + a_n + s_n))
        i_n = TorchDefaultDense(h, h, use_bias=False, dtype=self.dtype)(i_n)
        a_n = TorchDefaultDense(h, h, use_bias=False, dtype=self.dtype)(a_n)
        s_n = TorchDefaultDense(h, h, use_bias=False, dtype=self.dtype)(s_n)

        norm = act(TorchDefaultDense(2 * h, h, dtype=self.dtype)(norm))
        norm = act(TorchDefaultDense(3 * h, 2 * h, dtype=self.dtype)(norm))
        norm = norm.reshape(norm.shape[0], h, 3)

        x = (
            i_n * norm[:, None, None, :, 0]
            + a_n * norm[:, None, None, :, 1]
            + s_n * norm[:, None, None, :, 2]
        )
        return x


class Interaction(nn.Module):
    """One TensorNet interaction layer (reference tensornet.py:335-410)."""

    num_rbf: int
    hidden_channels: int
    activation: str
    cutoff_lower: float
    cutoff_upper: float
    equivariance_invariance_group: str
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, nbl, dist, edge_attr):
        h = self.hidden_channels
        act = act_fn_mapping[self.activation]

        c = cosine_cutoff(dist, self.cutoff_lower, self.cutoff_upper)
        w = act(TorchDefaultDense(h, self.num_rbf, dtype=self.dtype)(edge_attr))
        w = act(TorchDefaultDense(2 * h, h, dtype=self.dtype)(w))
        w = act(TorchDefaultDense(3 * h, 2 * h, dtype=self.dtype)(w))
        w = w * c[..., None]
        w = jnp.where(nbl.mask[..., None], w, 0.0)
        w = w.reshape(w.shape[0], w.shape[1], h, 3)  # (N, K, H, 3)

        x = x / (tensor_norm(x) + 1.0)[..., None, None, :]
        i_p, a_p, s_p = decompose_tensor(x)
        i_p = TorchDefaultDense(h, h, use_bias=False, dtype=self.dtype)(i_p)
        a_p = TorchDefaultDense(h, h, use_bias=False, dtype=self.dtype)(a_p)
        s_p = TorchDefaultDense(h, h, use_bias=False, dtype=self.dtype)(s_p)
        y = i_p + a_p + s_p

        # Edge-scalar-weighted tensor message passing (tensornet.py:329-332):
        # msg_i = sum_j f(i, j, c) * T[j, c]; gather-from-slots + masked sum.
        def mp(t, f):
            t_j = ell_gather(t, nbl.idx)  # (N, K, 3, 3, H)
            return (t_j * f[:, :, None, None, :]).sum(axis=1)

        msg = (
            mp(i_p, w[..., 0])
            + mp(a_p, w[..., 1])
            + mp(s_p, w[..., 2])
        )

        if self.equivariance_invariance_group == "O(3)":
            a_new = tensor_matmul(msg, y)
            b_new = tensor_matmul(y, msg)
            i_p, a_p, s_p = decompose_tensor(a_new + b_new)
        else:  # SO(3)
            b_new = tensor_matmul(y, msg)
            i_p, a_p, s_p = decompose_tensor(2.0 * b_new)

        normp1 = (tensor_norm(i_p + a_p + s_p) + 1.0)[..., None, None, :]
        i_p, a_p, s_p = i_p / normp1, a_p / normp1, s_p / normp1
        i_p = TorchDefaultDense(h, h, use_bias=False, dtype=self.dtype)(i_p)
        a_p = TorchDefaultDense(h, h, use_bias=False, dtype=self.dtype)(a_p)
        s_p = TorchDefaultDense(h, h, use_bias=False, dtype=self.dtype)(s_p)
        dx = i_p + a_p + s_p
        x = x + dx + tensor_matmul(dx, dx)
        return x


class TensorNet(nn.Module):
    """TensorNet (reference tensornet.py:70-234)."""

    hidden_channels: int = 128
    num_layers: int = 2
    num_rbf: int = 32
    rbf_type: str = "expnorm"
    trainable_rbf: bool = False
    activation: str = "silu"
    cutoff_lower: float = 0.0
    cutoff_upper: float = 4.5
    max_num_neighbors: int = 64
    max_z: int = 128
    equivariance_invariance_group: str = "O(3)"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z, pos, batch, atom_mask=None, q=None, s=None, box=None, nbl=None):
        assert self.equivariance_invariance_group in ("O(3)", "SO(3)")

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
        delta, dist = edge_geometry_components(pos, nbl, box=box)
        edge_attr = rbf_class_mapping[self.rbf_type](
            self.cutoff_lower,
            self.cutoff_upper,
            self.num_rbf,
            self.trainable_rbf,
            dtype=self.dtype,
        )(dist)

        # edge_vec = pos_i - pos_j = -delta; normalized except on self loops
        # (weight 1 there, tensornet.py:223-226); kept as (N, K) components.
        neg_inv = -(jnp.where(dist > 0, 1.0, 0.0) / jnp.where(dist > 0, dist, 1.0))
        edge_dir = tuple(comp * neg_inv for comp in delta)

        x = TensorEmbedding(
            self.hidden_channels,
            self.num_rbf,
            self.activation,
            self.cutoff_lower,
            self.cutoff_upper,
            self.max_z,
            dtype=self.dtype,
        )(z, nbl, dist, edge_dir, edge_attr)

        for _ in range(self.num_layers):
            x = Interaction(
                self.num_rbf,
                self.hidden_channels,
                self.activation,
                self.cutoff_lower,
                self.cutoff_upper,
                self.equivariance_invariance_group,
                dtype=self.dtype,
            )(x, nbl, dist, edge_attr)

        i_p, a_p, s_p = decompose_tensor(x)
        feats = jnp.concatenate(
            [tensor_norm(i_p), tensor_norm(a_p), tensor_norm(s_p)], axis=-1
        )
        feats = LayerNorm(dtype=self.dtype)(feats)
        act = act_fn_mapping[self.activation]
        out = act(
            TorchDefaultDense(self.hidden_channels, 3 * self.hidden_channels, dtype=self.dtype)(feats)
        )
        return out, None
