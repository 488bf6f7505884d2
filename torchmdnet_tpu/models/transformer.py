"""Invariant graph Transformer representation model.

TPU-native re-design of the reference TorchMD_T
(torchmdnet/models/torchmd_t.py): per-edge multi-head attention with
RBF-projected distance filters on keys/values, cosine-cutoff-weighted
activations, over the dense ELL neighbor format.  Self-loops included
(reference Distance loop=True, torchmd_t.py:102-104).
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from torchmdnet_tpu.models.blocks import (
    DenseParams,
    Embedding,
    LayerNorm,
    NeighborEmbedding,
    XavierDense,
)
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
    fused_attention: bool = False  # fused Pallas edge kernel (t_message.py)
    tag_remat: bool = False  # tag fused output for save-list remat (et.py)
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

        use_fused = False
        if self.fused_attention and not self.is_initializing():
            from torchmdnet_tpu.ops.pallas import fused_kernel_mode

            mode = fused_kernel_mode()
            if mode is not None:
                # kernel-capable platform: missing preconditions are a loud
                # configuration error, not a silent fallback (see et.py)
                if nbl.gather_plan is None:
                    raise ValueError(
                        "fused_attention=True but the neighbor list has no "
                        "gather plan. Build it via Potential.neighbors(batch, "
                        "gather_plan=True) on a spatially sorted batch and "
                        "pass it into apply/energy_and_forces (the trainer "
                        "and RingExecutor do this when --fused-attention is "
                        "set)."
                    )
                if not self.bf16_messages:
                    raise ValueError(
                        "fused_attention=True requires bf16_messages=True."
                    )
                if h % 128 != 0:
                    raise ValueError(
                        f"fused_attention=True requires hidden_channels "
                        f"divisible by 128 (the MXU lane width); got {h}."
                    )
                use_fused = True
        if use_fused:
            from torchmdnet_tpu.ops.pallas.t_message import (
                FusedTConfig,
                fused_t_messages,
            )

            # pin the composable branch's Dense auto-names (q/k/v took 0-2)
            di = 3
            has_dk = self.distance_influence in ("keys", "both")
            has_dv = self.distance_influence in ("values", "both")
            if has_dk:
                wdk, bdk = DenseParams(h, self.num_rbf, name=f"Dense_{di}")()
                di += 1
            else:
                wdk = jnp.zeros((self.num_rbf, h), jnp.float32)
                bdk = jnp.zeros((h,), jnp.float32)
            if has_dv:
                wdv, bdv = DenseParams(h, self.num_rbf, name=f"Dense_{di}")()
                di += 1
            else:
                wdv = jnp.zeros((self.num_rbf, h), jnp.float32)
                bdv = jnp.zeros((h,), jnp.float32)
            o_name = f"Dense_{di}"

            ring_kwargs = {}
            from torchmdnet_tpu.parallel.context import ring_info

            rinfo = ring_info()
            if rinfo is not None:
                if nbl.gather_plan.ring is None:
                    raise ValueError(
                        "fused_attention under ring edge-partitioning needs "
                        "a gather plan carrying ring boundary schedules "
                        "(BlockGatherPlan.ring); build it through "
                        "RingExecutor (parallel/edge_partition.py)."
                    )
                ring_kwargs = dict(ring_axis=rinfo.axis, ring_d=rinfo.n_shards)
            bf = jnp.bfloat16
            cutm = (
                cosine_cutoff(dist, self.cutoff_lower, self.cutoff_upper)
                * nbl.mask
            ).astype(jnp.float32)
            cfg = FusedTConfig(
                h=h,
                heads=heads,
                act=self.activation,
                attn_act=self.attn_activation,
                has_dk=has_dk,
                has_dv=has_dv,
                interpret=mode == "interpret",
                kc=max(2, 128 // nbl.gather_plan.block_rows),
                **ring_kwargs,
            )
            out = fused_t_messages(
                cfg,
                nbl.gather_plan,
                q.astype(bf),
                k.astype(bf),
                v.astype(bf),
                edge_attr.astype(bf),
                cutm,
                wdk.astype(bf),
                bdk.astype(bf).reshape(1, -1),
                wdv.astype(bf),
                bdv.astype(bf).reshape(1, -1),
            ).astype(acc_dtype)
            if self.tag_remat:
                from jax.ad_checkpoint import checkpoint_name

                out = checkpoint_name(out, "fused_edge_agg")
            return XavierDense(h, dtype=self.dtype, name=o_name)(out)

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
    # Route the edge phase through the fused Pallas kernel (requires
    # bf16_messages + a gather plan; see ops/pallas/t_message.py).
    fused_attention: bool = False
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

        if self.remat:
            # save the fused kernel's aggregate under remat (see models/et.py)
            layer_cls = nn.remat(
                MultiHeadAttention,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "fused_edge_agg"
                ),
            )
        else:
            layer_cls = MultiHeadAttention
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
                fused_attention=self.fused_attention,
                tag_remat=self.remat,
                dtype=self.dtype,
                name=f"MultiHeadAttention_{li}",
            )(x, nbl, dist, edge_attr)
        x = LayerNorm(dtype=self.dtype)(x)

        return x, None
