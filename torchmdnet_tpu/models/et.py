"""Equivariant Transformer representation model.

TPU-native re-design of the reference TorchMD_ET
(torchmdnet/models/torchmd_et.py).  Differences from the reference are purely
representational, not mathematical:

- neighbor interactions run over the dense ELL format (N, K) instead of a
  dynamic COO edge list: every per-edge quantity is (N, K, ...) and
  aggregation is a masked sum over the K axis (the reference's scatter-add,
  torchmd_et.py:337-347);
- d_ij follows the reference's sign convention for PyG source_to_target flow:
  the unit vector from receiving atom i to neighbor j (torchmd_et.py:173-174
  with edge_vec = pos[source] - pos[target]);
- self-interaction: column 0 of the neighbor list is the self edge
  (loop=True, torchmd_et.py:106-113), with distance 0 and zero direction.

Everything under jit is statically shaped; forces and force-training
(grad-of-grad) work through plain autodiff.
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


def vproj_column_perm(hidden_channels: int, num_heads: int) -> np.ndarray:
    """Column permutation between the reference's v/dv projection layout and
    ours.

    The reference splits the 3H-wide value projection PER HEAD
    (torchmd_et.py: v_j.reshape(-1, heads, 3*head_dim) then split(head_dim)),
    i.e. reference column g*3hd + p*hd + d holds (head g, part p, dim d).
    This framework splits in GLOBAL thirds (our column p*H + g*hd + d) so
    every tensor stays full-width on the 128-lane axis.  The math is
    identical with permuted weight columns: W_ours = W_ref[:, perm] with the
    perm returned here.  The torch-checkpoint importer applies it; fresh
    training is unaffected (column-permutation-invariant init).
    """
    hd = hidden_channels // num_heads
    ours = np.arange(3 * hidden_channels)
    p, rem = np.divmod(ours, hidden_channels)
    g, d = np.divmod(rem, hd)
    return g * 3 * hd + p * hd + d


class EquivariantMultiHeadAttention(nn.Module):
    """One ET attention layer (reference torchmd_et.py:208-352) in ELL form."""

    hidden_channels: int
    num_rbf: int
    distance_influence: str
    num_heads: int
    activation: str
    attn_activation: str
    cutoff_lower: float
    cutoff_upper: float
    bf16_messages: bool = False
    fused_attention: bool = False
    # under nn.remat: tag the fused outputs for the save-list policy (the
    # checkpoint_name barrier is pure overhead outside remat — measured ~8%
    # on the non-remat fused force eval)
    tag_remat: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, vec, nbl: NeighborList, dist, edge_attr, edge_dir):
        n = x.shape[0]
        h = self.hidden_channels
        heads = self.num_heads
        hd = h // heads
        act = act_fn_mapping[self.activation]
        attn_act = act_fn_mapping[self.attn_activation]

        # bf16_messages: all (N, K, ...) edge intermediates (distance filters,
        # gathered rows, attention, messages) are HBM-traffic-bound, not
        # compute-bound; run them in bf16 and accumulate every K-axis
        # reduction in the full dtype (same recipe as tensornet.Interaction).
        # Node-level (N, H) math stays in full precision.
        mp_dtype = jnp.bfloat16 if self.bf16_messages else self.dtype
        acc_dtype = x.dtype
        ecast = (lambda t: t.astype(jnp.bfloat16)) if self.bf16_messages else (lambda t: t)

        x = LayerNorm(dtype=self.dtype)(x)
        q = XavierDense(h, dtype=self.dtype)(x)  # (N, H)
        k = XavierDense(h, dtype=self.dtype)(x)  # (N, H)
        v = XavierDense(3 * h, dtype=self.dtype)(x)  # (N, 3H)

        # vec is a tuple of three (N, H) xyz components (no (N, 3, H) tensor
        # anywhere: its 3-wide sublane axis pads 2.7x and every relayout
        # costs); ONE shared projection module applied per component.
        vec_proj = XavierDense(3 * h, use_bias=False, dtype=self.dtype)
        vec123 = tuple(vec_proj(vc) for vc in vec)  # 3 x (N, 3H)
        vec1 = tuple(vc[:, :h] for vc in vec123)
        vec2 = tuple(vc[:, h : 2 * h] for vc in vec123)
        vec3 = tuple(vc[:, 2 * h :] for vc in vec123)
        vec_dot = sum(v1 * v2 for v1, v2 in zip(vec1, vec2))  # (N, H)

        use_fused = False
        if self.fused_attention and not self.is_initializing():
            from torchmdnet_tpu.ops.pallas import fused_kernel_mode

            mode = fused_kernel_mode()
            if mode is not None:
                # The platform can run the kernel: missing preconditions are
                # a configuration error, not a silent fallback (a no-op
                # --fused-attention flag is worse than none).
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
                        "fused_attention=True requires bf16_messages=True "
                        "(the kernel computes the edge phase in bf16 with "
                        "f32 accumulation)."
                    )
                if h % 128 != 0:
                    raise ValueError(
                        f"fused_attention=True requires hidden_channels "
                        f"divisible by 128 (the MXU lane width); got {h}."
                    )
                use_fused = True
            # mode None (CPU/GPU, no interpret opt-in): composable path —
            # interpret mode would be orders of magnitude slower.
        if use_fused:
            # Entire edge phase (gather + filters + attention + products +
            # K-reduce) in one Pallas kernel; no (N, K, F) HBM intermediates
            # (ops/pallas/et_message.py).  Differentiable at every order:
            # forces/MD/energy training run the fwd+bwd kernels, force
            # training adds a composable second-order rule for the outer
            # pass (et_message.py module docstring).
            from torchmdnet_tpu.ops.pallas.et_message import (
                FusedETConfig,
                fused_et_messages,
            )

            # Pin the Dense auto-names the composable branch would produce so
            # both parameter trees are identical (q/k/v/vec_proj took 0-3).
            di = 4
            has_dk = self.distance_influence in ("keys", "both")
            has_dv = self.distance_influence in ("values", "both")
            if has_dk:
                wdk, bdk = DenseParams(h, self.num_rbf, name=f"Dense_{di}")()
                di += 1
            else:
                wdk = jnp.zeros((self.num_rbf, h), jnp.float32)
                bdk = jnp.zeros((h,), jnp.float32)
            if has_dv:
                wdv, bdv = DenseParams(3 * h, self.num_rbf, name=f"Dense_{di}")()
                di += 1
            else:
                wdv = jnp.zeros((self.num_rbf, 3 * h), jnp.float32)
                bdv = jnp.zeros((3 * h,), jnp.float32)
            o_name = f"Dense_{di}"

            bf = jnp.bfloat16
            f32 = jnp.float32
            # per-edge scalars ride f32 (the kernel casts after broadcasting;
            # Mosaic cannot insert a minor dim on 16-bit operands)
            cutm = (
                cosine_cutoff(dist, self.cutoff_lower, self.cutoff_upper)
                * nbl.mask
            ).astype(f32)
            # Ring edge-partitioning: the executor attaches the boundary
            # schedules to the plan (BlockGatherPlan.ring); the static mesh
            # coordinates ride the hashable config so the custom_transpose
            # bodies never read the ring context (et_message.py docstring).
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
            cfg = FusedETConfig(
                h=h,
                heads=heads,
                act=self.activation,
                attn_act=self.attn_activation,
                has_dk=has_dk,
                has_dv=has_dv,
                interpret=mode == "interpret",
                # R*kc ~ 128 rows per MXU call balances matmul granularity
                # against the 16 MB scoped-VMEM limit (kc=8 at R=16 measured
                # fitting at K~100/W=384; larger R or W needs smaller chunks)
                kc=max(2, 128 // nbl.gather_plan.block_rows),
                **ring_kwargs,
            )
            x_agg, vec_cat = fused_et_messages(
                cfg,
                nbl.gather_plan,
                q.astype(bf),
                k.astype(bf),
                v.astype(bf),
                vec[0].astype(bf),
                vec[1].astype(bf),
                vec[2].astype(bf),
                edge_attr.astype(bf),
                cutm,
                nbl.mask.astype(f32),
                edge_dir[0].astype(f32),
                edge_dir[1].astype(f32),
                edge_dir[2].astype(f32),
                wdk.astype(bf),
                bdk.astype(bf).reshape(1, -1),
                wdv.astype(bf),
                bdv.astype(bf).reshape(1, -1),
            )
            if self.tag_remat:
                # Under remat, save the kernel outputs (policy in
                # TorchMD_ET): the bwd kernel recomputes its chunks
                # internally, so re-running the 60 ms fwd kernel during the
                # layer's backward only serves to rebuild these two
                # (N, H)/(N, 3H) aggregates — measured 21% of the ET STMV
                # MD step (PERF.md r4 trace).
                from jax.ad_checkpoint import checkpoint_name

                x_agg = checkpoint_name(x_agg, "fused_edge_agg")
                vec_cat = checkpoint_name(vec_cat, "fused_edge_agg")
            acc_dtype = x.dtype
            x_agg = x_agg.astype(acc_dtype)
            vec_agg = [
                vec_cat[:, c * h : (c + 1) * h].astype(acc_dtype) for c in range(3)
            ]
            o1, o2, o3 = jnp.split(
                XavierDense(3 * h, dtype=self.dtype, name=o_name)(x_agg), 3, axis=-1
            )
            dx = vec_dot * o2 + o3
            dvec = tuple(v3 * o1 + agg for v3, agg in zip(vec3, vec_agg))
            return dx, dvec

        # TPU layout note: every per-edge tensor stays (..., H) with the full
        # H=128 channels on the lane axis.  A (N, K, heads, hd=16) layout pads
        # the 16-wide trailing dim to 128 lanes (8x memory/bandwidth waste —
        # measured 4x whole-model slowdown).  Per-head attention reductions
        # are instead ONE small matmul with a block-of-ones matrix: each lane
        # receives its own head's sum, already broadcast.
        ones_block = jnp.asarray(
            np.kron(np.eye(heads), np.ones((hd, hd))),
            mp_dtype if mp_dtype is not None else x.dtype,
        )  # (H, H), 1 where both lanes belong to the same head

        # distance filters on edge RBFs, full width
        dk = None
        if self.distance_influence in ("keys", "both"):
            dk = act(XavierDense(h, dtype=mp_dtype)(edge_attr))  # (N, K, H)
        dv = None
        if self.distance_influence in ("values", "both"):
            dv = act(XavierDense(3 * h, dtype=mp_dtype)(edge_attr))  # (N, K, 3H)

        # --- per-edge message (reference message(), torchmd_et.py:314-335) ---
        k_j = ell_gather(ecast(k), nbl.idx, nbl.gather_plan)  # (N, K, H)
        prod = ecast(q)[:, None, :] * k_j
        if dk is not None:
            prod = prod * dk
        # per-head sum, broadcast back to the head's lanes, in one matmul
        attn = prod @ ones_block  # (N, K, H); lane l holds sum over l's head
        attn = attn_act(attn) * ecast(
            cosine_cutoff(dist, self.cutoff_lower, self.cutoff_upper)
        )[..., None]
        attn = jnp.where(nbl.mask[..., None], attn, 0.0)

        v_j = ell_gather(ecast(v), nbl.idx, nbl.gather_plan)  # (N, K, 3H)
        if dv is not None:
            v_j = v_j * dv
        x_m, vw1, vw2 = jnp.split(v_j, 3, axis=-1)  # each (N, K, H)

        x_msg = x_m * attn  # (N, K, H)

        # Vector messages, built per xyz component so the small (N, K) edge
        # directions broadcast straight into the wide H-trailing tensors
        # (no (N, K, 3) lane-padded intermediate).  NOTE: fusing the three
        # component gathers into one (N, 3H) gather was measured SLOWER
        # (the (N, 3, H) -> (N, 3H) relayout in the autodiff path costs more
        # than the saved gather rows) — keep per-component gathers.
        mask3 = nbl.mask[:, :, None]
        vec_agg = []
        for c in range(3):
            vec_j_c = ell_gather(ecast(vec[c]), nbl.idx, nbl.gather_plan)  # (N, K, H)
            msg_c = vec_j_c * vw1 + vw2 * ecast(edge_dir[c])[..., None]
            msg_c = jnp.where(mask3, msg_c, 0.0)
            vec_agg.append(msg_c.sum(axis=1, dtype=acc_dtype))

        # --- aggregate over neighbor slots (scatter-add analog) ---
        x_agg = x_msg.sum(axis=1, dtype=acc_dtype)

        # --- node update (torchmd_et.py:309-312) ---
        o1, o2, o3 = jnp.split(XavierDense(3 * h, dtype=self.dtype)(x_agg), 3, axis=-1)
        dx = vec_dot * o2 + o3
        dvec = tuple(v3 * o1 + agg for v3, agg in zip(vec3, vec_agg))
        return dx, dvec


class TorchMD_ET(nn.Module):
    """Equivariant Transformer (reference torchmd_et.py:14-205)."""

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
    # bf16_messages + a neighbor list carrying a gather plan; differentiable
    # at every order).  See ops/pallas/et_message.py.
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
        delta, dist = edge_geometry_components(pos, nbl, box=box)

        edge_attr = rbf_class_mapping[self.rbf_type](
            self.cutoff_lower,
            self.cutoff_upper,
            self.num_rbf,
            self.trainable_rbf,
            dtype=self.dtype,
            # the reference ET omits dtype when building its RBF
            # (torchmd_et.py:114-116), leaving float32 constants in any
            # precision mode; reproduced for checkpoint/golden parity
            buffer_dtype=jnp.float32,
        )(dist)

        # Unit vector from receiver i to neighbor j; zero for self/invalid
        # slots (the reference normalizes only non-self edges,
        # torchmd_et.py:173-174).  Kept as per-component (N, K) arrays.
        inv_dist = jnp.where(dist > 0, 1.0, 0.0) / jnp.where(dist > 0, dist, 1.0)
        edge_dir = tuple(comp * inv_dist for comp in delta)

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

        zero = jnp.zeros((x.shape[0], self.hidden_channels), dtype=x.dtype)
        vec = (zero, zero, zero)  # xyz components, each (N, H)

        if self.remat:
            # save-list remat: everything recomputes EXCEPT the fused edge
            # kernel's aggregates — the backward kernel rebuilds its own
            # internals, so re-running the fwd kernel in the backward pass
            # is pure waste (21% of the fused STMV MD step; PERF.md r4)
            layer_cls = nn.remat(
                EquivariantMultiHeadAttention,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "fused_edge_agg"
                ),
            )
        else:
            layer_cls = EquivariantMultiHeadAttention
        for li in range(self.num_layers):
            # explicit name keeps the param tree identical with/without remat
            dx, dvec = layer_cls(
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
                name=f"EquivariantMultiHeadAttention_{li}",
            )(x, vec, nbl, dist, edge_attr, edge_dir)
            x = x + dx
            vec = tuple(vc + dc for vc, dc in zip(vec, dvec))
        x = LayerNorm(dtype=self.dtype)(x)

        # boundary conversion for output heads: (N, 3, H), once per forward
        return x, jnp.stack(vec, axis=1)
