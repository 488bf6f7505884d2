"""Ziegler-Biersack-Littmark screened nuclear repulsion prior.

Equivalent of reference priors/zbl.py (eqs. 9-10 of the ZBL chapter): a
4-exponential screening function under a cosine cutoff, evaluated over its own
neighbor list and added per molecule after reduction.  The 0.5 factor accounts
for each pair appearing twice in the symmetric list.
"""

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from torchmdnet_tpu.constants import BOHR_RADIUS_M, COULOMB_CONSTANT_JM
from torchmdnet_tpu.ops.cutoff import cosine_cutoff
from torchmdnet_tpu.ops.neighbors import edge_geometry, ell_gather, neighbor_list
from torchmdnet_tpu.priors.base import BasePrior, molecular_pair_energy_sum


class ZBL(BasePrior):
    cutoff_distance: float = 4.0
    max_num_neighbors: int = 32
    atomic_number: Tuple[int, ...] = ()  # atom type -> atomic number map
    distance_scale: float = 1e-10  # dataset units -> meters
    energy_scale: float = 1.0  # dataset units -> Joules

    def get_init_args(self) -> Dict:
        return {
            "cutoff_distance": self.cutoff_distance,
            "max_num_neighbors": self.max_num_neighbors,
            "atomic_number": list(self.atomic_number),
            "distance_scale": self.distance_scale,
            "energy_scale": self.energy_scale,
        }

    def build_neighbor_list(self, pos, batch_ids, atom_mask):
        return neighbor_list(
            pos,
            batch_ids,
            atom_mask,
            k=self.max_num_neighbors,
            cutoff_lower=0.0,
            cutoff_upper=self.cutoff_distance,
            loop=False,
        )

    def post_reduce(self, y, z, pos, batch_ids, atom_mask, num_mol, extra=None):
        nbl = self.build_neighbor_list(pos, batch_ids, atom_mask)
        _, dist = edge_geometry(pos, nbl)
        zmap = jnp.asarray(self.atomic_number, dtype=pos.dtype)
        zi = zmap[z][:, None]  # (N, 1)
        # ell_gather (not direct indexing): under ring edge-partitioning the
        # idx holds GLOBAL atom ids while zmap[z] is this shard's rows
        zj = ell_gather(zmap[z], nbl.idx)  # (N, K)
        a = 0.8854 * BOHR_RADIUS_M / (zi**0.23 + zj**0.23)
        dist_safe = jnp.where(nbl.mask, dist, 1.0)
        d = dist_safe * self.distance_scale / a
        f = (
            0.1818 * jnp.exp(-3.2 * d)
            + 0.5099 * jnp.exp(-0.9423 * d)
            + 0.2802 * jnp.exp(-0.4029 * d)
            + 0.02817 * jnp.exp(-0.2016 * d)
        )
        f = f * cosine_cutoff(dist_safe, 0.0, self.cutoff_distance)
        e_pair = f * zi * zj / dist_safe
        e_mol = molecular_pair_energy_sum(e_pair, batch_ids, atom_mask, nbl.mask, num_mol)
        e_mol = 0.5 * (COULOMB_CONSTANT_JM / self.energy_scale / self.distance_scale) * e_mol
        return y + e_mol.reshape(y.shape)
