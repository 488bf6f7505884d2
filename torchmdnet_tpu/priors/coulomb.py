"""erf-damped Coulomb prior.

Equivalent of reference priors/coulomb.py: pairwise q_i q_j erf(alpha r)/r
using per-atom partial charges provided by the dataset via
``extra['partial_charges']``.
"""

from typing import Dict

import jax
import jax.numpy as jnp

from torchmdnet_tpu.constants import COULOMB_CONSTANT_JM
from torchmdnet_tpu.ops.neighbors import edge_geometry, ell_gather, neighbor_list
from torchmdnet_tpu.priors.base import BasePrior, molecular_pair_energy_sum


class Coulomb(BasePrior):
    alpha: float = 1.0  # in 1/nm, as in the reference (priors/coulomb.py:41)
    max_num_neighbors: int = 32
    distance_scale: float = 1e-10
    energy_scale: float = 1.0

    def get_init_args(self) -> Dict:
        return {
            "alpha": self.alpha,
            "max_num_neighbors": self.max_num_neighbors,
            "distance_scale": self.distance_scale,
            "energy_scale": self.energy_scale,
        }

    def build_neighbor_list(self, pos, batch_ids, atom_mask):
        # cutoff inf (every same-molecule pair, priors/coulomb.py:23); the
        # unit scale of pos is irrelevant for an unbounded cutoff
        return neighbor_list(
            pos,
            batch_ids,
            atom_mask,
            k=self.max_num_neighbors,
            cutoff_lower=0.0,
            cutoff_upper=jnp.inf,
            loop=False,
        )

    def post_reduce(self, y, z, pos, batch_ids, atom_mask, num_mol, extra=None):
        assert extra is not None and "partial_charges" in extra, (
            "The Coulomb prior requires the dataset to provide per-atom "
            "partial_charges (reference priors/coulomb.py:45)."
        )
        # Reference computes in nm: x = 1e9*distance_scale*pos,
        # alpha_nm = alpha/(1e9*distance_scale).  The product alpha*r is
        # scale-invariant, so evaluate in nm directly.
        pos_nm = 1e9 * self.distance_scale * pos
        nbl = self.build_neighbor_list(pos, batch_ids, atom_mask)
        _, dist = edge_geometry(pos_nm, nbl)
        dist_safe = jnp.where(nbl.mask, dist, 1.0)
        pq = extra["partial_charges"]
        qi = pq[:, None]
        qj = ell_gather(pq, nbl.idx)  # ring-safe cross-atom read
        e_pair = jax.scipy.special.erf(self.alpha * dist_safe) * qi * qj / dist_safe
        e_mol = molecular_pair_energy_sum(e_pair, batch_ids, atom_mask, nbl.mask, num_mol)
        e_mol = 0.5 * (COULOMB_CONSTANT_JM / self.energy_scale / self.distance_scale) * e_mol
        return y + e_mol.reshape(y.shape)
