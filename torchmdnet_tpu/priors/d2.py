"""Grimme DFT-D2 dispersion correction prior.

Equivalent of reference priors/d2.py: damped -s6*C6/r^6 pair energies with the
element table (C_6 in J/mol*nm^6, vdW radii converted to nm) from Grimme 2006,
Table 1 (elements up to Z=54).
"""

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from torchmdnet_tpu.constants import AVOGADRO
from torchmdnet_tpu.ops.neighbors import edge_geometry, ell_gather, neighbor_list
from torchmdnet_tpu.priors.base import BasePrior, molecular_pair_energy_sum

# fmt: off
# [C_6 (J/mol*nm^6), R_r (Angstrom)] per atomic number; Grimme 2006 Table 1.
_C6_RR = np.array([
    [np.nan, np.nan],
    [0.14, 1.001], [0.08, 1.012], [1.61, 0.825], [1.61, 1.408], [3.13, 1.485],
    [1.75, 1.452], [1.23, 1.397], [0.70, 1.342], [0.75, 1.287], [0.63, 1.243],
    [5.71, 1.144], [5.71, 1.364], [10.79, 1.639], [9.23, 1.716], [7.84, 1.705],
    [5.57, 1.683], [5.07, 1.639], [4.61, 1.595], [10.80, 1.485], [10.80, 1.474],
    [10.80, 1.562], [10.80, 1.562], [10.80, 1.562], [10.80, 1.562], [10.80, 1.562],
    [10.80, 1.562], [10.80, 1.562], [10.80, 1.562], [10.80, 1.562], [10.80, 1.562],
    [16.99, 1.650], [17.10, 1.727], [16.37, 1.760], [12.64, 1.771], [12.47, 1.749],
    [12.01, 1.727], [24.67, 1.628], [24.67, 1.606], [24.67, 1.639], [24.67, 1.639],
    [24.67, 1.639], [24.67, 1.639], [24.67, 1.639], [24.67, 1.639], [24.67, 1.639],
    [24.67, 1.639], [24.67, 1.639], [24.67, 1.639], [37.32, 1.672], [38.71, 1.804],
    [38.44, 1.881], [31.74, 1.892], [31.50, 1.892], [29.99, 1.881],
])
_C6_RR[:, 1] *= 0.1  # Angstrom -> nm
# fmt: on


class D2(BasePrior):
    cutoff_distance: float = 10.0
    # default matches the reference (priors/d2.py:40); at the 10 A default
    # cutoff a small capacity silently truncates on anything dense
    max_num_neighbors: int = 128
    atomic_number: Tuple[int, ...] = ()
    distance_scale: float = 1e-10
    energy_scale: float = 1.0
    d: float = 20.0
    s_6: float = 1.0

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
        # Internal units: nm and J/mol (priors/d2.py:155-160).
        r_ij = dist * (self.distance_scale * 1e9)
        r_ij = jnp.where(nbl.mask, r_ij, 1.0)
        energy_scale_jmol = self.energy_scale * AVOGADRO

        zmap = jnp.asarray(self.atomic_number, dtype=jnp.int32)
        table = jnp.asarray(_C6_RR, dtype=pos.dtype)
        zi = zmap[z]
        c6i, rri = table[zi, 0][:, None], table[zi, 1][:, None]
        # gather per-atom float rows, not atom types: ring-safe AND one fewer
        # table lookup per edge
        c6j = ell_gather(table[zi, 0], nbl.idx)  # (N, K)
        rrj = ell_gather(table[zi, 1], nbl.idx)
        c6 = jnp.sqrt(c6i * c6j)
        rr = rri + rrj
        f_damp = 1.0 / (1.0 + jnp.exp(-self.d * (r_ij / rr - 1.0)))
        e_pair = c6 / r_ij**6 * f_damp
        e_mol = molecular_pair_energy_sum(e_pair, batch_ids, atom_mask, nbl.mask, num_mol)
        e_disp = -self.s_6 * e_mol / 2.0
        return y + (e_disp / energy_scale_jmol).reshape(y.shape)
