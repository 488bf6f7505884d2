"""Atomref prior: trainable per-element reference energies.

Equivalent of reference priors/atomref.py: a (max_z, 1) embedding seeded from
the dataset's ``get_atomref()`` and added to each atom's scalar prediction
before reduction.
"""

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from torchmdnet_tpu.priors.base import BasePrior


class Atomref(BasePrior):
    max_z: Optional[int] = None
    # Initial values as a hashable tuple so the module stays a valid static
    # argument under jit; None -> zeros(max_z).
    initial_atomref: Optional[Tuple[float, ...]] = None

    @staticmethod
    def from_dataset(dataset=None, max_z=None):
        """Factory mirroring the reference ctor (priors/atomref.py:20-38)."""
        if max_z is None and dataset is None:
            raise ValueError("Can't instantiate Atomref prior, all arguments are None.")
        atomref = None
        if dataset is not None:
            atomref = dataset.get_atomref()
            if atomref is None:
                atomref = np.zeros((100, 1))
        if atomref is None:
            atomref = np.zeros((max_z, 1))
        atomref = np.asarray(atomref).reshape(-1)
        return Atomref(max_z=len(atomref), initial_atomref=tuple(float(v) for v in atomref))

    def _initial(self):
        if self.initial_atomref is None:
            return jnp.zeros((self.max_z, 1), dtype=jnp.float32)
        return jnp.asarray(self.initial_atomref, dtype=jnp.float32)[:, None]

    def get_init_args(self) -> Dict:
        return {"max_z": self.max_z if self.max_z is not None else len(self.initial_atomref)}

    def setup(self):
        self.atomref = self.param("atomref", lambda rng: self._initial())

    def pre_reduce(self, x, z, pos, batch_ids, atom_mask, extra=None):
        return x + self.atomref[z]
