"""MD-engine calculator interface.

Equivalent of reference torchmdnet/calculators.py: the ``External`` class is
the hook MD engines (TorchMD/OpenMM/ACEMD-style integrations) call once per
step with positions and a box, returning (energy, forces) after an optional
unit transform.

TPU-native specifics: the energy+force function is jitted ONCE with donated
position buffers, so the per-step path is a single cached executable call —
the XLA analog of the reference's CUDA-graph replay ambitions.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from torchmdnet_tpu.data.batch import AtomicBatch
from torchmdnet_tpu.models.potential import check_atom_filter_batch, load_model

# dict of preset transforms (reference calculators.py:5-18)
tranforms = {
    "eV/A -> kcal/mol/A": lambda energy, forces: (
        energy * 23.0609,
        forces * 23.0609,
    ),
    "Hartree/Bohr -> kcal/mol/A": lambda energy, forces: (
        energy * 627.509,
        forces * 627.509 / 0.529177,
    ),
    "Hartree/A -> kcal/mol/A": lambda energy, forces: (
        energy * 627.509,
        forces * 627.509,
    ),
}
transforms = tranforms  # alias without the reference's typo


class External:
    """Batched external potential for MD engines (calculators.py:21-56).

    Args:
        netfile: checkpoint path (or a (Potential, params) tuple).
        embeddings: (nbatch, natoms) atom type indices; replicas share types.
        output_transform: preset name or a callable (energy, forces) ->
            (energy, forces).
        use_box: set True when `calculate` will be called with a periodic box.
        check_errors: verify on the first `calculate` that the model's and
            every prior's neighbor capacity holds for this system (one-time
            host fetch; the reference checks every step via check_errors,
            utils.py:251-257).
    """

    def __init__(self, netfile, embeddings, device=None, output_transform=None,
                 use_box=False, check_errors=True):
        if isinstance(netfile, tuple):
            self.model, self.params = netfile
            self.model.derivative = True
        else:
            self.model, self.params = load_model(netfile, derivative=True)
        embeddings = np.asarray(embeddings)
        self.n_batch, self.n_atoms = embeddings.shape
        n_total = self.n_batch * self.n_atoms

        z = jnp.asarray(embeddings.reshape(-1), jnp.int32)
        batch_ids = jnp.repeat(jnp.arange(self.n_batch, dtype=jnp.int32), self.n_atoms)
        self._template = AtomicBatch(
            z=z,
            pos=jnp.zeros((n_total, 3), jnp.float32),
            batch=batch_ids,
            atom_mask=jnp.ones((n_total,), bool),
            mol_mask=jnp.ones((self.n_batch,), bool),
            num_mol=self.n_batch,
        )
        self.use_box = use_box
        # atom types are fixed at construction, so the all-atoms-filtered
        # check (reference wrappers.py:45-48) can run right here
        check_atom_filter_batch(self.model.module, self._template, "External")

        if not output_transform:
            self.output_transformer = lambda energy, forces: (energy, forces)
        elif output_transform in tranforms:
            self.output_transformer = tranforms[output_transform]
        else:
            self.output_transformer = eval(output_transform)  # noqa: S307 (reference parity)

        # pos is NOT donated: MD engines often pass buffers they still hold
        # (donation would invalidate them); the saving is one (N, 3) array.
        from torchmdnet_tpu.ops.pallas import jit_vmem_retry

        @jit_vmem_retry
        def _step(params, pos, box):
            batch = self._template.replace(pos=pos)
            y, neg_dy = self.model.energy_and_forces(
                params, batch, box=box if self.use_box else None
            )
            return y, neg_dy

        self._step = _step
        self._default_box = jnp.eye(3, dtype=jnp.float32)
        self._check_errors = check_errors

    def calculate(self, pos, box: Optional[np.ndarray] = None):
        """One MD step: pos (nbatch*natoms, 3) or (nbatch, natoms, 3)."""
        # The jitted step closed over use_box at construction; silently
        # ignoring a mismatched box argument would be wrong physics.
        if box is not None and not self.use_box:
            raise ValueError(
                "External was constructed with use_box=False but calculate() "
                "received a box; rebuild with use_box=True."
            )
        if box is None and self.use_box:
            raise ValueError(
                "External was constructed with use_box=True but calculate() "
                "received no box."
            )
        pos = jnp.asarray(pos, jnp.float32).reshape(-1, 3)
        box_arr = (
            jnp.asarray(box, jnp.float32) if box is not None else self._default_box
        )
        if self._check_errors:
            # one-time loud capacity check for the model list AND every
            # prior-internal list (both silently truncate inside jit)
            self._check_errors = False
            batch = self._template.replace(pos=pos)
            b = box_arr if self.use_box else None
            self.model.neighbors(batch, box=b).raise_on_overflow(
                "External.calculate"
            )
            for prior in self.model.module.priors:
                prior.check_neighbor_capacity(batch, "External.calculate")
        energy, forces = self._step(self.params, pos, box_arr)
        return self.output_transformer(
            energy, forces.reshape(self.n_batch, self.n_atoms, 3)
        )
