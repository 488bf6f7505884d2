"""Prior model interface.

Mirrors the reference BasePrior (torchmdnet/priors/base.py): priors hook into
the potential either per-atom before reduction (``pre_reduce``) or
per-molecule after (``post_reduce``).  Unlike the reference they receive the
atom mask and static molecule capacity so padded batches reduce exactly.

``get_init_args`` round-trips through checkpoints (prior_args in hparams,
reference model.py:166-169).
"""

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from torchmdnet_tpu.ops.segment import segment_reduce


class BasePrior(nn.Module):
    def get_init_args(self) -> Dict:
        return {}

    def build_neighbor_list(self, pos, batch_ids, atom_mask):
        """The prior's internal neighbor list, or None if it has none.

        Priors with pair terms (ZBL/D2/Coulomb) build their own list inside
        ``post_reduce`` with their own cutoff/capacity; exposing the same
        build here lets host code verify the static capacity before training
        or MD starts (the reference hard-errors inside forward via the
        Distance assert, utils.py:419-424 — inside jit we cannot raise, so
        the check runs loudly at setup instead).
        """
        return None

    def check_neighbor_capacity(self, batch, context: str = ""):
        """Host-side loud failure when this prior's neighbor list would
        silently truncate pairs (wrong physics).  Call outside jit at
        training/MD setup, like NeighborList.raise_on_overflow."""
        nbl = self.build_neighbor_list(batch.pos, batch.batch, batch.atom_mask)
        if nbl is not None:
            name = type(self).__name__
            ctx = f"the {name} prior" + (f" on {context}" if context else "")
            nbl.raise_on_overflow(ctx)

    def pre_reduce(self, x, z, pos, batch_ids, atom_mask, extra: Optional[Dict] = None):
        """Update per-atom scalar predictions x (N, 1)."""
        return x

    def post_reduce(
        self,
        y,
        z,
        pos,
        batch_ids,
        atom_mask,
        num_mol: int,
        extra: Optional[Dict] = None,
    ):
        """Update per-molecule predictions y (M, ...)."""
        return y


def molecular_pair_energy_sum(e_pair, batch_ids, atom_mask, mask, num_mol: int):
    """Sum per-edge energies (N, K) into per-molecule energies (M, 1).

    Every pair appears twice in the symmetric ELL list, so callers apply the
    0.5 factor themselves (matching the reference's convention, e.g.
    priors/zbl.py:61).
    """
    e_pair = jnp.where(mask, e_pair, 0.0)
    per_atom = e_pair.sum(axis=1)  # (N,)
    per_atom = jnp.where(atom_mask, per_atom, 0.0)
    # segment_reduce (not a raw segment_sum) so the reduction becomes the
    # two-stage partial-sum + psum under ring edge-partitioning
    per_mol = segment_reduce(per_atom, batch_ids, num_mol + 1, "sum")
    return per_mol[:num_mol, None]
