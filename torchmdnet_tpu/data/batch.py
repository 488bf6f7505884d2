"""Statically-shaped batched molecular data.

The reference relies on torch-geometric's concat collation with dynamic sizes
per step (torchmdnet/data.py:127-148).  On TPU every shape under jit must be
static, so a batch is padded to a fixed (num_atoms, num_molecules) capacity:

- padding atoms have atom_mask False, z = 0, pos = 0, and batch id equal to
  ``num_mol`` (a trash segment sliced off after reduction);
- padding molecules have mol_mask False.

Capacities are chosen by the dataloader via bucketing to avoid recompiles.
"""

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class AtomicBatch:
    """One padded batch of molecules.

    Sample schema mirrors the reference's Data(z, pos, y?, neg_dy?, q?, s?,
    pq?, dp?) (README.md:53-57).
    """

    z: jnp.ndarray  # (N,) int32 atomic numbers / atom types; padding = 0
    pos: jnp.ndarray  # (N, 3)
    batch: jnp.ndarray  # (N,) int32 molecule id; padding atoms -> num_mol
    atom_mask: jnp.ndarray  # (N,) bool
    mol_mask: jnp.ndarray  # (M,) bool
    num_mol: int = struct.field(pytree_node=False)  # static M (padded capacity)
    y: Optional[jnp.ndarray] = None  # (M, 1) energies
    neg_dy: Optional[jnp.ndarray] = None  # (N, 3) forces
    q: Optional[jnp.ndarray] = None  # (M,) total charge
    s: Optional[jnp.ndarray] = None  # (M,) spin
    extra: Dict[str, jnp.ndarray] = struct.field(default_factory=dict)

    @property
    def num_atoms(self):
        return self.z.shape[0]


def pad_molecules(
    mols: Sequence[Dict[str, np.ndarray]],
    num_atoms: int,
    num_mol: Optional[int] = None,
    extra_atom_keys: Sequence[str] = (),
    float_dtype=np.float32,
    mol_id_offset: int = 0,
    num_mol_global: Optional[int] = None,
) -> AtomicBatch:
    """Collate a list of per-molecule dicts into one padded AtomicBatch.

    Each dict has at least ``z (n,), pos (n, 3)`` and optionally ``y, neg_dy,
    q, s`` plus extra per-atom fields (e.g. partial_charges).

    Multi-host shards (parallel/distributed.py): when this batch is one
    process's slice of a larger global batch, ``mol_id_offset`` is the rank
    of the first local molecule in the global batch and ``num_mol_global``
    the global molecule capacity — batch ids are then global (padding atoms
    point at the GLOBAL trash segment) and ``AtomicBatch.num_mol`` carries
    the global capacity for the segment reductions.
    """
    if num_mol is None:
        num_mol = len(mols)
    assert len(mols) <= num_mol
    total = sum(len(m["z"]) for m in mols)
    assert total <= num_atoms, f"batch needs {total} atom slots, capacity {num_atoms}"
    if num_mol_global is None:
        num_mol_global = num_mol
        assert mol_id_offset == 0
    trash = num_mol_global

    z = np.zeros(num_atoms, dtype=np.int32)
    pos = np.zeros((num_atoms, 3), dtype=float_dtype)
    batch = np.full(num_atoms, trash, dtype=np.int32)
    atom_mask = np.zeros(num_atoms, dtype=bool)
    mol_mask = np.zeros(num_mol, dtype=bool)

    has_y = all("y" in m and m["y"] is not None for m in mols) and mols
    has_f = all("neg_dy" in m and m["neg_dy"] is not None for m in mols) and mols
    has_q = all("q" in m and m["q"] is not None for m in mols) and mols
    has_s = all("s" in m and m["s"] is not None for m in mols) and mols
    y = np.zeros((num_mol, 1), dtype=float_dtype) if has_y else None
    neg_dy = np.zeros((num_atoms, 3), dtype=float_dtype) if has_f else None
    q = np.zeros(num_mol, dtype=float_dtype) if has_q else None
    s = np.zeros(num_mol, dtype=float_dtype) if has_s else None
    extra = {
        key: np.zeros(num_atoms, dtype=float_dtype) for key in extra_atom_keys
    }

    offset = 0
    for i, m in enumerate(mols):
        n = len(m["z"])
        sl = slice(offset, offset + n)
        z[sl] = m["z"]
        pos[sl] = m["pos"]
        batch[sl] = mol_id_offset + i
        atom_mask[sl] = True
        mol_mask[i] = True
        if has_y:
            y[i, 0] = np.asarray(m["y"]).reshape(-1)[0]
        if has_f:
            neg_dy[sl] = m["neg_dy"]
        if has_q:
            q[i] = np.asarray(m["q"]).reshape(-1)[0]
        if has_s:
            s[i] = np.asarray(m["s"]).reshape(-1)[0]
        for key in extra_atom_keys:
            extra[key][sl] = np.asarray(m[key]).reshape(n)
        offset += n

    return AtomicBatch(
        z=jnp.asarray(z),
        pos=jnp.asarray(pos),
        batch=jnp.asarray(batch),
        atom_mask=jnp.asarray(atom_mask),
        mol_mask=jnp.asarray(mol_mask),
        num_mol=num_mol_global,
        y=None if y is None else jnp.asarray(y),
        neg_dy=None if neg_dy is None else jnp.asarray(neg_dy),
        q=None if q is None else jnp.asarray(q),
        s=None if s is None else jnp.asarray(s),
        extra={k: jnp.asarray(v) for k, v in extra.items()},
    )


def spatial_sort(batch: AtomicBatch, cell: float = 5.0) -> Tuple[AtomicBatch, jnp.ndarray]:
    """Reorder atoms so storage order follows space (cell-key sort).

    Spatially coherent row order concentrates each receiver block's sources
    into a small window — the property the one-hot MXU gather plan
    (ops/pallas/onehot_gather.py) and the ring edge-partition boundary plan
    (parallel/edge_partition.py) exploit.  Atom order is semantically
    irrelevant to every model (all reductions are segment-based), so sorting
    once at setup is free accuracy-wise; per-atom outputs (forces) come back
    in the sorted order and map to the original with the returned permutation:
    ``forces_original = forces_sorted[inverse]`` where
    ``inverse = jnp.argsort(order)``.

    Sorts within-molecule (batch id is the leading key) so molecule
    boundaries and segment reductions are untouched.  Padding atoms sort
    last.  ``cell`` should be about the model cutoff.
    """
    import jax

    pos = np.asarray(batch.pos)
    ids = np.asarray(batch.batch).astype(np.int64)
    mask = np.asarray(batch.atom_mask)
    c = np.floor((pos - pos.min(axis=0)) / float(cell)).astype(np.int64)
    span = int(max(c.max() + 1, 1))
    key = ((ids * span + c[:, 0]) * span + c[:, 1]) * span + c[:, 2]
    key = np.where(mask, key, np.iinfo(np.int64).max)  # padding last
    order = jnp.asarray(np.argsort(key, kind="stable"), jnp.int32)

    def permute(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == batch.num_atoms:
            return leaf[order]
        return leaf

    sorted_batch = jax.tree_util.tree_map(permute, batch)
    return sorted_batch, order
