"""Batched, padded data loading.

Replaces the reference's torch-geometric DataLoader (data.py:127-148) with a
static-shape loader: every batch has the same (num_atoms, num_mol) capacity so
the jitted train step compiles exactly once.  Capacity = batch_size x the
largest molecule, rounded up to a multiple of 8 sublanes (TPU-friendly), with
an optional explicit override.
"""

import math
from typing import Iterator, Optional, Sequence

import numpy as np

from torchmdnet_tpu.data.batch import AtomicBatch, pad_molecules


def _round_up(x, m):
    return int(math.ceil(x / m) * m)


class PaddedLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        num_atoms_pad: Optional[int] = None,
        extra_atom_keys: Sequence[str] = (),
        drop_last: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.extra_atom_keys = tuple(extra_atom_keys)
        self.drop_last = drop_last
        self.epoch = 0
        if num_atoms_pad is None:
            sizes = np.asarray(dataset.sample_sizes())
            max_size = int(sizes.max()) if len(sizes) else 1
            num_atoms_pad = _round_up(batch_size * max_size, 8)
        self.num_atoms_pad = num_atoms_pad

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[AtomicBatch]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(self.seed + self.epoch).permutation(order)
        self.epoch += 1
        for start in range(0, n, self.batch_size):
            idxs = order[start : start + self.batch_size]
            if self.drop_last and len(idxs) < self.batch_size:
                break
            mols = [self.dataset[int(i)] for i in idxs]
            for m in mols:
                if "pq" in m and "partial_charges" not in m:
                    m["partial_charges"] = m["pq"]
            yield pad_molecules(
                mols,
                num_atoms=self.num_atoms_pad,
                num_mol=self.batch_size,
                extra_atom_keys=self.extra_atom_keys,
            )
