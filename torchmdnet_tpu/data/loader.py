"""Batched, padded data loading.

Replaces the reference's torch-geometric DataLoader (data.py:127-148) with a
static-shape loader: every batch has the same (num_atoms, num_mol) capacity so
the jitted train step compiles exactly once.  Capacity = batch_size x the
largest molecule, rounded up to a multiple of 8 sublanes (TPU-friendly), with
an optional explicit override.
"""

import math
import queue
import threading
from typing import Iterator, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from torchmdnet_tpu.data.batch import AtomicBatch, pad_molecules
from torchmdnet_tpu.data.native_collate import fast_pad_collate


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
        use_native: bool = True,
        prefetch: int = 0,
        float_dtype=np.float32,
        process_rank: int = 0,
        process_count: int = 1,
    ):
        """When ``process_count > 1`` (multi-host training,
        parallel/distributed.py), every process iterates the SAME global
        batch sequence (same seed/epoch => same shuffle) but collates only
        its slice: ``batch_size/process_count`` molecules padded into
        ``num_atoms_pad/process_count`` atom slots, with GLOBAL molecule ids.
        The trainer assembles the shards into mesh-wide arrays — the analog
        of DDP's DistributedSampler (reference scripts/train.py:176-180).
        """
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.extra_atom_keys = tuple(extra_atom_keys)
        self.drop_last = drop_last
        self.epoch = 0
        self.use_native = use_native
        self.prefetch = prefetch
        self.float_dtype = np.dtype(float_dtype)
        self.process_rank = process_rank
        self.process_count = process_count
        if num_atoms_pad is None:
            sizes = np.asarray(dataset.sample_sizes())
            max_size = int(sizes.max()) if len(sizes) else 1
            num_atoms_pad = _round_up(batch_size * max_size, 8 * process_count)
        self.num_atoms_pad = num_atoms_pad
        if process_count > 1:
            assert batch_size % process_count == 0, (
                f"batch_size {batch_size} must divide over {process_count} hosts"
            )
            assert num_atoms_pad % process_count == 0, (
                f"num_atoms_pad {num_atoms_pad} must divide over "
                f"{process_count} hosts"
            )

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _collate(self, mols) -> AtomicBatch:
        for m in mols:
            if "pq" in m and "partial_charges" not in m:
                m["partial_charges"] = m["pq"]
        if self.process_count > 1:
            # this process's shard of the global batch: local capacities,
            # global molecule ids (assembled by global_batch_from_local)
            local_bs = self.batch_size // self.process_count
            return pad_molecules(
                mols,
                num_atoms=self.num_atoms_pad // self.process_count,
                num_mol=local_bs,
                extra_atom_keys=self.extra_atom_keys,
                float_dtype=self.float_dtype,
                mol_id_offset=self.process_rank * local_bs,
                num_mol_global=self.batch_size,
            )
        if (
            self.use_native
            and self.float_dtype == np.float32
            and set(self.extra_atom_keys) <= {"partial_charges"}
        ):
            out = fast_pad_collate(mols, self.num_atoms_pad, self.batch_size)
            if out is not None:
                extra = {}
                if "partial_charges" in self.extra_atom_keys:
                    extra["partial_charges"] = jnp.asarray(
                        out["pq"]
                        if out["pq"] is not None
                        else np.zeros(self.num_atoms_pad, np.float32)
                    )
                return AtomicBatch(
                    z=jnp.asarray(out["z"]),
                    pos=jnp.asarray(out["pos"]),
                    batch=jnp.asarray(out["batch"]),
                    atom_mask=jnp.asarray(out["atom_mask"]),
                    mol_mask=jnp.asarray(out["mol_mask"]),
                    num_mol=self.batch_size,
                    y=None if out["y"] is None else jnp.asarray(out["y"]),
                    neg_dy=None if out["neg_dy"] is None else jnp.asarray(out["neg_dy"]),
                    q=None if out["q"] is None else jnp.asarray(out["q"]),
                    s=None if out["s"] is None else jnp.asarray(out["s"]),
                    extra=extra,
                )
        return pad_molecules(
            mols,
            num_atoms=self.num_atoms_pad,
            num_mol=self.batch_size,
            extra_atom_keys=self.extra_atom_keys,
            float_dtype=self.float_dtype,
        )

    def _batches(self) -> Iterator[AtomicBatch]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(self.seed + self.epoch).permutation(order)
        self.epoch += 1
        for start in range(0, n, self.batch_size):
            idxs = order[start : start + self.batch_size]
            if self.drop_last and len(idxs) < self.batch_size:
                break
            if self.process_count > 1:
                local_bs = self.batch_size // self.process_count
                idxs = idxs[
                    self.process_rank * local_bs : (self.process_rank + 1) * local_bs
                ]
            mols = [self.dataset[int(i)] for i in idxs]
            yield self._collate(mols)

    def __iter__(self) -> Iterator[AtomicBatch]:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        # background-thread prefetch: overlap host-side dataset reads +
        # collation with device compute (the reference leaned on torch
        # DataLoader workers for this, data.py:127-148)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for b in self._batches():
                    q.put(b)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
