"""Batched, padded data loading.

Replaces the reference's torch-geometric DataLoader (data.py:127-148) with a
static-shape loader: every batch has the same (num_atoms, num_mol) capacity so
the jitted train step compiles exactly once.  Capacity = batch_size x the
largest molecule, rounded up to a multiple of 8 sublanes (TPU-friendly), with
an optional explicit override.

Size bucketing (``num_buckets > 1``): for heterogeneous datasets (SPICE
spans ~3-100 atoms) one worst-case capacity pads every batch to the largest
molecule — 3-5x wasted atom slots per step.  Bucketing sorts samples by size
into ``num_buckets`` groups, batches WITHIN a group (batch order shuffled
across groups each epoch), and pads each group to its own capacity — one
compiled executable per bucket instead of per batch shape.  The reference's
exact-size collation (data.py:127-148) is the dynamic-shape analog; the
bucket trade-off (size-homogeneous batches) is the standard
bucket-by-length discipline of sequence training.
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
        num_buckets: int = 1,
        pad_multiple: Optional[int] = None,
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
        # capacities must divide over 8 sublanes, every host, and (for
        # mesh-sharded runs) every device — callers pass the device-aware
        # multiple via pad_multiple
        mult = pad_multiple if pad_multiple else 8 * process_count
        mult = mult * process_count // math.gcd(mult, process_count)
        mult = mult * 8 // math.gcd(mult, 8)
        sizes = np.asarray(dataset.sample_sizes())
        self.num_buckets = max(1, int(num_buckets))
        self._buckets = None  # [(member_indices, capacity)] when bucketing
        if self.num_buckets > 1 and len(sizes) and num_atoms_pad is None:
            by_size = np.argsort(sizes, kind="stable")
            groups = [
                g for g in np.array_split(by_size, self.num_buckets) if len(g)
            ]
            self._buckets = [
                (g, _round_up(batch_size * int(sizes[g].max()), mult))
                for g in groups
            ]
            num_atoms_pad = max(cap for _, cap in self._buckets)
        if num_atoms_pad is None:
            max_size = int(sizes.max()) if len(sizes) else 1
            num_atoms_pad = _round_up(batch_size * max_size, mult)
        self.num_atoms_pad = num_atoms_pad  # largest capacity (bucketed: max)
        if process_count > 1:
            assert batch_size % process_count == 0, (
                f"batch_size {batch_size} must divide over {process_count} hosts"
            )
            assert num_atoms_pad % process_count == 0, (
                f"num_atoms_pad {num_atoms_pad} must divide over "
                f"{process_count} hosts"
            )

    def __len__(self):
        def nbatches(n):
            return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

        if self._buckets is not None:
            return sum(nbatches(len(members)) for members, _ in self._buckets)
        return nbatches(len(self.dataset))

    def _collate(self, mols, num_atoms_pad: Optional[int] = None) -> AtomicBatch:
        cap = self.num_atoms_pad if num_atoms_pad is None else num_atoms_pad
        for m in mols:
            if "pq" in m and "partial_charges" not in m:
                m["partial_charges"] = m["pq"]
        if self.process_count > 1:
            # this process's shard of the global batch: local capacities,
            # global molecule ids (assembled by global_batch_from_local)
            local_bs = self.batch_size // self.process_count
            return pad_molecules(
                mols,
                num_atoms=cap // self.process_count,
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
            out = fast_pad_collate(mols, cap, self.batch_size)
            if out is not None:
                extra = {}
                if "partial_charges" in self.extra_atom_keys:
                    extra["partial_charges"] = jnp.asarray(
                        out["pq"]
                        if out["pq"] is not None
                        else np.zeros(cap, np.float32)
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
            num_atoms=cap,
            num_mol=self.batch_size,
            extra_atom_keys=self.extra_atom_keys,
            float_dtype=self.float_dtype,
        )

    def _batch_plan(self):
        """Deterministic epoch plan: [(sample_indices, capacity)].

        Bucketed: samples shuffle within their size bucket, batch order
        shuffles across buckets.  Identical on every host (seeded by
        seed+epoch), like the flat plan.
        """
        rng = np.random.default_rng(self.seed + self.epoch)
        plan = []
        if self._buckets is not None:
            for members, cap in self._buckets:
                mem = rng.permutation(members) if self.shuffle else members
                for start in range(0, len(mem), self.batch_size):
                    idxs = mem[start : start + self.batch_size]
                    if self.drop_last and len(idxs) < self.batch_size:
                        break
                    plan.append((idxs, cap))
            if self.shuffle:
                rng.shuffle(plan)
            return plan
        n = len(self.dataset)
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        for start in range(0, n, self.batch_size):
            idxs = order[start : start + self.batch_size]
            if self.drop_last and len(idxs) < self.batch_size:
                break
            plan.append((idxs, self.num_atoms_pad))
        return plan

    def _batches(self) -> Iterator[AtomicBatch]:
        plan = self._batch_plan()
        self.epoch += 1
        for idxs, cap in plan:
            if self.process_count > 1:
                local_bs = self.batch_size // self.process_count
                idxs = idxs[
                    self.process_rank * local_bs : (self.process_rank + 1) * local_bs
                ]
            mols = [self.dataset[int(i)] for i in idxs]
            yield self._collate(mols, cap)

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
