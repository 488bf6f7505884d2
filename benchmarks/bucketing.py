"""Padding-waste / throughput benchmark for size-bucketed loading.

Heterogeneous datasets (SPICE: ~3-100 atoms) padded to one worst-case
capacity waste 3-5x of every batch's atom slots; ``--loader-buckets`` pads
each size bucket to its own capacity (data/loader.py).  This harness runs
the REAL trainer epoch loop on a SPICE-like synthetic size distribution and
reports steady-state epoch wall-clock + the padded-atom waste factor.

Usage:
    python benchmarks/bucketing.py --buckets 1
    python benchmarks/bucketing.py --buckets 4
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class SpiceLikeDataset:
    """Lognormal sizes in [3, 96] — the SPICE heterogeneity profile."""

    def __init__(self, n=2048, seed=0):
        rng = np.random.default_rng(seed)
        self.sizes = np.clip((3 + rng.lognormal(2.2, 0.8, n)).astype(int), 3, 96)
        self.atomic_number = list(range(100))
        self.distance_scale = 1e-10
        self.energy_scale = 1.60218e-19

    def __len__(self):
        return len(self.sizes)

    def sample_sizes(self):
        return self.sizes

    def __getitem__(self, i):
        rng = np.random.default_rng(1000 + i)
        n = int(self.sizes[i])
        return {
            "z": rng.integers(1, 9, n).astype(np.int64),
            "pos": (rng.standard_normal((n, 3)) * (0.8 * n ** (1 / 3) + 0.6)).astype(
                np.float32
            ),
            "y": rng.standard_normal((1, 1)).astype(np.float32),
            "neg_dy": rng.standard_normal((n, 3)).astype(np.float32),
        }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--samples", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--model", default="equivariant-transformer")
    ap.add_argument("--embedding-dimension", type=int, default=128)
    ap.add_argument("--num-layers", type=int, default=4)
    ap.add_argument("--bf16-messages", action="store_true")
    args = ap.parse_args()

    from torchmdnet_tpu.data.module import DataModule
    from torchmdnet_tpu.models.potential import create_model
    from torchmdnet_tpu.train.trainer import Trainer

    ds = SpiceLikeDataset(args.samples)
    with tempfile.TemporaryDirectory() as td:
        h = dict(
            model=args.model,
            embedding_dimension=args.embedding_dimension,
            num_layers=args.num_layers,
            num_rbf=32,
            rbf_type="expnorm",
            trainable_rbf=False,
            activation="silu",
            attn_activation="silu",
            neighbor_embedding=True,
            num_heads=8,
            distance_influence="both",
            cutoff_lower=0.0,
            cutoff_upper=5.0,
            max_z=100,
            max_num_neighbors=64,
            derivative=True,
            output_model="Scalar",
            prior_model=None,
            reduce_op="sum",
            precision=32,
            atom_filter=-1,
            aggr="add",
            equivariance_invariance_group="O(3)",
            bf16_messages=args.bf16_messages,
            batch_size=args.batch_size,
            inference_batch_size=args.batch_size,
            num_epochs=args.epochs,
            train_size=args.samples - 2 * args.batch_size,
            val_size=args.batch_size,
            test_size=args.batch_size,
            seed=1,
            log_dir=td,
            save_interval=1000,
            test_interval=-1,
            lr=1e-4,
            lr_patience=1000,
            lr_factor=0.8,
            lr_min=1e-8,
            lr_warmup_steps=0,
            early_stopping_patience=10000,
            gradient_clipping=0.0,
            ema_alpha_y=1.0,
            ema_alpha_neg_dy=1.0,
            weight_decay=0.0,
            num_workers=1,
            reset_trainer=False,
            splits=None,
            standardize=False,
            steps_per_dispatch=8,
            auto_resume=False,
            loader_buckets=args.buckets,
            y_weight=1.0,
            neg_dy_weight=1.0,
            charge=False,
            spin=False,
        )
        data = DataModule(h, dataset=ds)
        data.setup()

        # padding-waste factor (padded slots / real atoms) over one epoch
        loader = data.train_dataloader()
        real = padded = 0
        for b in loader:
            real += int(np.asarray(b.atom_mask).sum())
            padded += b.num_atoms
        waste = padded / max(real, 1)

        model = create_model(h)
        trainer = Trainer(model, h)

        times = []
        orig = trainer._run_train_epoch

        def timed(state, loader):
            t0 = time.time()
            out = orig(state, loader)
            times.append(time.time() - t0)
            return out

        trainer._run_train_epoch = timed
        trainer.fit(data)
        steady = min(times[1:]) if len(times) > 1 else times[0]
        print(
            f"buckets={args.buckets} waste={waste:.2f}x "
            f"epoch_s={steady:.2f} (epochs: {[round(t, 2) for t in times]}) "
            f"mol/s={h['train_size'] / steady:.0f}"
        )


if __name__ == "__main__":
    main()
