"""Trainer tests (reference tests/test_module.py): short Trainer.fit + test
on the dummy dataset, checkpoint resume, standardize, calculator."""

import os

import jax
import numpy as np
import pytest

from torchmdnet_tpu.calculators import External
from torchmdnet_tpu.data.datasets import DummyDataset
from torchmdnet_tpu.data.module import DataModule
from torchmdnet_tpu.models.potential import create_model
from torchmdnet_tpu.train.trainer import Trainer

from utils import load_example_args


def _hparams(tmp_path, **over):
    h = load_example_args("graph-network", remove_prior=True)
    h.update(
        num_layers=1,
        embedding_dimension=16,
        num_rbf=8,
        max_num_neighbors=8,
        derivative=True,
        batch_size=4,
        inference_batch_size=4,
        lr=1e-3,
        lr_patience=2,
        lr_factor=0.5,
        lr_min=1e-7,
        lr_warmup_steps=2,
        num_epochs=2,
        early_stopping_patience=50,
        train_size=12,
        val_size=4,
        test_size=4,
        seed=1,
        log_dir=str(tmp_path),
        save_interval=1,
        test_interval=-1,
        gradient_clipping=10.0,
        ema_alpha_y=0.9,
        ema_alpha_neg_dy=1.0,
        weight_decay=0.0,
        num_workers=0,
        reset_trainer=False,
        splits=None,
    )
    h.update(over)
    return h


def test_fit_and_test(tmp_path):
    h = _hparams(tmp_path)
    ds = DummyDataset(num_samples=20, num_atoms=5)
    data = DataModule(h, dataset=ds)
    data.setup()
    model = create_model(h)
    trainer = Trainer(model, h)
    state = trainer.fit(data)
    assert state.epoch == 1
    assert trainer.best_model_path is not None
    metrics = trainer.test(data)
    assert np.isfinite(metrics["test_total_l1_loss"])
    assert os.path.exists(os.path.join(str(tmp_path), "metrics.csv"))
    assert os.path.exists(os.path.join(str(tmp_path), "splits.npz"))


def test_resume(tmp_path):
    h = _hparams(tmp_path, num_epochs=1)
    ds = DummyDataset(num_samples=20, num_atoms=5)
    data = DataModule(h, dataset=ds)
    data.setup()
    model = create_model(h)
    trainer = Trainer(model, h)
    state = trainer.fit(data)
    ckpt = trainer.best_model_path

    h2 = _hparams(tmp_path, num_epochs=2)
    trainer2 = Trainer(create_model(h2), h2)
    state2 = trainer2.fit(data, ckpt_path=ckpt)
    assert state2.epoch >= 1
    assert state2.global_step > state.global_step


def test_auto_resume(tmp_path):
    """Elastic restart: with auto_resume, a fresh trainer pointed at the same
    log_dir continues from the newest checkpoint with no --load-model."""
    from torchmdnet_tpu.train.checkpoints import latest_checkpoint

    h = _hparams(tmp_path, num_epochs=2)
    ds = DummyDataset(num_samples=20, num_atoms=5)
    data = DataModule(h, dataset=ds)
    data.setup()
    state = Trainer(create_model(h), h).fit(data)  # "preempted" after 2 epochs

    newest = latest_checkpoint(str(tmp_path))
    assert newest is not None and "epoch=1" in newest

    h2 = _hparams(tmp_path, num_epochs=4, auto_resume=True)
    trainer2 = Trainer(create_model(h2), h2)
    state2 = trainer2.fit(data)
    assert state2.epoch == 3
    assert state2.global_step > state.global_step

    # without the flag, the same setup starts from scratch
    h3 = _hparams(tmp_path, num_epochs=1)
    state3 = Trainer(create_model(h3), h3).fit(data)
    assert state3.epoch == 0


def test_standardize(tmp_path):
    h = _hparams(tmp_path, standardize=True)
    ds = DummyDataset(num_samples=20, num_atoms=5)
    data = DataModule(h, dataset=ds)
    data.setup()
    assert data.mean is not None and data.std is not None
    # mean/std computed over the train subset energies
    ys = [float(np.asarray(ds[i]["y"])) for i in data.idx_train]
    np.testing.assert_allclose(data.mean, np.mean(ys), rtol=1e-5)
    np.testing.assert_allclose(data.std, np.std(ys, ddof=1), rtol=1e-5)


@pytest.mark.slow
def test_calculator_matches_direct_forward(tmp_path):
    """reference tests/test_calculator.py: External == direct model call,
    including stacked multi-molecule batches."""
    h = load_example_args("equivariant-transformer", remove_prior=True, derivative=True)
    model = create_model(h)
    rng = np.random.default_rng(0)
    n_batch, n_atoms = 2, 6
    embeddings = rng.integers(1, 10, (n_batch, n_atoms))
    pos = rng.standard_normal((n_batch * n_atoms, 3)).astype(np.float32)

    from torchmdnet_tpu.data.batch import AtomicBatch
    import jax.numpy as jnp

    batch = AtomicBatch(
        z=jnp.asarray(embeddings.reshape(-1), jnp.int32),
        pos=jnp.asarray(pos),
        batch=jnp.repeat(jnp.arange(n_batch, dtype=jnp.int32), n_atoms),
        atom_mask=jnp.ones(n_batch * n_atoms, bool),
        mol_mask=jnp.ones(n_batch, bool),
        num_mol=n_batch,
    )
    params = model.init(jax.random.PRNGKey(0), batch)
    y_direct, f_direct = model.energy_and_forces(params, batch)

    calc = External((model, params), embeddings)
    energy, forces = calc.calculate(pos.copy())
    np.testing.assert_allclose(np.asarray(energy), np.asarray(y_direct), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(forces).reshape(-1, 3), np.asarray(f_direct), rtol=1e-4, atol=1e-6
    )

    # unit transform applies
    calc2 = External((model, params), embeddings, output_transform="eV/A -> kcal/mol/A")
    e2, f2 = calc2.calculate(pos.copy())
    np.testing.assert_allclose(np.asarray(e2), np.asarray(energy) * 23.0609, rtol=1e-5)


def test_synthetic_morse_learnability(tmp_path):
    """Loss on an exactly-labeled physics dataset drops substantially within a
    few epochs — end-to-end learnability of the training stack."""
    from torchmdnet_tpu.data.datasets import SyntheticMorse

    h = _hparams(
        tmp_path,
        num_epochs=6,
        batch_size=16,
        inference_batch_size=32,
        lr=5e-3,
        lr_warmup_steps=10,
        train_size=180,
        val_size=30,
        test_size=30,
        standardize=True,
        y_weight=0.3,
        neg_dy_weight=0.7,
        embedding_dimension=32,
        num_rbf=12,
        max_num_neighbors=10,
    )
    ds = SyntheticMorse(num_samples=240, num_atoms=6, seed=0)
    data = DataModule(h, dataset=ds)
    data.setup()
    model = create_model(h, mean=data.mean, std=data.std)
    trainer = Trainer(model, h)
    trainer.fit(data)

    import csv

    with open(os.path.join(str(tmp_path), "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    first = float(rows[0]["train_total_mse_loss"])
    last = float(rows[-1]["train_total_mse_loss"])
    assert last < first * 0.35, f"no convergence: {first} -> {last}"


def test_optimize_api(tmp_path):
    """optimize() returns a donated-buffer evaluator matching Potential."""
    from torchmdnet_tpu.optimize import optimize
    from torchmdnet_tpu.data.batch import pad_molecules
    from utils import random_molecule

    h = load_example_args("graph-network", remove_prior=True, derivative=True,
                          num_layers=1, embedding_dimension=16, num_rbf=8)
    model = create_model(h)
    mol = random_molecule(8, seed=1)
    batch = pad_molecules([mol], num_atoms=8, num_mol=1)
    params = model.init(jax.random.PRNGKey(0), batch)
    y0, f0 = model.apply(params, batch)

    opt = optimize(model, params, batch)
    y1, f1 = opt(np.asarray(batch.pos).copy())
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), rtol=1e-5, atol=1e-7)


def test_profiling_benchmark():
    from torchmdnet_tpu.profiling import benchmark, benchmark_pipelined
    import jax.numpy as jnp

    f = jax.jit(lambda x: (x * 2).sum())
    r = benchmark(f, jnp.ones((64, 64)), warmup=1, iters=3)
    assert r["mean_ms"] > 0 and r["min_ms"] <= r["mean_ms"]
    r2 = benchmark_pipelined(f, jnp.ones((64, 64)), warmup=1, iters=3)
    assert r2["mean_ms"] > 0


def test_steps_per_dispatch_matches_single(tmp_path):
    """The multi-step dispatch (lax.scan over stacked batches) must produce
    the same training trajectory as per-step dispatch: same global_step,
    matching epoch losses and final parameters (chunk remainder and the
    in-chunk LR warmup advance included: 5 steps/epoch, chunk 2, warmup 3)."""
    import csv

    import jax.numpy as jnp

    results = {}
    for spd in (1, 2):
        d = tmp_path / f"spd{spd}"
        d.mkdir()
        h = _hparams(
            d, steps_per_dispatch=spd, num_epochs=2, lr_warmup_steps=3,
            train_size=20, batch_size=4, ema_alpha_y=0.9,
            val_size=12,  # 3 val batches: one eval chunk of 2 + remainder
        )
        ds = DummyDataset(num_samples=40, num_atoms=5, seed=7)
        data = DataModule(h, dataset=ds)
        data.setup()
        model = create_model(h)
        trainer = Trainer(model, h)
        state = trainer.fit(data)
        with open(os.path.join(str(d), "metrics.csv")) as f:
            rows = list(csv.DictReader(f))
        results[spd] = (
            state.global_step,
            [float(r["train_total_mse_loss"]) for r in rows]
            + [float(r["val_total_mse_loss"]) for r in rows],
            jax.tree_util.tree_leaves(state.params),
        )

    assert results[1][0] == results[2][0] == 10
    np.testing.assert_allclose(results[1][1], results[2][1], rtol=1e-4)
    for a, b in zip(results[1][2], results[2][2]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_trace_summary(tmp_path):
    """trace_summary parses the Perfetto JSON jax.profiler writes and ranks
    device HLO fusions (host frames and region groupings excluded)."""
    import gzip
    import json

    from torchmdnet_tpu.profiling import trace_summary

    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    events = [
        # two iterations of a device fusion: 2 ms total, 100 MB each
        *[
            {
                "ph": "X", "name": "fusion.1", "dur": 1000,
                "args": {
                    "device_duration_ps": "1000000000",
                    "hlo_category": "loop fusion",
                    "bytes_accessed": str(100 * 1024**2),
                    "long_name": "%fusion.1 = bf16[8,8] ...",
                },
            }
            for _ in range(2)
        ],
        # a region grouping with device time but no category: skipped
        {"ph": "X", "name": "7", "dur": 999,
         "args": {"device_duration_ps": "999000000000"}},
        # a host frame: skipped
        {"ph": "X", "name": "$numpy asarray", "dur": 50, "args": {}},
    ]
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    rows = trace_summary(str(tmp_path), iters=2)
    assert len(rows) == 1
    r = rows[0]
    assert r["name"] == "fusion.1" and r["count"] == 1
    assert abs(r["ms"] - 1.0) < 1e-9
    assert abs(r["gbps"] - 100 * 1024**2 / 1e6) < 1.0
    assert r["category"] == "loop fusion"


def test_lr_injection_is_chain_agnostic(tmp_path):
    """The plateau/warmup LR injection locates the inject_hyperparams state
    by structure; appending extra transforms to the optax chain must not
    break it (VERDICT r1: the old code hard-coded opt_state[-1])."""
    import optax

    h = _hparams(tmp_path, steps_per_dispatch=2, num_epochs=1, lr_warmup_steps=3)
    ds = DummyDataset(num_samples=20, num_atoms=5, seed=7)
    data = DataModule(h, dataset=ds)
    data.setup()
    model = create_model(h)
    trainer = Trainer(model, h)
    # adamw no longer last in the chain: add a no-op transform AFTER it
    trainer.optimizer = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.inject_hyperparams(optax.adamw)(learning_rate=h["lr"]),
        optax.identity(),
    )
    state = trainer.fit(data)
    assert state.global_step == 3  # 12 samples / bs 4 / 1 epoch
    # warmup actually applied: stored lr is the base, injected one differs
    idx = trainer._lr_state_index(state.opt_state)
    assert float(state.opt_state[idx].hyperparams["learning_rate"]) > 0


def test_bucketed_loader_waste_and_coverage():
    """Size bucketing: every sample appears exactly once per epoch, per-batch
    capacities are bucket-local, and padded-atom waste drops several-fold on
    a SPICE-like size distribution (VERDICT r1 / SURVEY 7.6; the reference
    collates exact sizes, data.py:127-148)."""
    import numpy as np

    from torchmdnet_tpu.data.loader import PaddedLoader

    class SpiceLike:
        """Sizes ~ lognormal in [3, 96], like SPICE heterogeneity."""

        def __init__(self, n=256, seed=0):
            rng = np.random.default_rng(seed)
            self.sizes = np.clip(
                (3 + rng.lognormal(2.2, 0.8, n)).astype(int), 3, 96
            )

        def __len__(self):
            return len(self.sizes)

        def sample_sizes(self):
            return self.sizes

        def __getitem__(self, i):
            n = int(self.sizes[i])
            return {
                "z": np.full(n, 1 + i % 8, np.int64),
                "pos": np.full((n, 3), float(i), np.float32),
                "y": np.asarray([float(i)], np.float32),
            }

    ds = SpiceLike()

    def run(num_buckets):
        loader = PaddedLoader(
            ds, batch_size=16, shuffle=True, seed=3, num_buckets=num_buckets
        )
        seen, real, padded = [], 0, 0
        for b in loader:
            ids = np.asarray(b.y)[np.asarray(b.mol_mask)].reshape(-1)
            seen.extend(int(v) for v in ids)
            real += int(np.asarray(b.atom_mask).sum())
            padded += b.num_atoms
        return seen, real, padded

    seen1, real1, padded1 = run(1)
    seen4, real4, padded4 = run(4)
    assert sorted(seen1) == sorted(seen4) == list(range(len(ds)))
    assert real1 == real4  # identical real atoms
    waste1 = padded1 / real1
    waste4 = padded4 / real4
    assert waste4 < 0.5 * waste1, (waste1, waste4)
    # capacities actually vary across batches in the bucketed run
    caps = {b.num_atoms for b in PaddedLoader(ds, 16, num_buckets=4)}
    assert len(caps) >= 3, caps


def test_bucketed_training_runs(tmp_path):
    """A fit with loader_buckets > 1 and steps_per_dispatch > 1 trains
    (per-shape dispatch chunks) and evaluates every sample."""
    class VarSizeDataset(DummyDataset):
        def __init__(self, **kw):
            super().__init__(**kw)
            rng = np.random.default_rng(0)
            self.cut = rng.integers(3, self.z.shape[1] + 1, len(self.z))

        def sample_sizes(self):
            return self.cut

        def __getitem__(self, idx):
            s = super().__getitem__(idx)
            c = int(self.cut[idx])
            return {
                k: (v[:c] if k in ("z", "pos", "neg_dy") else v)
                for k, v in s.items()
            }

    h = _hparams(
        tmp_path, steps_per_dispatch=2, num_epochs=2, loader_buckets=3,
        train_size=24, val_size=8, test_size=8, batch_size=4,
        # 12-atom gaussian-packed molecules have up to 11 in-cutoff
        # neighbors; the per-batch capacity surveillance now catches the
        # truncation the old batch-0-only check missed
        max_num_neighbors=12,
    )
    ds = VarSizeDataset(num_samples=40, num_atoms=12, seed=7)
    data = DataModule(h, dataset=ds)
    data.setup()
    model = create_model(h)
    trainer = Trainer(model, h)
    state = trainer.fit(data)
    assert state.global_step == 12  # 24 train / bs 4 / 2 epochs
    metrics = trainer.test(data)
    assert np.isfinite(metrics["test_total_l1_loss"])


def test_auto_neighbor_strategy_batched_small_molecules():
    """Batched small molecules overlap in space (each sample near its own
    origin), so per-cell occupancy scales with batch size and the cell list
    degenerates; Potential.neighbors' auto strategy must pick brute there
    even above the cell-list atom-count threshold."""
    from torchmdnet_tpu.data.batch import pad_molecules

    rng = np.random.default_rng(0)
    mols = []
    for _ in range(32):
        n = 70
        mols.append(
            {
                "z": rng.integers(1, 9, n).astype(np.int64),
                "pos": (rng.standard_normal((n, 3)) * 2.0).astype(np.float32),
            }
        )
    batch = pad_molecules(mols, num_atoms=32 * 70, num_mol=32)
    h = _hparams("/tmp", max_num_neighbors=72)
    model = create_model(h)
    nbl = model.neighbors(batch)  # auto; would overflow cell buckets
    nbl.raise_on_overflow("auto strategy on a batched-small-molecule batch")
    assert nbl.cell_overflow is None  # brute was chosen
