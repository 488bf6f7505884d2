"""optimize(): the latency-optimized evaluator matches the direct model,
including with Verlet-skin neighbor reuse across calls (reference
tests/test_optimize.py checks NNPOps-optimized vs reference modules)."""

import jax
import jax.numpy as jnp
import numpy as np

from torchmdnet_tpu.data.batch import pad_molecules
from torchmdnet_tpu.models.potential import create_model
from torchmdnet_tpu.optimize import optimize

from utils import load_example_args, random_molecule


def _setup():
    args = load_example_args(
        "graph-network", num_layers=2, embedding_dimension=16, num_rbf=8,
        derivative=True,
    )
    model = create_model(args)
    mol = random_molecule(12, seed=5, scale=1.5)
    batch = pad_molecules([mol], num_atoms=16, num_mol=1)
    params = model.init(jax.random.PRNGKey(0), batch)
    return model, params, batch


def test_optimized_matches_direct():
    model, params, batch = _setup()
    opt = optimize(model, params, batch)
    y_o, f_o = opt(batch.pos)
    y_d, f_d = model.energy_and_forces(params, batch)
    np.testing.assert_allclose(np.asarray(y_o), np.asarray(y_d), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f_o), np.asarray(f_d), rtol=1e-5, atol=1e-6)


def test_optimized_skin_reuse_matches_direct():
    model, params, batch = _setup()
    opt = optimize(model, params, batch, skin=1.0, rebuild_every=4)
    rng = np.random.default_rng(0)
    pos = np.asarray(batch.pos)
    for i in range(10):
        # small drift per call, well under skin/2 between rebuilds
        pos = pos + 0.02 * rng.standard_normal(pos.shape).astype(np.float32)
        y_o, f_o = opt(pos)
        y_d, f_d = model.energy_and_forces(params, batch.replace(pos=jnp.asarray(pos)))
        np.testing.assert_allclose(np.asarray(y_o), np.asarray(y_d), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(f_o), np.asarray(f_d), rtol=1e-4, atol=1e-5
        )
    assert not opt.stale


def test_optimized_skin_staleness_flag():
    model, params, batch = _setup()
    opt = optimize(model, params, batch, skin=1e-3, rebuild_every=8)
    rng = np.random.default_rng(1)
    pos = np.asarray(batch.pos)
    for _ in range(6):
        pos = pos + 0.5 * rng.standard_normal(pos.shape).astype(np.float32)
        opt(pos)
    assert opt.stale
