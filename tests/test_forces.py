"""Force-path correctness in fp64 (reference tests/test_model.py:192-211
gradcheck): forces equal numerical -dE/dpos, and the force-training path
(grad through forces) is finite — the grad-of-grad capability the reference
needed a custom twice-differentiable backward for."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmdnet_tpu import create_model
from torchmdnet_tpu.data.batch import pad_molecules

from utils import check_grads_fd, load_example_args, random_molecule

MODELS = ["graph-network", "transformer", "equivariant-transformer", "tensornet"]


def _fp64_model_and_batch(model_name, seed=0):
    args = load_example_args(model_name, precision=64, num_layers=1, derivative=True)
    model = create_model(args)
    mol = random_molecule(6, seed=seed)
    batch = pad_molecules([mol], num_atoms=6, num_mol=1)
    batch = batch.replace(pos=batch.pos.astype(jnp.float64))
    params = model.init(jax.random.PRNGKey(0), batch)
    return model, params, batch


@pytest.mark.parametrize("model_name", MODELS)
def test_forces_match_finite_differences(model_name):
    model, params, batch = _fp64_model_and_batch(model_name)

    def energy(pos):
        return model.energy(params, batch.replace(pos=pos)).sum()

    check_grads_fd(energy, batch.pos, order=1, atol=1e-5, rtol=1e-4)

    y, neg_dy = model.energy_and_forces(params, batch)
    g = jax.grad(energy)(batch.pos)
    np.testing.assert_allclose(np.asarray(neg_dy), -np.asarray(g), rtol=1e-10)


@pytest.mark.parametrize("model_name", MODELS)
def test_force_training_grad_of_grad(model_name):
    """Loss over forces; its parameter gradient must be finite (second order)."""
    model, params, batch = _fp64_model_and_batch(model_name, seed=5)
    target = jnp.zeros_like(batch.pos)

    def loss(p):
        _, neg_dy = model.energy_and_forces(p, batch)
        return jnp.mean((neg_dy - target) ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_second_order_gradcheck_small():
    """Full second-order check on the smallest ET config."""
    model, params, batch = _fp64_model_and_batch("equivariant-transformer", seed=7)

    def energy(pos):
        return model.energy(params, batch.replace(pos=pos)).sum()

    check_grads_fd(energy, batch.pos, order=2, atol=5e-4, rtol=5e-4)
