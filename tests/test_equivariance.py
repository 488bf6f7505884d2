"""Symmetry tests (reference tests/test_equivariance.py, extended):
rotation invariance of scalar outputs for every model, rotation equivariance
of ET vector outputs and forces, and O(3)-vs-SO(3) behavior for TensorNet.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmdnet_tpu import create_model
from torchmdnet_tpu.data.batch import pad_molecules

from utils import load_example_args, random_molecule, rotation_matrix

MODELS = ["graph-network", "transformer", "equivariant-transformer", "tensornet"]


def _rotate_batch(batch, rot):
    return batch.replace(pos=batch.pos @ rot.T)


@pytest.mark.parametrize("model_name", MODELS)
def test_scalar_rotation_invariance(model_name):
    model = create_model(load_example_args(model_name))
    batch = pad_molecules([random_molecule(8, seed=0, scale=0.7)], num_atoms=10, num_mol=1)
    params = model.init(jax.random.PRNGKey(0), batch)
    y, _ = model.apply(params, batch)
    rot = rotation_matrix(seed=3)
    y_rot, _ = model.apply(params, _rotate_batch(batch, rot))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_rot), rtol=1e-4, atol=1e-5)


def test_et_vector_output_equivariance():
    args = load_example_args(
        "equivariant-transformer", output_model="EquivariantVectorOutput"
    )
    model = create_model(args)
    batch = pad_molecules([random_molecule(8, seed=1, scale=0.7)], num_atoms=8, num_mol=1)
    params = model.init(jax.random.PRNGKey(0), batch)
    rot = rotation_matrix(seed=5)

    # the head returns per-atom vectors pre-reduce; reduced output is (M, 3)
    y, _ = model.apply(params, batch)
    y_rot, _ = model.apply(params, _rotate_batch(batch, rot))
    np.testing.assert_allclose(
        np.asarray(y @ rot.T), np.asarray(y_rot), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("model_name", MODELS)
def test_forces_equivariance(model_name):
    args = load_example_args(model_name, derivative=True)
    model = create_model(args)
    batch = pad_molecules([random_molecule(8, seed=2, scale=0.7)], num_atoms=8, num_mol=1)
    params = model.init(jax.random.PRNGKey(0), batch)
    _, f = model.apply(params, batch)
    rot = rotation_matrix(seed=9)
    _, f_rot = model.apply(params, _rotate_batch(batch, rot))
    np.testing.assert_allclose(
        np.asarray(f @ rot.T), np.asarray(f_rot), rtol=1e-3, atol=1e-4
    )


def test_tensornet_o3_reflection_invariance():
    """O(3) TensorNet is invariant under improper rotations (reflections)."""
    args = load_example_args("tensornet", equivariance_invariance_group="O(3)")
    model = create_model(args)
    batch = pad_molecules([random_molecule(8, seed=6, scale=0.7)], num_atoms=8, num_mol=1)
    params = model.init(jax.random.PRNGKey(0), batch)
    y, _ = model.apply(params, batch)
    reflect = jnp.diag(jnp.asarray([-1.0, 1.0, 1.0], jnp.float32))
    y_ref, _ = model.apply(params, _rotate_batch(batch, reflect))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-5)


def test_tensornet_so3_rotation_invariance():
    args = load_example_args("tensornet", equivariance_invariance_group="SO(3)")
    model = create_model(args)
    batch = pad_molecules([random_molecule(8, seed=8, scale=0.7)], num_atoms=8, num_mol=1)
    params = model.init(jax.random.PRNGKey(0), batch)
    y, _ = model.apply(params, batch)
    rot = rotation_matrix(seed=13)
    y_rot, _ = model.apply(params, _rotate_batch(batch, rot))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_rot), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("model_name", MODELS)
def test_translation_invariance(model_name):
    model = create_model(load_example_args(model_name))
    batch = pad_molecules([random_molecule(8, seed=10, scale=0.7)], num_atoms=8, num_mol=1)
    params = model.init(jax.random.PRNGKey(0), batch)
    y, _ = model.apply(params, batch)
    shifted = batch.replace(pos=batch.pos + jnp.asarray([10.0, -5.0, 3.0]))
    y_shift, _ = model.apply(params, shifted)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_shift), rtol=1e-4, atol=1e-5)
