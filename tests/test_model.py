"""Model forward tests (reference tests/test_model.py strategy):
every model x output head, determinism, dtype, and — specific to the
static-shape TPU design — padding invariance and batch invariance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmdnet_tpu import create_model
from torchmdnet_tpu.data.batch import pad_molecules

from utils import create_example_batch, load_example_args, random_molecule

MODELS = ["graph-network", "transformer", "equivariant-transformer", "tensornet"]


@pytest.mark.parametrize("model_name", MODELS)
def test_forward(model_name):
    model = create_model(load_example_args(model_name))
    batch = create_example_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    y, neg_dy = model.apply(params, batch)
    assert y.shape == (batch.num_mol, 1)
    assert neg_dy is None
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("model_name", MODELS)
@pytest.mark.parametrize(
    "output_model",
    [
        "Scalar",
        "DipoleMoment",
        "ElectronicSpatialExtent",
        "EquivariantVectorOutput",
    ],
)
def test_forward_output_modules(model_name, output_model):
    if output_model == "EquivariantVectorOutput" and model_name != "equivariant-transformer":
        pytest.skip("vector head needs vector features")
    args = load_example_args(model_name, remove_prior=True, output_model=output_model)
    if model_name == "equivariant-transformer" and output_model in (
        "Scalar",
        "DipoleMoment",
    ):
        # factory upgrades to the Equivariant head flavor internally
        pass
    model = create_model(args)
    batch = create_example_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    y, _ = model.apply(params, batch)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("model_name", MODELS)
def test_forward_derivative(model_name):
    args = load_example_args(model_name, derivative=True)
    model = create_model(args)
    batch = create_example_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    y, neg_dy = model.apply(params, batch)
    assert neg_dy.shape == batch.pos.shape
    assert np.isfinite(np.asarray(neg_dy)).all()
    # padding atoms feel no force
    forces = np.asarray(neg_dy)
    np.testing.assert_allclose(forces[~np.asarray(batch.atom_mask)], 0.0, atol=1e-6)


@pytest.mark.parametrize("model_name", MODELS)
def test_seeded_init_deterministic(model_name):
    """reference tests/test_model.py:126-136."""
    model = create_model(load_example_args(model_name))
    batch = create_example_batch()
    p1 = model.init(jax.random.PRNGKey(1234), batch)
    p2 = model.init(jax.random.PRNGKey(1234), batch)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("model_name", MODELS)
def test_padding_invariance(model_name):
    """THE core guarantee of the static-shape design: growing the padded atom
    and molecule capacities never changes the computed energies."""
    model = create_model(load_example_args(model_name))
    mols = [random_molecule(5, seed=1), random_molecule(7, seed=2)]
    tight = pad_molecules(mols, num_atoms=12, num_mol=2)
    padded = pad_molecules(mols, num_atoms=40, num_mol=6)
    params = model.init(jax.random.PRNGKey(0), tight)
    y1, _ = model.apply(params, tight)
    y2, _ = model.apply(params, padded)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2)[:2], rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("model_name", MODELS)
def test_batch_invariance(model_name):
    """A molecule's energy is the same alone and inside a batch."""
    model = create_model(load_example_args(model_name))
    m1, m2 = random_molecule(6, seed=3), random_molecule(9, seed=4)
    together = pad_molecules([m1, m2], num_atoms=15, num_mol=2)
    alone1 = pad_molecules([m1], num_atoms=15, num_mol=2)
    alone2 = pad_molecules([m2], num_atoms=15, num_mol=2)
    params = model.init(jax.random.PRNGKey(0), together)
    y, _ = model.apply(params, together)
    y1, _ = model.apply(params, alone1)
    y2, _ = model.apply(params, alone2)
    np.testing.assert_allclose(np.asarray(y)[0], np.asarray(y1)[0], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(y)[1], np.asarray(y2)[0], rtol=2e-4, atol=2e-5)


def test_atom_filter():
    """AtomFilter semantics (reference tests/test_wrappers.py): filtered atoms
    are excluded from the readout sum."""
    args = load_example_args("graph-network", atom_filter=1)
    model = create_model(args)
    batch = create_example_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    y_filtered, _ = model.apply(params, batch)

    args0 = load_example_args("graph-network", atom_filter=-1)
    model0 = create_model(args0)
    y_all, _ = model0.apply(params, batch)
    # with H atoms present in the random batch the two must differ
    if np.any(np.asarray(batch.z)[np.asarray(batch.atom_mask)] <= 1):
        assert not np.allclose(np.asarray(y_filtered), np.asarray(y_all))


@pytest.mark.parametrize("model_name", MODELS)
def test_precision_64(model_name):
    args = load_example_args(model_name, precision=64)
    model = create_model(args)
    batch = create_example_batch()
    batch = batch.replace(pos=batch.pos.astype(jnp.float64))
    params = model.init(jax.random.PRNGKey(0), batch)
    y, _ = model.apply(params, batch)
    assert y.dtype == jnp.float64


def test_checkpoint_roundtrip(tmp_path):
    from torchmdnet_tpu import load_model
    from torchmdnet_tpu.train.checkpoints import save_checkpoint

    args = load_example_args("equivariant-transformer")
    model = create_model(args)
    batch = create_example_batch()
    params = model.init(jax.random.PRNGKey(7), batch)
    y0, _ = model.apply(params, batch)

    path = tmp_path / "model.ckpt"
    save_checkpoint(str(path), params, args)
    model2, params2 = load_model(str(path))
    y1, _ = model2.apply(params2, batch)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-6)


@pytest.mark.slow
def test_remat_matches_no_remat():
    """remat=True must be numerically identical (same param tree, same
    outputs/forces) — it only changes what the backward stores."""
    import jax
    import numpy as np

    from torchmdnet_tpu.data.batch import pad_molecules
    from torchmdnet_tpu.models.potential import create_model
    from utils import load_example_args, random_molecule

    mol = random_molecule(10, seed=3, scale=1.2)
    batch = pad_molecules([mol], num_atoms=16, num_mol=1)
    for name in ["graph-network", "equivariant-transformer", "tensornet"]:
        args = load_example_args(
            name, num_layers=2, embedding_dimension=32, num_rbf=8,
            derivative=True,
        )
        m0 = create_model(dict(args, remat=False))
        m1 = create_model(dict(args, remat=True))
        p = m0.init(jax.random.PRNGKey(0), batch)
        y0, f0 = m0.energy_and_forces(p, batch)
        y1, f1 = m1.energy_and_forces(p, batch)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(f0), np.asarray(f1), rtol=1e-5, atol=1e-7
        )


@pytest.mark.parametrize("model_name", MODELS)
def test_bf16_messages_close_to_f32(model_name):
    """bf16_messages only quantizes the edge intermediates (f32
    accumulation), so outputs and forces must track the f32 model to
    bf16-roundoff tolerance, with the identical param tree."""
    mol = random_molecule(12, seed=5, scale=1.2)
    batch = pad_molecules([mol], num_atoms=16, num_mol=1)
    args = load_example_args(
        model_name, num_layers=2, embedding_dimension=32, num_rbf=8,
        derivative=True,
    )
    m0 = create_model(dict(args, bf16_messages=False))
    m1 = create_model(dict(args, bf16_messages=True))
    p = m0.init(jax.random.PRNGKey(0), batch)
    y0, f0 = m0.energy_and_forces(p, batch)
    y1, f1 = m1.energy_and_forces(p, batch)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        m1.init(jax.random.PRNGKey(0), batch)
    )
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=2e-2, atol=2e-2)
    scale = np.abs(np.asarray(f0)).max()
    np.testing.assert_allclose(
        np.asarray(f1), np.asarray(f0), atol=5e-2 * max(scale, 1.0)
    )
