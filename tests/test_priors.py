"""Prior tests vs closed-form pair sums (reference tests/test_priors.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmdnet_tpu import create_model
from torchmdnet_tpu.data.batch import pad_molecules
from torchmdnet_tpu.models.potential import create_prior_models
from torchmdnet_tpu.priors import ZBL, Atomref, Coulomb, D2

from utils import load_example_args, random_molecule


def _single_mol_inputs(pos, types):
    n = len(types)
    z = jnp.asarray(types, jnp.int32)
    pos = jnp.asarray(pos, jnp.float32)
    batch_ids = jnp.zeros(n, jnp.int32)
    atom_mask = jnp.ones(n, bool)
    return z, pos, batch_ids, atom_mask


def test_atomref_offsets_output():
    """Atomref adds sum-of-atomrefs per molecule (reference test_atomref)."""
    rng = np.random.default_rng(0)
    atomref_vals = rng.standard_normal(100)
    mol = random_molecule(7, seed=1)
    batch = pad_molecules([mol], num_atoms=9, num_mol=1)

    args = load_example_args("graph-network", remove_prior=True)
    model_plain = create_model(args)
    prior = Atomref(max_z=100, initial_atomref=tuple(atomref_vals))
    args2 = dict(args)
    args2["prior_model"] = "Atomref"
    model_prior = create_model(args2, prior_models=[prior])

    params = model_prior.init(jax.random.PRNGKey(0), batch)
    y_prior, _ = model_prior.apply(params, batch)
    # strip the prior's params and reuse the representation params
    plain_params = {"params": {k: v for k, v in params["params"].items() if k != "priors_0"}}
    y_plain, _ = model_plain.apply(plain_params, batch)

    expected_offset = atomref_vals[np.asarray(mol["z"])].sum()
    np.testing.assert_allclose(
        np.asarray(y_prior)[0, 0] - np.asarray(y_plain)[0, 0],
        expected_offset,
        rtol=1e-4,
    )


def test_zbl_closed_form():
    """Reference test_zbl: positions in Bohr, energies in kJ/mol."""
    pos = np.array(
        [[1.0, 0.0, 0.0], [2.5, 0.0, 0.0], [1.0, 1.0, 0.0], [0.0, 0.0, -1.0]],
        dtype=np.float32,
    )
    types = [0, 1, 2, 1]
    atomic_number = (1, 6, 8)
    distance_scale = 5.29177210903e-11
    energy_scale = 1000.0 / 6.02214076e23

    zbl = ZBL(
        cutoff_distance=10.0,
        max_num_neighbors=5,
        atomic_number=atomic_number,
        distance_scale=distance_scale,
        energy_scale=energy_scale,
    )
    z, posj, batch_ids, atom_mask = _single_mol_inputs(pos, types)
    y = zbl.apply(
        {}, jnp.zeros((1, 1)), z, posj, batch_ids, atom_mask, 1, method=zbl.post_reduce
    )

    def interaction(p1, p2, z1, z2):
        r = np.linalg.norm(p1 - p2)
        x = r / (0.8854 / (z1**0.23 + z2**0.23))
        phi = (
            0.1818 * np.exp(-3.2 * x)
            + 0.5099 * np.exp(-0.9423 * x)
            + 0.2802 * np.exp(-0.4029 * x)
            + 0.02817 * np.exp(-0.2016 * x)
        )
        cutoff = 0.5 * (np.cos(r * np.pi / 10.0) + 1.0)
        return cutoff * phi * (138.935 / 5.29177210903e-2) * z1 * z2 / r

    expected = 0.0
    for i in range(len(pos)):
        for j in range(i):
            expected += interaction(
                pos[i], pos[j], atomic_number[types[i]], atomic_number[types[j]]
            )
    np.testing.assert_allclose(float(y[0, 0]), expected, rtol=1e-4)


def test_coulomb_closed_form():
    """Reference test_coulomb: positions in nm, energies in kJ/mol."""
    pos = np.array(
        [[0.5, 0.0, 0.0], [1.5, 0.0, 0.0], [0.8, 0.8, 0.0], [0.0, 0.0, -0.4]],
        dtype=np.float32,
    )
    charge = np.array([0.2, -0.1, 0.8, -0.9], dtype=np.float32)
    types = [0, 1, 2, 1]
    alpha = 1.8

    coulomb = Coulomb(
        alpha=alpha,
        max_num_neighbors=5,
        distance_scale=1e-9,
        energy_scale=1000.0 / 6.02214076e23,
    )
    z, posj, batch_ids, atom_mask = _single_mol_inputs(pos, types)
    y = coulomb.apply(
        {},
        jnp.zeros((1, 1)),
        z,
        posj,
        batch_ids,
        atom_mask,
        1,
        method=coulomb.post_reduce,
        extra={"partial_charges": jnp.asarray(charge)},
    )

    expected = 0.0
    for i in range(len(pos)):
        for j in range(i):
            r = np.linalg.norm(pos[i] - pos[j])
            expected += math.erf(alpha * r) * 138.935 * charge[i] * charge[j] / r
    np.testing.assert_allclose(float(y[0, 0]), expected, rtol=1e-4)


def test_d2_closed_form():
    """D2 vs a direct NumPy evaluation of the Grimme formula."""
    pos = np.array(
        [[0.0, 0.0, 0.0], [1.2, 0.0, 0.0], [0.0, 1.5, 0.3]], dtype=np.float32
    )  # Angstrom
    types = [0, 1, 1]
    atomic_number = (6, 1, 8)
    distance_scale = 1e-10
    energy_scale = 4.35974e-18  # Hartree -> J

    d2 = D2(
        cutoff_distance=10.0,
        max_num_neighbors=5,
        atomic_number=atomic_number,
        distance_scale=distance_scale,
        energy_scale=energy_scale,
    )
    z, posj, batch_ids, atom_mask = _single_mol_inputs(pos, types)
    y = d2.apply(
        {}, jnp.zeros((1, 1)), z, posj, batch_ids, atom_mask, 1, method=d2.post_reduce
    )

    from torchmdnet_tpu.priors.d2 import _C6_RR

    expected = 0.0
    for i in range(len(pos)):
        for j in range(i):
            zi, zj = atomic_number[types[i]], atomic_number[types[j]]
            r_nm = np.linalg.norm(pos[i] - pos[j]) * 0.1
            c6 = np.sqrt(_C6_RR[zi, 0] * _C6_RR[zj, 0])
            rr = _C6_RR[zi, 1] + _C6_RR[zj, 1]
            fd = 1.0 / (1.0 + np.exp(-20.0 * (r_nm / rr - 1.0)))
            expected += -c6 / r_nm**6 * fd
    expected /= energy_scale * 6.02214076e23
    np.testing.assert_allclose(float(y[0, 0]), expected, rtol=1e-4)


def test_priors_in_model_pipeline():
    """ZBL + Atomref composed inside the model (config-driven), padded batch."""

    class FakeDataset:
        atomic_number = list(range(100))
        distance_scale = 1e-10
        energy_scale = 1.0

        def get_atomref(self):
            return np.linspace(-1, 1, 100).reshape(-1, 1)

    args = load_example_args(
        "equivariant-transformer",
        prior_model=[{"ZBL": {"cutoff_distance": 4.0, "max_num_neighbors": 16}}, "Atomref"],
    )
    priors = create_prior_models(args, FakeDataset())
    assert len(priors) == 2
    assert isinstance(priors[0], ZBL)
    assert priors[0].cutoff_distance == 4.0
    assert isinstance(priors[1], Atomref)

    model = create_model(args, prior_models=priors)
    mol = random_molecule(6, seed=11)
    batch = pad_molecules([mol], num_atoms=10, num_mol=2)
    params = model.init(jax.random.PRNGKey(0), batch)
    y, _ = model.apply(params, batch)
    assert np.isfinite(np.asarray(y)).all()
    # prior_args round-trip (reference model.py:166-169)
    args["prior_args"] = [p.get_init_args() for p in priors]
    priors2 = create_prior_models(args)
    assert priors2[0].cutoff_distance == 4.0
    assert priors2[0].max_num_neighbors == 16


def test_prior_neighbor_overflow_raises():
    """A dense system whose prior-internal neighbor list would silently
    truncate must raise at setup (VERDICT r1: reference hard-errors via
    check_errors, utils.py:251-257)."""
    from torchmdnet_tpu.data.batch import AtomicBatch

    # 64 atoms packed inside a 6 A ball: every atom has 63 neighbors within
    # D2's 10 A cutoff, far above a k=16 capacity
    rng = np.random.default_rng(3)
    n = 64
    pos = jnp.asarray(rng.uniform(-3.0, 3.0, (n, 3)), jnp.float32)
    batch = AtomicBatch(
        z=jnp.full((n,), 1, jnp.int32),
        pos=pos,
        batch=jnp.zeros((n,), jnp.int32),
        atom_mask=jnp.ones((n,), bool),
        mol_mask=jnp.ones((1,), bool),
        num_mol=1,
    )
    atomic_number = tuple(range(100))
    d2 = D2(max_num_neighbors=16, atomic_number=atomic_number)
    with pytest.raises(ValueError, match="[Nn]eighbor capacity"):
        d2.check_neighbor_capacity(batch, "test batch")
    zbl = ZBL(max_num_neighbors=8, cutoff_distance=4.0, atomic_number=atomic_number)
    with pytest.raises(ValueError, match="[Nn]eighbor capacity"):
        zbl.check_neighbor_capacity(batch, "test batch")
    coul = Coulomb(max_num_neighbors=32)
    with pytest.raises(ValueError, match="[Nn]eighbor capacity"):
        coul.check_neighbor_capacity(batch, "test batch")
    # ample capacity passes
    D2(max_num_neighbors=128, atomic_number=atomic_number).check_neighbor_capacity(batch)
    Coulomb(max_num_neighbors=64).check_neighbor_capacity(batch)
    # Atomref has no internal list: no-op
    Atomref(initial_atomref=tuple(np.zeros(100)), max_z=100).check_neighbor_capacity(batch)


def test_trainer_fit_checks_prior_capacity(tmp_path):
    """trainer.fit raises before training when a prior's capacity is too
    small for the actual data."""
    from torchmdnet_tpu.data.module import DataModule
    from torchmdnet_tpu.train.trainer import Trainer

    h = load_example_args(
        "graph-network", num_layers=1, embedding_dimension=16, num_rbf=8,
    )
    h.update(
        dataset="DummyDataset",
        # standard-normal positions: ~19 neighbors per atom within 10 A
        dataset_arg={"num_samples": 8, "num_atoms": 20},
        dataset_root=str(tmp_path),
        batch_size=4, inference_batch_size=4, num_epochs=1,
        log_dir=str(tmp_path), seed=1, train_size=4, val_size=2, test_size=2,
        lr=1e-3, num_workers=0, splits=None, standardize=False,
        derivative=False, steps_per_dispatch=1,
    )
    from torchmdnet_tpu.models.potential import create_model

    data = DataModule(h)
    data.setup()
    priors = [D2(max_num_neighbors=2, atomic_number=tuple(range(100)))]
    model = create_model(h, prior_models=priors)
    trainer = Trainer(model, h)
    with pytest.raises(ValueError, match="[Nn]eighbor capacity"):
        trainer.fit(data)
