"""MD driver: NVE energy conservation on a small LJ-ish system and Langevin
thermostat sanity."""

import jax
import numpy as np
import pytest

from torchmdnet_tpu.data.batch import pad_molecules
from torchmdnet_tpu.md import Simulation
from torchmdnet_tpu.models.potential import create_model

from utils import load_example_args, random_molecule


def _sim(**kwargs):
    args = load_example_args(
        "graph-network", num_layers=1, embedding_dimension=16, num_rbf=8,
        derivative=True,
    )
    model = create_model(args)
    mol = random_molecule(10, seed=3, scale=1.0)
    batch = pad_molecules([mol], num_atoms=16, num_mol=1)
    params = model.init(jax.random.PRNGKey(0), batch)
    return Simulation(model, params, batch, **kwargs)


def test_nve_runs_and_energy_is_bounded():
    sim = _sim(timestep_fs=0.2)
    sim.set_velocities_from_temperature(50.0)
    e0 = sim.potential_energy() + sim.kinetic_energy()
    sim.step(20)
    assert np.isfinite(np.asarray(sim.state.pos)).all()
    e1 = sim.potential_energy() + sim.kinetic_energy()
    # a random-weight potential is stiff; just require bounded drift over
    # 20 small steps
    assert abs(e1 - e0) < 0.5 * max(1.0, abs(e0))


def test_verlet_skin_matches_per_step_rebuild():
    # With a generous skin and small steps, the skin-reused trajectory must
    # match the rebuild-every-step trajectory (same math, same neighbor sets).
    sim_ref = _sim(timestep_fs=0.2)
    sim_skin = _sim(timestep_fs=0.2, neighbor_skin=1.5, rebuild_every=5)
    sim_ref.set_velocities_from_temperature(50.0)
    sim_skin.set_velocities_from_temperature(50.0)
    sim_ref.step(10)
    sim_skin.step(10)
    np.testing.assert_allclose(
        np.asarray(sim_skin.state.pos),
        np.asarray(sim_ref.state.pos),
        rtol=1e-5,
        atol=1e-6,
    )
    assert not bool(sim_skin.state.stale)


def test_verlet_skin_staleness_detected():
    # A tiny skin with violent motion must trip the staleness flag.
    sim = _sim(timestep_fs=0.2, neighbor_skin=1e-3, rebuild_every=10)
    sim.set_velocities_from_temperature(5000.0)
    sim.step(10)
    assert bool(sim.state.stale)


def test_langevin_thermostat_moves_atoms():
    sim = _sim(timestep_fs=0.2, friction_per_fs=0.1, temperature_K=300.0)
    p0 = np.asarray(sim.state.pos).copy()
    sim.step(5)
    p1 = np.asarray(sim.state.pos)
    mask = np.asarray(sim.batch.atom_mask)
    assert not np.allclose(p0[mask], p1[mask])
    # padding atoms never move
    np.testing.assert_array_equal(p0[~mask], p1[~mask])


def test_md_periodic_box_multi_molecule():
    """Boxed, multi-molecule MD: atoms stay finite, padding atoms frozen,
    and the skin path agrees with per-step rebuilds under PBC."""
    import jax.numpy as jnp

    args = load_example_args(
        "graph-network", num_layers=1, embedding_dimension=16, num_rbf=8,
        derivative=True, cutoff_upper=3.0,
    )
    model = create_model(args)
    rng = np.random.default_rng(7)
    mols = []
    for _ in range(2):
        mols.append(
            {
                "z": rng.integers(1, 9, 8).astype(np.int32),
                "pos": (8.0 * rng.random((8, 3))).astype(np.float32),
            }
        )
    batch = pad_molecules(mols, num_atoms=24, num_mol=2)
    params = model.init(jax.random.PRNGKey(0), batch)
    box = jnp.diag(jnp.asarray([8.0, 8.0, 8.0], jnp.float32))

    sim_ref = Simulation(model, params, batch, timestep_fs=0.2, box=box)
    sim_skin = Simulation(
        model, params, batch, timestep_fs=0.2, box=box,
        neighbor_skin=1.0, rebuild_every=5,
    )
    sim_ref.set_velocities_from_temperature(50.0)
    sim_skin.set_velocities_from_temperature(50.0)
    sim_ref.step(10)
    sim_skin.step(10)
    assert np.isfinite(np.asarray(sim_ref.state.pos)).all()
    np.testing.assert_allclose(
        np.asarray(sim_skin.state.pos), np.asarray(sim_ref.state.pos),
        rtol=1e-5, atol=1e-6,
    )
    mask = np.asarray(batch.atom_mask)
    np.testing.assert_array_equal(
        np.asarray(sim_ref.state.pos)[~mask], np.asarray(batch.pos)[~mask]
    )


def test_ring_edge_partition_md_matches_plain():
    """MD with edge_partition=True (ring executor over the 8-device mesh,
    skin rebuilds with NO host fetch — overflow folds into MDState.stale)
    reproduces the plain single-device skin trajectory."""
    from jax.sharding import Mesh

    from torchmdnet_tpu.data.batch import spatial_sort

    args = load_example_args(
        "graph-network", num_layers=1, embedding_dimension=16, num_rbf=8,
        derivative=True, max_num_neighbors=40,
    )
    model = create_model(args)
    mol = random_molecule(58, seed=7, scale=4.0)
    batch = pad_molecules([mol], num_atoms=64, num_mol=1)
    batch, _ = spatial_sort(batch)
    params = model.init(jax.random.PRNGKey(0), batch)

    kw = dict(timestep_fs=0.2, neighbor_skin=1.5, rebuild_every=5)
    sim_ref = Simulation(model, params, batch, **kw)
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    sim_ring = Simulation(
        model, params, batch, mesh=mesh, edge_partition=True, **kw
    )
    sim_ref.set_velocities_from_temperature(50.0)
    sim_ring.set_velocities_from_temperature(50.0)
    sim_ref.step(10)
    sim_ring.step(10)
    np.testing.assert_allclose(
        np.asarray(sim_ring.state.pos),
        np.asarray(sim_ref.state.pos),
        rtol=1e-4,
        atol=1e-5,
    )
    assert not bool(np.asarray(sim_ring.state.stale))


def test_ring_md_requires_skin():
    from jax.sharding import Mesh

    args = load_example_args(
        "graph-network", num_layers=1, embedding_dimension=16, num_rbf=8,
        derivative=True,
    )
    model = create_model(args)
    mol = random_molecule(14, seed=3, scale=2.0)
    batch = pad_molecules([mol], num_atoms=16, num_mol=1)
    params = model.init(jax.random.PRNGKey(0), batch)
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    with pytest.raises(ValueError, match="neighbor_skin"):
        Simulation(model, params, batch, mesh=mesh, edge_partition=True)


def test_simulation_probes_plan_shape_for_fused():
    """md.Simulation with gather_plan=True and no explicit plan_width
    probes a tight (R, W, A) from the skin list at setup (r5 — same
    contract as Trainer.fit / optimize() / bench.py)."""
    import jax

    from torchmdnet_tpu.data.batch import pad_molecules, spatial_sort
    from torchmdnet_tpu.md import Simulation
    from torchmdnet_tpu.models.potential import create_model

    from utils import load_example_args, random_molecule

    args = load_example_args(
        "equivariant-transformer", num_layers=1, embedding_dimension=128,
        num_rbf=8, derivative=True, max_num_neighbors=16,
    )
    args.update(
        bf16_messages=True, fused_attention=True, num_heads=8,
        attn_activation="silu", distance_influence="both",
        neighbor_embedding=False,
    )
    model = create_model(args)
    mol = random_molecule(12, seed=5, scale=1.5)
    batch = pad_molecules([mol], num_atoms=16, num_mol=1)
    batch, _ = spatial_sort(batch)
    params = model.init(jax.random.PRNGKey(0), batch)
    sim = Simulation(
        model, params, batch, timestep_fs=0.2, neighbor_skin=1.0,
        rebuild_every=4, neighbor_kwargs={"gather_plan": True},
    )
    sim.step(4)
    assert np.isfinite(np.asarray(sim.state.pos)).all()
