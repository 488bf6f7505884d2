"""Minimal molecular-dynamics driver on top of a trained potential.

The reference integrates with external engines (TorchMD/OpenMM/ACEMD) through
the calculator API (torchmdnet/calculators.py); this module additionally
provides a self-contained velocity-Verlet / Langevin loop that runs the WHOLE
step (integrator + energy + forces) inside one jitted, donated-buffer
executable — the XLA analog of CUDA-graph-replayed MD stepping, with zero
host work per step except the Python dispatch.

Units: positions in Angstrom, energies in eV, masses in amu, time in fs
(conversion constant below), temperatures in Kelvin.
"""

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from torchmdnet_tpu.constants import ATOMIC_MASSES
from torchmdnet_tpu.data.batch import AtomicBatch

# 1 eV/A / amu in A/fs^2
_ACCEL = 0.00964853
# Boltzmann constant in eV/K
_KB = 8.617333262e-5


class MDState(NamedTuple):
    pos: jnp.ndarray  # (N, 3) Angstrom
    vel: jnp.ndarray  # (N, 3) A/fs
    key: jnp.ndarray  # PRNG key (Langevin)
    energy: jnp.ndarray  # (M, 1) eV (from the last force evaluation)


class Simulation:
    """Velocity-Verlet (NVE) or Langevin (NVT) dynamics for one padded batch.

    Each `step(n)` call runs n integration steps inside one lax.scan under a
    single cached executable.
    """

    def __init__(
        self,
        model,
        params,
        batch: AtomicBatch,
        timestep_fs: float = 1.0,
        friction_per_fs: float = 0.0,
        temperature_K: Optional[float] = None,
        box: Optional[jnp.ndarray] = None,
        seed: int = 0,
    ):
        self.model = model
        self.params = params
        self.batch = batch
        self.box = box
        self.dt = float(timestep_fs)
        self.friction = float(friction_per_fs)
        self.temperature = temperature_K
        masses = jnp.asarray(ATOMIC_MASSES, jnp.float32)[batch.z][:, None]
        self.masses = jnp.where(batch.atom_mask[:, None], masses, 1.0)

        dt, gamma = self.dt, self.friction
        kT = _KB * (temperature_K or 0.0)
        atom_mask3 = batch.atom_mask[:, None]

        def forces(pos):
            y, neg_dy = model.energy_and_forces(
                params, batch.replace(pos=pos), box=box
            )
            return y, jnp.where(atom_mask3, neg_dy, 0.0)

        def one_step(state, _):
            pos, vel, key = state
            _, f = forces(pos)
            acc = _ACCEL * f / self.masses
            vel = vel + 0.5 * dt * acc
            pos = pos + dt * vel
            y2, f2 = forces(pos)
            acc2 = _ACCEL * f2 / self.masses
            vel = vel + 0.5 * dt * acc2
            if gamma > 0.0 and temperature_K is not None:
                # BAOAB-style Langevin velocity update
                key, sub = jax.random.split(key)
                c1 = jnp.exp(-gamma * dt)
                sigma = jnp.sqrt((1 - c1**2) * kT / self.masses * _ACCEL / dt * dt)
                noise = sigma * jax.random.normal(sub, vel.shape, dtype=vel.dtype)
                vel = c1 * vel + noise
            vel = jnp.where(atom_mask3, vel, 0.0)
            return (pos, vel, key), y2

        @partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
        def run(state, n):
            (pos, vel, key), ys = jax.lax.scan(
                one_step, (state.pos, state.vel, state.key), None, length=n
            )
            return MDState(pos=pos, vel=vel, key=key, energy=ys[-1])

        self._run = run
        self.state = MDState(
            pos=batch.pos,
            vel=jnp.zeros_like(batch.pos),
            key=jax.random.PRNGKey(seed),
            energy=jnp.zeros((batch.num_mol, 1), batch.pos.dtype),
        )

    def set_velocities_from_temperature(self, temperature_K: float, seed: int = 1):
        """Maxwell-Boltzmann initialization."""
        key = jax.random.PRNGKey(seed)
        sigma = jnp.sqrt(_KB * temperature_K / self.masses * _ACCEL)
        vel = sigma * jax.random.normal(key, self.state.pos.shape, dtype=self.state.pos.dtype)
        vel = jnp.where(self.batch.atom_mask[:, None], vel, 0.0)
        self.state = self.state._replace(vel=vel)

    def kinetic_energy(self):
        v2 = (self.state.vel**2).sum(-1, keepdims=True)
        ke = 0.5 * self.masses * v2 / _ACCEL
        return float(jnp.where(self.batch.atom_mask[:, None], ke, 0.0).sum())

    def potential_energy(self):
        y = self.model.energy(self.params, self.batch.replace(pos=self.state.pos), box=self.box)
        return float(jnp.where(self.batch.mol_mask[:, None], y, 0.0).sum())

    def step(self, n: int = 1):
        self.state = self._run(self.state, n)
        return self.state
