"""Synthetic benchmark systems matching the reference's PDB sizes.

The reference benchmarks real PDBs (benchmarks/README.md: ALA2 22, CLN 166,
DHFR 2489, factorIX 5807, STMV 30327 atoms); those files are not
redistributable here, so systems are generated at protein density
(0.094 atoms/A^3) with protein-like composition — neighbor counts per atom,
which drive message-passing cost, match.
"""

import numpy as np

SYSTEMS = {
    "ala2": 22,
    "testosterone": 49,
    "chignolin": 166,
    "dhfr": 2489,
    "factor_ix": 5807,
    "stmv": 30327,
}

DENSITY = 0.094  # atoms / A^3


def synthetic_system(n_atoms: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    volume = n_atoms / DENSITY
    radius = (3.0 * volume / (4.0 * np.pi)) ** (1.0 / 3.0)
    r = radius * rng.random(n_atoms) ** (1.0 / 3.0)
    v = rng.standard_normal((n_atoms, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pos = (r[:, None] * v).astype(np.float32)
    z = rng.choice([1, 6, 7, 8, 16], size=n_atoms, p=[0.5, 0.32, 0.09, 0.08, 0.01])
    return z.astype(np.int32), pos
