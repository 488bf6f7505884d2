"""Benchmark systems: the reference's real PDBs, with a synthetic fallback.

The reference benchmarks real PDB systems (benchmarks/README.md: ALA2 22,
CLN 166, DHFR 2489, factorIX 5807, STMV 30327 atoms).  :func:`get_system`
parses those files at runtime from the read-only reference mount (nothing is
copied or redistributed); when the mount is absent it falls back to
:func:`synthetic_system`, a generator at protein density (0.094 atoms/A^3)
with protein-like composition so neighbor counts per atom — which drive
message-passing cost — still match.
"""

import os

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

# the reference's benchmark inputs, read in place (benchmarks/README.md:5-12)
PDB_DIR = "/root/reference/benchmarks/systems"
PDB_FILES = {
    "ala2": "alanine_dipeptide.pdb",
    "testosterone": "testosterone.pdb",
    "chignolin": "chignolin.pdb",
    "dhfr": "dhfr.pdb",
    "factor_ix": "factorIX.pdb",
    "stmv": "stmv.pdb",
}

_SYMBOL_TO_Z = {
    "H": 1, "C": 6, "N": 7, "O": 8, "F": 9, "NA": 11, "MG": 12, "P": 15,
    "S": 16, "CL": 17, "K": 19, "CA": 20, "ZN": 30, "BR": 35, "I": 53,
}


def load_pdb(path):
    """Minimal PDB reader: (z, pos) from the first MODEL's ATOM/HETATM rows.

    Element from columns 77-78 (falling back to the first letter of the atom
    name, columns 13-16), coordinates from columns 31-54 — the standard
    fixed-column PDB layout the reference's moleculekit reader consumes
    (reference benchmarks/inference.py:50-53).
    """
    zs, pos = [], []
    with open(path) as f:
        for line in f:
            if line.startswith(("ATOM", "HETATM")):
                sym = line[76:78].strip().upper()
                if not sym:
                    name = line[12:16].strip()
                    sym = next((c for c in name if c.isalpha()), "C").upper()
                if sym not in _SYMBOL_TO_Z:
                    # nonstandard element fields (e.g. STMV writes 'HO' for
                    # hydroxyl hydrogens): first letter decides
                    sym = sym[0]
                zs.append(_SYMBOL_TO_Z[sym])
                pos.append(
                    (float(line[30:38]), float(line[38:46]), float(line[46:54]))
                )
            elif line.startswith("ENDMDL"):
                break  # first model only
    return np.asarray(zs, np.int32), np.asarray(pos, np.float32)


def get_system_by_count(n_atoms: int, seed: int = 0):
    """(z, pos, source) for an atom count: the matching real PDB when the
    count names a reference system and the mount is readable, else synthetic."""
    for name, count in SYSTEMS.items():
        if count == n_atoms:
            return get_system(name, seed=seed)
    z, pos = synthetic_system(n_atoms, seed=seed)
    return z, pos, "synthetic"


def get_system(name: str, seed: int = 0):
    """(z, pos, source): real PDB coordinates when the reference mount is
    readable, else density-matched synthetic ones."""
    path = os.path.join(PDB_DIR, PDB_FILES[name])
    if os.path.exists(path):
        z, pos = load_pdb(path)
        assert len(z) == SYSTEMS[name], (
            f"{name}: parsed {len(z)} atoms, expected {SYSTEMS[name]}"
        )
        return z, pos, "pdb"
    z, pos = synthetic_system(SYSTEMS[name], seed=seed)
    return z, pos, "synthetic"


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
