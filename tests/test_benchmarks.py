"""benchmarks/ harnesses: importable, systems generator sane, one tiny
measurement runs end-to-end (on CPU)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_systems_generator():
    from benchmarks.systems import SYSTEMS, synthetic_system

    assert SYSTEMS["dhfr"] == 2489 and SYSTEMS["stmv"] == 30327
    z, pos = synthetic_system(166)
    assert z.shape == (166,) and pos.shape == (166, 3)
    assert np.isfinite(pos).all()
    # density close to protein-like
    from benchmarks.systems import DENSITY

    r = np.linalg.norm(pos, axis=1).max()
    vol = 4.0 / 3.0 * np.pi * r**3
    assert 0.5 * DENSITY < 166 / vol < 2.0 * DENSITY


def test_neighbors_benchmark_tiny():
    from benchmarks.neighbors import bench_strategy

    ms = bench_strategy("brute", 64, k=16, cutoff=5.0)
    assert np.isfinite(ms)


def test_inference_benchmark_imports():
    from benchmarks.inference import MODEL_ALIASES, model_args

    assert MODEL_ALIASES["gn"] == "graph-network"
    args = model_args("tensornet")
    assert args["num_layers"] == 2


def test_pdb_loader_real_systems():
    """The runtime PDB reader parses the reference's benchmark systems with
    the documented atom counts (skipped when the mount is absent)."""
    import os

    import pytest

    from benchmarks.systems import PDB_DIR, SYSTEMS, get_system

    if not os.path.isdir(PDB_DIR):
        pytest.skip("reference mount not available")
    for name in ("ala2", "chignolin", "dhfr"):
        z, pos, src = get_system(name)
        assert src == "pdb"
        assert len(z) == SYSTEMS[name] and pos.shape == (len(z), 3)
        assert z.min() >= 1 and z.max() <= 53
        # coordinates are Angstrom-scale: a protein spans tens of A
        import numpy as np

        assert 3.0 < np.ptp(pos, axis=0).max() < 500.0
