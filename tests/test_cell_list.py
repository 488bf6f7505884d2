"""Cell-list strategy: bitwise identical to brute across grids of shapes,
cutoffs, batches, loops, PBC; overflow detection; split-program usage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmdnet_tpu.ops.cell_list import neighbor_list_cell
from torchmdnet_tpu.ops.neighbors import neighbor_list


def _compare(pos, batch, k, cutoff, loop=False, box=None, atom_mask=None):
    b = neighbor_list(
        pos, batch, atom_mask, k=k, cutoff_upper=cutoff, loop=loop, box=box,
        strategy="brute",
    )
    c = neighbor_list(
        pos, batch, atom_mask, k=k, cutoff_upper=cutoff, loop=loop, box=box,
        strategy="cell",
    )
    np.testing.assert_array_equal(np.asarray(b.idx), np.asarray(c.idx))
    np.testing.assert_array_equal(np.asarray(b.mask), np.asarray(c.mask))
    np.testing.assert_array_equal(
        np.asarray(b.n_neighbors), np.asarray(c.n_neighbors)
    )
    assert not bool(c.cell_overflow)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("cutoff", [1.5, 3.0])
@pytest.mark.parametrize("loop", [False, True])
def test_cell_matches_brute(seed, cutoff, loop):
    rng = np.random.default_rng(seed)
    n = 70
    pos = jnp.asarray(6.0 * rng.standard_normal((n, 3)), jnp.float32)
    batch = jnp.asarray(np.sort(rng.integers(0, 3, n)), jnp.int32)
    _compare(pos, batch, k=n, cutoff=cutoff, loop=loop)


def test_cell_matches_brute_pbc_rect():
    rng = np.random.default_rng(5)
    n = 60
    pos = jnp.asarray(7.0 * rng.random((n, 3)) - 20.0, jnp.float32)  # unwrapped
    box = jnp.diag(jnp.asarray([7.0, 7.0, 7.0], jnp.float32))
    _compare(pos, jnp.zeros(n, jnp.int32), k=n, cutoff=2.0, box=box)


def test_cell_padding_atoms():
    rng = np.random.default_rng(9)
    n = 40
    pos = np.zeros((n, 3), np.float32)
    pos[:30] = 5.0 * rng.standard_normal((30, 3))
    atom_mask = jnp.asarray([True] * 30 + [False] * 10)
    _compare(
        jnp.asarray(pos), jnp.zeros(n, jnp.int32), k=n, cutoff=2.5,
        atom_mask=atom_mask,
    )


def test_cell_overflow_flag():
    # 40 atoms piled into one cell with capacity 4 -> bucket overflow
    pos = jnp.asarray(np.random.default_rng(0).random((40, 3)), jnp.float32)
    nbl = neighbor_list_cell(pos, k=40, cutoff_upper=5.0, cell_capacity=4)
    assert bool(nbl.cell_overflow)


@pytest.mark.parametrize("box", [None, 7.0])
def test_cell_hash_fallback_matches_brute(box):
    rng = np.random.default_rng(11)
    n = 80
    pos = jnp.asarray(9.0 * rng.standard_normal((n, 3)), jnp.float32)
    batch = jnp.asarray(np.sort(rng.integers(0, 2, n)), jnp.int32)
    boxm = None if box is None else jnp.diag(jnp.full((3,), box, jnp.float32))
    b = neighbor_list(pos, batch, k=n, cutoff_upper=2.5, box=boxm, strategy="brute")
    h = neighbor_list_cell(
        pos, batch, k=n, cutoff_upper=2.5, box=boxm, hash_strategy=True
    )
    np.testing.assert_array_equal(np.asarray(b.idx), np.asarray(h.idx))
    np.testing.assert_array_equal(np.asarray(b.mask), np.asarray(h.mask))
    assert not bool(h.cell_overflow)


def test_cell_max_cells_overflow_flag():
    # more occupied cells than max_cells -> overflow reported, not silent
    rng = np.random.default_rng(2)
    pos = jnp.asarray(100.0 * rng.standard_normal((64, 3)), jnp.float32)
    nbl = neighbor_list_cell(pos, k=8, cutoff_upper=1.0, max_cells=8)
    assert bool(nbl.cell_overflow)


def test_cell_lower_cutoff():
    rng = np.random.default_rng(3)
    pos = jnp.asarray(4.0 * rng.standard_normal((50, 3)), jnp.float32)
    b = neighbor_list(pos, k=50, cutoff_lower=1.0, cutoff_upper=3.0, strategy="brute")
    c = neighbor_list(pos, k=50, cutoff_lower=1.0, cutoff_upper=3.0, strategy="cell")
    np.testing.assert_array_equal(np.asarray(b.idx), np.asarray(c.idx))


def test_precomputed_nbl_matches_internal():
    """Potential.neighbors + apply(nbl=...) == apply() (split-program path)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from utils import load_example_args, random_molecule

    from torchmdnet_tpu.data.batch import pad_molecules
    from torchmdnet_tpu.models.potential import create_model

    for model_name in ["graph-network", "equivariant-transformer"]:
        model = create_model(load_example_args(model_name, num_layers=1))
        batch = pad_molecules([random_molecule(8, seed=1)], num_atoms=8, num_mol=1)
        params = model.init(jax.random.PRNGKey(0), batch)
        y_internal, _ = model.apply(params, batch)
        nbl = model.neighbors(batch)
        y_pre, _ = model.apply(params, batch, nbl=nbl)
        np.testing.assert_allclose(np.asarray(y_internal), np.asarray(y_pre), rtol=1e-6)
        nbl_cell = model.neighbors(batch, strategy="cell")
        y_cell, _ = model.apply(params, batch, nbl=nbl_cell)
        np.testing.assert_allclose(np.asarray(y_internal), np.asarray(y_cell), rtol=1e-6)


@pytest.mark.parametrize("loop", [False, True])
def test_pallas_compaction_matches_brute(loop):
    """The Pallas streaming-compaction kernel (interpret mode on CPU) is
    bitwise identical to the XLA brute strategy."""
    rng = np.random.default_rng(7)
    n = 150
    pos = jnp.asarray(7.0 * rng.standard_normal((n, 3)), jnp.float32)
    batch = jnp.asarray(np.sort(rng.integers(0, 2, n)), jnp.int32)
    am = jnp.asarray(rng.random(n) > 0.1)
    b = neighbor_list(pos, batch, am, k=24, cutoff_upper=3.5, loop=loop, strategy="brute")
    p = neighbor_list(pos, batch, am, k=24, cutoff_upper=3.5, loop=loop, strategy="brute-pallas")
    np.testing.assert_array_equal(np.asarray(b.idx), np.asarray(p.idx))
    np.testing.assert_array_equal(np.asarray(b.mask), np.asarray(p.mask))
    np.testing.assert_array_equal(np.asarray(b.n_neighbors), np.asarray(p.n_neighbors))


def test_select_topk_matches_lax_topk():
    """Pallas min-extraction selection == XLA top_k, including all-invalid
    rows, duplicate sentinels, and k > valid-count rows."""
    from torchmdnet_tpu.ops.pallas.select_topk import select_topk

    rng = np.random.default_rng(7)
    n, w, k, sent = 300, 91, 17, 1000
    keys = rng.integers(0, sent, size=(n, w)).astype(np.int32)
    # make entries unique per row where valid (atom ids are unique); invalid
    # slots all hold the sentinel
    keys = np.sort(keys, axis=1)
    keys[np.diff(keys, axis=1, prepend=-1) == 0] = sent
    keys[5] = sent  # an all-invalid row
    keys[6, 3:] = sent  # fewer than k valid entries
    shuf = rng.permuted(keys, axis=1)

    got = np.asarray(select_topk(jnp.asarray(shuf), k, sent))
    neg_top, _ = jax.lax.top_k(-jnp.asarray(shuf), k)
    want = np.asarray(-neg_top)
    np.testing.assert_array_equal(got, want)


def test_suggest_cell_capacity_probe():
    """The setup-time occupancy probe yields a capacity the build accepts
    (no overflow) and that reproduces brute exactly."""
    from torchmdnet_tpu.ops.cell_list import suggest_cell_capacity

    rng = np.random.default_rng(3)
    pos = rng.uniform(0, 18.0, size=(257, 3)).astype(np.float32)
    cap = suggest_cell_capacity(pos, cutoff_upper=4.0, headroom=1.0)
    nbl = neighbor_list_cell(
        jnp.asarray(pos), k=32, cutoff_upper=4.0, cell_capacity=cap
    )
    assert not bool(nbl.cell_overflow)
    ref = neighbor_list(
        jnp.asarray(pos), k=32, cutoff_upper=4.0, strategy="brute"
    )
    np.testing.assert_array_equal(np.asarray(nbl.idx), np.asarray(ref.idx))
    np.testing.assert_array_equal(np.asarray(nbl.mask), np.asarray(ref.mask))
    # a deliberately lower capacity must trip the loud overflow flag
    nbl_low = neighbor_list_cell(
        jnp.asarray(pos), k=32, cutoff_upper=4.0, cell_capacity=max(1, cap // 4)
    )
    assert bool(nbl_low.cell_overflow)


def test_wants_cell_probe_gate():
    """The large-molecule probe gate has ONE definition (ops/cell_list) used
    by Trainer.fit, OptimizedPotential, md.Simulation, benchmarks/training."""
    from torchmdnet_tpu.ops.cell_list import wants_cell_probe

    assert wants_cell_probe(2048, 1)
    assert wants_cell_probe(30327, 1)
    assert wants_cell_probe(4096, 8)  # 512 atoms/mol boundary
    assert not wants_cell_probe(2047, 1)  # below total-atom floor
    assert not wants_cell_probe(4096, 9)  # < 512 atoms per molecule
    assert not wants_cell_probe(128, 1)
    # the three production call sites all route through the shared predicate
    import inspect

    import torchmdnet_tpu.md as md
    import torchmdnet_tpu.optimize as optimize
    import torchmdnet_tpu.train.trainer as trainer

    for mod in (md, optimize, trainer):
        assert "wants_cell_probe" in inspect.getsource(mod)


@pytest.mark.parametrize(
    "side,cutoff,n",
    [(51.4, 7.0, 4096), (18.0, 4.0, 600), (33.3, 5.0, 2048)],
)
def test_suggest_cell_capacity_probe_box(side, cutoff, n):
    """Box-path probe regression (ADVICE r3): the build clips cell coords to
    ext = floor(diag/cutoff), merging the boundary remainder slab into the
    last cells — up to ~8x a width-cutoff cell's volume in the corner.  The
    probe must bin identically or the first periodic build overflows
    spuriously for any non-integer diag/cutoff ratio (e.g. 97.5/7)."""
    from torchmdnet_tpu.ops.cell_list import suggest_cell_capacity

    rng = np.random.default_rng(11)
    pos = rng.uniform(0, side, size=(n, 3)).astype(np.float32)
    box = np.diag([side, side, side]).astype(np.float32)
    cap = suggest_cell_capacity(pos, cutoff_upper=cutoff, box=box, headroom=1.0)
    nbl = neighbor_list_cell(
        jnp.asarray(pos),
        k=96,
        cutoff_upper=cutoff,
        box=jnp.asarray(box),
        cell_capacity=cap,
    )
    assert not bool(nbl.cell_overflow)
    ref = neighbor_list(
        jnp.asarray(pos),
        k=96,
        cutoff_upper=cutoff,
        box=jnp.asarray(box),
        strategy="brute",
    )
    np.testing.assert_array_equal(np.asarray(nbl.idx), np.asarray(ref.idx))
    np.testing.assert_array_equal(np.asarray(nbl.mask), np.asarray(ref.mask))


def test_suggest_max_cells_probe():
    """Sparse/hollow systems (mean occupancy < 8) violate the N//8 default's
    assumption; the probe sizes max_cells from the OCCUPIED cell count so
    the build does not rank-overflow (found on solvated STMV, r4)."""
    from torchmdnet_tpu.ops.cell_list import suggest_max_cells

    rng = np.random.default_rng(5)
    # hollow shell: ~4 atoms per occupied cell at cutoff 5
    n = 4096
    r = 40.0 + rng.uniform(0, 5.0, n)
    v = rng.standard_normal((n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pos = (r[:, None] * v).astype(np.float32)
    mc = suggest_max_cells(pos, cutoff_upper=5.0)
    assert mc % 8 == 0
    # default N//8 = 512 would overflow; the probe must exceed it
    assert mc > n // 8
    nbl = neighbor_list_cell(
        jnp.asarray(pos), k=64, cutoff_upper=5.0, cell_capacity=16,
        max_cells=mc,
    )
    assert not bool(nbl.cell_overflow)
    # and the undersized default must trip the loud flag
    nbl_bad = neighbor_list_cell(
        jnp.asarray(pos), k=64, cutoff_upper=5.0, cell_capacity=16,
    )
    assert bool(nbl_bad.cell_overflow)


def test_cell_soa_branch_matches_brute():
    """The SoA field-plane formulation (picked when the candidate tile
    exceeds scoped-VMEM scale; r5 STMV relayout fix) is bitwise identical
    to brute too — forced here via an oversized max_cells so the static
    gate flips without needing 30k atoms."""
    from torchmdnet_tpu.ops import cell_list as cl

    rng = np.random.default_rng(7)
    n = 512
    pos = jnp.asarray(rng.uniform(0, 18.0, (n, 3)), jnp.float32)
    batch = jnp.zeros((n,), jnp.int32)
    b = neighbor_list(pos, batch, k=48, cutoff_upper=3.0, strategy="brute")
    # max_cells=4096 x cap 32: tile = 4096*27*32*5*4 B = 70 MB > 16 MB -> SoA
    c = neighbor_list(
        pos, batch, k=48, cutoff_upper=3.0, strategy="cell",
        cell_capacity=32, max_cells=4096,
    )
    assert not bool(c.cell_overflow)
    np.testing.assert_array_equal(np.asarray(b.idx), np.asarray(c.idx))
    np.testing.assert_array_equal(np.asarray(b.mask), np.asarray(c.mask))
    np.testing.assert_array_equal(
        np.asarray(b.n_neighbors), np.asarray(c.n_neighbors)
    )
