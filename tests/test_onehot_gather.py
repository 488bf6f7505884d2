"""Tests for the one-hot MXU gather (ops/pallas/onehot_gather.py) and its
ell_gather / Potential.neighbors integration.

Runs in pallas interpret mode on CPU (the kernel auto-detects the platform);
the TPU-measured perf is recorded in PERF.md and benchmarks/exp_gather.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmdnet_tpu.ops.neighbors import ell_gather, neighbor_list
from torchmdnet_tpu.ops.pallas.onehot_gather import (
    make_block_gather_plan,
    onehot_gather,
)

from utils import load_example_args, random_molecule


def _valid_list(n=128, seed=0, k=None):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(np.cumsum(rng.standard_normal((n, 3)) * 0.8, axis=0), jnp.float32)
    probe = neighbor_list(pos, k=8, cutoff_upper=5.0, loop=True, strategy="brute")
    k = k or int(np.asarray(probe.n_neighbors).max()) + 9
    nbl = neighbor_list(pos, k=k, cutoff_upper=5.0, loop=True, strategy="brute")
    assert not bool(np.asarray(nbl.overflow()))
    return nbl


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("f", [128, 256])
def test_onehot_gather_bitwise_exact(dtype, f):
    nbl = _valid_list()
    plan = make_block_gather_plan(nbl.idx, block_rows=32, width=256)
    assert int(plan.overflow) == 0
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((nbl.num_atoms, f)), dtype)
    out = onehot_gather(x, plan)
    assert (np.asarray(out) == np.asarray(x[nbl.idx])).all()


def test_plan_overflow_detected_and_raised():
    nbl = _valid_list()
    tiny = make_block_gather_plan(nbl.idx, block_rows=32, width=128)
    if int(tiny.overflow) == 0:
        pytest.skip("list too sparse to overflow width=128")
    with pytest.raises(ValueError, match="Gather-plan width"):
        nbl.replace(gather_plan=tiny).raise_on_overflow("test")


def test_ell_gather_routes_and_matches_all_orders():
    """plan and plain paths agree with native XLA autodiff through
    grad-of-grad (the force-training order)."""
    nbl = _valid_list()
    plan = make_block_gather_plan(nbl.idx, block_rows=32, width=256)
    rng = np.random.default_rng(2)
    x32 = jnp.asarray(rng.standard_normal((nbl.num_atoms, 256)), jnp.float32)
    x = x32.astype(jnp.bfloat16)

    out_plain = ell_gather(x, nbl.idx)
    out_plan = ell_gather(x, nbl.idx, plan)
    assert (np.asarray(out_plain) == np.asarray(out_plan)).all()

    def h(fn, xx):
        inner = lambda y_: (fn(y_).astype(jnp.float32) ** 2).sum()
        outer = lambda x_: (jax.grad(inner)(x_).astype(jnp.float32) ** 2).sum()
        return np.asarray(jax.jit(jax.grad(outer))(xx), np.float64)

    hn = h(lambda y: y[nbl.idx], x32)
    h2 = h(lambda y: ell_gather(y, nbl.idx, plan), x32.astype(jnp.bfloat16))
    # bf16 inputs: identical values, f32 math differs only by reduction order
    rel = np.abs(h2 - hn) / (np.abs(hn) + 1e-2)
    assert np.median(rel) < 2e-2, np.median(rel)

    g1 = jax.grad(lambda y: (ell_gather(y, nbl.idx).astype(jnp.float32) ** 2).sum())(x)
    g2 = jax.grad(lambda y: (ell_gather(y, nbl.idx, plan).astype(jnp.float32) ** 2).sum())(x)
    assert (np.asarray(g1) == np.asarray(g2)).all()


@pytest.mark.slow
def test_neighbors_builds_plan_and_model_output_unchanged():
    """Potential.neighbors(gather_plan=True) threads the plan through the
    representation; outputs must equal the planless run bitwise (the one-hot
    matmul emits exact rows)."""
    from torchmdnet_tpu.data.batch import pad_molecules, spatial_sort
    from torchmdnet_tpu.models.potential import create_model

    args = load_example_args(
        "equivariant-transformer",
        num_layers=2,
        embedding_dimension=128,
        derivative=True,
    )
    model = create_model(dict(args, bf16_messages=True))
    mols = [random_molecule(16, seed=i) for i in range(2)]
    batch = pad_molecules(mols, num_atoms=64, num_mol=2)
    batch, _ = spatial_sort(batch)
    params = model.init(jax.random.PRNGKey(0), batch)

    nbl_plain = model.neighbors(batch)
    nbl_plan = model.neighbors(batch, gather_plan=True, plan_width=256)
    assert nbl_plan.gather_plan is not None
    nbl_plan.raise_on_overflow("test")

    y0, f0 = model.apply(params, batch, nbl=nbl_plain)
    y1, f1 = model.apply(params, batch, nbl=nbl_plan)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))


@pytest.mark.slow
def test_spatial_sort_preserves_physics():
    from torchmdnet_tpu.data.batch import pad_molecules, spatial_sort
    from torchmdnet_tpu.models.potential import create_model

    model = create_model(load_example_args("tensornet", num_layers=1, derivative=True))
    mols = [random_molecule(12, seed=i) for i in range(3)]
    batch = pad_molecules(mols, num_atoms=48, num_mol=3)
    params = model.init(jax.random.PRNGKey(0), batch)
    y0, f0 = model.apply(params, batch)

    sbatch, order = spatial_sort(batch)
    y1, f1 = model.apply(params, sbatch)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-5, atol=1e-6)
    inv = np.argsort(np.asarray(order))
    np.testing.assert_allclose(
        np.asarray(f0), np.asarray(f1)[inv], rtol=1e-4, atol=1e-5
    )


def test_onehot_transpose_sum_matches_argsort_path():
    from torchmdnet_tpu.ops.neighbors import ell_transpose_sum
    from torchmdnet_tpu.ops.pallas.onehot_gather import onehot_transpose_sum

    nbl = _valid_list()
    plan = make_block_gather_plan(nbl.idx, block_rows=32, width=256)
    assert int(plan.overflow) == 0 and int(plan.inv_overflow) == 0
    rng = np.random.default_rng(3)
    g = jnp.asarray(
        rng.standard_normal((nbl.num_atoms, nbl.idx.shape[1], 128)), jnp.float32
    )
    ref = ell_transpose_sum(g, nbl.idx)
    out = onehot_transpose_sum(g, plan)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-5)
    gb = g.astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(ell_transpose_sum(gb, nbl.idx), np.float32),
        np.asarray(onehot_transpose_sum(gb, plan), np.float32),
        rtol=1e-2, atol=1e-2,
    )


def test_inv_capacity_overflow_detected():
    nbl = _valid_list()
    plan = make_block_gather_plan(nbl.idx, block_rows=32, width=256, inv_capacity=8)
    if int(plan.inv_overflow) == 0:
        pytest.skip("inverse table fits capacity 8")
    with pytest.raises(ValueError, match="inverse capacity"):
        nbl.replace(gather_plan=plan).raise_on_overflow("test")


def test_suggest_plan_shape_capacities_fit():
    """The probe's (R, W, A) must hold the probed list with zero plan
    overflow at headroom=1.0 (mirrors the cell_list probe tests): W covers
    the densest block's unique sources and A the max blocks-per-source."""
    from torchmdnet_tpu.ops.pallas.onehot_gather import suggest_plan_shape

    for seed in range(3):
        nbl = _valid_list(n=160, seed=seed)
        shape = suggest_plan_shape(
            jax.device_get(nbl.idx), block_rows=16, headroom=1.0
        )
        assert shape is not None
        r, w, a = shape
        assert 160 % r == 0 and w % 128 == 0
        plan = make_block_gather_plan(
            nbl.idx, block_rows=r, width=w, inv_capacity=a
        )
        assert int(plan.overflow) == 0, "probed width W overflowed"
        assert int(plan.inv_overflow) == 0, "probed inv capacity A overflowed"


def test_suggest_plan_shape_indivisible_returns_none():
    """N not divisible by any block_rows <= 8: the probe returns None (the
    Potential.neighbors contract — no plan attached, no crash at setup)."""
    from torchmdnet_tpu.ops.pallas.onehot_gather import suggest_plan_shape

    idx = np.zeros((27, 4), np.int32)  # 27 is odd: no r <= 8 divides it
    assert suggest_plan_shape(idx, block_rows=16) is None
