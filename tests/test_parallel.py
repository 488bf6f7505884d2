"""Multi-device tests the reference never had (SURVEY.md section 4):
shard-count invariance of losses/energies on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from torchmdnet_tpu.data.batch import pad_molecules
from torchmdnet_tpu.models.potential import create_model

from utils import load_example_args, random_molecule


def _batch(num_mol=8, atoms=6, capacity=64):
    mols = [random_molecule(atoms, seed=i) for i in range(num_mol)]
    return pad_molecules(mols, num_atoms=capacity, num_mol=num_mol)


@pytest.mark.parametrize("model_name", ["equivariant-transformer", "tensornet"])
def test_dp_sharded_energy_matches_single_device(model_name):
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    model = create_model(load_example_args(model_name, num_layers=1))
    batch = _batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    y_single, _ = model.apply(params, batch)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    def shard(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] % 8 == 0:
            return jax.device_put(leaf, NamedSharding(mesh, P("dp")))
        return leaf
    sharded = jax.tree_util.tree_map(shard, batch)

    with mesh:
        y_sharded, _ = jax.jit(lambda p, b: model.apply(p, b))(params, sharded)
    np.testing.assert_allclose(
        np.asarray(y_single), np.asarray(y_sharded), rtol=1e-5, atol=1e-6
    )


def test_dp_sharded_gradients_match(tmp_path):
    """The DDP-parity property: gradients from a dp-sharded step equal the
    single-device gradients (XLA inserts the psum the reference's NCCL
    allreduce performed)."""
    model = create_model(
        load_example_args("graph-network", num_layers=1, derivative=True)
    )
    batch = _batch()
    target_y = jnp.ones((batch.num_mol, 1))
    params = model.init(jax.random.PRNGKey(0), batch)

    def loss_fn(p, b):
        y, neg_dy = model.energy_and_forces(p, b)
        return jnp.where(b.mol_mask[:, None], (y - target_y) ** 2, 0.0).sum()

    g_single = jax.grad(loss_fn)(params, batch)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    def shard(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] % 8 == 0:
            return jax.device_put(leaf, NamedSharding(mesh, P("dp")))
        return leaf
    sharded = jax.tree_util.tree_map(shard, batch)
    with mesh:
        g_sharded = jax.jit(jax.grad(loss_fn))(params, sharded)

    for a, b in zip(
        jax.tree_util.tree_leaves(g_single), jax.tree_util.tree_leaves(g_sharded)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_edge_partitioned_apply_matches_single_device():
    """Atom/edge-sharded execution of one large molecule == single device."""
    from torchmdnet_tpu.parallel.edge_partition import edge_sharded_apply

    model = create_model(
        load_example_args("equivariant-transformer", num_layers=1, derivative=True)
    )
    # one 64-atom molecule sharded across 8 devices
    batch = _batch(num_mol=1, atoms=64, capacity=64)
    params = model.init(jax.random.PRNGKey(0), batch)
    y_single, f_single = model.apply(params, batch)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    y_sharded, f_sharded = edge_sharded_apply(model, params, batch, mesh)
    np.testing.assert_allclose(np.asarray(y_single), np.asarray(y_sharded), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_single), np.asarray(f_sharded), rtol=1e-4, atol=1e-6)


def test_sharded_gather_aggregate_explicit():
    from torchmdnet_tpu.parallel.edge_partition import (
        sharded_gather_aggregate,
        two_stage_molecular_reduce,
    )

    rng = np.random.default_rng(0)
    n, k, h = 64, 8, 16
    x = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, (n, k)), jnp.int32)
    mask = jnp.asarray(rng.random((n, k)) > 0.3)
    w = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)

    expected = jnp.where(mask[..., None], x[idx] * w[..., None], 0.0).sum(axis=1)
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    out = sharded_gather_aggregate(x, idx, mask, w, mesh)
    np.testing.assert_allclose(np.asarray(expected), np.asarray(out), rtol=1e-6)

    ids = jnp.asarray(np.sort(rng.integers(0, 4, n)), jnp.int32)
    per_atom = expected.sum(axis=1)
    expected_mol = jax.ops.segment_sum(per_atom, ids, num_segments=5)[:4]
    out_mol = two_stage_molecular_reduce(per_atom, ids, 4, mesh)
    np.testing.assert_allclose(np.asarray(expected_mol), np.asarray(out_mol), rtol=1e-6)


def _ring_problem(n=64, k=8, h=16, seed=0, local_bias=False):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    if local_bias:
        # cell-list-like locality: most sources near the receiver row
        base = np.arange(n)[:, None] + rng.integers(-4, 5, (n, k))
        idx = jnp.asarray(np.clip(base, 0, n - 1), jnp.int32)
    else:
        idx = jnp.asarray(rng.integers(0, n, (n, k)), jnp.int32)
    mask = jnp.asarray(rng.random((n, k)) > 0.3)
    w = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    expected = jnp.where(mask[..., None], x[idx] * w[..., None], 0.0).sum(axis=1)
    return x, idx, mask, w, expected


@pytest.mark.slow
@pytest.mark.parametrize("local_bias", [False, True])
def test_ring_gather_aggregate_matches_dense(local_bias):
    from torchmdnet_tpu.parallel.edge_partition import (
        make_ring_plan,
        ring_gather_aggregate,
    )

    x, idx, mask, w, expected = _ring_problem(local_bias=local_bias)
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    plan = make_ring_plan(idx, mask, mesh, boundary_capacity=64)
    assert int(np.asarray(plan[2]).sum()) == 0, "capacity 64 must hold all boundary edges"
    out = ring_gather_aggregate(x, idx, mask, w, plan, mesh)
    np.testing.assert_allclose(np.asarray(expected), np.asarray(out), rtol=1e-5, atol=1e-6)


def test_ring_plan_reports_overflow_and_counts_boundary_edges():
    from torchmdnet_tpu.parallel.edge_partition import make_ring_plan

    x, idx, mask, w, _ = _ring_problem()
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    n_local = idx.shape[0] // 8
    owner = np.asarray(idx) // n_local
    me = np.repeat(np.arange(8), n_local)[:, None]
    n_boundary = int((np.asarray(mask) & (owner != me)).sum())

    full = make_ring_plan(idx, mask, mesh, boundary_capacity=64)
    assert int(np.asarray(full[1]).sum()) == n_boundary
    tiny = make_ring_plan(idx, mask, mesh, boundary_capacity=2)
    assert int(np.asarray(tiny[2]).sum()) == n_boundary - int(np.asarray(tiny[1]).sum())
    assert int(np.asarray(tiny[2]).sum()) > 0


def test_ring_gather_aggregate_under_jit_with_grad():
    """The ring schedule must be jittable and differentiable (force path)."""
    from torchmdnet_tpu.parallel.edge_partition import (
        make_ring_plan,
        ring_gather_aggregate,
    )

    x, idx, mask, w, expected = _ring_problem(local_bias=True)
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    plan = make_ring_plan(idx, mask, mesh, boundary_capacity=64)

    def loss(x_, w_):
        return ring_gather_aggregate(x_, idx, mask, w_, plan, mesh).sum()

    def loss_ref(x_, w_):
        return jnp.where(mask[..., None], x_[idx] * w_[..., None], 0.0).sum()

    with mesh:
        gx, gw = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, w)
    gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), rtol=1e-5, atol=1e-6)


def test_ring_comm_stats_accounting():
    """ICI byte accounting (round-4 verdict item 6): per-hop bytes are
    O(N/D) — exactly one resident chunk — and the boundary-edge count
    matches an independent host-side recount.  On a spatially local list
    the boundary fraction is a surface term (<< the 7/8 a random list
    gives), which is the compaction the ring's overlap story rests on."""
    from torchmdnet_tpu.parallel.edge_partition import ring_comm_stats

    h = 16
    row_bytes = 2 * 7 * h  # fused-ET-style bf16 (7H) source rows
    for d in (4, 8):
        mesh = Mesh(np.array(jax.devices()[:d]), ("dp",))
        x, idx, mask, w, _ = _ring_problem(local_bias=True)
        stats = ring_comm_stats(idx, mask, mesh, row_bytes=row_bytes)
        n = idx.shape[0]
        assert stats.d == d and stats.hops == d - 1
        assert stats.n_local == n // d
        # comm volume per hop is one chunk: O(N/D), independent of edges
        assert stats.bytes_per_hop == (n // d) * row_bytes
        assert stats.total_bytes == (d - 1) * stats.bytes_per_hop
        # boundary count == independent recount
        n_local = n // d
        owner = np.asarray(idx) // n_local
        me = np.repeat(np.arange(d), n_local)[:, None]
        expect_boundary = int((np.asarray(mask) & (owner != me)).sum())
        assert stats.edges_boundary == expect_boundary
        assert stats.edges_total == int(np.asarray(mask).sum())
        # locality keeps boundary edges a surface term: far below the
        # (d-1)/d fraction a spatially random list would show
        assert stats.boundary_fraction < 0.5 * (d - 1) / d, stats
