"""Neighbor list vs a NumPy O(N^2) oracle.

Mirrors the reference's strategy (tests/test_neighbors.py): compare the
framework op against brute-force NumPy over grids of batch counts, cutoffs,
loop, PBC boxes, and dtypes; plus gradient checks through edge geometry
including second derivatives (force training path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from utils import check_grads_fd
from torchmdnet_tpu.ops.neighbors import (
    edge_geometry,
    minimum_image,
    neighbor_list,
    safe_norm,
)


def oracle_pairs(pos, batch, cutoff_lower, cutoff_upper, box=None):
    """Set of (i, j) pairs with lo <= d < hi within the same molecule."""
    n = len(pos)
    pairs = set()
    for i in range(n):
        for j in range(n):
            if i == j or batch[i] != batch[j]:
                continue
            d = pos[i] - pos[j]
            if box is not None:
                d = d - np.round(d[2] / box[2, 2]) * box[2]
                d = d - np.round(d[1] / box[1, 1]) * box[1]
                d = d - np.round(d[0] / box[0, 0]) * box[0]
            dist = np.linalg.norm(d)
            if cutoff_lower <= dist < cutoff_upper:
                pairs.add((i, j))
    return pairs


def ell_pairs(nbl):
    nbl = nbl.without_self_loops()
    idx = np.asarray(nbl.idx)
    mask = np.asarray(nbl.mask)
    pairs = set()
    for i in range(idx.shape[0]):
        for s in range(idx.shape[1]):
            if mask[i, s]:
                pairs.add((i, int(idx[i, s])))
    return pairs


@pytest.mark.parametrize("n_batches", [1, 2, 3])
@pytest.mark.parametrize("cutoff", [1.0, 2.5, 1000.0])
@pytest.mark.parametrize("loop", [True, False])
def test_neighbors_match_oracle(n_batches, cutoff, loop):
    rng = np.random.default_rng(4321)
    n = 24
    pos = 10.0 * rng.standard_normal((n, 3)).astype(np.float32)
    batch = np.sort(rng.integers(0, n_batches, n)).astype(np.int32)

    nbl = neighbor_list(
        jnp.asarray(pos),
        jnp.asarray(batch),
        k=n,
        cutoff_upper=cutoff,
        loop=loop,
    )
    expected = oracle_pairs(pos, batch, 0.0, cutoff)
    assert ell_pairs(nbl) == expected
    # exact true neighbor counts
    counts = np.zeros(n, dtype=int)
    for i, _ in expected:
        counts[i] += 1
    np.testing.assert_array_equal(np.asarray(nbl.n_neighbors), counts)
    if loop:
        # self column is column 0 with distance 0
        np.testing.assert_array_equal(np.asarray(nbl.idx[:, 0]), np.arange(n))
        assert bool(np.all(np.asarray(nbl.mask[:, 0])))


def test_lower_cutoff_window():
    rng = np.random.default_rng(7)
    pos = 3.0 * rng.standard_normal((16, 3)).astype(np.float32)
    batch = np.zeros(16, dtype=np.int32)
    nbl = neighbor_list(
        jnp.asarray(pos), jnp.asarray(batch), k=16, cutoff_lower=1.0, cutoff_upper=3.0
    )
    expected = oracle_pairs(pos, batch, 1.0, 3.0)
    assert ell_pairs(nbl) == expected


@pytest.mark.parametrize(
    "box",
    [
        np.diag([3.2, 3.2, 3.2]).astype(np.float32),
        np.array(  # reduced triclinic (neighbors_cpu.cpp:31-48 constraints)
            [[3.3, 0.0, 0.0], [0.5, 3.3, 0.0], [0.4, 0.3, 3.3]], dtype=np.float32
        ),
    ],
)
def test_neighbors_pbc(box):
    rng = np.random.default_rng(11)
    n = 20
    pos = (3.0 * rng.random((n, 3)) - 1.5).astype(np.float32)
    batch = np.zeros(n, dtype=np.int32)
    cutoff = 1.5
    nbl = neighbor_list(
        jnp.asarray(pos),
        jnp.asarray(batch),
        k=n,
        cutoff_upper=cutoff,
        box=jnp.asarray(box),
    )
    assert ell_pairs(nbl) == oracle_pairs(pos, batch, 0.0, cutoff, box=box)

    # distances match the minimum image oracle
    delta, dist = edge_geometry(jnp.asarray(pos), nbl, box=jnp.asarray(box))
    idx = np.asarray(nbl.idx)
    mask = np.asarray(nbl.mask)
    for i in range(n):
        for s in range(idx.shape[1]):
            if not mask[i, s]:
                continue
            d = pos[idx[i, s]] - pos[i]
            d = d - np.round(d[2] / box[2, 2]) * box[2]
            d = d - np.round(d[1] / box[1, 1]) * box[1]
            d = d - np.round(d[0] / box[0, 0]) * box[0]
            np.testing.assert_allclose(np.asarray(delta)[i, s], d, atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(dist)[i, s], np.linalg.norm(d), atol=1e-5
            )


def test_overflow_detection():
    # 5 atoms all within cutoff, capacity 2 -> overflow flagged
    pos = jnp.asarray(np.random.default_rng(0).standard_normal((5, 3)), jnp.float32)
    nbl = neighbor_list(pos, k=2, cutoff_upper=100.0)
    assert bool(nbl.overflow())
    nbl = neighbor_list(pos, k=4, cutoff_upper=100.0)
    assert not bool(nbl.overflow())


def test_padding_atoms_get_no_neighbors():
    rng = np.random.default_rng(3)
    pos = rng.standard_normal((10, 3)).astype(np.float32)
    pos[6:] = 0.0  # padding atoms piled at the origin
    atom_mask = np.array([True] * 6 + [False] * 4)
    batch = np.zeros(10, dtype=np.int32)
    nbl = neighbor_list(
        jnp.asarray(pos),
        jnp.asarray(batch),
        jnp.asarray(atom_mask),
        k=10,
        cutoff_upper=100.0,
        loop=True,
    )
    mask = np.asarray(nbl.mask)
    idx = np.asarray(nbl.idx)
    assert not mask[6:].any()
    # no real atom lists a padding atom
    assert not np.isin(idx[:6][mask[:6]], [6, 7, 8, 9]).any()


def test_deterministic_order():
    pos = jnp.asarray(np.random.default_rng(5).standard_normal((12, 3)), jnp.float32)
    a = neighbor_list(pos, k=12, cutoff_upper=3.0)
    b = neighbor_list(pos + 0.0, k=12, cutoff_upper=3.0)
    np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))
    # ascending neighbor index within each row
    idx = np.asarray(a.idx)
    mask = np.asarray(a.mask)
    for i in range(12):
        row = idx[i][mask[i]]
        assert (np.diff(row) > 0).all()


def test_edge_geometry_gradients_first_and_second_order():
    """Force-training path: grad and grad-of-grad through distances are
    exact and NaN-free, including with self-loops at distance zero."""
    rng = np.random.default_rng(42)
    pos0 = jnp.asarray(rng.standard_normal((8, 3)), jnp.float64)

    def energy(pos):
        nbl = neighbor_list(pos, k=8, cutoff_upper=2.5, loop=True)
        _, dist = edge_geometry(pos, nbl)
        c = jnp.where(nbl.mask, jnp.cos(dist) * dist, 0.0)
        return c.sum()

    check_grads_fd(energy, pos0, order=2, atol=1e-4, rtol=1e-4)

    g = jax.grad(energy)(pos0)
    assert np.isfinite(np.asarray(g)).all()
    h = jax.grad(lambda p: (jax.grad(energy)(p) ** 2).sum())(pos0)
    assert np.isfinite(np.asarray(h)).all()


def test_safe_norm_zero():
    x = jnp.zeros((3, 3))
    assert np.all(np.asarray(safe_norm(x)) == 0)
    g = jax.grad(lambda v: safe_norm(v).sum())(x)
    assert np.isfinite(np.asarray(g)).all()


def test_minimum_image_rect():
    box = jnp.diag(jnp.array([2.0, 4.0, 6.0]))
    delta = jnp.array([[1.9, -3.9, 5.9]])
    wrapped = np.asarray(minimum_image(delta, box))
    np.testing.assert_allclose(wrapped, [[-0.1, 0.1, -0.1]], atol=1e-6)


def test_ell_gather_matches_plain_autodiff():
    """ell_gather's scatter-free custom VJP equals plain x[idx] autodiff to
    first and second order, on a symmetric ELL list with padding + loops."""
    from torchmdnet_tpu.ops.neighbors import ell_gather

    rng = np.random.default_rng(0)
    pos0 = jnp.asarray(rng.standard_normal((24, 3)) * 2.0, jnp.float64)
    batch = jnp.asarray(np.sort(rng.integers(0, 2, 24)), jnp.int32)
    am = jnp.asarray([True] * 20 + [False] * 4)
    x0 = jnp.asarray(rng.standard_normal((24, 5)), jnp.float64)

    for loop in (False, True):
        nbl = neighbor_list(
            pos0, batch, am, k=24, cutoff_upper=3.0, loop=loop
        )

        def f_custom(x):
            out = ell_gather(x, nbl.idx)
            return jnp.where(nbl.mask[..., None], jnp.sin(out) * out, 0.0).sum()

        def f_plain(x):
            out = x[nbl.idx]
            return jnp.where(nbl.mask[..., None], jnp.sin(out) * out, 0.0).sum()

        np.testing.assert_allclose(float(f_custom(x0)), float(f_plain(x0)))
        g_c = jax.grad(f_custom)(x0)
        g_p = jax.grad(f_plain)(x0)
        np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_p), atol=1e-12)
        # second order (force training = grad of grad)
        h_c = jax.grad(lambda x: (jax.grad(f_custom)(x) ** 2).sum())(x0)
        h_p = jax.grad(lambda x: (jax.grad(f_plain)(x) ** 2).sum())(x0)
        np.testing.assert_allclose(np.asarray(h_c), np.asarray(h_p), atol=1e-12)


def test_ell_gather_unmasked_slots_grads():
    """Cotangents on padding slots (idx == row) must flow to the row itself,
    exactly like plain gather autodiff — even without masking."""
    from torchmdnet_tpu.ops.neighbors import ell_gather

    rng = np.random.default_rng(3)
    pos0 = jnp.asarray(rng.standard_normal((16, 3)) * 2.0, jnp.float64)
    nbl = neighbor_list(pos0, k=16, cutoff_upper=2.0)
    x0 = jnp.asarray(rng.standard_normal((16, 4)), jnp.float64)

    def f_custom(x):
        return (ell_gather(x, nbl.idx) ** 2).sum()  # no mask on purpose

    def f_plain(x):
        return (x[nbl.idx] ** 2).sum()

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_custom)(x0)),
        np.asarray(jax.grad(f_plain)(x0)),
        atol=1e-12,
    )


def test_raise_on_overflow():
    from torchmdnet_tpu.ops.neighbors import neighbor_list
    import pytest

    rng = np.random.default_rng(0)
    pos0 = jnp.asarray(rng.standard_normal((32, 3)) * 1.0, jnp.float64)
    nbl = neighbor_list(pos0, k=4, cutoff_upper=5.0)  # far too small k
    with pytest.raises(ValueError, match="max_num_neighbors"):
        nbl.raise_on_overflow()
    ok = neighbor_list(pos0, k=32, cutoff_upper=5.0)
    ok.raise_on_overflow()  # no error
