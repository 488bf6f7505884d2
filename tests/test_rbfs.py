"""RBF shape/decay tests (reference tests/test_rbfs.py) plus closed-form checks."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmdnet_tpu.ops.cutoff import cosine_cutoff
from torchmdnet_tpu.ops.rbf import ExpNormalSmearing, GaussianSmearing, rbf_class_mapping


@pytest.mark.parametrize("rbf_name", ["gauss", "expnorm"])
@pytest.mark.parametrize("trainable", [True, False])
@pytest.mark.parametrize("cutoffs", [(0.0, 5.0), (2.0, 8.0)])
def test_shape_and_decay(rbf_name, trainable, cutoffs):
    lo, hi = cutoffs
    rbf = rbf_class_mapping[rbf_name](lo, hi, 32, trainable)
    d = jnp.linspace(lo, hi + 2.0, 100)
    params = rbf.init(jax.random.PRNGKey(0), d)
    out = rbf.apply(params, d)
    assert out.shape == (100, 32)
    # values beyond the upper cutoff should be (near) zero for expnorm
    if rbf_name == "expnorm":
        beyond = rbf.apply(params, jnp.asarray([hi + 1.0]))
        assert float(jnp.abs(beyond).max()) < 1e-6
    if trainable:
        flat = jax.tree_util.tree_leaves(params)
        assert len(flat) == 2


def test_gaussian_closed_form():
    lo, hi, n = 0.0, 5.0, 8
    rbf = GaussianSmearing(lo, hi, n, trainable=False)
    params = rbf.init(jax.random.PRNGKey(0), jnp.zeros(1))
    d = np.asarray([0.7, 2.2, 4.9])
    out = np.asarray(rbf.apply(params, jnp.asarray(d, jnp.float32)))
    offset = np.linspace(lo, hi, n)
    coeff = -0.5 / (offset[1] - offset[0]) ** 2
    expected = np.exp(coeff * (d[:, None] - offset) ** 2)
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_expnorm_closed_form():
    lo, hi, n = 0.0, 5.0, 8
    rbf = ExpNormalSmearing(lo, hi, n, trainable=False)
    params = rbf.init(jax.random.PRNGKey(0), jnp.zeros(1))
    d = np.asarray([0.3, 1.7, 4.2])
    out = np.asarray(rbf.apply(params, jnp.asarray(d, jnp.float32)))
    start = math.exp(-hi + lo)
    means = np.linspace(start, 1.0, n)
    betas = (2.0 / n * (1 - start)) ** -2
    alpha = 5.0 / (hi - lo)
    cut = 0.5 * (np.cos(d * np.pi / hi) + 1.0) * (d < hi)
    expected = cut[:, None] * np.exp(
        -betas * (np.exp(alpha * (-d[:, None] + lo)) - means) ** 2
    )
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-7)


def test_cosine_cutoff_window():
    d = jnp.asarray([0.0, 1.0, 2.5, 4.99, 5.0, 7.0])
    c = np.asarray(cosine_cutoff(d, 0.0, 5.0))
    assert c[0] == 1.0
    assert c[4] == 0.0 and c[5] == 0.0
    assert np.all(np.diff(c) <= 1e-7)

    # lower-cutoff window: zero at and below lo, zero at and above hi
    c2 = np.asarray(cosine_cutoff(jnp.asarray([1.0, 2.0, 3.0, 4.0]), 2.0, 4.0))
    assert c2[0] == 0.0 and c2[1] == 0.0 and c2[3] == 0.0
    assert c2[2] == pytest.approx(1.0)
