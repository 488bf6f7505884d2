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


def test_torch_linspace_bit_exact():
    """_torch_linspace must reproduce torch.linspace bit-for-bit (ADVICE r1:
    torch's CPU kernel is FMA-contracted with a target-dtype step)."""
    torch = pytest.importorskip("torch")
    from torchmdnet_tpu.ops.rbf import _torch_linspace

    rng = np.random.default_rng(0)
    cases = [
        (float(rng.uniform(-10, 10)), float(rng.uniform(-10, 10)), int(rng.integers(2, 200)))
        for _ in range(100)
    ]
    # the repo's own RBF configs
    for nr in (8, 16, 32, 64, 128):
        cases.append((0.0, 5.0, nr))
        cases.append((float(np.exp(np.float64(-5.0))), 1.0, nr))
        cases.append((2.0, 8.0, nr))
    for np_dt, t_dt in ((np.float32, torch.float32), (np.float64, torch.float64)):
        for start, end, num in cases:
            ref = torch.linspace(start, end, num, dtype=t_dt).numpy()
            got = _torch_linspace(start, end, num, np_dt)
            assert got.dtype == ref.dtype
            int_t = np.int32 if np_dt == np.float32 else np.int64
            np.testing.assert_array_equal(
                got.view(int_t), ref.view(int_t),
                err_msg=f"linspace({start}, {end}, {num}, {np_dt})",
            )


def test_expnorm_start_value_matches_torch():
    """np-vs-torch exp parity for the expnorm start constant (ADVICE r1)."""
    torch = pytest.importorskip("torch")
    for lo, hi in ((0.0, 5.0), (0.0, 4.5), (2.0, 8.0), (0.0, 10.0)):
        ref = torch.exp(torch.tensor(-hi + lo, dtype=torch.float32)).numpy()
        mine = np.asarray(np.exp(np.float64(-hi + lo)), np.float32)
        np.testing.assert_array_equal(mine.view(np.int32), ref.view(np.int32))


@pytest.mark.parametrize("rbf_name", ["gauss", "expnorm"])
def test_trainable_params_in_model_dtype(rbf_name):
    """Trainable RBF params are created in the model dtype even when the
    buffer constants are computed in float32 (reference model.to(dtype)
    upcasts nn.Parameters; ADVICE r1)."""
    rbf = rbf_class_mapping[rbf_name](
        0.0, 5.0, 16, trainable=True, dtype=jnp.float64, buffer_dtype=jnp.float32
    )
    params = rbf.init(jax.random.PRNGKey(0), jnp.zeros(4, jnp.float64))
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float64
    # non-trainable buffers keep the f32 quirk (values == f32 constants)
    rbf_f = rbf_class_mapping[rbf_name](
        0.0, 5.0, 16, trainable=False, dtype=jnp.float64, buffer_dtype=jnp.float32
    )
    p_f = rbf_f.init(jax.random.PRNGKey(0), jnp.zeros(4, jnp.float64))
    out_t = rbf.apply(params, jnp.asarray([1.3], jnp.float64))
    out_f = rbf_f.apply(p_f, jnp.asarray([1.3], jnp.float64))
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_f), rtol=1e-6)
