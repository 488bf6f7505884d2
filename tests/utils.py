"""Test fixtures, mirroring the reference's tests/utils.py strategy:
example hyperparameter dicts per model and random small-molecule batches.
"""

import jax.numpy as jnp
import numpy as np

from torchmdnet_tpu.data.batch import pad_molecules

# Hyperparameters equivalent to the reference's example YAMLs used as test
# fixtures (tests/utils.py:7-24 loads examples/ET-QM9.yaml or
# examples/TensorNet-QM9.yaml).
_BASE_ARGS = {
    "activation": "silu",
    "atom_filter": -1,
    "batch_size": 16,
    "cutoff_lower": 0.0,
    "cutoff_upper": 5.0,
    "derivative": False,
    "embedding_dimension": 64,
    "max_num_neighbors": 32,
    "max_z": 100,
    "model": "equivariant-transformer",
    "neighbor_embedding": True,
    "num_heads": 8,
    "num_layers": 2,
    "num_rbf": 16,
    "output_model": "Scalar",
    "precision": 32,
    "prior_model": None,
    "rbf_type": "expnorm",
    "reduce_op": "sum",
    "trainable_rbf": False,
    "attn_activation": "silu",
    "distance_influence": "both",
    "aggr": "add",
    "equivariance_invariance_group": "O(3)",
    "standardize": False,
    "y_weight": 1.0,
    "neg_dy_weight": 1.0,
    "charge": False,
    "spin": False,
}


def load_example_args(model_name, remove_prior=False, **kwargs):
    args = dict(_BASE_ARGS)
    args["model"] = model_name
    if model_name == "tensornet":
        args["max_z"] = 128
    if remove_prior:
        args["prior_model"] = None
    for key, val in kwargs.items():
        assert key in args or key in (
            "prior_model",
            "prior_args",
            "dataset",
        ), f"Broken test! Unknown key '{key}'."
        args[key] = val
    return args


def create_example_batch(n_atoms=6, multiple_batches=True, num_atoms_pad=None, seed=1234):
    """Random molecules, 2 batches by default (reference tests/utils.py:27-36)."""
    rng = np.random.default_rng(seed)
    n1 = n_atoms // 2 if multiple_batches else n_atoms
    sizes = [n1, n_atoms - n1] if multiple_batches and n_atoms - n1 > 0 else [n1]
    mols = []
    for n in sizes:
        mols.append(
            {
                "z": rng.integers(1, 100, size=n).astype(np.int32),
                "pos": rng.standard_normal((n, 3)).astype(np.float32),
                "q": np.array([0.0], dtype=np.float32),
                "s": np.array([0.0], dtype=np.float32),
            }
        )
    capacity = num_atoms_pad or n_atoms
    return pad_molecules(mols, num_atoms=capacity, num_mol=len(sizes))


def random_molecule(n, max_z=10, seed=0, scale=1.5):
    rng = np.random.default_rng(seed)
    return {
        "z": rng.integers(1, max_z, size=n).astype(np.int32),
        "pos": (scale * rng.standard_normal((n, 3))).astype(np.float32),
    }


def rotation_matrix(seed=0):
    """Random proper rotation via QR decomposition."""
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((3, 3))
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return jnp.asarray(q, dtype=jnp.float32)


def check_grads_fd(fn, x, order=1, eps=1e-5, atol=1e-4, rtol=1e-4, n_probe=6, seed=0):
    """Finite-difference gradient check (jax.test_util.check_grads is no
    longer public in jax 0.9): compares rev-mode gradients against central
    differences along random directions; recurses for higher orders."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    g = jax.grad(fn)(x)
    for i in range(n_probe):
        v = jnp.asarray(rng.standard_normal(np.shape(x)), dtype=x.dtype)
        v = v / jnp.sqrt((v**2).sum())
        fd = (fn(x + eps * v) - fn(x - eps * v)) / (2 * eps)
        an = (g * v).sum()
        np.testing.assert_allclose(
            np.asarray(fd), np.asarray(an), atol=atol, rtol=rtol,
            err_msg=f"probe {i}, order-1 directional derivative mismatch",
        )
    if order >= 2:
        v = jnp.asarray(rng.standard_normal(np.shape(x)), dtype=x.dtype)
        v = v / jnp.sqrt((v**2).sum())
        check_grads_fd(
            lambda y: (jax.grad(fn)(y) * v).sum(),
            x,
            order=order - 1,
            eps=eps,
            atol=max(atol * 10, 1e-4),
            rtol=max(rtol * 10, 1e-4),
            n_probe=max(2, n_probe // 2),
            seed=seed + 1,
        )
