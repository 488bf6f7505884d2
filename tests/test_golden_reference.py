"""TRUE golden parity against the reference implementation.

The reference's own model code (mounted at /root/reference) is executed on
CPU torch via tests/reference_shim.py; its weights are imported through
tools/import_torch.py and the same molecules are evaluated by this framework.
Energies and autograd forces must agree to fp64 tolerance.

This is the strongest parity statement available offline: the golden values
are produced by the reference's actual forward pass (torchmd_et.py /
torchmd_gn.py / torchmd_t.py / tensornet.py / model.py / output_modules.py),
not by a re-derivation of its equations (tests/test_reference_parity.py
covers that independently).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/torchmdnet"),
    reason="reference checkout not mounted",
)

from torchmdnet_tpu.data.batch import pad_molecules
from torchmdnet_tpu.models.potential import create_model
from torchmdnet_tpu.tools.import_torch import import_state_dict

from utils import load_example_args

MODELS = ["graph-network", "transformer", "equivariant-transformer", "tensornet"]


def _example_molecules(seed=7, sizes=(4, 5)):
    rng = np.random.default_rng(seed)
    mols = []
    for n in sizes:
        mols.append(
            {
                "z": rng.integers(1, 10, size=n).astype(np.int32),
                "pos": (1.2 * rng.standard_normal((n, 3))).astype(np.float64),
            }
        )
    return mols


def _reference_eval(args, mols, derivative):
    """Run the actual reference model; return (y, neg_dy, state_dict)."""
    from reference_shim import install_shims

    install_shims()
    import torch

    from torchmdnet.models.model import create_model as ref_create_model

    torch.manual_seed(1234)
    model = ref_create_model(dict(args))
    model.eval()

    z = torch.tensor(np.concatenate([m["z"] for m in mols]), dtype=torch.long)
    pos = torch.tensor(
        np.concatenate([m["pos"] for m in mols]), dtype=torch.float64
    )
    batch = torch.tensor(
        np.concatenate([[i] * len(m["z"]) for i, m in enumerate(mols)]),
        dtype=torch.long,
    )
    y, neg_dy = model(z, pos, batch)
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    y = y.detach().cpu().numpy()
    neg_dy = None if neg_dy is None else neg_dy.detach().cpu().numpy()
    return y, neg_dy, sd


def _framework_eval(args, mols, params):
    model = create_model(dict(args))
    n_real = sum(len(m["z"]) for m in mols)
    batch = pad_molecules(
        [dict(m, pos=m["pos"].astype(np.float64)) for m in mols],
        num_atoms=n_real + 3,
        num_mol=len(mols) + 1,
        float_dtype=np.float64,
    )
    y, neg_dy = model.apply(params, batch)
    y = np.asarray(y)[: len(mols)]
    if neg_dy is not None:
        neg_dy = np.asarray(neg_dy)[np.asarray(batch.atom_mask)]
    return y, neg_dy


@pytest.mark.parametrize("model_name", MODELS)
@pytest.mark.parametrize("derivative", [False, True])
def test_golden_energy_and_forces(model_name, derivative):
    args = load_example_args(
        model_name, remove_prior=True, precision=64, derivative=derivative
    )
    mols = _example_molecules()
    y_ref, f_ref, sd = _reference_eval(args, mols, derivative)
    params = import_state_dict(args, sd)
    y, f = _framework_eval(args, mols, params)

    np.testing.assert_allclose(y, y_ref.reshape(y.shape), atol=1e-9, rtol=1e-9)
    if derivative:
        np.testing.assert_allclose(f, f_ref, atol=1e-8, rtol=1e-7)
    else:
        assert f_ref is None and f is None


@pytest.mark.parametrize(
    "model_name,output_model",
    [
        ("equivariant-transformer", "DipoleMoment"),
        ("graph-network", "DipoleMoment"),
        ("graph-network", "ElectronicSpatialExtent"),
        ("transformer", "ElectronicSpatialExtent"),
    ],
)
def test_golden_output_heads(model_name, output_model):
    args = load_example_args(
        model_name, remove_prior=True, precision=64, output_model=output_model
    )
    mols = _example_molecules(seed=11)
    y_ref, _, sd = _reference_eval(args, mols, False)
    params = import_state_dict(args, sd)
    y, _ = _framework_eval(args, mols, params)
    np.testing.assert_allclose(y, y_ref.reshape(y.shape), atol=1e-9, rtol=1e-9)


@pytest.mark.parametrize("aggr", ["mean", "max"])
def test_golden_gn_aggregation(aggr):
    args = load_example_args(
        "graph-network", remove_prior=True, precision=64, aggr=aggr
    )
    mols = _example_molecules(seed=3)
    y_ref, _, sd = _reference_eval(args, mols, False)
    params = import_state_dict(args, sd)
    y, _ = _framework_eval(args, mols, params)
    np.testing.assert_allclose(y, y_ref.reshape(y.shape), atol=1e-9, rtol=1e-9)


def test_golden_tensornet_so3():
    args = load_example_args(
        "tensornet",
        remove_prior=True,
        precision=64,
        equivariance_invariance_group="SO(3)",
    )
    mols = _example_molecules(seed=5)
    y_ref, _, sd = _reference_eval(args, mols, False)
    params = import_state_dict(args, sd)
    y, _ = _framework_eval(args, mols, params)
    np.testing.assert_allclose(y, y_ref.reshape(y.shape), atol=1e-9, rtol=1e-9)
