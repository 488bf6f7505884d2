"""Golden parity on the PERF paths (VERDICT r1 #6).

Round-1 golden tests covered 4-5-atom molecules on the default path only.
Here the reference's own forward (via tests/reference_shim.py) is matched on:

- 150-atom protein-density molecules (fp64, 1e-9);
- PER-LAYER activations: each ET attention layer's (dx, dvec) and each
  TensorNet interaction's X, captured with flax capture_intermediates vs
  torch forward hooks — the north-star per-layer allclose gate (BASELINE.md);
- a periodic box (the reference's OptimizedDistance minimum-image path);
- the cell-list neighbor strategy feeding the same model;
- bf16_messages (+ the one-hot MXU gather plan) against the fp64 reference
  within measured mixed-precision bounds.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/torchmdnet"),
    reason="reference checkout not mounted",
)

import jax

from torchmdnet_tpu.data.batch import pad_molecules, spatial_sort
from torchmdnet_tpu.models.potential import create_model
from torchmdnet_tpu.tools.import_torch import import_state_dict

from utils import load_example_args


def _protein_density_molecule(n=150, seed=17):
    """Atoms uniform in a ball at protein density (~0.094 / A^3): realistic
    neighbor counts (max ~60-75 at 5 A) without exceeding shim limits."""
    rng = np.random.default_rng(seed)
    radius = (3.0 * n / (4.0 * np.pi * 0.094)) ** (1.0 / 3.0)
    r = radius * rng.random(n) ** (1.0 / 3.0)
    v = rng.standard_normal((n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return {
        "z": rng.integers(1, 10, size=n).astype(np.int32),
        "pos": (r[:, None] * v).astype(np.float64),
    }


def _torch_inputs(torch, mols):
    z = torch.tensor(np.concatenate([m["z"] for m in mols]), dtype=torch.long)
    pos = torch.tensor(
        np.concatenate([m["pos"] for m in mols]), dtype=torch.float64
    )
    batch = torch.tensor(
        np.concatenate([[i] * len(m["z"]) for i, m in enumerate(mols)]),
        dtype=torch.long,
    )
    return z, pos, batch


def _reference_model(args):
    from reference_shim import install_shims

    install_shims()
    import torch

    from torchmdnet.models.model import create_model as ref_create_model

    torch.manual_seed(1234)
    model = ref_create_model(dict(args))
    model.eval()
    return model, torch


def _framework_batch(mols, float_dtype=np.float64, pad_atoms=5, pad_mols=1):
    n_real = sum(len(m["z"]) for m in mols)
    return pad_molecules(
        [dict(m, pos=m["pos"].astype(float_dtype)) for m in mols],
        num_atoms=n_real + pad_atoms,
        num_mol=len(mols) + pad_mols,
        float_dtype=float_dtype,
    )


@pytest.mark.slow
@pytest.mark.parametrize(
    "model_name", ["equivariant-transformer", "tensornet", "graph-network"]
)
def test_golden_large_molecule(model_name):
    """150 atoms at protein density, fp64, energies + autograd forces."""
    args = load_example_args(
        model_name, remove_prior=True, precision=64, derivative=True,
        max_num_neighbors=96,
    )
    mols = [_protein_density_molecule()]
    ref, torch = _reference_model(args)
    z, pos, batch_ids = _torch_inputs(torch, mols)
    y_ref, f_ref = ref(z, pos, batch_ids)
    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}

    params = import_state_dict(args, sd)
    model = create_model(dict(args))
    batch = _framework_batch(mols)
    y, f = model.apply(params, batch)
    y = np.asarray(y)[: len(mols)]
    f = np.asarray(f)[np.asarray(batch.atom_mask)]
    np.testing.assert_allclose(
        y, y_ref.detach().numpy().reshape(y.shape), atol=1e-9, rtol=1e-9
    )
    np.testing.assert_allclose(f, f_ref.detach().numpy(), atol=1e-8, rtol=1e-7)


@pytest.mark.slow
def test_golden_per_layer_et():
    """Every ET attention layer's (dx, dvec) matches the reference layer's
    output on a 96-atom molecule (fp64)."""
    args = load_example_args(
        "equivariant-transformer", remove_prior=True, precision=64,
        max_num_neighbors=96, num_layers=3,
    )
    mols = [_protein_density_molecule(n=96, seed=23)]
    ref, torch = _reference_model(args)

    captured = []
    for layer in ref.representation_model.attention_layers:
        layer.register_forward_hook(
            lambda mod, inp, out: captured.append(
                tuple(o.detach().numpy() for o in out)
            )
        )
    z, pos, batch_ids = _torch_inputs(torch, mols)
    ref(z, pos, batch_ids)
    assert len(captured) == args["num_layers"]
    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}

    params = import_state_dict(args, sd)
    model = create_model(dict(args))
    batch = _framework_batch(mols)
    _, state = model.module.apply(
        params, batch, capture_intermediates=(
            lambda mdl, method: "EquivariantMultiHeadAttention" in (mdl.name or "")
        ),
    )
    inter = state["intermediates"]["representation"]
    am = np.asarray(batch.atom_mask)
    for li, (dx_ref, dvec_ref) in enumerate(captured):
        (ours,) = inter[f"EquivariantMultiHeadAttention_{li}"]["__call__"]
        dx, dvec = ours
        dx = np.asarray(dx)[am]
        # dvec is carried as xyz component tuples; reference is (N, 3, H)
        dvec = np.stack([np.asarray(c) for c in dvec], axis=1)[am]
        np.testing.assert_allclose(
            dx, dx_ref, atol=1e-10, rtol=1e-9, err_msg=f"dx layer {li}"
        )
        np.testing.assert_allclose(
            dvec, dvec_ref, atol=1e-10, rtol=1e-9, err_msg=f"dvec layer {li}"
        )


@pytest.mark.slow
def test_golden_per_layer_tensornet():
    """Every TensorNet interaction layer's X (N, H, 3, 3) matches (fp64)."""
    from torchmdnet_tpu.models.tensornet import t9_to_full

    args = load_example_args(
        "tensornet", remove_prior=True, precision=64, max_num_neighbors=96,
        num_layers=2,
    )
    mols = [_protein_density_molecule(n=96, seed=29)]
    ref, torch = _reference_model(args)
    captured = []
    for layer in ref.representation_model.layers:
        layer.register_forward_hook(
            lambda mod, inp, out: captured.append(out.detach().numpy())
        )
    z, pos, batch_ids = _torch_inputs(torch, mols)
    ref(z, pos, batch_ids)
    assert len(captured) == args["num_layers"]
    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}

    params = import_state_dict(args, sd)
    model = create_model(dict(args))
    batch = _framework_batch(mols)
    _, state = model.module.apply(
        params, batch, capture_intermediates=(
            lambda mdl, method: (mdl.name or "").startswith("Interaction")
        ),
    )
    inter = state["intermediates"]["representation"]
    am = np.asarray(batch.atom_mask)
    for li, x_ref in enumerate(captured):
        (t9,) = inter[f"Interaction_{li}"]["__call__"]
        full = np.asarray(t9_to_full(t9))  # (N, 3, 3, H)
        full = np.moveaxis(full, -1, 1)[am]  # -> (N, H, 3, 3)
        np.testing.assert_allclose(
            full, x_ref, atol=1e-10, rtol=1e-9, err_msg=f"X layer {li}"
        )


@pytest.mark.slow
@pytest.mark.parametrize("model_name", ["equivariant-transformer", "tensornet"])
def test_golden_periodic_box(model_name):
    """The reference's minimum-image periodic path (OptimizedDistance with a
    box) vs the framework's box handling, fp64."""
    args = load_example_args(
        model_name, remove_prior=True, precision=64, derivative=True,
        max_num_neighbors=96,
    )
    mol = _protein_density_molecule(n=96, seed=31)
    box_l = 12.0  # > 2 * cutoff; atoms span ~13 A so images matter
    mol["pos"] = mol["pos"] - mol["pos"].min(axis=0)  # inside the box corner
    box = np.diag([box_l, box_l, box_l]).astype(np.float64)

    ref, torch = _reference_model(args)
    dist_mod = ref.representation_model.distance
    dist_mod.box = torch.tensor(box)
    dist_mod.use_periodic = True
    z, pos, batch_ids = _torch_inputs(torch, [mol])
    y_ref, f_ref = ref(z, pos, batch_ids)
    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}

    params = import_state_dict(args, sd)
    model = create_model(dict(args))
    batch = _framework_batch([mol])
    y, f = model.apply(params, batch, box=np.asarray(box))
    y = np.asarray(y)[:1]
    f = np.asarray(f)[np.asarray(batch.atom_mask)]
    np.testing.assert_allclose(
        y, y_ref.detach().numpy().reshape(y.shape), atol=1e-9, rtol=1e-9
    )
    np.testing.assert_allclose(f, f_ref.detach().numpy(), atol=1e-8, rtol=1e-7)


@pytest.mark.slow
def test_golden_cell_list_strategy():
    """A cell-list-built neighbor list feeding the model reproduces the
    reference exactly (the strategy changes HOW the list is built, not the
    physics)."""
    args = load_example_args(
        "equivariant-transformer", remove_prior=True, precision=64,
        derivative=True, max_num_neighbors=96,
    )
    mols = [_protein_density_molecule(n=150, seed=37)]
    ref, torch = _reference_model(args)
    z, pos, batch_ids = _torch_inputs(torch, mols)
    y_ref, f_ref = ref(z, pos, batch_ids)
    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}

    params = import_state_dict(args, sd)
    model = create_model(dict(args))
    batch = _framework_batch(mols, pad_atoms=10)
    nbl = model.neighbors(batch, strategy="cell")
    nbl.raise_on_overflow("golden cell list")
    y, f = model.apply(params, batch, nbl=nbl)
    y = np.asarray(y)[: len(mols)]
    f = np.asarray(f)[np.asarray(batch.atom_mask)]
    np.testing.assert_allclose(
        y, y_ref.detach().numpy().reshape(y.shape), atol=1e-9, rtol=1e-9
    )
    np.testing.assert_allclose(f, f_ref.detach().numpy(), atol=1e-8, rtol=1e-7)


@pytest.mark.slow
def test_golden_bf16_messages_and_gather_plan_bounds():
    """bf16 message passing (and the one-hot MXU gather plan routing the
    wide bf16 gathers) against the fp64 reference: mixed-precision error
    stays within bf16 roundoff bounds of the fp64 truth."""
    args = load_example_args(
        "equivariant-transformer", remove_prior=True, precision=64,
        derivative=True, max_num_neighbors=96, embedding_dimension=128,
        num_layers=2,
    )
    mols = [_protein_density_molecule(n=96, seed=41)]
    ref, torch = _reference_model(args)
    z, pos, batch_ids = _torch_inputs(torch, [mols[0]])
    y_ref, f_ref = ref(z, pos, batch_ids)
    y_ref = y_ref.detach().numpy().reshape(-1)
    f_ref = f_ref.detach().numpy()
    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}

    f32_args = dict(args, precision=32, bf16_messages=True)
    params = import_state_dict(f32_args, sd)
    model = create_model(f32_args)
    batch = _framework_batch(mols, float_dtype=np.float32, pad_atoms=0)
    batch, order = spatial_sort(batch)
    inv = np.argsort(np.asarray(order))
    for gather_plan in (False, True):
        nbl = model.neighbors(batch, gather_plan=gather_plan)
        if gather_plan:
            assert nbl.gather_plan is not None
        y, f = model.apply(params, batch, nbl=nbl)
        y = np.asarray(y).reshape(-1)[:1]
        f = np.asarray(f)[inv][np.ones(len(f_ref), bool)]
        # bf16 has ~2-3 significant digits; energies are O(10) sums of O(1)
        # per-atom terms with f32 accumulation
        np.testing.assert_allclose(y, y_ref, rtol=5e-3, atol=5e-2)
        scale = np.abs(f_ref).max()
        assert np.abs(f - f_ref).max() < 0.05 * scale, (
            np.abs(f - f_ref).max(), scale, f"gather_plan={gather_plan}"
        )
