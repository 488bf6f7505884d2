"""Trained round-trip parity vs the EXECUTED reference (r3 verdict item 9,
deepened per the r4 verdict item 4).

Golden forward parity (test_golden_*.py) pins the models; this pins the
TRAINING LOOP jointly — model + loss composition + AdamW + priors +
standardize — the closest offline proxy to QM9 MAE parity while dataset
downloads are blocked:

  the reference model (run from the read-only mount through
  tests/reference_shim.py, CPU torch, fp64) is trained for 20 steps by a
  loop that replicates the reference LNNP exactly (train-MSE losses
  weighted y_weight/neg_dy_weight, torch.optim.AdamW — module.py:40-59,
  72-88, 130-179); this framework's Trainer starts from the SAME imported
  initial weights on the SAME data and must reproduce the loss trajectory
  and the final parameters.

Coverage axes (r4 verdict item 4):
  - all four representation models (with forces in the loss),
  - an Atomref prior (trainable, its embedding receives gradients from
    step 1) + standardize (mean/std buffers) — model.py:262-283 order,
  - one run through the REAL example-YAML path: examples/ET-QM9.yaml parsed
    by the same get_args/LoadFromFile CLI merge the torchmd-train entry
    point uses (precision overridden to 64 through the CLI-overrides-YAML
    mechanism itself).

Any drift in loss definitions, gradient flow (incl. the force grad-of-grad)
or optimizer semantics (decoupled weight decay, bias correction, eps
placement) fails this test.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchmdnet_tpu.models.potential import create_model
from torchmdnet_tpu.tools.import_torch import import_state_dict
from torchmdnet_tpu.train.trainer import Trainer

from test_golden_extended import (
    _framework_batch,
    _protein_density_molecule,
    _torch_inputs,
)
from utils import load_example_args

LR = 1e-2
WEIGHT_DECAY = 0.01
Y_W, F_W = 1.0, 0.5
STEPS = 20

ALL_MODELS = [
    "equivariant-transformer",
    "transformer",
    "graph-network",
    "tensornet",
]


def _training_molecules(n_mols=4, with_forces=True):
    rng = np.random.default_rng(42)
    mols = []
    for i in range(n_mols):
        m = _protein_density_molecule(n=20, seed=100 + i)
        m["y"] = rng.standard_normal((1, 1)).astype(np.float64)
        if with_forces:
            m["neg_dy"] = rng.standard_normal((20, 3)).astype(np.float64)
        mols.append(m)
    return mols


def _reference_model_trained(args, mols, steps, mean=None, std=None):
    """Reference model built through the executed reference factory (with
    prior/mean/std when configured), trained `steps` AdamW steps.  Returns
    (initial state_dict, per-step losses, final state_dict)."""
    from reference_shim import install_shims

    install_shims()
    import torch

    from torchmdnet.models.model import create_model as ref_create_model

    torch.manual_seed(1234)
    t64 = lambda v: None if v is None else torch.tensor(v, dtype=torch.float64)
    ref = ref_create_model(dict(args), mean=t64(mean), std=t64(std))
    ref.train()
    z, pos, batch_ids = _torch_inputs(torch, mols)
    y_t = torch.tensor(
        np.concatenate([m["y"] for m in mols]), dtype=torch.float64
    )
    f_t = None
    if args.get("derivative"):
        f_t = torch.tensor(
            np.concatenate([m["neg_dy"] for m in mols]), dtype=torch.float64
        )
    sd0 = {k: v.detach().cpu().numpy().copy() for k, v in ref.state_dict().items()}
    opt = torch.optim.AdamW(ref.parameters(), lr=LR, weight_decay=WEIGHT_DECAY)
    losses = []
    for _ in range(steps):
        opt.zero_grad()
        y, neg_dy = ref(z, pos, batch_ids)
        loss = Y_W * torch.nn.functional.mse_loss(y, y_t)
        if f_t is not None:
            loss = loss + F_W * torch.nn.functional.mse_loss(neg_dy, f_t)
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    sd_final = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    return sd0, losses, sd_final


def _run_roundtrip(
    args,
    steps=STEPS,
    mean=None,
    std=None,
    force_grad_mode="gradgrad",
    loss_rtol=2e-5,
):
    mols = _training_molecules(with_forces=args.get("derivative", False))
    sd0, ref_losses, sd_final = _reference_model_trained(
        args, mols, steps, mean=mean, std=std
    )

    # ---- this framework's Trainer from the same initial weights ----------
    h = dict(
        args,
        lr=LR, weight_decay=WEIGHT_DECAY, gradient_clipping=0.0,
        lr_warmup_steps=0, ema_alpha_y=1.0, ema_alpha_neg_dy=1.0,
        y_weight=Y_W,
        neg_dy_weight=F_W if args.get("derivative") else 0.0,
        log_dir="/tmp/test_golden_training",
        force_grad_mode=force_grad_mode,
    )
    model = create_model(dict(h), mean=mean, std=std)
    batch = _framework_batch(mols, pad_atoms=4, pad_mols=1)
    trainer = Trainer(model, h)
    params = import_state_dict(args, sd0)
    opt_state = trainer.optimizer.init(params)
    acc = jnp.zeros(4, jnp.float32)
    ema = jnp.zeros((), jnp.float32)
    our_losses = []
    prev = 0.0
    for _ in range(steps):
        params, opt_state, acc, _, _ = trainer._train_step(
            params, opt_state, acc, batch, ema, ema
        )
        tot = float(np.asarray(acc)[0])
        our_losses.append(tot - prev)
        prev = tot

    # loss trajectory parity (acc accumulates in f32 -> ~1e-6 resolution)
    np.testing.assert_allclose(
        np.asarray(our_losses), np.asarray(ref_losses), rtol=loss_rtol,
        err_msg="training loss trajectory diverged from the reference loop",
    )

    # final parameters parity: re-import the reference's trained state and
    # compare leaf-by-leaf against our trained params
    params_ref_final = import_state_dict(args, sd_final)
    for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(params_ref_final),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-8,
            err_msg="trained parameters diverged from the reference loop",
        )


def _small_args(model_name, **overrides):
    return load_example_args(
        model_name, remove_prior=True, precision=64, derivative=True,
        max_num_neighbors=64, num_layers=2, embedding_dimension=32,
        num_rbf=8, **overrides,
    )


@pytest.mark.slow
@pytest.mark.parametrize("force_grad_mode", ["gradgrad", "jvp"])
def test_trained_roundtrip_matches_reference(force_grad_mode):
    """ET force training, both force-gradient formulations (r4 parity
    study): the original round-trip, kept as the formulation cross-check."""
    _run_roundtrip(
        _small_args("equivariant-transformer"), force_grad_mode=force_grad_mode
    )


@pytest.mark.slow
@pytest.mark.parametrize("model_name", ALL_MODELS)
def test_trained_roundtrip_all_models_prior_standardize(model_name):
    """20-step trained round-trip for EVERY representation model with an
    Atomref prior (trainable from zeros — its embedding carries gradients
    from step 1) and standardize on (mean/std, model.py:262-283 order)."""
    args = _small_args(model_name)
    args["prior_model"] = "Atomref"
    args["prior_args"] = [{"max_z": args["max_z"]}]
    _run_roundtrip(args, mean=-1.3, std=2.7)


@pytest.mark.slow
def test_trained_roundtrip_example_yaml_path():
    """The REAL example-YAML path: examples/ET-QM9.yaml parsed by the same
    get_args/LoadFromFile merge the torchmd-train console entry uses
    (reference scripts/train.py:22-123 semantics), precision flipped to 64
    through the CLI-overrides-YAML mechanism itself.  Energy-only loss (the
    QM9 config has derivative: false); full-size ET 8x256."""
    from torchmdnet_tpu.scripts.train import get_args

    yaml_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "ET-QM9.yaml",
    )
    args = vars(
        get_args(["--conf", yaml_path, "--precision", "64", "--log-dir", "/tmp/tgt_yaml"])
    )
    # Atomref normally seeds from the QM9 dataset's get_atomref(); offline,
    # replay the ckpt-style prior_args instead (zeros, trainable)
    args["prior_args"] = [{"max_z": args["max_z"]}]
    _run_roundtrip(args, steps=8, mean=-0.4, std=1.9)
