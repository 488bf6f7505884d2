"""optimize(): the latency-optimized evaluator matches the direct model,
including with Verlet-skin neighbor reuse across calls (reference
tests/test_optimize.py checks NNPOps-optimized vs reference modules)."""

import jax
import jax.numpy as jnp
import numpy as np

from torchmdnet_tpu.data.batch import pad_molecules
from torchmdnet_tpu.models.potential import create_model
from torchmdnet_tpu.optimize import optimize

from utils import load_example_args, random_molecule


def _setup():
    args = load_example_args(
        "graph-network", num_layers=2, embedding_dimension=16, num_rbf=8,
        derivative=True,
    )
    model = create_model(args)
    mol = random_molecule(12, seed=5, scale=1.5)
    batch = pad_molecules([mol], num_atoms=16, num_mol=1)
    params = model.init(jax.random.PRNGKey(0), batch)
    return model, params, batch


def test_optimized_matches_direct():
    model, params, batch = _setup()
    opt = optimize(model, params, batch)
    y_o, f_o = opt(batch.pos)
    y_d, f_d = model.energy_and_forces(params, batch)
    np.testing.assert_allclose(np.asarray(y_o), np.asarray(y_d), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f_o), np.asarray(f_d), rtol=1e-5, atol=1e-6)


def test_optimized_skin_reuse_matches_direct():
    model, params, batch = _setup()
    opt = optimize(model, params, batch, skin=1.0, rebuild_every=4)
    rng = np.random.default_rng(0)
    pos = np.asarray(batch.pos)
    for i in range(10):
        # small drift per call, well under skin/2 between rebuilds
        pos = pos + 0.02 * rng.standard_normal(pos.shape).astype(np.float32)
        y_o, f_o = opt(pos)
        y_d, f_d = model.energy_and_forces(params, batch.replace(pos=jnp.asarray(pos)))
        np.testing.assert_allclose(np.asarray(y_o), np.asarray(y_d), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(f_o), np.asarray(f_d), rtol=1e-4, atol=1e-5
        )
    assert not opt.stale


def test_optimized_skin_staleness_flag():
    model, params, batch = _setup()
    opt = optimize(model, params, batch, skin=1e-3, rebuild_every=8)
    rng = np.random.default_rng(1)
    pos = np.asarray(batch.pos)
    for _ in range(6):
        pos = pos + 0.5 * rng.standard_normal(pos.shape).astype(np.float32)
        opt(pos)
    assert opt.stale


def test_optimize_probes_plan_shape_for_fused():
    """gather_plan=True without an explicit plan_width: optimize() probes a
    tight (R, W, A) from the example skin list (r5 — the fused kernels' MXU
    work is linear in W) and the fused evaluation matches the direct model."""
    from torchmdnet_tpu.data.batch import spatial_sort

    args = load_example_args(
        "equivariant-transformer", num_layers=1, embedding_dimension=128,
        num_rbf=8, derivative=True, max_num_neighbors=16,
    )
    args.update(
        bf16_messages=True, fused_attention=True, num_heads=8,
        attn_activation="silu", distance_influence="both",
        neighbor_embedding=False,
    )
    model = create_model(args)
    mol = random_molecule(12, seed=5, scale=1.5)
    batch = pad_molecules([mol], num_atoms=16, num_mol=1)
    batch, _ = spatial_sort(batch)
    params = model.init(jax.random.PRNGKey(0), batch)
    opt = optimize(
        model, params, batch, skin=1.0, rebuild_every=4,
        neighbor_kwargs={"gather_plan": True},
    )
    # the probe resolved a concrete 128-multiple width
    probed_nbl = opt._nbl_fn(batch.pos)
    assert probed_nbl.gather_plan is not None
    assert probed_nbl.gather_plan.u.shape[1] % 128 == 0
    y_o, f_o = opt(batch.pos)
    nbl_d = model.neighbors(batch, gather_plan=True, plan_block_rows=8,
                            plan_width=128)
    y_d, f_d = model.energy_and_forces(params, batch, nbl=nbl_d)
    np.testing.assert_allclose(np.asarray(y_o), np.asarray(y_d), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(f_o), np.asarray(f_d), rtol=1e-4, atol=1e-5
    )
