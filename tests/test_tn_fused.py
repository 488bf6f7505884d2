"""Fused TensorNet message kernel (ops/pallas/tn_message.py) vs composable math.

Interpret mode on CPU; the reference below mirrors tensornet.py's composable
message branch (itself golden-verified against the PyTorch reference).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import *  # noqa: F401,F403
from torchmdnet_tpu.ops.activations import act_fn_mapping
from torchmdnet_tpu.ops.cutoff import cosine_cutoff
from torchmdnet_tpu.ops.neighbors import neighbor_list
from torchmdnet_tpu.ops.pallas.onehot_gather import make_block_gather_plan
from torchmdnet_tpu.ops.pallas.tn_message import FusedTNConfig, fused_tn_messages

H = 128
RBF = 16
N = 64


def _setup(seed=0):
    rng = np.random.RandomState(seed)
    pos = jnp.asarray(rng.uniform(0, 6.0, (N, 3)).astype(np.float32))
    nbl = neighbor_list(
        pos, jnp.zeros(N, jnp.int32), jnp.ones(N, bool), k=12,
        cutoff_lower=0.0, cutoff_upper=3.0, loop=True,
    )
    plan = make_block_gather_plan(nbl.idx, block_rows=8, width=256)
    assert int(plan.overflow) == 0 and int(plan.inv_overflow) == 0
    k = nbl.idx.shape[1]
    delta = pos[nbl.idx] - pos[:, None, :]
    dist = jnp.where(nbl.mask, jnp.linalg.norm(delta, axis=-1), 0.0)
    cutm = (cosine_cutoff(dist, 0.0, 3.0) * nbl.mask).astype(jnp.float32)
    r = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
    inputs = dict(
        cat=r(N, 9 * H),
        ea=r(N, k, RBF) * 0.3,
        cutm=cutm,
        w1=r(RBF, H) * 0.2, b1=r(1, H) * 0.1,
        w2=r(H, 2 * H) * 0.08, b2=r(1, 2 * H) * 0.1,
        w3=r(2 * H, 3 * H) * 0.05, b3=r(1, 3 * H) * 0.1,
    )
    return nbl, plan, inputs


def _reference(idx, inputs, act="silu"):
    a = act_fn_mapping[act]
    w = a(inputs["ea"] @ inputs["w1"] + inputs["b1"][0])
    w = a(w @ inputs["w2"] + inputs["b2"][0])
    w = a(w @ inputs["w3"] + inputs["b3"][0])
    w = w * inputs["cutm"][..., None]
    cat_j = inputs["cat"][idx]  # (N, K, 9H)
    w_i = w[..., :H]
    w_a = w[..., H : 2 * H]
    w_s = w[..., 2 * H :]
    wb = (w_i, w_a, w_a, w_a, w_s, w_s, w_s, w_s, w_s)
    outs = [
        (cat_j[:, :, i * H : (i + 1) * H] * wb[i]).sum(axis=1, dtype=jnp.float32)
        for i in range(9)
    ]
    return jnp.concatenate(outs, axis=-1)


ORDER = ["cat", "ea", "cutm", "w1", "b1", "w2", "b2", "w3", "b3"]


def _call(cfg, plan, inputs):
    return fused_tn_messages(cfg, plan, *[inputs[n] for n in ORDER])


@pytest.mark.parametrize("act", ["silu", "ssp"])
def test_tn_fused_forward(act):
    nbl, plan, inputs = _setup()
    cfg = FusedTNConfig(h=H, act=act, interpret=True)
    m = _call(cfg, plan, inputs)
    m_ref = _reference(nbl.idx, inputs, act=act)
    np.testing.assert_allclose(m, m_ref, rtol=1e-5, atol=1e-5)


def test_tn_fused_gradients():
    nbl, plan, inputs = _setup(seed=1)
    cfg = FusedTNConfig(h=H, act="silu", interpret=True)
    wm = jnp.asarray(np.random.RandomState(5).randn(N, 9 * H).astype(np.float32))

    def loss_f(d):
        return jnp.sum(_call(cfg, plan, dict(inputs, **d)) * wm)

    def loss_r(d):
        return jnp.sum(_reference(nbl.idx, dict(inputs, **d)) * wm)

    diff = {n: inputs[n] for n in ORDER if n != "cutm"}
    diff["cutm"] = inputs["cutm"]
    g_f = jax.grad(loss_f)(diff)
    g_r = jax.grad(loss_r)(diff)
    for n in diff:
        np.testing.assert_allclose(
            g_f[n], g_r[n], rtol=3e-4, atol=3e-4, err_msg=f"grad wrt {n}"
        )


def test_tn_fused_second_order_matches_reference():
    """grad-of-grad (force-training pattern) through the fused TN op."""
    nbl, plan, inputs = _setup(seed=2)
    cfg = FusedTNConfig(h=H, act="silu", interpret=True)

    def make_loss(call):
        def loss(w1):
            full = dict(inputs, w1=w1)

            def energy(cutm):
                return jnp.sum(call(dict(full, cutm=cutm)) ** 2)

            force = jax.grad(energy)(inputs["cutm"])
            return jnp.sum(force**2)

        return loss

    g_f = jax.grad(make_loss(lambda d: _call(cfg, plan, d)))(inputs["w1"])
    g_r = jax.grad(make_loss(lambda d: _reference(nbl.idx, d)))(inputs["w1"])
    scale = np.abs(np.asarray(g_r)).max()
    np.testing.assert_allclose(
        np.asarray(g_f), np.asarray(g_r), atol=1e-4 * max(scale, 1.0), rtol=1e-4
    )


def test_tn_fused_model_matches_composable():
    from torchmdnet_tpu.data.batch import pad_molecules, spatial_sort
    from torchmdnet_tpu.models.potential import create_model

    rng = np.random.RandomState(3)
    n_real = 61
    z = rng.randint(1, 9, n_real)
    pos = rng.uniform(0, 7.0, (n_real, 3)).astype(np.float32)
    batch = pad_molecules([{"z": z, "pos": pos}], num_atoms=64, num_mol=1)
    batch, _ = spatial_sort(batch)

    args = dict(
        model="tensornet", embedding_dimension=H, num_layers=2, num_rbf=RBF,
        rbf_type="expnorm", trainable_rbf=False, activation="silu",
        cutoff_lower=0.0, cutoff_upper=4.5, max_z=100, max_num_neighbors=64,
        derivative=True, output_model="Scalar", prior_model=None,
        reduce_op="add", precision=32, atom_filter=-1, bf16_messages=True,
        equivariance_invariance_group="O(3)",
    )
    base = create_model(dict(args))
    fused = create_model(dict(args, fused_message=True))
    params = base.init(jax.random.PRNGKey(0), batch)
    params_f = fused.init(jax.random.PRNGKey(0), batch)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_f
    ), "fused path must produce the identical parameter tree"

    nbl = fused.neighbors(batch, gather_plan=True, plan_block_rows=8, plan_width=256)
    nbl.raise_on_overflow("test")
    y0, f0 = base.energy_and_forces(params, batch, nbl=nbl)
    y1, f1 = fused.energy_and_forces(params, batch, nbl=nbl)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=3e-2, atol=3e-2)
    scale = np.abs(np.asarray(f0)).max()
    np.testing.assert_allclose(
        np.asarray(f1), np.asarray(f0), atol=5e-2 * max(scale, 1.0)
    )
