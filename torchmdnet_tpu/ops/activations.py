"""Activation registry.

Mirrors the reference's act_class_mapping (torchmdnet/models/utils.py:347-359,579-584)
as pure functions: {ssp, silu, tanh, sigmoid}.
"""

import math

import jax
import jax.numpy as jnp

_LOG2 = math.log(2.0)


def shifted_softplus(x):
    """softplus(x) - log(2)  (reference utils.py:347-359)."""
    return jax.nn.softplus(x) - _LOG2


act_fn_mapping = {
    "ssp": shifted_softplus,
    "silu": jax.nn.silu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
}
