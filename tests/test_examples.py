"""Every examples/*.yaml instantiates a model and runs a forward
(reference tests/test_examples.py)."""

import glob
import os

import jax
import numpy as np
import pytest
import yaml

from torchmdnet_tpu.models.potential import create_model

from utils import create_example_batch

EXAMPLES = sorted(
    glob.glob(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples", "*.yaml")
    )
)


@pytest.mark.parametrize("fname", EXAMPLES, ids=[os.path.basename(f) for f in EXAMPLES])
def test_example_yaml(fname):
    with open(fname) as f:
        args = yaml.safe_load(f)
    # shrink so tests stay fast; architecture/choices come from the YAML
    args["embedding_dimension"] = 32
    args["num_layers"] = 1
    args["num_rbf"] = 8
    args["prior_model"] = None
    model = create_model(args)
    batch = create_example_batch(n_atoms=8)
    params = model.init(jax.random.PRNGKey(0), batch)
    y, neg_dy = model.apply(params, batch)
    assert np.isfinite(np.asarray(y)).all()
    if args.get("derivative"):
        assert np.isfinite(np.asarray(neg_dy)).all()
