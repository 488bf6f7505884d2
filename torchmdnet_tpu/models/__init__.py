__all__ = ["graph-network", "transformer", "equivariant-transformer", "tensornet"]

from torchmdnet_tpu.models.et import TorchMD_ET  # noqa: F401
from torchmdnet_tpu.models.graph_network import TorchMD_GN  # noqa: F401
from torchmdnet_tpu.models.potential import (  # noqa: F401
    EnergyModel,
    Potential,
    create_model,
    create_prior_models,
    load_model,
)
from torchmdnet_tpu.models.tensornet import TensorNet  # noqa: F401
from torchmdnet_tpu.models.transformer import TorchMD_T  # noqa: F401
