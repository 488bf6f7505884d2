from torchmdnet_tpu.ops.activations import act_fn_mapping, shifted_softplus  # noqa: F401
from torchmdnet_tpu.ops.cutoff import cosine_cutoff  # noqa: F401
from torchmdnet_tpu.ops.rbf import (  # noqa: F401
    GaussianSmearing,
    ExpNormalSmearing,
    rbf_class_mapping,
)
from torchmdnet_tpu.ops.neighbors import (  # noqa: F401
    NeighborList,
    neighbor_list,
    edge_geometry,
    edge_geometry_components,
    safe_norm,
    minimum_image,
)
from torchmdnet_tpu.ops.segment import segment_reduce  # noqa: F401
