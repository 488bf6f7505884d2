"""Device mesh construction.

The reference's distributed story is DDP over NCCL (scripts/train.py:176-180);
here parallelism is a jax.sharding.Mesh.  Data parallelism shards the padded
atom/molecule axes over 'dp'; XLA inserts the gradient psums that DDP's
allreduce performed.  Multi-host: jax.distributed.initialize before mesh
construction (ICI within slice, DCN across).
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    ndevices: int = -1, axis_name: str = "dp", allow_single: bool = False
) -> Optional[Mesh]:
    """1-D data-parallel mesh over local devices.

    Returns None for a single device unless ``allow_single`` (modes that
    REQUIRE a mesh — e.g. --edge-partition — run fine on a degenerate
    1-device ring)."""
    devices = jax.devices()
    if ndevices is None or ndevices < 0:
        ndevices = len(devices)
    if ndevices > len(devices):
        import warnings

        warnings.warn(
            f"Requested {ndevices} devices but only {len(devices)} are "
            f"available; a user expecting sharded execution may silently get "
            f"a single device. Using {len(devices)}."
        )
    ndevices = min(ndevices, len(devices))
    if ndevices <= 1 and not allow_single:
        return None
    return Mesh(np.array(devices[:max(ndevices, 1)]), (axis_name,))


def make_2d_mesh(dp: int, mp: int, axis_names=("dp", "mp")) -> Mesh:
    """dp x mp mesh for edge-partitioned (model-parallel) execution."""
    devices = np.array(jax.devices()[: dp * mp]).reshape(dp, mp)
    return Mesh(devices, axis_names)
