"""Dataset registry (reference torchmdnet/datasets/__init__.py).

All datasets are numpy-native (no torch / torch-geometric): samples are dicts
with keys z, pos and optionally y, neg_dy, q, s, pq, dp
(reference README.md:53-57 schema).
"""

from torchmdnet_tpu.data.datasets.ace import Ace  # noqa: F401
from torchmdnet_tpu.data.datasets.ani import ANI1, ANI1CCX, ANI1X  # noqa: F401
from torchmdnet_tpu.data.datasets.base import MolecularDataset, Subset  # noqa: F401
from torchmdnet_tpu.data.datasets.comp6 import (  # noqa: F401
    ANIMD,
    COMP6v1,
    DrugBank,
    GDB07to09,
    GDB10to13,
    S66X8,
    Tripeptides,
)
from torchmdnet_tpu.data.datasets.custom import Custom  # noqa: F401
from torchmdnet_tpu.data.datasets.dummy import DummyDataset  # noqa: F401
from torchmdnet_tpu.data.datasets.hdf import HDF5  # noqa: F401
from torchmdnet_tpu.data.datasets.md17 import MD17  # noqa: F401
from torchmdnet_tpu.data.datasets.md22 import MD22  # noqa: F401
from torchmdnet_tpu.data.datasets.qm9 import QM9  # noqa: F401
from torchmdnet_tpu.data.datasets.qm9q import QM9q  # noqa: F401
from torchmdnet_tpu.data.datasets.spice import SPICE  # noqa: F401
from torchmdnet_tpu.data.datasets.synthetic import SyntheticMorse  # noqa: F401

__all__ = [
    "Ace",
    "ANIMD",
    "ANI1",
    "ANI1CCX",
    "ANI1X",
    "COMP6v1",
    "Custom",
    "DrugBank",
    "DummyDataset",
    "GDB07to09",
    "GDB10to13",
    "HDF5",
    "MD17",
    "MD22",
    "QM9",
    "QM9q",
    "S66X8",
    "SPICE",
    "SyntheticMorse",
    "Tripeptides",
]
