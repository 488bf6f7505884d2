from torchmdnet_tpu.priors.atomref import Atomref  # noqa: F401
from torchmdnet_tpu.priors.coulomb import Coulomb  # noqa: F401
from torchmdnet_tpu.priors.d2 import D2  # noqa: F401
from torchmdnet_tpu.priors.zbl import ZBL  # noqa: F401

__all__ = ["Atomref", "D2", "ZBL", "Coulomb"]

prior_class_mapping = {"Atomref": Atomref, "D2": D2, "ZBL": ZBL, "Coulomb": Coulomb}
