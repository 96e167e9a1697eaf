from m3d.data.datasets import Dataset, ToyDataset, ToyHeadDataset  # noqa: F401
from m3d.data.rpn_targets import build_rpn_targets  # noqa: F401
