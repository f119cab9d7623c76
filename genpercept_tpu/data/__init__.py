from genpercept_tpu.data.transforms import (
    DepthNormalizer,
    get_depth_normalizer,
    scale_shift_depth_normalize,
    scale_shift_disparity_normalize,
)
from genpercept_tpu.data.datasets import (
    BaseDataset,
    DatasetMode,
    PredNameMode,
    get_dataset,
    DATASET_REGISTRY,
)
from genpercept_tpu.data.sampler import MixedBatchSampler

__all__ = [
    "DepthNormalizer",
    "get_depth_normalizer",
    "scale_shift_depth_normalize",
    "scale_shift_disparity_normalize",
    "BaseDataset",
    "DatasetMode",
    "PredNameMode",
    "get_dataset",
    "DATASET_REGISTRY",
    "MixedBatchSampler",
]
