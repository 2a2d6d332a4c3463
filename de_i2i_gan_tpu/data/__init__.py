from de_i2i_gan_tpu.data.datasets import (
    AFHQDataset,
    CodeBrimDataset,
    ConcatDataset,
    FaceDataset,
    MTVecDataset,
    find_dataset_using_name,
)
from de_i2i_gan_tpu.data.pipeline import DataLoader, InfiniteLoader, DualStreamLoader
from de_i2i_gan_tpu.data.synthetic import SyntheticDefectDataset

__all__ = [
    "AFHQDataset", "CodeBrimDataset", "ConcatDataset", "FaceDataset",
    "MTVecDataset", "find_dataset_using_name",
    "DataLoader", "InfiniteLoader", "DualStreamLoader",
    "SyntheticDefectDataset",
]
