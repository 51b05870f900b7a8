from vitx.data.folder import FolderDataset
from vitx.data.cifar import CIFAR10
from vitx.data.synthetic import SyntheticDataset
from vitx.data.loader import BatchLoader
from vitx.data.pipeline import make_preprocess
from vitx.data.shards import ShardDataset, write_shards

__all__ = [
    "FolderDataset",
    "CIFAR10",
    "SyntheticDataset",
    "BatchLoader",
    "make_preprocess",
    "ShardDataset",
    "write_shards",
]
