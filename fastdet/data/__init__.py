from fastdet.data.dataset import DarknetDataset, default_augment
from fastdet.data.loader import DataLoader

__all__ = ["DarknetDataset", "default_augment", "DataLoader"]
