from .dataset import EventDataset, create_datasets
from .batcher import Batcher, BatchShape
from . import schema

__all__ = ["EventDataset", "create_datasets", "Batcher", "BatchShape", "schema"]
