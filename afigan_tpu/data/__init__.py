from .coco import (
    CocoDataset,
    get_dataset,
    read_image,
    register_coco_instances,
    register_dataset,
    register_default_datasets,
)
from .dataset_mapper import DatasetMapper
from .loader import (
    PrefetchingLoader,
    RepeatFactorTrainingSampler,
    TrainingSampler,
    build_test_loader,
    build_train_loader,
    collate_batch,
)
from .transforms import ResolvedTransform, sample_train_transform, test_transform

__all__ = [
    "CocoDataset",
    "get_dataset",
    "read_image",
    "register_coco_instances",
    "register_dataset",
    "register_default_datasets",
    "DatasetMapper",
    "TrainingSampler",
    "RepeatFactorTrainingSampler",
    "PrefetchingLoader",
    "build_train_loader",
    "build_test_loader",
    "collate_batch",
    "ResolvedTransform",
    "sample_train_transform",
    "test_transform",
]
