from .pipeline import create_dataset, Batcher, DevicePrefetcher
from .tfrecord import parse_tfrecords, iter_tfrecord_files
from .coco_json import create_dataset_from_files

__all__ = [
    "create_dataset",
    "Batcher",
    "DevicePrefetcher",
    "parse_tfrecords",
    "iter_tfrecord_files",
    "create_dataset_from_files",
]
