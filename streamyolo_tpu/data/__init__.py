from streamyolo_tpu.data.argoverse_classes import ARGOVERSE_CLASSES, COCO_SUBSET
from streamyolo_tpu.data.coco import COCO
from streamyolo_tpu.data.datasets import (
    ONE_ARGOVERSEDataset,
    STILL_ARGOVERSEDataset,
    TWO_ARGOVERSEDataset,
)
from streamyolo_tpu.data.loader import (
    DataLoader,
    DevicePrefetcher,
    InfiniteSampler,
    ShardDataset,
    YoloBatchSampler,
    worker_init_reset_seed,
)
from streamyolo_tpu.data.mosaic import MosaicDetection, StillMosaicDetection
from streamyolo_tpu.data.transforms import (
    DoubleTrainTransform,
    DoubleValTransform,
    TrainTransform,
    ValTransform,
    augment_hsv,
    box_candidates,
    preproc,
    random_perspective,
    warp_keep_mask,
)

__all__ = [
    "ARGOVERSE_CLASSES",
    "COCO_SUBSET",
    "COCO",
    "ONE_ARGOVERSEDataset",
    "STILL_ARGOVERSEDataset",
    "TWO_ARGOVERSEDataset",
    "DataLoader",
    "DevicePrefetcher",
    "InfiniteSampler",
    "ShardDataset",
    "YoloBatchSampler",
    "worker_init_reset_seed",
    "MosaicDetection",
    "StillMosaicDetection",
    "DoubleTrainTransform",
    "DoubleValTransform",
    "TrainTransform",
    "ValTransform",
    "augment_hsv",
    "box_candidates",
    "preproc",
    "random_perspective",
    "warp_keep_mask",
]
