from streamyolo_tpu.ops.boxes import (
    adjust_box_anns,
    bboxes_iou,
    cxcywh2xyxy,
    elementwise_iou,
    pairwise_iou,
    xyxy2cxcywh,
    xyxy2xywh,
)
from streamyolo_tpu.ops.nms import nms_padded, postprocess, postprocess_fixed
from streamyolo_tpu.ops.resize import resize_bilinear_torch, resize_nearest

__all__ = [
    "adjust_box_anns",
    "bboxes_iou",
    "cxcywh2xyxy",
    "elementwise_iou",
    "pairwise_iou",
    "xyxy2cxcywh",
    "xyxy2xywh",
    "nms_padded",
    "postprocess",
    "postprocess_fixed",
    "resize_bilinear_torch",
    "resize_nearest",
]
