from streamyolo_tpu.eval.cocoeval import COCOeval, COCOeval_opt, bbox_iou_xywh
from streamyolo_tpu.eval.evaluators import (
    ONEX_COCOEvaluator,
    STILL_COCOEvaluator,
    TWOX_COCOEvaluator,
    per_class_AP_table,
)
from streamyolo_tpu.eval.seq_forward import SequentialDedupForward

__all__ = [
    "COCOeval",
    "COCOeval_opt",
    "bbox_iou_xywh",
    "ONEX_COCOEvaluator",
    "STILL_COCOEvaluator",
    "TWOX_COCOEvaluator",
    "per_class_AP_table",
    "SequentialDedupForward",
]
