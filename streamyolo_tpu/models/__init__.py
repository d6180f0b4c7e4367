from streamyolo_tpu.models.darknet import CSPDarknet, Darknet
from streamyolo_tpu.models.dfp_pafpn import DFPPAFPN
from streamyolo_tpu.models.heads import PIPEHead, TALHead, YOLOXHead
from streamyolo_tpu.models.yolox import YOLOX, StreamYOLO

__all__ = [
    "CSPDarknet",
    "Darknet",
    "DFPPAFPN",
    "PIPEHead",
    "TALHead",
    "YOLOXHead",
    "YOLOX",
    "StreamYOLO",
]
from streamyolo_tpu.models.assign import Assignment, simota_assign_batch, simota_assign_single
from streamyolo_tpu.models.losses import bce_with_logits, iou_loss, streamyolo_losses

__all__ += [
    "Assignment",
    "simota_assign_batch",
    "simota_assign_single",
    "bce_with_logits",
    "iou_loss",
    "streamyolo_losses",
]
