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
