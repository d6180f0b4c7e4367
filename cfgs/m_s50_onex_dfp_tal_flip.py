# StreamYOLO-m, 1x velocity, DFP + TAL + flip.
# Mirrors /root/reference/cfgs/m_s50_onex_dfp_tal_flip.py (0.67/0.75, TAL
# gamma=1.0 ignore_thr=0.4 ignore_value=1.7).
import os

from streamyolo_tpu.exp import StreamExp


class Exp(StreamExp):
    head_name = "tal"
    dataset_name = "one"
    evaluator_name = "onex"
    tal_gamma = 1.0
    tal_ignore_thr = 0.4
    tal_ignore_value = 1.7

    def __init__(self):
        super().__init__()
        self.depth = 0.67
        self.width = 0.75
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(".")[0]
