# StreamYOLO-s, 1x velocity, DFP + TAL + flip.
# Mirrors /root/reference/cfgs/s_s50_onex_dfp_tal_flip.py (depth 0.33 /
# width 0.50, TAL gamma=1.0 ignore_thr=0.5 ignore_value=1.5); everything else
# comes from streamyolo_tpu.exp.StreamExp.
import os

from streamyolo_tpu.exp import StreamExp


class Exp(StreamExp):
    head_name = "tal"
    dataset_name = "one"
    evaluator_name = "onex"
    tal_gamma = 1.0
    tal_ignore_thr = 0.5
    tal_ignore_value = 1.5

    def __init__(self):
        super().__init__()
        self.depth = 0.33
        self.width = 0.50
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(".")[0]
