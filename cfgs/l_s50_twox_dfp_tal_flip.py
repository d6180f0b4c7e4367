# StreamYOLO-l, 2x velocity (support t-2, target t+2).
# Mirrors /root/reference/cfgs/l_s50_twox_dfp_tal_flip.py (TAL gamma=1.0
# ignore_thr=0.4 ignore_value=1.5; TWO_ dataset + TWOX evaluator).
import os

from streamyolo_tpu.exp import StreamExp


class Exp(StreamExp):
    head_name = "tal"
    dataset_name = "two"
    evaluator_name = "twox"
    tal_gamma = 1.0
    tal_ignore_thr = 0.4
    tal_ignore_value = 1.5

    def __init__(self):
        super().__init__()
        self.depth = 1.0
        self.width = 1.0
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(".")[0]
