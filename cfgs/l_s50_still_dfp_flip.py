# StreamYOLO-l, still-frame (offline AP) variant.
# Mirrors /root/reference/cfgs/l_s50_still_dfp_flip.py (PIPEHead, STILL_
# dataset + evaluator, single-frame TrainTransform).
import os

from streamyolo_tpu.exp import StreamExp


class Exp(StreamExp):
    head_name = "pipe"
    dataset_name = "still"
    evaluator_name = "still"

    def __init__(self):
        super().__init__()
        self.depth = 1.0
        self.width = 1.0
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(".")[0]
