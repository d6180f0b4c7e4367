"""Experiment (config) system: BaseExp + dynamic config loading.

Capability parity with the yolox ``Exp`` surface the reference consumes
(SURVEY.md §2.3, §5.6): a config IS a Python subclass that carries both
hyperparameter attributes and factory methods; it is loaded by file path
(``get_exp(-f cfgs/x.py)`` dynamic import, `/root/reference/tools/train.py:123`)
and can be overridden from the CLI via ``exp.merge(opts)`` key/value pairs.

Default attribute values mirror the yolox 0.3 base Exp (the values the five
shipped configs inherit without overriding — e.g. ``test_conf=0.01`` /
``nmsthre=0.65`` govern the README benchmark numbers).
"""

from __future__ import annotations

import ast
import importlib.util
import os
import sys
from typing import Optional, Sequence


class BaseExp:
    """Hyperparameter defaults (yolox base Exp values)."""

    def __init__(self):
        # ---------------- training ----------------
        self.seed: Optional[int] = None
        self.output_dir = "./StreamYOLO_outputs"
        self.print_interval = 10
        self.eval_interval = 10
        self.save_history_ckpt = True
        self.max_epoch = 300
        self.warmup_epochs = 5
        self.warmup_lr = 0.0
        self.min_lr_ratio = 0.05
        self.basic_lr_per_img = 0.01 / 64.0
        self.scheduler = "yoloxwarmcos"
        self.no_aug_epochs = 15
        self.ema = True
        self.weight_decay = 5e-4
        self.momentum = 0.9
        # ---------------- data / augment ----------------
        self.data_num_workers = 4
        self.input_size = (640, 640)
        self.multiscale_range = 5
        self.random_size = None
        self.train_ann = "train.json"
        self.val_ann = "val.json"
        self.degrees = 10.0
        self.translate = 0.1
        self.mosaic_scale = (0.1, 2.0)
        self.mixup_scale = (0.5, 1.5)
        self.shear = 2.0
        self.enable_mixup = True
        self.mosaic_prob = 1.0
        self.mixup_prob = 1.0
        # ---------------- model ----------------
        self.num_classes = 80
        self.depth = 1.00
        self.width = 1.00
        self.act = "silu"
        # ---------------- eval ----------------
        self.test_size = (640, 640)
        self.test_conf = 0.01
        self.nmsthre = 0.65

    def merge(self, cfg_list: Sequence[str]):
        """CLI ``key value`` override pairs (`yolox.exp.BaseExp.merge`)."""
        assert len(cfg_list) % 2 == 0, "override list must be key-value pairs"
        for k, v in zip(cfg_list[0::2], cfg_list[1::2]):
            if k.startswith("--"):
                k = k[2:]
            assert hasattr(self, k), f"{k} is not an attribute of {type(self).__name__}"
            src_value = getattr(self, k)
            try:
                value = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                value = v
            if src_value is not None and not isinstance(value, type(src_value)):
                try:
                    value = type(src_value)(value)
                except (ValueError, TypeError):
                    pass
            setattr(self, k, value)
        return self

    def __repr__(self):
        rows = [
            f"{k:25s}: {v}"
            for k, v in sorted(vars(self).items())
            if not k.startswith("_")
        ]
        return "\n".join(rows)


def get_exp(exp_file: Optional[str] = None, exp_name: Optional[str] = None):
    """Load an ``Exp`` instance from a config file path (or a shipped config
    name like ``s_s50_onex_dfp_tal_flip``)."""
    assert exp_file is not None or exp_name is not None, (
        "please provide exp file or exp name"
    )
    if exp_file is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
        exp_file = os.path.join(repo_root, "cfgs", f"{exp_name}.py")
    exp_file = os.path.realpath(exp_file)
    module_name = os.path.basename(exp_file).split(".")[0]
    spec = importlib.util.spec_from_file_location(module_name, exp_file)
    module = importlib.util.module_from_spec(spec)
    sys.modules[module_name] = module
    spec.loader.exec_module(module)
    return module.Exp()
