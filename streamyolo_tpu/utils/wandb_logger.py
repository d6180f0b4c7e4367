"""Weights & Biases sink (gated: wandb is not installed in this image).

Capability slot for the reference's ``yolox.utils.WandbLogger``
(`/root/reference/exps/train_utils/double_trainer.py:186-191,269-271,340-345`):
metric logging, per-epoch val metrics, checkpoint artifact upload. When the
``wandb`` package is absent every call degrades to a logged no-op so training
configs that request the sink still run.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from streamyolo_tpu.utils.logger import get_logger


class WandbLogger:
    def __init__(self, project: Optional[str] = None, name: Optional[str] = None,
                 config: Optional[Dict[str, Any]] = None, **kwargs):
        self._run = None
        try:
            import wandb

            self._wandb = wandb
            self._run = wandb.init(project=project, name=name, config=config, **kwargs)
        except ImportError:
            self._wandb = None
            get_logger().warning(
                "wandb is not installed; WandbLogger degrades to a no-op sink"
            )

    @classmethod
    def initialize_wandb_logger(cls, args, exp, val_dataset=None):
        prefix = "wandb-"
        params = {}
        for k, v in zip(getattr(args, "opts", [])[0::2], getattr(args, "opts", [])[1::2]):
            if k.startswith(prefix):
                params[k[len(prefix):]] = v
        return cls(config=vars(exp) if hasattr(exp, "__dict__") else None, **params)

    def log_metrics(self, metrics: Dict[str, Any], step: Optional[int] = None):
        if self._run is not None:
            self._wandb.log(metrics, step=step)

    def save_checkpoint(self, save_dir: str, model_name: str, is_best: bool, metadata=None):
        if self._run is not None:
            import os

            artifact = self._wandb.Artifact(model_name, type="model", metadata=metadata)
            artifact.add_file(os.path.join(save_dir, model_name + "_ckpt.pkl"))
            self._run.log_artifact(artifact, aliases=["best"] if is_best else None)

    def finish(self):
        if self._run is not None:
            self._run.finish()
