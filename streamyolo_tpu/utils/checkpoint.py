"""Checkpoint save/load with the reference's name/semantic surface.

Mirrors `yolox.utils.save_checkpoint` usage at `/root/reference/exps/
train_utils/double_trainer.py:353-371`: rank-0 writes
``{start_epoch, model (EMA weights if enabled), optimizer-state, best_ap}``
under the names ``latest``, ``best_ckpt``, ``last_epoch``,
``last_mosaic_epoch``, optional ``epoch_N`` history; fine-tune loads are
shape-tolerant (``load_ckpt``, `double_trainer.py:311-316`).

Format: a pickle of NumPy pytrees (atomic via tmp-file rename). Torch ``.pth``
files are loaded through ``streamyolo_tpu.utils.torch_import`` so released
reference weights work as fine-tune/eval inputs everywhere a checkpoint is
accepted.
"""

from __future__ import annotations

import os
import pickle
import shutil
from typing import Any, Dict

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(state: Dict[str, Any], is_best: bool, save_dir: str, model_name: str):
    """Atomic write of ``<model_name>_ckpt.pkl`` (+ ``best_ckpt.pkl`` copy)."""
    os.makedirs(save_dir, exist_ok=True)
    filename = os.path.join(save_dir, model_name + "_ckpt.pkl")
    tmp = filename + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(state), f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, filename)
    if is_best:
        shutil.copyfile(filename, os.path.join(save_dir, "best_ckpt.pkl"))


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load either our pickle checkpoints or a torch ``.pth`` file (returned
    as ``{"model": flax_variables}`` so callers treat both uniformly)."""
    if path.endswith((".pth", ".pt")):
        from streamyolo_tpu.utils.torch_import import load_torch_checkpoint

        return {"model": load_torch_checkpoint(path), "start_epoch": 0}
    with open(path, "rb") as f:
        return pickle.load(f)


def load_ckpt_tolerant(target_variables, loaded_variables):
    """Shape-tolerant merge for fine-tuning (reference ``load_ckpt``):
    mismatched / missing leaves keep their init values."""
    from streamyolo_tpu.utils.torch_import import merge_variables

    return merge_variables(target_variables, loaded_variables, strict=False)
