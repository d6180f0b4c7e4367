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
    """Atomic write of ``<model_name>_ckpt.pkl`` (+ ``best_ckpt.pkl`` copy).

    Both files go through a same-directory tmp file + ``os.replace`` so a
    crash mid-write can never leave a truncated checkpoint under the real
    name — at worst an orphaned ``*.tmp`` and the previous intact file."""
    os.makedirs(save_dir, exist_ok=True)
    filename = os.path.join(save_dir, model_name + "_ckpt.pkl")
    tmp = filename + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(state), f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, filename)
    if is_best:
        best = os.path.join(save_dir, "best_ckpt.pkl")
        shutil.copyfile(filename, best + ".tmp")
        os.replace(best + ".tmp", best)


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load either our pickle checkpoints or a torch ``.pth`` file (returned
    as ``{"model": flax_variables}`` so callers treat both uniformly).

    A corrupted/truncated file fails LOUDLY with the path in the message —
    never a silently partial state. Recovery: the trainer keeps
    ``latest_ckpt.pkl`` (every epoch), ``last_epoch_ckpt.pkl`` and
    ``best_ckpt.pkl``, each written atomically, so an intact sibling exists
    unless the filesystem lost them all."""
    if path.endswith((".pth", ".pt")):
        from streamyolo_tpu.utils.torch_import import load_torch_checkpoint

        return {"model": load_torch_checkpoint(path), "start_epoch": 0}
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except (pickle.UnpicklingError, EOFError, ValueError, ImportError) as e:
        raise RuntimeError(
            f"Corrupted or truncated checkpoint: {path} ({type(e).__name__}: "
            f"{e}). Atomic writes make this unreachable through a training "
            "crash; fall back to the sibling latest/last_epoch/best_ckpt "
            "file."
        ) from e


def save_safetensors(variables: Dict[str, Any], path: str,
                     torch_layout: bool = True) -> int:
    """Export model variables as a ``.safetensors`` file for interchange
    with the torch ecosystem (the format torch/HF tooling loads directly;
    unlike pickle it is safe to open from untrusted sources).

    ``torch_layout=True`` (default) writes torch state_dict names with OIHW
    convs (``utils/torch_import.py::variables_to_state_dict`` — the exact
    inverse of the ``.pth`` importer, so
    ``state_dict_to_variables(load_file(path))`` round-trips bit-for-bit);
    ``False`` keeps flax names (``params/.../kernel``, '/'-joined) and HWIO.
    Atomic via tmp + rename. Returns the number of tensors written."""
    from safetensors.numpy import save_file

    if torch_layout:
        from streamyolo_tpu.utils.torch_import import variables_to_state_dict

        flat = variables_to_state_dict(variables)
    else:
        from flax.traverse_util import flatten_dict

        flat = {
            "/".join(k): np.ascontiguousarray(np.asarray(v))
            for k, v in flatten_dict(variables).items()
        }
    tmp = path + ".tmp"
    save_file(flat, tmp, metadata={
        "format": "pt" if torch_layout else "flax",
        "producer": "streamyolo_tpu",
    })
    os.replace(tmp, path)
    return len(flat)


def load_ckpt_tolerant(target_variables, loaded_variables):
    """Shape-tolerant merge for fine-tuning (reference ``load_ckpt``):
    mismatched / missing leaves keep their init values."""
    from streamyolo_tpu.utils.torch_import import merge_variables

    return merge_variables(target_variables, loaded_variables, strict=False)
