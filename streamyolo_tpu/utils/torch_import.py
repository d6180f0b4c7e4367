"""Torch ``.pth`` checkpoint importer: torch state_dict -> flax variables.

The BASELINE north star requires loading the released StreamYOLO weights
(``{s,m,l}_s50_one_x.pth`` etc., `/root/reference/README.md:18-22`) with
bit-matching offline sAP, and fine-tuning from COCO-pretrained ``yolox_*.pth``
through a shape-tolerant load (the reference's ``load_ckpt`` at
`exps/train_utils/double_trainer.py:311-316`).

Mapping rules (purely mechanical thanks to the mirrored module names):
  * torch module path segments with list indices flatten ``a.N`` -> ``a_N``
    (e.g. ``backbone.backbone.dark2.0.conv.weight`` ->
    params/backbone/backbone/dark2_0/conv/kernel);
  * 4-D conv ``weight`` transposes OIHW -> HWIO;
  * BatchNorm ``weight``/``bias`` -> params ``scale``/``bias``;
    ``running_mean``/``running_var`` -> batch_stats ``mean``/``var``;
    ``num_batches_tracked`` is dropped.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def _merge_numeric_segments(segments):
    out = []
    for seg in segments:
        if seg.isdigit() and out:
            out[-1] = f"{out[-1]}_{seg}"
        else:
            out.append(seg)
    return out


def torch_key_to_flax(key: str, ndim: int) -> Optional[Tuple[str, Tuple[str, ...], Optional[Tuple[int, ...]]]]:
    """Map one torch state_dict key to (collection, flax path, transpose).

    Returns None for entries with no flax counterpart
    (``num_batches_tracked``).
    """
    segments = key.split(".")
    leaf = segments[-1]
    path = _merge_numeric_segments(segments[:-1])

    if leaf == "num_batches_tracked":
        return None
    if leaf == "running_mean":
        return "batch_stats", tuple(path + ["mean"]), None
    if leaf == "running_var":
        return "batch_stats", tuple(path + ["var"]), None
    if leaf == "weight":
        if ndim == 4:  # conv OIHW -> HWIO
            return "params", tuple(path + ["kernel"]), (2, 3, 1, 0)
        return "params", tuple(path + ["scale"]), None  # BN affine
    if leaf == "bias":
        return "params", tuple(path + ["bias"]), None
    raise KeyError(f"Unrecognized torch parameter leaf: {key}")


def state_dict_to_variables(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert a torch state_dict (tensors or ndarrays) to a flax variables
    dict {'params': ..., 'batch_stats': ...} (nested)."""
    from flax.traverse_util import unflatten_dict

    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    for key, value in state_dict.items():
        arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
        mapped = torch_key_to_flax(key, arr.ndim)
        if mapped is None:
            continue
        collection, path, transpose = mapped
        if transpose is not None:
            arr = arr.transpose(transpose)
        flat[(collection,) + path] = arr.astype(np.float32)
    return unflatten_dict(flat)


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference ``.pth`` checkpoint file and return flax variables.
    Handles both raw state_dicts and trainer checkpoints with a ``model`` key
    (`double_trainer.py:355` saves EMA weights under ``model``)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    return state_dict_to_variables(state_dict)


def flax_path_to_torch(collection: str, path: Tuple[str, ...], ndim: int) -> Tuple[str, Optional[Tuple[int, ...]]]:
    """Inverse of ``torch_key_to_flax``: one flax variables leaf -> (torch
    state_dict key, transpose to apply).

    The segment inverse maps trailing ``_<digits>`` back to ``.<digits>``
    (repeatedly: ``m_0_1`` -> ``m.0.1``). That is unambiguous for this model
    tree because the mirrored torch module names never END in ``_<digits>``
    themselves (yolox attaches digits without an underscore: ``bu_conv2``,
    ``C3_p4``); the round-trip test in tests/test_aux.py proves it leaf by
    leaf on the real model."""
    segments = []
    for seg in path[:-1]:
        parts = seg.split("_")
        i = len(parts)
        while i > 1 and parts[i - 1].isdigit():
            i -= 1
        segments.append("_".join(parts[:i]))
        segments.extend(parts[i:])
    leaf = path[-1]
    prefix = ".".join(segments)
    if collection == "batch_stats":
        assert leaf in ("mean", "var"), (collection, path)
        return f"{prefix}.running_{leaf}", None
    if leaf == "kernel":
        if ndim == 4:  # HWIO -> OIHW
            return f"{prefix}.weight", (3, 2, 0, 1)
        if ndim == 2:  # flax Dense [in, out] -> torch Linear [out, in]
            return f"{prefix}.weight", (1, 0)
        return f"{prefix}.weight", None
    if leaf == "scale":
        return f"{prefix}.weight", None
    if leaf == "bias":
        return f"{prefix}.bias", None
    raise KeyError(f"Unrecognized flax parameter leaf: {collection}/{'/'.join(path)}")


def variables_to_state_dict(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Convert flax variables {'params', 'batch_stats'} to a torch-layout
    state_dict of ndarrays (torch names, OIHW convs) — the interchange
    EXPORT direction. ``num_batches_tracked`` entries are not emitted (torch
    loads fine without them via ``strict=False``, and the reference's
    ``load_ckpt`` ignores them)."""
    from flax.traverse_util import flatten_dict

    out: Dict[str, np.ndarray] = {}
    for full_path, value in flatten_dict(variables).items():
        collection, path = full_path[0], full_path[1:]
        arr = np.asarray(value)
        key, transpose = flax_path_to_torch(collection, path, arr.ndim)
        if transpose is not None:
            arr = arr.transpose(transpose)
        out[key] = np.ascontiguousarray(arr)
    return out


def merge_variables(
    target: Mapping[str, Any], loaded: Mapping[str, Any], strict: bool = True
) -> Dict[str, Any]:
    """Merge ``loaded`` into the structure of ``target`` (a ``model.init``
    result).

    ``strict=True``: every target leaf must be present with matching shape.
    ``strict=False``: shape-tolerant fine-tune load — mismatched or missing
    leaves keep the target's init value (reference ``load_ckpt`` semantics).
    Returns the merged variables and (in non-strict mode) logs skipped keys.
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    tgt = flatten_dict(target)
    src = flatten_dict(loaded)
    merged = {}
    skipped = []
    for path, value in tgt.items():
        if path in src and tuple(src[path].shape) == tuple(np.shape(value)):
            merged[path] = src[path]
        elif strict:
            have = tuple(src[path].shape) if path in src else None
            raise ValueError(
                f"Checkpoint missing/mismatched for {'/'.join(path)}: "
                f"target {tuple(np.shape(value))}, checkpoint {have}"
            )
        else:
            merged[path] = value
            skipped.append("/".join(path))
    extra = [p for p in src if p not in tgt]
    if strict and extra:
        raise ValueError(
            f"Checkpoint has {len(extra)} keys absent from the model, e.g. "
            + ", ".join("/".join(p) for p in extra[:5])
        )
    if skipped:
        from streamyolo_tpu.utils.logger import get_logger

        get_logger().warning(
            "Shape-tolerant load skipped %d keys (kept init values): %s%s",
            len(skipped),
            ", ".join(skipped[:8]),
            "..." if len(skipped) > 8 else "",
        )
    return unflatten_dict(merged)
