"""Post-training int8 quantization for serving (TPU MXU int8 path).

The reference's deployment slot is TensorRT, whose headline capability is
int8 post-training quantization with an activation-calibration pass. This
is the TPU-native equivalent: fold BN into the conv weights
(``utils/fuse.py``), observe per-conv input ranges over a calibration set,
and re-emit the variables with every CBS conv as a symmetric-int8 kernel +
scales. ``BaseConv`` (nn/blocks.py) consumes the ``'quant'`` collection and
runs the conv as int8 x int8 -> int32 on the MXU — 2x the bf16 MACs/cycle
on v5e and half the activation HBM traffic — with the dequant multiply
fused into the epilogue. The final head ``*_preds`` convs are plain
``nn.Conv`` (no BN) and stay full precision, the standard PTQ practice for
detection heads.

Scheme: activations per-tensor symmetric (absmax over the calibration set),
weights per-output-channel symmetric, both to [-127, 127]; zero-points are
0 everywhere, so the int32 accumulate needs no correction terms.

Accuracy note: quantization changes the numbers (unlike every other
transformation in this repo, which is bit-exact); validate sAP on real data
with ``tools/validate_baseline.py`` before shipping an int8 deployment.

Phase-packed interplay: ``PackedConvBN`` (nn/packed.py) carries the same
calibration/int8 hooks as ``BaseConv``, gathering the RAW int8 kernel over
packed coordinates at apply time, so packed models quantize end-to-end —
and packed + int8 is the FAST combination: XLA gives every narrow (C < 128)
int8 conv a relayout copy on both operands (s8 (4,1)-tiled input, s32
W-major output), which the lane-filled packed shapes avoid entirely. The
per-tensor act scales are layout-independent (packing permutes the value
multiset), so a calibration observed on either layout serves both. The two
Focus stem formulations do not sow and stay full-precision under
``packed=True`` (in the raw layout the stem is a plain ``BaseConv`` and
quantizes — it is also where the worst int8 relayout copies live).
``quantize_variables(..., strip=True)`` drops the f32 kernels of quantized
convs; unsown modules (the packed stem) keep theirs.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, Sequence

import jax
import numpy as np

from streamyolo_tpu.utils.fuse import fuse_model_variables

_SCALE_FLOOR = 1e-8  # all-zero calibration input: keep the divide finite


def _unwrap_sown(v):
    """Sown absmax leaf -> ndarray (scalar for packed convs, [C_in] for
    BaseConv). sow stores a tuple when no reduce_fn merged in-place."""
    if isinstance(v, tuple):
        arrs = [np.asarray(e, np.float32) for e in v]
        out = arrs[0]
        for a in arrs[1:]:
            out = np.maximum(out, a)
        return out
    return np.asarray(v, np.float32)


def calibrate_activations(
    model,
    variables: Dict[str, Any],
    batches: Iterable[np.ndarray],
    **apply_kwargs,
) -> Dict[str, Any]:
    """Run ``model.apply`` over ``batches`` with the ``'calib'`` collection
    mutable and return the merged per-conv input-absmax tree (same module
    paths as ``variables['params']``).

    ``apply_kwargs`` are forwarded to ``model.apply``. StreamYOLO's default
    ``mode='off_pipe'`` is the right calibration mode: the 6-channel
    dual-frame input exercises every backbone conv, including the DFP
    fusion convs.
    """

    @jax.jit
    def observe(v, x):
        _, mut = model.apply(v, x, mutable=["calib"], **apply_kwargs)
        return mut["calib"]

    merged = None
    for x in batches:
        calib = jax.device_get(observe(variables, x))
        calib = jax.tree_util.tree_map(
            _unwrap_sown, calib, is_leaf=lambda v: isinstance(v, tuple)
        )
        merged = calib if merged is None else jax.tree_util.tree_map(
            np.maximum, merged, calib
        )
    if merged is None:
        raise ValueError("calibration needs at least one batch")
    return merged


def _is_cbs_node(p_node) -> bool:
    return (
        isinstance(p_node, dict)
        and "conv" in p_node
        and "bn" in p_node
        and isinstance(p_node["conv"], dict)
        and "kernel" in p_node["conv"]
    )


def quantize_variables(
    variables: Dict[str, Any],
    act_absmax: Dict[str, Any],
    *,
    skip: Sequence[str] = (),
    strip: bool = False,
    per_channel_act: bool = False,
) -> Dict[str, Any]:
    """Return serving variables with a ``'quant'`` collection: BN folded,
    every calibrated CBS conv re-emitted as ``kernel_q`` (int8 HWIO) +
    ``w_scale`` (f32 per-out-channel) + ``act_scale`` (f32 scalar, or
    [C_in] vector with ``per_channel_act``).

    ``skip``: regexes matched against the '/'-joined module path — matching
    convs keep the full-precision path (e.g. ``skip=[r"stem"]``).
    ``strip``: replace each quantized conv's f32 kernel with a 1-element
    placeholder to free the weight memory. Safe for both layouts: only
    calibrated (sown) convs are quantized/stripped, and every consuming
    module (``BaseConv`` raw, ``PackedConvBN`` packed) reads ``kernel_q``
    instead of the placeholder when the 'quant' collection is present.
    ``per_channel_act``: quantize activations with one scale per INPUT
    channel instead of per tensor. The channel scales fold into the kernel
    before its own per-out-channel quantization (y = conv(x/s_c, k*s_c)),
    so the int8 conv and its epilogue cost exactly the same — only the
    input divide becomes a [C] broadcast. Applies where the calibration
    leaf is a per-channel vector matching the kernel's input extent (plain
    ``BaseConv``); grouped convs and the packed layout (its calibration is
    over PERMUTED packed channels) keep the per-tensor scale.

    Measured trade-off (tests/test_quant.py::test_per_channel_act_*): the
    fold spends weight-mantissa on the scale SPREAD across input channels,
    so on well-behaved activations per-channel is ~2x WORSE in median
    output error (both ~1e-3 of the output scale), while on skewed channel
    ranges (a loud uninformative channel) it is >5x better. An option, not
    the default — try it when calibration shows orders-of-magnitude range
    differences across a conv's input channels.
    """
    variables = fuse_model_variables(variables)
    skip_res = [re.compile(s) for s in skip]
    quant: Dict[str, Any] = {}
    n_quantized = 0

    def walk(p_node, c_node, q_node, path):
        nonlocal n_quantized
        if not isinstance(p_node, dict):
            return
        if _is_cbs_node(p_node) and isinstance(c_node, dict) \
                and "in_absmax" in c_node:
            joined = "/".join(path)
            if any(r.search(joined) for r in skip_res):
                return
            kernel = np.asarray(p_node["conv"]["kernel"], np.float32)
            absmax = np.maximum(_unwrap_sown(c_node["in_absmax"]), _SCALE_FLOOR)
            if per_channel_act and absmax.ndim == 1 \
                    and kernel.shape[2] == absmax.shape[0]:
                s_c = (absmax / 127.0).astype(np.float32)  # [C_in]
                kernel = kernel * s_c[None, None, :, None]
                act_scale = s_c
            else:
                act_scale = np.float32(float(absmax.max()) / 127.0)
            w_absmax = np.maximum(
                np.abs(kernel).max(axis=(0, 1, 2)), _SCALE_FLOOR
            )
            w_scale = (w_absmax / 127.0).astype(np.float32)
            kernel_q = np.clip(
                np.round(kernel / w_scale), -127, 127
            ).astype(np.int8)
            q_node["kernel_q"] = kernel_q
            q_node["w_scale"] = w_scale
            q_node["act_scale"] = act_scale
            n_quantized += 1
            if strip:
                p_node["conv"]["kernel"] = np.zeros((1, 1, 1, 1), np.float32)
            return
        for k, v in p_node.items():
            if isinstance(v, dict):
                sub: Dict[str, Any] = {}
                walk(v, (c_node or {}).get(k), sub, path + (k,))
                if sub:
                    q_node[k] = sub

    walk(variables["params"], act_absmax, quant, ())
    if not n_quantized:
        raise ValueError(
            "no conv matched the calibration tree — was calibrate_activations "
            "run on the same model structure?")
    variables["quant"] = quant
    return variables


def quantize_for_serving(
    model,
    variables: Dict[str, Any],
    batches: Iterable[np.ndarray],
    *,
    skip: Sequence[str] = (),
    strip: bool = False,
    per_channel_act: bool = False,
    **apply_kwargs,
) -> Dict[str, Any]:
    """Calibrate + quantize in one call; see the two steps above."""
    absmax = calibrate_activations(model, variables, batches, **apply_kwargs)
    return quantize_variables(variables, absmax, skip=skip, strip=strip,
                              per_channel_act=per_channel_act)
