"""Conv+BN folding for serving (the analogue of ``yolox.utils.fuse_model``,
used at `/root/reference/tools/eval.py:175-177`).

On TPU, XLA already fuses the eval-mode BatchNorm affine into the conv's
epilogue, so this fold mostly removes a VPU elementwise pass; it exists for
surface parity (``--fuse``) and for exporting fused weights.

Mechanics: every block in our tree pairs ``conv/kernel`` (HWIO, bias-free)
with a sibling ``bn`` (scale, bias + batch_stats mean, var). Folding scales
the kernel's output channels by s = scale / sqrt(var + eps) and rewrites the
BN to an identity-with-bias: mean'=0, var'=1-eps, scale'=1,
bias' = bias - mean * s — numerically identical to the unfused model, with
no module surgery required.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from streamyolo_tpu.nn.blocks import BN_EPS


def _fold_node(params_node: Dict[str, Any], stats_node: Dict[str, Any]):
    kernel = np.asarray(params_node["conv"]["kernel"])
    scale = np.asarray(params_node["bn"]["scale"])
    bias = np.asarray(params_node["bn"]["bias"])
    mean = np.asarray(stats_node["bn"]["mean"])
    var = np.asarray(stats_node["bn"]["var"])

    s = scale / np.sqrt(var + BN_EPS)
    params_node["conv"]["kernel"] = (kernel * s[None, None, None, :]).astype(
        kernel.dtype
    )
    params_node["bn"]["scale"] = np.ones_like(scale)
    params_node["bn"]["bias"] = (bias - mean * s).astype(bias.dtype)
    stats_node["bn"]["mean"] = np.zeros_like(mean)
    stats_node["bn"]["var"] = np.full_like(var, 1.0 - BN_EPS)


def fuse_model_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Return a new variables dict with every conv+BN pair folded."""
    import copy

    variables = copy.deepcopy(
        {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        }
    )

    def walk(p_node, s_node):
        if isinstance(p_node, dict):
            if "conv" in p_node and "bn" in p_node and s_node and "bn" in s_node:
                _fold_node(p_node, s_node)
            for k, v in p_node.items():
                if isinstance(v, dict):
                    walk(v, (s_node or {}).get(k))

    walk(variables["params"], variables["batch_stats"])
    return variables
