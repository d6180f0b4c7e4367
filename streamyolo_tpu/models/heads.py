"""Decoupled YOLOX detection head (TAL / PIPE variants), TPU-native NHWC.

Capability parity with `/root/reference/exps/model/tal_head.py:19-260` and
`pipe_head.py:19` (the two share an identical conv trunk; they differ only in
the loss, which lives in ``streamyolo_tpu.models.losses`` as pure functions):

  * per FPN level: 1x1 stem -> (2x 3x3 cls branch, 2x 3x3 reg branch) ->
    1x1 cls / reg / obj prediction convs (`tal_head.py:55-131`);
  * cls/obj prediction biases initialized to ``-log((1-p)/p)`` with
    prior_prob p = 1e-2 (`tal_head.py:141-150`, applied by every config at
    `cfgs/s_s50_onex_dfp_tal_flip.py:53`);
  * inference decode: per-anchor ``xy = (pred + grid) * stride``,
    ``wh = exp(pred) * stride`` (`tal_head.py:245-260`).

The head module is *pure conv compute* — it returns raw per-level maps. The
flatten/decode helpers below are pure functions of static shapes so both the
training loss and the serving path stay inside one jitted program with no
host round-trips.
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from streamyolo_tpu.nn.blocks import BaseConv, DWConv


class YOLOXHead(nn.Module):
    """Shared decoupled head trunk. Returns, per level, the raw NHWC map
    ``[B, H, W, 4 + 1 + num_classes]`` ordered (reg, obj, cls) to match the
    reference channel concat (`tal_head.py:173,203`)."""

    num_classes: int
    width: float = 1.0
    strides: Sequence[int] = (8, 16, 32)
    in_channels: Sequence[int] = (256, 512, 1024)
    act: str = "silu"
    depthwise: bool = False
    prior_prob: float = 1e-2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xin: Sequence[jax.Array], *, train: bool = False) -> List[jax.Array]:
        Conv = DWConv if self.depthwise else BaseConv
        feat_ch = int(256 * self.width)
        bias_val = -math.log((1 - self.prior_prob) / self.prior_prob)
        pred_kw = dict(
            kernel_size=(1, 1),
            strides=(1, 1),
            padding="VALID",
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )

        outputs = []
        for k, x in enumerate(xin):
            x = BaseConv(feat_ch, 1, 1, act=self.act, dtype=self.dtype, name=f"stems_{k}")(
                x, train=train
            )
            cls_feat = x
            for i in range(2):
                cls_feat = Conv(
                    feat_ch, 3, 1, act=self.act, dtype=self.dtype, name=f"cls_convs_{k}_{i}"
                )(cls_feat, train=train)
            cls_output = nn.Conv(
                features=self.num_classes,
                bias_init=nn.initializers.constant(bias_val),
                name=f"cls_preds_{k}",
                **pred_kw,
            )(cls_feat)

            reg_feat = x
            for i in range(2):
                reg_feat = Conv(
                    feat_ch, 3, 1, act=self.act, dtype=self.dtype, name=f"reg_convs_{k}_{i}"
                )(reg_feat, train=train)
            reg_output = nn.Conv(features=4, name=f"reg_preds_{k}", **pred_kw)(reg_feat)
            obj_output = nn.Conv(
                features=1,
                bias_init=nn.initializers.constant(bias_val),
                name=f"obj_preds_{k}",
                **pred_kw,
            )(reg_feat)

            outputs.append(
                jnp.concatenate([reg_output, obj_output, cls_output], axis=-1)
            )
        return outputs


class TALHead(YOLOXHead):
    """TAL head = trunk + Trend-Aware Loss hyperparams (`tal_head.py:19-40`).
    The TAL weighting itself is applied in ``losses.streamyolo_losses``."""

    gamma: float = 1.5
    ignore_thr: float = 0.2
    ignore_value: float = 0.2


class PIPEHead(YOLOXHead):
    """Plain YOLOX head used by the still-frame config
    (`/root/reference/exps/model/pipe_head.py:19`; no trend weighting)."""


def level_grids(
    hw: Sequence[Tuple[int, int]], strides: Sequence[int]
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static anchor-point bookkeeping for a set of level shapes.

    Returns (grid_xy [N,2], expanded_strides [N], level_id [N]) as NumPy —
    constants folded into the jitted program. Anchor order is row-major per
    level, levels concatenated in stride order, matching the reference
    flatten (`tal_head.py:211-215`, `:245-260`).
    """
    xs, ss, lids = [], [], []
    for lid, ((h, w), s) in enumerate(zip(hw, strides)):
        yv, xv = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        xs.append(np.stack([xv.reshape(-1), yv.reshape(-1)], axis=-1))
        ss.append(np.full((h * w,), s))
        lids.append(np.full((h * w,), lid))
    return (
        np.concatenate(xs, 0).astype(np.float32),
        np.concatenate(ss, 0).astype(np.float32),
        np.concatenate(lids, 0),
    )


def flatten_levels(outputs: Sequence[jax.Array]) -> jax.Array:
    """Per-level NHWC maps -> [B, N_total, C]; NHWC reshape yields the same
    row-major anchor order as the reference CHW flatten+permute."""
    return jnp.concatenate(
        [o.reshape(o.shape[0], -1, o.shape[-1]) for o in outputs], axis=1
    )


def decode_outputs(
    flat: jax.Array, grid_xy: jax.Array, strides: jax.Array
) -> jax.Array:
    """Decode raw flattened predictions [B, N, 5+C] to image coordinates:
    box = (cx, cy, w, h); obj/cls channels pass through unchanged
    (`tal_head.py:245-260`)."""
    strides = strides[None, :, None]
    xy = (flat[..., :2] + grid_xy[None]) * strides
    wh = jnp.exp(flat[..., 2:4]) * strides
    return jnp.concatenate([xy, wh, flat[..., 4:]], axis=-1)


def eval_outputs(
    outputs: Sequence[jax.Array], strides: Sequence[int]
) -> jax.Array:
    """Full inference post-head pipeline: sigmoid obj/cls, flatten, decode.
    Matches the reference eval branch (`tal_head.py:203-218`)."""
    hw = [o.shape[1:3] for o in outputs]
    grid_xy, exp_strides, _ = level_grids(hw, strides)
    flat = flatten_levels(outputs)
    flat = jnp.concatenate(
        [flat[..., :4], jax.nn.sigmoid(flat[..., 4:])], axis=-1
    )
    return decode_outputs(flat, jnp.asarray(grid_xy), jnp.asarray(exp_strides))
