"""StreamYOLO composite model (backbone + head), TPU-native.

Capability parity with `/root/reference/exps/model/yolox.py:28-55`:

  * ``mode='off_pipe'`` — 6-channel (current ++ support) input through the
    DFP-PAFPN; in training the caller feeds the raw head outputs to
    ``losses.streamyolo_losses`` (the loss is a pure function, not module
    state); in eval the decoded per-anchor predictions are returned.
  * ``mode='on_pipe'`` — 3-channel current frame + DFP buffer carry; returns
    ``(decoded_outputs, new_buffer)``. The buffer is a pytree of three NHWC
    feature maps that stays in HBM across frames (SURVEY.md §5.7).

Unlike the torch reference there is no mutable ``self.training`` flag — the
``train`` kwarg selects the branch, so each (mode, train) pair is its own
jitted program with static shapes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from streamyolo_tpu.models.dfp_pafpn import Buffer
from streamyolo_tpu.models.heads import eval_outputs


class StreamYOLO(nn.Module):
    """Composes a DFP-PAFPN backbone and a decoupled head.

    Built by the config factories (``Exp.get_model``) exactly like the
    reference's ``YOLOX(backbone, head)`` construction
    (`/root/reference/cfgs/s_s50_onex_dfp_tal_flip.py:34-55`).
    """

    backbone: nn.Module
    head: nn.Module

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        buffer: Optional[Buffer] = None,
        mode: str = "off_pipe",
        *,
        support_shift: Optional[jax.Array] = None,
        star_mask: Optional[jax.Array] = None,
        train: bool = False,
    ):
        assert mode in ("off_pipe", "on_pipe", "seq")
        if not jnp.issubdtype(x.dtype, jnp.inexact):
            # The host pipeline ships uint8 (4x less H2D + host memory
            # traffic than float32; lossless — letterbox output is integral
            # either way). XLA fuses this cast into the stem's first read.
            x = x.astype(jnp.float32)
        if mode == "seq":
            # Sequential-dedup batched eval: one backbone pass per unique
            # frame (see DFPPAFPN mode='seq'); returns the [2,...] tail-frame
            # feature carry for the next batch.
            fpn_outs, buffer_ = self.backbone(
                x, buffer=buffer, mode="seq",
                support_shift=support_shift, train=False,
            )
            outputs = self.head(fpn_outs, train=False)
            return eval_outputs(outputs, self.head.strides), buffer_
        if mode == "off_pipe":
            fpn_outs = self.backbone(x, mode="off_pipe", train=train)
            outputs = self.head(fpn_outs, train=train)
            if train:
                # Raw per-level maps; the train step pairs them with
                # losses.streamyolo_losses (reference threads targets through
                # the head here, `yolox.py:36-47`).
                return outputs
            return eval_outputs(outputs, self.head.strides)

        fpn_outs, buffer_ = self.backbone(
            x, buffer=buffer, mode="on_pipe", star_mask=star_mask, train=train
        )
        outputs = self.head(fpn_outs, train=train)
        return eval_outputs(outputs, self.head.strides), buffer_


# Reference-surface alias (`exps/model/yolox.py` class name).
YOLOX = StreamYOLO
