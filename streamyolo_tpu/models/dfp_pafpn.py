"""DFP-PAFPN: PAFPN neck + Dual-Flow Perception fusion, TPU-native NHWC.

Capability parity with `/root/reference/exps/model/dfp_pafpn.py:13-259`:

  * ``off_pipe`` (training / batched offline eval): the input is a 6-channel
    (current ++ support) image; the shared backbone+PAFPN runs on both frames
    and the per-level outputs are fused by the ``jian{2,1,0}`` half-channel
    1x1 convs: ``concat(jian(cur), jian(sup)) + cur``
    (`dfp_pafpn.py:168-170`). A 3-channel input is self-duplicated (the
    reference's GFLOPs-count mode, `dfp_pafpn.py:234-238`).
  * ``on_pipe`` (online streaming): runs the backbone ONCE on the current
    frame and fuses with the cached previous-frame PAFPN outputs — the DFP
    buffer (`dfp_pafpn.py:177-228`). The buffer is an explicit jit-carried
    pytree of three NHWC tensors that stays resident in HBM between frames;
    ``node='star'`` (first frame) self-fuses, ``node='buffer'`` fuses with the
    carry and returns the new carry.

The upsample uses exact torch-'nearest' semantics (``ops.resize.resize_nearest``)
because at 600x960 the stride-16 level (38x60) upsamples to a 75x120 skip —
a non-integer scale the reference handles with ``F.interpolate(size=...)``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from streamyolo_tpu.models.darknet import CSPDarknet
from streamyolo_tpu.nn.blocks import BaseConv, CSPLayer, DWConv
from streamyolo_tpu.ops.resize import resize_nearest

# The DFP feature buffer: (pan_out2 /8, pan_out1 /16, pan_out0 /32), NHWC.
Buffer = Tuple[jax.Array, jax.Array, jax.Array]


class DFPPAFPN(nn.Module):
    depth: float = 1.0
    width: float = 1.0
    in_features: Sequence[str] = ("dark3", "dark4", "dark5")
    in_channels: Sequence[int] = (256, 512, 1024)
    depthwise: bool = False
    act: str = "silu"
    dtype: Any = jnp.float32
    packed: bool = True

    def setup(self):
        ic = self.in_channels
        w = self.width
        Conv = DWConv if self.depthwise else BaseConv
        kw = dict(act=self.act, dtype=self.dtype)
        csp_kw = dict(
            shortcut=False, depthwise=self.depthwise, act=self.act,
            dtype=self.dtype, packed=self.packed,
        )
        n = round(3 * self.depth)

        self.backbone = CSPDarknet(
            self.depth, w, depthwise=self.depthwise, act=self.act,
            dtype=self.dtype, packed=self.packed,
        )
        self.lateral_conv0 = BaseConv(int(ic[1] * w), 1, 1, **kw)
        self.C3_p4 = CSPLayer(int(ic[1] * w), n=n, **csp_kw)
        self.reduce_conv1 = BaseConv(int(ic[0] * w), 1, 1, **kw)
        self.C3_p3 = CSPLayer(int(ic[0] * w), n=n, **csp_kw)
        self.bu_conv2 = Conv(int(ic[0] * w), 3, 2, **kw)
        self.C3_n3 = CSPLayer(int(ic[1] * w), n=n, **csp_kw)
        self.bu_conv1 = Conv(int(ic[1] * w), 3, 2, **kw)
        self.C3_n4 = CSPLayer(int(ic[2] * w), n=n, **csp_kw)
        # DFP half-channel fusion convs (`dfp_pafpn.py:82-106`)
        self.jian2 = Conv(int(ic[0] * w) // 2, 1, 1, **kw)
        self.jian1 = Conv(int(ic[1] * w) // 2, 1, 1, **kw)
        self.jian0 = Conv(int(ic[2] * w) // 2, 1, 1, **kw)

    def pafpn(self, x: jax.Array, *, train: bool = False) -> Buffer:
        """Backbone + PAFPN on a single 3-channel frame -> per-level outputs
        (pan_out2 /8, pan_out1 /16, pan_out0 /32). Weight-shared between the
        current and support passes."""
        feats = self.backbone(x, train=train)
        x2, x1, x0 = (feats[f] for f in self.in_features)

        fpn_out0 = self.lateral_conv0(x0, train=train)  # 1024->512 /32
        f_out0 = resize_nearest(fpn_out0, x1.shape[1:3])
        f_out0 = jnp.concatenate([f_out0, x1], axis=-1)
        f_out0 = self.C3_p4(f_out0, train=train)  # 1024->512 /16

        fpn_out1 = self.reduce_conv1(f_out0, train=train)  # 512->256 /16
        f_out1 = resize_nearest(fpn_out1, x2.shape[1:3])
        f_out1 = jnp.concatenate([f_out1, x2], axis=-1)
        pan_out2 = self.C3_p3(f_out1, train=train)  # 512->256 /8

        p_out1 = self.bu_conv2(pan_out2, train=train)  # 256->256 /16
        p_out1 = jnp.concatenate([p_out1, fpn_out1], axis=-1)
        pan_out1 = self.C3_n3(p_out1, train=train)  # 512->512 /16

        p_out0 = self.bu_conv1(pan_out1, train=train)  # 512->512 /32
        p_out0 = jnp.concatenate([p_out0, fpn_out0], axis=-1)
        pan_out0 = self.C3_n4(p_out0, train=train)  # 1024->1024 /32

        return pan_out2, pan_out1, pan_out0

    def _dfp_fuse(self, cur: Buffer, sup: Buffer, *, train: bool = False) -> Buffer:
        """concat(jian(cur), jian(sup)) + cur, per level (`dfp_pafpn.py:168-170`)."""
        jians = (self.jian2, self.jian1, self.jian0)
        return tuple(
            jnp.concatenate([j(c, train=train), j(s, train=train)], axis=-1) + c
            for j, c, s in zip(jians, cur, sup)
        )

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
        if mode == "seq":
            # Sequential-video batched eval: ONE backbone pass per unique
            # frame. In dataset order, sample i's support frame is frame
            # i - support_shift[i] (ONE pairing: shift 1, or 0 at the
            # fid==0 / sequence-tail / dataset-tail boundaries; TWO pairing:
            # shift 2, degrading to 1 or 0 at its boundaries), so the support
            # features are gathered from the batch's own pafpn outputs
            # extended with a 2-frame HBM carry of the previous batch's tail.
            # Eval-only: BN uses running stats, so the outputs are identical
            # to off_pipe's two passes at half the backbone FLOPs.
            assert not train and support_shift is not None
            cur = self.pafpn(x, train=False)
            carry = (
                # First batch: duplicate frame 0 as a placeholder — real
                # datasets give their first rows shift <= row index.
                tuple(jnp.concatenate([c[:1], c[:1]], axis=0) for c in cur)
                if buffer is None
                else tuple(b.astype(c.dtype) for b, c in zip(buffer, cur))
            )
            ext = tuple(
                jnp.concatenate([k, c], axis=0) for k, c in zip(carry, cur)
            )
            rows = jnp.arange(x.shape[0]) + 2 - support_shift
            sup = tuple(e[rows] for e in ext)
            outputs = self._dfp_fuse(cur, sup, train=False)
            return outputs, tuple(e[-2:] for e in ext)
        if mode == "off_pipe":
            if x.shape[-1] == 3:  # GFLOPs-count mode: self-duplicate
                cur_img = sup_img = x
            else:
                cur_img, sup_img = x[..., :3], x[..., 3:]
            if not train:
                # Eval: ONE batched backbone pass over [cur ++ sup] — BN uses
                # running stats so the math is identical to two passes, and
                # the doubled batch tiles the MXU far better (the torch
                # reference always runs two passes, `dfp_pafpn.py:120-167`).
                b = cur_img.shape[0]
                both = self.pafpn(
                    jnp.concatenate([cur_img, sup_img], axis=0), train=False
                )
                cur = tuple(o[:b] for o in both)
                sup = tuple(o[b:] for o in both)
            else:
                # Train: two passes like the reference — batch-stat BN over a
                # jointly-batched pass would mix current/support statistics.
                cur = self.pafpn(cur_img, train=True)
                sup = self.pafpn(sup_img, train=True)
            return self._dfp_fuse(cur, sup, train=train)

        # on_pipe
        cur = self.pafpn(x, train=train)
        sup = cur if buffer is None else tuple(buffer)  # 'star' vs 'buffer' node
        if buffer is not None and star_mask is not None:
            # Per-row star selection for batched multi-stream serving: a True
            # row fuses with its own current features (a restarted stream's
            # 'star' semantics) while the others keep their buffer carry —
            # one program for any mix of fresh and running streams.
            m = star_mask.reshape(-1, 1, 1, 1)
            sup = tuple(jnp.where(m, c, s.astype(c.dtype)) for c, s in zip(cur, sup))
        outputs = self._dfp_fuse(cur, sup, train=train)
        return outputs, cur
