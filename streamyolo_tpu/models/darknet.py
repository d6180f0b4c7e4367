"""CSPDarknet backbone, TPU-native NHWC (flax.linen).

Capability parity with `/root/reference/exps/model/darknet.py:97-179`
(``CSPDarknet``): Focus stem -> dark2..dark5 (Conv + CSPLayer), SPP inside
dark5; returns the dict of dark3/dark4/dark5 feature maps (strides 8/16/32).
The legacy plain ``Darknet`` 21/53 (`darknet.py:10-94`, unused by any shipped
config) is also provided for completeness.

Sequential children are named ``<stage>_<i>`` mirroring the torch state_dict
("dark2.0" -> "dark2_0") so weight import is mechanical.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from streamyolo_tpu.nn.blocks import (
    BaseConv,
    CSPLayer,
    DWConv,
    Focus,
    ResLayer,
    SPPBottleneck,
)
from streamyolo_tpu.nn.packed import (
    PackedConvBN,
    PackedCSPLayer,
    PackedFocus,
    unpack2x2,
)


class CSPDarknet(nn.Module):
    """YOLOX CSPDarknet. ``dep_mul``/``wid_mul`` scale depth/width exactly as
    the reference (base_channels = int(wid_mul * 64),
    base_depth = max(round(dep_mul * 3), 1)).

    When ``packed`` (default) and shapes allow, the narrow high-resolution
    head of the network runs on the 2x2 phase-packed layout
    (``streamyolo_tpu.nn.packed``): the stem when 4 * base_channels <= 192
    (it stops paying at l width, see inline note), and the whole dark2
    stage when 4 * base_channels <= 128 lanes. Mathematically identical,
    identical parameter tree — purely an execution-layout choice."""

    dep_mul: float
    wid_mul: float
    out_features: Sequence[str] = ("dark3", "dark4", "dark5")
    depthwise: bool = False
    act: str = "silu"
    dtype: Any = jnp.float32
    packed: bool = True

    @nn.compact
    def __call__(
        self, x: jax.Array, *, train: bool = False
    ) -> Dict[str, jax.Array]:
        assert self.out_features, "please provide output features of Darknet"
        Conv = DWConv if self.depthwise else BaseConv

        base_channels = int(self.wid_mul * 64)
        base_depth = max(round(self.dep_mul * 3), 1)
        kw = dict(
            depthwise=self.depthwise, act=self.act, dtype=self.dtype,
            packed=self.packed,
        )
        pkw = dict(act=self.act, dtype=self.dtype)

        h, w = x.shape[-3], x.shape[-2]
        # Packing pays when the raw layout wastes lanes: measured, the stem
        # pack wins 1.5x (s, 4*32=128 exact) and 1.16x (m, 4*48=192 vs 48
        # padded 2.7x), but costs ~3% for l (4*64=256 — raw 64ch already
        # half-fills lanes and packing doubles the contraction padding).
        pack_stem = (
            self.packed and not self.depthwise and h % 4 == 0 and w % 4 == 0
            and base_channels * 4 <= 192
        )
        pack_dark2 = (
            pack_stem and base_channels * 4 <= 128
            and h % 8 == 0 and w % 8 == 0
        )

        outputs: Dict[str, jax.Array] = {}

        if pack_stem:
            x = PackedFocus(
                base_channels, ksize=3, act=self.act, dtype=self.dtype, name="stem"
            )(x, train=train)
        else:
            # fast=self.packed: packed=False must yield a fully raw execution
            # (no transformed-kernel paths), for layout-numerics bisection.
            x = Focus(
                base_channels, ksize=3, act=self.act, dtype=self.dtype,
                fast=self.packed, name="stem",
            )(x, train=train)
        if "stem" in self.out_features:
            outputs["stem"] = unpack2x2(x) if pack_stem else x

        # dark2: stride-2 conv + CSP(n=base_depth)
        if pack_dark2:
            x = PackedConvBN(base_channels * 2, 3, 2, name="dark2_0", **pkw)(
                x, train=train
            )
            x = PackedCSPLayer(base_channels * 2, n=base_depth, name="dark2_1", **pkw)(
                x, train=train
            )
            if "dark2" in self.out_features:
                outputs["dark2"] = unpack2x2(x)
            # dark3 entry consumes the packed features, emits raw layout
            x = PackedConvBN(
                base_channels * 4, 3, 2, packed_out=False, name="dark3_0", **pkw
            )(x, train=train)
        else:
            if pack_stem:
                x = PackedConvBN(
                    base_channels * 2, 3, 2, packed_out=False, name="dark2_0", **pkw
                )(x, train=train)
            else:
                x = Conv(
                    base_channels * 2, 3, 2, act=self.act, dtype=self.dtype,
                    name="dark2_0",
                )(x, train=train)
            x = CSPLayer(base_channels * 2, n=base_depth, name="dark2_1", **kw)(
                x, train=train
            )
            if "dark2" in self.out_features:
                outputs["dark2"] = x
            x = Conv(
                base_channels * 4, 3, 2, act=self.act, dtype=self.dtype,
                name="dark3_0",
            )(x, train=train)
        x = CSPLayer(base_channels * 4, n=base_depth * 3, name="dark3_1", **kw)(
            x, train=train
        )
        outputs["dark3"] = x

        # dark4: stride-2 conv + CSP(n=base_depth * 3)
        x = Conv(base_channels * 8, 3, 2, act=self.act, dtype=self.dtype, name="dark4_0")(
            x, train=train
        )
        x = CSPLayer(base_channels * 8, n=base_depth * 3, name="dark4_1", **kw)(
            x, train=train
        )
        outputs["dark4"] = x

        # dark5: stride-2 conv + SPP + CSP(n=base_depth, no shortcut)
        x = Conv(base_channels * 16, 3, 2, act=self.act, dtype=self.dtype, name="dark5_0")(
            x, train=train
        )
        x = SPPBottleneck(
            base_channels * 16, activation=self.act, dtype=self.dtype, name="dark5_1"
        )(x, train=train)
        x = CSPLayer(
            base_channels * 16, n=base_depth, shortcut=False, name="dark5_2", **kw
        )(x, train=train)
        outputs["dark5"] = x

        return {k: v for k, v in outputs.items() if k in self.out_features}


class Darknet(nn.Module):
    """Legacy plain Darknet 21/53 (`/root/reference/exps/model/darknet.py:10-94`).

    Kept for component-inventory completeness; no shipped config uses it.
    """

    depth: int
    stem_out_channels: int = 32
    out_features: Sequence[str] = ("dark3", "dark4", "dark5")
    dtype: Any = jnp.float32

    DEPTH2BLOCKS = {21: (1, 2, 2, 1), 53: (2, 8, 8, 4)}

    def _group(
        self, x: jax.Array, in_ch: int, num_blocks: int, stride: int, prefix: str, train: bool
    ) -> Tuple[jax.Array, int]:
        x = BaseConv(
            in_ch * 2, 3, stride, act="lrelu", dtype=self.dtype, name=f"{prefix}_0"
        )(x, train=train)
        for i in range(num_blocks):
            x = ResLayer(in_ch * 2, dtype=self.dtype, name=f"{prefix}_{i + 1}")(
                x, train=train
            )
        return x, in_ch * 2

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> Dict[str, jax.Array]:
        assert self.out_features, "please provide output features of Darknet"
        num_blocks = Darknet.DEPTH2BLOCKS[self.depth]
        outputs: Dict[str, jax.Array] = {}

        x = BaseConv(
            self.stem_out_channels, 3, 1, act="lrelu", dtype=self.dtype, name="stem_0"
        )(x, train=train)
        # stem group layer (1 block, stride 2); children continue stem_<i>
        x = BaseConv(
            self.stem_out_channels * 2, 3, 2, act="lrelu", dtype=self.dtype, name="stem_1"
        )(x, train=train)
        x = ResLayer(self.stem_out_channels * 2, dtype=self.dtype, name="stem_2")(
            x, train=train
        )
        outputs["stem"] = x
        in_ch = self.stem_out_channels * 2

        x, in_ch = self._group(x, in_ch, num_blocks[0], 2, "dark2", train)
        outputs["dark2"] = x
        x, in_ch = self._group(x, in_ch, num_blocks[1], 2, "dark3", train)
        outputs["dark3"] = x
        x, in_ch = self._group(x, in_ch, num_blocks[2], 2, "dark4", train)
        outputs["dark4"] = x
        x, in_ch = self._group(x, in_ch, num_blocks[3], 2, "dark5", train)
        # SPP block tail (`darknet.py:67-82`)
        x = BaseConv(in_ch, 1, 1, act="lrelu", dtype=self.dtype, name="dark5_spp_0")(
            x, train=train
        )
        x = BaseConv(in_ch * 2, 3, 1, act="lrelu", dtype=self.dtype, name="dark5_spp_1")(
            x, train=train
        )
        x = SPPBottleneck(in_ch, activation="lrelu", dtype=self.dtype, name="dark5_spp_2")(
            x, train=train
        )
        x = BaseConv(in_ch * 2, 3, 1, act="lrelu", dtype=self.dtype, name="dark5_spp_3")(
            x, train=train
        )
        x = BaseConv(in_ch, 1, 1, act="lrelu", dtype=self.dtype, name="dark5_spp_4")(
            x, train=train
        )
        outputs["dark5"] = x

        return {k: v for k, v in outputs.items() if k in self.out_features}
