"""Canonical YOLOX-style conv blocks, TPU-native (NHWC, flax.linen).

Functional re-design of the block vocabulary consumed by the reference model
(`/root/reference/exps/model/darknet.py:7`, `dfp_pafpn.py:10`, `tal_head.py:16`
import these from the external ``yolox==0.3`` package — see SURVEY.md §2.3):
``BaseConv`` (conv + BN + SiLU), ``DWConv``, ``Bottleneck``, ``CSPLayer``,
``Focus`` (space-to-depth stem), ``SPPBottleneck``, ``ResLayer``.

TPU-first decisions:
  * NHWC activations / HWIO kernels everywhere — the native XLA:TPU layout, so
    convs tile straight onto the MXU without transposes.
  * BN is kept as a separate affine op during training (XLA fuses
    conv+BN+SiLU into one kernel); for serving, ``fold_conv_bn`` in
    ``streamyolo_tpu.utils.fuse`` folds BN into conv weights ahead of time
    (the analogue of ``yolox.utils.fuse_model``, used at
    `/root/reference/tools/eval.py:175-177`).
  * Submodule names mirror the reference state_dict paths (with ``.N`` list
    indices flattened to ``_N``) so that the torch weight importer
    (``streamyolo_tpu.utils.torch_import``) is a pure mechanical mapping.

BatchNorm defaults match the reference override applied to every model config
(eps=1e-3, torch momentum=0.03 ⇒ flax momentum=0.97,
`/root/reference/cfgs/s_s50_onex_dfp_tal_flip.py:40-44`).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Reference BN hyperparams: torch BatchNorm2d(eps=1e-3, momentum=0.03).
# torch's `momentum` is the weight of the *new* batch statistic; flax's is the
# weight of the *old* running statistic, hence 1 - 0.03.
BN_EPS = 1e-3
BN_MOMENTUM = 0.97


def get_activation(name: str = "silu") -> Callable[[jax.Array], jax.Array]:
    if name == "silu":
        return jax.nn.silu
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.1)
    raise AttributeError(f"Unsupported act type: {name}")


class BaseConv(nn.Module):
    """Conv2d(bias=False) -> BatchNorm -> activation ("CBS" block).

    Equivalent capability to yolox ``BaseConv`` (SURVEY.md §2.3). Padding is
    the torch convention ``(ksize - 1) // 2`` so spatial dims follow
    ``ceil(H / stride)`` exactly like the reference.

    Two optional serving hooks (``streamyolo_tpu.quant.ptq``):

      * calibration — when a mutable ``'calib'`` collection is present, the
        block sows its input absmax (a static Python check, so the normal
        apply compiles nothing extra);
      * int8 — when the ``'quant'`` collection carries ``kernel_q`` (int8
        HWIO) + ``w_scale`` (per-out-channel) + ``act_scale`` (per-tensor)
        for this block, the conv runs as an int8xint8->int32 MXU conv with
        the dequant multiply in the epilogue, replacing the bf16/f32
        ``nn.Conv``. BN (identity-with-bias after folding) and the
        activation stay in ``self.dtype``.
    """

    out_channels: int
    ksize: int
    stride: int = 1
    groups: int = 1
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        pad = (self.ksize - 1) // 2
        # not during init: every collection is mutable there, and the sown
        # scalar would pollute the canonical variables tree
        if not self.is_initializing() and self.is_mutable_collection("calib"):
            # per-INPUT-channel absmax [C]: the per-tensor scale is its max,
            # and quantize_variables(per_channel_act=True) can fold the
            # whole vector into the kernel (ptq.py) — one sow serves both
            self.sow(
                "calib", "in_absmax",
                jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(0, 1, 2)),
                init_fn=lambda: jnp.zeros(x.shape[-1], jnp.float32),
                reduce_fn=jnp.maximum,
            )
        if self.has_variable("quant", "kernel_q"):
            if train:
                raise ValueError(
                    "int8 PTQ variables are serving-only: the round/clip "
                    "in the quantized conv has zero gradient, so training "
                    "through it would silently learn nothing — fine-tune "
                    "with the fp variables and re-quantize")
            x = self._int8_conv(x, pad)
        else:
            x = nn.Conv(
                features=self.out_channels,
                kernel_size=(self.ksize, self.ksize),
                strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)),
                feature_group_count=self.groups,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        return get_activation(self.act)(x)

    def _int8_conv(self, x: jax.Array, pad: int) -> jax.Array:
        """Symmetric int8 conv: x/act_scale and kernel_q are int8, the MXU
        accumulates int32, and the combined (act_scale * w_scale[c]) dequant
        rides the epilogue. ``quant/ptq.py`` builds the collection.

        ``act_scale`` is a scalar (per-tensor) or a [C_in] vector
        (per-channel, broadcast over NHWC's last dim); in the vector case
        the channel scales are already folded into ``kernel_q``, so the
        epilogue multiplies by ``w_scale`` alone."""
        kq = self.get_variable("quant", "kernel_q")
        w_scale = self.get_variable("quant", "w_scale")
        act_scale = self.get_variable("quant", "act_scale")
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / act_scale), -127, 127
        ).astype(jnp.int8)
        dn = jax.lax.conv_dimension_numbers(
            xq.shape, kq.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            xq, kq,
            window_strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=dn,
            feature_group_count=self.groups,
            preferred_element_type=jnp.int32,
        )
        mult = w_scale if jnp.ndim(act_scale) else act_scale * w_scale
        return (y.astype(jnp.float32) * mult).astype(self.dtype)


class DWConv(nn.Module):
    """Depthwise conv followed by pointwise conv (yolox ``DWConv``)."""

    out_channels: int
    ksize: int
    stride: int = 1
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        in_channels = x.shape[-1]
        x = BaseConv(
            out_channels=in_channels,
            ksize=self.ksize,
            stride=self.stride,
            groups=in_channels,
            act=self.act,
            dtype=self.dtype,
            name="dconv",
        )(x, train=train)
        x = BaseConv(
            out_channels=self.out_channels,
            ksize=1,
            stride=1,
            act=self.act,
            dtype=self.dtype,
            name="pconv",
        )(x, train=train)
        return x


class Bottleneck(nn.Module):
    """1x1 reduce -> 3x3 conv, optional residual (yolox ``Bottleneck``)."""

    out_channels: int
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        in_channels = x.shape[-1]
        hidden = int(self.out_channels * self.expansion)
        y = BaseConv(hidden, 1, 1, act=self.act, dtype=self.dtype, name="conv1")(
            x, train=train
        )
        conv2_cls = DWConv if self.depthwise else BaseConv
        y = conv2_cls(self.out_channels, 3, 1, act=self.act, dtype=self.dtype, name="conv2")(
            y, train=train
        )
        if self.shortcut and in_channels == self.out_channels:
            y = y + x
        return y


class ResLayer(nn.Module):
    """Residual 1x1 -> 3x3 block with lrelu (yolox ``ResLayer``; used by the
    legacy plain ``Darknet`` 21/53, `/root/reference/exps/model/darknet.py:10-94`)."""

    in_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        mid = self.in_channels // 2
        y = BaseConv(mid, 1, 1, act="lrelu", dtype=self.dtype, name="layer1")(
            x, train=train
        )
        y = BaseConv(self.in_channels, 3, 1, act="lrelu", dtype=self.dtype, name="layer2")(
            y, train=train
        )
        return x + y


class CSPLayer(nn.Module):
    """Cross-Stage-Partial layer: two 1x1 branches, ``n`` bottlenecks on one,
    concat, 1x1 fuse (yolox ``CSPLayer`` / "C3").

    When ``packed`` (default) and the hidden width is <= 64 channels on an
    even-W feature map, the internals execute W-packed (factor 2) via
    ``streamyolo_tpu.nn.packed.csp_packed_body``: raw input/output, same
    parameter tree, mathematically identical — the hidden branches (which
    raw layout pads 2x to 128 lanes) run dense. At 600x960 this engages on
    dark3_1 and C3_p3 for the s width (hidden 64) and on dark2_1 for the
    m/l widths (hidden 48/64); wider CSPs (hidden >= 96) keep the raw
    layout.
    """

    out_channels: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    dtype: Any = jnp.float32
    packed: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        hidden = int(self.out_channels * self.expansion)
        if (
            self.packed
            and not self.depthwise
            and 1 <= hidden <= 64
            and x.shape[-2] % 2 == 0
        ):
            from streamyolo_tpu.nn import packed as pk

            y = pk.csp_packed_body(
                x,
                out_channels=self.out_channels,
                n=self.n,
                shortcut=self.shortcut,
                expansion=self.expansion,
                act=self.act,
                axes=(False, True),
                packed_input=False,
                dtype=self.dtype,
                train=train,
            )
            return pk.unpack_w(y)
        x1 = BaseConv(hidden, 1, 1, act=self.act, dtype=self.dtype, name="conv1")(
            x, train=train
        )
        x2 = BaseConv(hidden, 1, 1, act=self.act, dtype=self.dtype, name="conv2")(
            x, train=train
        )
        for i in range(self.n):
            x1 = Bottleneck(
                hidden,
                shortcut=self.shortcut,
                expansion=1.0,
                depthwise=self.depthwise,
                act=self.act,
                dtype=self.dtype,
                name=f"m_{i}",
            )(x1, train=train)
        x = jnp.concatenate([x1, x2], axis=-1)
        return BaseConv(
            self.out_channels, 1, 1, act=self.act, dtype=self.dtype, name="conv3"
        )(x, train=train)


class SPPBottleneck(nn.Module):
    """Spatial pyramid pooling: 1x1 reduce, parallel maxpools (5/9/13, stride
    1, same padding), concat, 1x1 fuse (yolox ``SPPBottleneck``)."""

    out_channels: int
    kernel_sizes: Sequence[int] = (5, 9, 13)
    activation: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        in_channels = x.shape[-1]
        hidden = in_channels // 2
        x = BaseConv(hidden, 1, 1, act=self.activation, dtype=self.dtype, name="conv1")(
            x, train=train
        )
        pools = [
            nn.max_pool(
                x,
                window_shape=(k, k),
                strides=(1, 1),
                padding=((k // 2, k // 2), (k // 2, k // 2)),
            )
            for k in self.kernel_sizes
        ]
        x = jnp.concatenate([x] + pools, axis=-1)
        return BaseConv(
            self.out_channels, 1, 1, act=self.activation, dtype=self.dtype, name="conv2"
        )(x, train=train)


def space_to_depth_focus(x: jax.Array) -> jax.Array:
    """2x2 space-to-depth with the yolox ``Focus`` channel ordering:
    [top-left, bottom-left, top-right, bottom-right] along channels."""
    tl = x[..., ::2, ::2, :]
    bl = x[..., 1::2, ::2, :]
    tr = x[..., ::2, 1::2, :]
    br = x[..., 1::2, 1::2, :]
    return jnp.concatenate([tl, bl, tr, br], axis=-1)


class _FocusStemConv(nn.Module):
    """The Focus convolution applied directly to the RAW image as the
    mathematically identical (2k)x(2k) stride-2 convolution.

    Declares the SAME ``kernel`` parameter as the ``nn.Conv`` it replaces
    (shape [k, k, 4*C, F], torch-import/checkpoint compatible) and gathers it
    into the equivalent doubled kernel at apply time. Why: the slice-concat
    space-to-depth plus a conv on a 12-channel map is lane-starved on TPU
    (C=3/12 against 128-lane tiles) — measured 5.5x slower than this
    formulation at 600x960. Exactness: with the Focus channel order
    (tl,bl,tr,br) = (p,q) in ((0,0),(1,0),(0,1),(1,1)),

      out[I,J,o] = sum_{di,dj,p,q,c} x[2(I+di-pad)+p, 2(J+dj-pad)+q, c]
                                     * K[di, dj, (p+2q)*C + c, o]
                 = conv2d(x, K6, stride 2, pad 2*pad),
      K6[2di+p, 2dj+q, c, o] = K[di, dj, (p+2q)*C + c, o].
    """

    features: int
    ksize: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        k = self.ksize
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, 4 * c, self.features),
            jnp.float32,
        )
        # [di, dj, (p + 2q)*C + c, o] -> [2di+p, 2dj+q, c, o]
        k6 = kernel.reshape(k, k, 2, 2, c, self.features)  # (di, dj, q, p, c, o)
        k6 = k6.transpose(0, 3, 1, 2, 4, 5).reshape(
            2 * k, 2 * k, c, self.features
        )
        pad = 2 * ((k - 1) // 2)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, k6.shape, ("NHWC", "HWIO", "NHWC")
        )
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            k6.astype(self.dtype),
            (2, 2),
            ((pad, pad), (pad, pad)),
            dimension_numbers=dn,
        )


class _FocusCBS(nn.Module):
    """BaseConv twin for the Focus fast path: identical child names
    ("conv" kernel + "bn"), conv swapped for ``_FocusStemConv``."""

    out_channels: int
    ksize: int
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = _FocusStemConv(
            self.out_channels, self.ksize, dtype=self.dtype, name="conv"
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        return get_activation(self.act)(x)


class Focus(nn.Module):
    """Focus stem: lossless 2x downsample via space-to-depth, then conv
    (yolox ``Focus``). Turns (B, H, W, C) into (B, H/2, W/2, out).

    On even-sized inputs with stride 1 (every real use) this runs as the
    equivalent (2k)x(2k) stride-2 conv on the raw image (``_FocusStemConv``);
    the parameter tree is identical in both branches, so a model initialized
    either way runs either way. ``fast=False`` forces the literal
    space-to-depth + conv formulation (the backbone threads its ``packed``
    flag here, so ``CSPDarknet(packed=False)`` is a fully raw execution for
    layout-numerics bisection)."""

    out_channels: int
    ksize: int = 1
    stride: int = 1
    act: str = "silu"
    dtype: Any = jnp.float32
    fast: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        h, w = x.shape[-3], x.shape[-2]
        if self.fast and self.stride == 1 and h % 2 == 0 and w % 2 == 0:
            return _FocusCBS(
                self.out_channels,
                self.ksize,
                act=self.act,
                dtype=self.dtype,
                name="conv",
            )(x, train=train)
        x = space_to_depth_focus(x)
        return BaseConv(
            self.out_channels,
            self.ksize,
            self.stride,
            act=self.act,
            dtype=self.dtype,
            name="conv",
        )(x, train=train)
