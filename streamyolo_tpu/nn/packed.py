"""Phase-packed (2x2 space-to-depth) execution of sub-128-channel stages.

The v5e MXU/VPU tiles activations as (8 sublanes, 128 lanes): every channel
count C < 128 is padded to 128 in both compute and HBM layout, so the
narrow high-resolution trunk stages (32/64 channels for the s/l widths at
600x960 — `/root/reference/exps/model/darknet.py:97-141`) pay full-lane
memory traffic and MXU occupancy for a fraction of the useful FLOPs.

This module executes those stages on a 2x2 space-to-depth *packed* layout:
an activation (B, H, W, C) is carried as (B, H/2, W/2, 4C) using the Focus
phase order (tl, bl, tr, br), i.e. packed channel index (p + 2q)*C + c for
row phase p, column phase q. 4C fills the 128 lanes, quartering both the
padded MACs and the padded HBM traffic of the narrow stages.

Every conv stays MATHEMATICALLY IDENTICAL: modules declare the same
canonical raw-layout ``kernel`` parameter as the ``nn.Conv`` they replace
(torch-import/checkpoint compatible) and gather it at apply time into the
equivalent kernel over packed operands — the same trick as
``blocks._FocusStemConv``. Derivation, per spatial axis (they separate):

  raw:     y[m] = sum_i x[stride*m + i - pad] * K[i]
  packed:  x[r] = xp[r // 2, r mod 2]   and/or   y[m] = yp[m // 2, m mod 2]

Substituting m = 2M + h (packed output phase h) and r = 2R + g (packed
input phase g) turns the raw conv into a conv over packed coordinates with
stride' = stride * (2 if packed_out else 1) / (2 if packed_in else 1) and a
gathered kernel K'[u, g, h] = K[i] where the integer tap algebra (built
once in numpy by ``_axis_plan``) decides which (u, g, h, i) combinations
are live. BatchNorm commutes with packing (the per-channel value multiset
is unchanged); ``PackedBatchNorm`` computes the raw moments on the packed
layout and keeps flax ``BatchNorm``'s exact variable layout.

Used by ``models.darknet.CSPDarknet``: the stem always emits packed
features when shapes allow, and the whole dark2 stage stays packed when
4 * base_channels <= 128 (width <= 0.50). Measured win documented in
README.md's roofline section.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from streamyolo_tpu.nn.blocks import BN_EPS, BN_MOMENTUM, get_activation


def _pair(flag) -> Tuple[int, int]:
    """Normalize a per-axis pack spec to integer factors: bool -> 1/2,
    int -> itself, tuple -> per-axis. A factor f means the axis is carried
    f-fold space-to-depth packed (factor 1 = unpacked)."""
    def one(v) -> int:
        if isinstance(v, bool):
            return 2 if v else 1
        return int(v)

    if isinstance(flag, (tuple, list)):
        return (one(flag[0]), one(flag[1]))
    return (one(flag), one(flag))


def _factor(flag) -> int:
    """Channel multiplication factor of a pack spec."""
    fh, fw = _pair(flag)
    return fh * fw


def pack2x2(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), Focus phase order (p + 2q)*C + c."""
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)  # (b, I, p, J, q, c)
    y = y.transpose(0, 1, 3, 4, 2, 5)  # (b, I, J, q, p, c)
    return y.reshape(b, h // 2, w // 2, 4 * c)


def unpack2x2(x: jax.Array) -> jax.Array:
    """Inverse of :func:`pack2x2`."""
    b, hp, wp, c4 = x.shape
    c = c4 // 4
    y = x.reshape(b, hp, wp, 2, 2, c)  # (b, I, J, q, p, c)
    y = y.transpose(0, 1, 4, 2, 3, 5)  # (b, I, p, J, q, c)
    return y.reshape(b, 2 * hp, 2 * wp, c)


def pack_grid(x: jax.Array, fr: int, fc: int) -> jax.Array:
    """(B, H, W, C) -> (B, H/fr, W/fc, fr*fc*C) general space-to-depth with
    the phase-conv channel convention (q*fr + p)*C + c (q = column phase,
    p = row phase) — :func:`pack2x2` is ``pack_grid(x, 2, 2)``."""
    b, h, w, c = x.shape
    y = x.reshape(b, h // fr, fr, w // fc, fc, c)  # (b, I, p, J, q, c)
    y = y.transpose(0, 1, 3, 4, 2, 5)  # (b, I, J, q, p, c)
    return y.reshape(b, h // fr, w // fc, fr * fc * c)


def pack_w(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H, W/2, 2C): W-only packing, channel index
    q*C + c. A pure row-major reshape — no data movement at the logical
    level (the physical relayout to dense lanes is the point)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def unpack_w(x: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_w` (pure reshape)."""
    b, h, wp, c2 = x.shape
    return x.reshape(b, h, 2 * wp, c2 // 2)


@functools.lru_cache(maxsize=None)
def _axis_plan(
    k: int, stride: int, pad: int, f_in: int, f_out: int
) -> Tuple[np.ndarray, int, int]:
    """1-D tap algebra for integer pack factors: selection tensor
    S[u, g, h, i] (1.0 where the packed kernel position u, input phase g,
    output phase h takes raw tap i), plus (stride_eff, pad_lo_eff) for the
    packed-coordinate convolution.

    Derivation (raw y[m] = sum_i x[stride*m + i - pad] K[i]; x[r] =
    xp[r // f_in, r % f_in]; y[m] = yp[m // f_out, m % f_out]): substituting
    m = f_out*M + h gives raw input index r = (stride*f_out)*M +
    (stride*h + i - pad), so the packed stride is stride*f_out / f_in —
    which must divide evenly for the input phase to be independent of M."""
    a_coef = stride * f_out
    if a_coef % f_in:
        raise ValueError(
            f"unsupported packed conv: k={k} stride={stride} "
            f"f_in={f_in} f_out={f_out} (stride*f_out % f_in != 0)"
        )
    stride_eff = a_coef // f_in
    entries = []  # (shift, g, h, i)
    for h in range(f_out):
        for i in range(k):
            c0 = stride * h + i - pad
            g = c0 % f_in
            entries.append(((c0 - g) // f_in, g, h, i))
    pad_lo = -min(e[0] for e in entries)
    u_size = max(e[0] for e in entries) + pad_lo + 1
    s = np.zeros((u_size, f_in, f_out, k), np.float32)
    for shift, g, h, i in entries:
        s[shift + pad_lo, g, h, i] = 1.0
    return s, stride_eff, pad_lo


def _gather_kernel(
    kernel: jax.Array,
    stride: int,
    pad: int,
    packed_in,
    packed_out,
) -> Tuple[jax.Array, Tuple[int, int], Tuple[int, int]]:
    """Gather raw K[kh, kw, C, F] into the packed-coordinate kernel
    K'[U, V, G*C, H*F]; returns (K', per-axis stride_eff, per-axis pad_lo).
    ``packed_in``/``packed_out`` are per-axis (H, W) pack specs — bool or
    2-tuple — so W-only (factor 2) packing uses the same algebra with the
    row-phase axis collapsed to size 1."""
    pin, pout = _pair(packed_in), _pair(packed_out)
    kh, kw, c, f = kernel.shape
    sr, stride_r, pad_r = _axis_plan(kh, stride, pad, pin[0], pout[0])
    sc, stride_c, pad_c = _axis_plan(kw, stride, pad, pin[1], pout[1])
    # channel order (p + P*q)*C + c == flatten of (q, p, c); ditto outputs.
    k_eff = jnp.einsum("upri,vqsj,ijcf->uvqpcsrf", sr, sc, kernel)
    u, v = sr.shape[0], sc.shape[0]
    gs = sr.shape[1] * sc.shape[1]
    hs = sr.shape[2] * sc.shape[2]
    return (
        k_eff.reshape(u, v, gs * c, hs * f),
        (stride_r, stride_c),
        (pad_r, pad_c),
    )


def concat_perm(channels: Sequence[int], groups: int = 4) -> Tuple[int, ...]:
    """Channel permutation describing a concatenation of packed arrays
    (``groups`` = pack factor, 4 for 2x2 and 2 for W-only).

    ``jnp.concatenate`` of packed tensors with raw widths ``channels`` puts
    actual channel a at logical packed position perm[a] of the packed
    concat; a downstream :class:`PhaseConv` re-gathers its kernel with this
    so no activation relayout is ever executed."""
    total = sum(channels)
    perm = []
    base = 0
    for width in channels:
        for g in range(groups):
            for c in range(width):
                perm.append(g * total + base + c)
        base += width
    return tuple(perm)


def phase_conv(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride: int,
    pad: int,
    packed_in: bool,
    packed_out: bool,
    dtype: Any,
    in_perm: Optional[Tuple[int, ...]] = None,
    preferred_acc: Optional[Any] = None,
) -> jax.Array:
    """Apply the raw conv (kernel, stride, symmetric low pad ``pad``) over
    packed operands, reproducing the raw ``nn.Conv`` output geometry
    (per-axis raw output length = ceil(raw_in / stride)). Pack specs are
    per-axis (bool or (H, W) tuple). ``preferred_acc`` forwards to the
    convolution's ``preferred_element_type`` (int8 x int8 -> int32 for the
    PTQ serving path)."""
    pin, pout = _pair(packed_in), _pair(packed_out)
    k_eff, stride_eff, pad_lo = _gather_kernel(
        kernel, stride, pad, pin, pout
    )
    if in_perm is not None:
        k_eff = k_eff[:, :, np.asarray(in_perm, np.int32), :]
    # solve the high-side padding that makes the packed conv produce exactly
    # the raw geometry.
    out_hw = []
    pad_hw = []
    for i, axis in enumerate((-3, -2)):
        n_in = x.shape[axis]
        raw_in = n_in * pin[i]
        raw_out = -(-raw_in // stride)
        if pout[i] > 1:
            assert raw_out % pout[i] == 0, (
                f"packed_out (factor {pout[i]}) on axis {i} needs a "
                f"divisible raw output length, got {raw_out} "
                f"(raw_in={raw_in}, stride={stride})"
            )
        n_out = raw_out // pout[i]
        pad_hi = (n_out - 1) * stride_eff[i] + k_eff.shape[axis + 3] \
            - pad_lo[i] - n_in
        out_hw.append(n_out)
        pad_hw.append((pad_lo[i], pad_hi))
    dn = jax.lax.conv_dimension_numbers(
        x.shape, k_eff.shape, ("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        k_eff.astype(dtype),
        stride_eff,
        pad_hw,
        dimension_numbers=dn,
        preferred_element_type=preferred_acc,
    )
    assert y.shape[-3:-1] == tuple(out_hw), (y.shape, out_hw)
    return y


class PhaseConv(nn.Module):
    """Bias-free conv over phase-packed activations. Declares the canonical
    raw-layout ``kernel`` [k, k, Cin, F] (identical to the ``nn.Conv`` it
    replaces) and applies the gathered packed-coordinate kernel."""

    features: int
    ksize: int
    stride: int = 1
    packed_in: Any = True
    packed_out: Any = True
    in_perm: Optional[Tuple[int, ...]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1] // _factor(self.packed_in)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.ksize, self.ksize, c_in, self.features),
            jnp.float32,
        )
        return phase_conv(
            x,
            kernel,
            stride=self.stride,
            pad=(self.ksize - 1) // 2,
            packed_in=self.packed_in,
            packed_out=self.packed_out,
            dtype=self.dtype,
            in_perm=self.in_perm,
        )


class PackedBatchNorm(nn.Module):
    """BatchNorm over packed activations with flax ``BatchNorm``'s variable
    layout (params scale/bias, batch_stats mean/var, all shape [C]).

    Exact because packing permutes, never mixes, the per-channel value
    multiset: batch moments are reduced over (B, H', W') *and* the
    ``groups`` phase groups, reproducing the raw-layout moments."""

    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    groups: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        c = x.shape[-1] // self.groups
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if train:
            xf = x.astype(jnp.float32)
            m4 = jnp.mean(xf, axis=(0, 1, 2)).reshape(self.groups, c)
            sq4 = jnp.mean(jnp.square(xf), axis=(0, 1, 2)).reshape(self.groups, c)
            mean = m4.mean(axis=0)
            var = sq4.mean(axis=0) - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1.0 - self.momentum) * var
                )
        else:
            mean, var = ra_mean.value, ra_var.value
        mul = scale * jax.lax.rsqrt(var + self.epsilon)
        add = bias - mean * mul
        mul4 = jnp.tile(mul, self.groups).astype(self.dtype)
        add4 = jnp.tile(add, self.groups).astype(self.dtype)
        return x.astype(self.dtype) * mul4 + add4


class PackedConvBN(nn.Module):
    """``BaseConv`` twin on packed activations: identical child names
    ("conv" kernel + "bn"), conv swapped for :class:`PhaseConv` and BN for
    :class:`PackedBatchNorm` when the output stays packed.

    Carries the same two serving hooks as ``BaseConv`` (see
    ``streamyolo_tpu.quant.ptq``): a 'calib' input-absmax sow (packing
    permutes, never mixes, the value multiset, so the observed absmax — and
    therefore the per-tensor act_scale — is identical to the raw layout's),
    and an int8 path when the 'quant' collection carries this block's
    ``kernel_q``: the RAW int8 kernel is gathered over packed coordinates
    (the tap algebra only selects/zeroes integer entries — exact), the conv
    runs s8 x s8 -> s32 on the MXU, and the dequant rides the epilogue.
    Running int8 on the packed layout matters beyond the MACs: XLA gives
    narrow (C < 128) int8 convs a relayout copy on BOTH operands (s8
    (4,1)-tiled in, s32 W-major out — measured ~43 ms of the 73 ms raw-int8
    l eval); lane-filled packed shapes take neither."""

    out_channels: int
    ksize: int
    stride: int = 1
    act: str = "silu"
    packed_in: Any = True
    packed_out: Any = True
    in_perm: Optional[Tuple[int, ...]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        if not self.is_initializing() and self.is_mutable_collection("calib"):
            self.sow(
                "calib", "in_absmax",
                jnp.max(jnp.abs(x.astype(jnp.float32))),
                init_fn=lambda: jnp.float32(0.0), reduce_fn=jnp.maximum,
            )
        if self.has_variable("quant", "kernel_q"):
            if train:
                raise ValueError(
                    "int8 PTQ variables are serving-only: the round/clip "
                    "in the quantized conv has zero gradient, so training "
                    "through it would silently learn nothing — fine-tune "
                    "with the fp variables and re-quantize")
            x = self._int8_conv(x)
        else:
            x = PhaseConv(
                self.out_channels,
                self.ksize,
                self.stride,
                packed_in=self.packed_in,
                packed_out=self.packed_out,
                in_perm=self.in_perm,
                dtype=self.dtype,
                name="conv",
            )(x)
        out_factor = _factor(self.packed_out)
        if out_factor > 1:
            x = PackedBatchNorm(
                groups=out_factor, dtype=self.dtype, name="bn"
            )(x, train=train)
        else:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="bn",
            )(x)
        return get_activation(self.act)(x)

    def _int8_conv(self, x: jax.Array) -> jax.Array:
        """Symmetric int8 phase conv (the ``BaseConv._int8_conv`` twin):
        quantize the packed input with the per-tensor act_scale, gather the
        int8 kernel (values <= 127 are exact in the f32 einsum), convolve
        s8 x s8 -> s32, dequantize with w_scale tiled over the ``hs`` output
        phases (packed channel order is phase-major: h * F + f)."""
        kq = self.get_variable("quant", "kernel_q")
        w_scale = self.get_variable("quant", "w_scale")
        act_scale = self.get_variable("quant", "act_scale")
        assert jnp.ndim(act_scale) == 0, (
            "per-channel act scales are raw-layout only: the packed channel "
            "order is a permutation of raw channels, so a [C] scale vector "
            "would misalign — ptq.quantize_variables only emits the vector "
            "for plain BaseConv calibrations (scalar here means per-tensor)")
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / act_scale), -127, 127
        ).astype(jnp.int8)
        y = phase_conv(
            xq,
            kq.astype(jnp.float32),
            stride=self.stride,
            pad=(self.ksize - 1) // 2,
            packed_in=self.packed_in,
            packed_out=self.packed_out,
            dtype=jnp.int8,
            in_perm=self.in_perm,
            preferred_acc=jnp.int32,
        )
        scale = act_scale * jnp.tile(w_scale, _factor(self.packed_out))
        return (y.astype(jnp.float32) * scale).astype(self.dtype)


class PackedBottleneck(nn.Module):
    """``Bottleneck`` twin, packed on ``axes`` (child names conv1/conv2)."""

    out_channels: int
    shortcut: bool = True
    expansion: float = 0.5
    act: str = "silu"
    axes: Any = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        in_channels = x.shape[-1] // _factor(self.axes)
        hidden = int(self.out_channels * self.expansion)
        y = PackedConvBN(
            hidden, 1, 1, act=self.act, packed_in=self.axes,
            packed_out=self.axes, dtype=self.dtype, name="conv1",
        )(x, train=train)
        y = PackedConvBN(
            self.out_channels, 3, 1, act=self.act, packed_in=self.axes,
            packed_out=self.axes, dtype=self.dtype, name="conv2",
        )(y, train=train)
        if self.shortcut and in_channels == self.out_channels:
            y = y + x
        return y


def unpack(x: jax.Array, axes) -> jax.Array:
    """Undo the packing described by ``axes``."""
    ph, pw = _pair(axes)
    if ph == 2 and pw == 2:
        return unpack2x2(x)
    if pw == 2 and ph == 1:
        return unpack_w(x)
    assert ph == 1 and pw == 1, f"no unpacker for factors ({ph}, {pw})"
    return x


def csp_packed_body(
    x: jax.Array,
    *,
    out_channels: int,
    n: int,
    shortcut: bool,
    expansion: float,
    act: str,
    axes,
    packed_input,
    dtype,
    train: bool,
) -> jax.Array:
    """The packed CSP computation, shared by :class:`PackedCSPLayer` and
    the W-only fast path inside ``blocks.CSPLayer``. Must be called inside
    an ``@nn.compact`` ``__call__`` — children (conv1/conv2/m_i/conv3) are
    created in the CALLER's scope, so both hosts declare the identical
    parameter tree. The branch concat happens in packed layout; conv3
    absorbs the channel interleave through ``in_perm`` (a kernel gather,
    not an activation relayout). Returns the conv3 output still packed on
    ``axes``; ``packed_input`` says whether ``x`` already is."""
    hidden = int(out_channels * expansion)
    packed_in = axes if packed_input else False
    x1 = PackedConvBN(
        hidden, 1, 1, act=act, packed_in=packed_in,
        packed_out=axes, dtype=dtype, name="conv1",
    )(x, train=train)
    x2 = PackedConvBN(
        hidden, 1, 1, act=act, packed_in=packed_in,
        packed_out=axes, dtype=dtype, name="conv2",
    )(x, train=train)
    for i in range(n):
        x1 = PackedBottleneck(
            hidden,
            shortcut=shortcut,
            expansion=1.0,
            act=act,
            axes=axes,
            dtype=dtype,
            name=f"m_{i}",
        )(x1, train=train)
    x = jnp.concatenate([x1, x2], axis=-1)
    return PackedConvBN(
        out_channels,
        1,
        1,
        act=act,
        packed_in=axes,
        packed_out=axes,
        dtype=dtype,
        in_perm=concat_perm((hidden, hidden), groups=_factor(axes)),
        name="conv3",
    )(x, train=train)


class PackedCSPLayer(nn.Module):
    """``CSPLayer`` twin packed on ``axes``: input and output are both
    packed (darknet's fully-packed dark2 stage). The W-only raw-in/raw-out
    variant lives in ``blocks.CSPLayer``; both share
    :func:`csp_packed_body`."""

    out_channels: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    act: str = "silu"
    axes: Any = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        return csp_packed_body(
            x,
            out_channels=self.out_channels,
            n=self.n,
            shortcut=self.shortcut,
            expansion=self.expansion,
            act=self.act,
            axes=self.axes,
            packed_input=True,
            dtype=self.dtype,
            train=train,
        )


class _PackedFocusConv(nn.Module):
    """``blocks._FocusStemConv`` twin emitting PACKED output: declares the
    same canonical ``kernel`` [k, k, 4C, F], gathers it first into the raw
    (2k)x(2k) stride-2 image kernel, then runs it over a 4x4 space-to-depth
    PACKED view of the raw image with packed (2x2) output — a dense
    (k/2+1)-ish conv (16C -> 4F) in fully lane-filled layout.

    Why packed INPUT in training: the raw formulation convolves a C=3
    image, for which XLA's TPU emitter picks a batch-in-lanes layout that
    pads the batch to 128 lanes — a measured ~29 ms of a 79 ms s train step
    (input relayout copy + stem conv/BN-moment + stem wgrad all reading the
    8x padded tensor). Packing the image to (H/4, W/4, 16C=48) on device
    first is one cheap fused transpose (~0.15 GB vs 1.18 GB padded), and
    the stem conv, its wgrad, and the fused BN moments then all run
    C-in-lanes (measured s train b=16: 79.3 -> 74.9 ms/step).

    Why NOT in eval: with no wgrad and no BN moments the raw stride-2 conv
    is already cheap, while the tap-gathered packed kernel is denser in
    zero taps — measured s dual-frame eval b=8 REGRESSES 8.4 -> 11.0
    ms/batch packed-in. Both formulations gather the SAME canonical
    ``kernel`` [k, k, 4C, F] (equality-tested in tests/test_packed.py), so
    the choice is a static branch on ``train`` with an identical parameter
    tree."""

    features: int
    ksize: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        k = self.ksize
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, 4 * c, self.features),
            jnp.float32,
        )
        # [di, dj, (p + 2q)*C + c, o] -> raw K2k[2di+p, 2dj+q, c, o]
        k2k = kernel.reshape(k, k, 2, 2, c, self.features)  # (di, dj, q, p, c, o)
        k2k = k2k.transpose(0, 3, 1, 2, 4, 5).reshape(
            2 * k, 2 * k, c, self.features
        )
        if train:
            x, packed_in = pack_grid(x.astype(self.dtype), 4, 4), 4
        else:
            packed_in = False
        return phase_conv(
            x,
            k2k,
            stride=2,
            pad=2 * ((k - 1) // 2),
            packed_in=packed_in,
            packed_out=True,
            dtype=self.dtype,
        )


class _PackedFocusCBS(nn.Module):
    """``blocks._FocusCBS`` twin with packed output (child names "conv"/"bn")."""

    out_channels: int
    ksize: int
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = _PackedFocusConv(
            self.out_channels, self.ksize, dtype=self.dtype, name="conv"
        )(x, train=train)
        x = PackedBatchNorm(dtype=self.dtype, name="bn")(x, train=train)
        return get_activation(self.act)(x)


class PackedFocus(nn.Module):
    """``blocks.Focus`` twin producing phase-packed stem features
    (B, H/4, W/4, 4*out). Identical parameter tree; requires H, W % 4 == 0
    and stride 1 (the caller gates on this)."""

    out_channels: int
    ksize: int = 1
    stride: int = 1
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        assert self.stride == 1, "PackedFocus supports stride 1 only"
        assert x.shape[-3] % 4 == 0 and x.shape[-2] % 4 == 0, x.shape
        return _PackedFocusCBS(
            self.out_channels,
            self.ksize,
            act=self.act,
            dtype=self.dtype,
            name="conv",
        )(x, train=train)
