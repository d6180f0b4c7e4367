"""Resize ops with exact torch-semantics, NHWC.

The reference PAFPN upsamples with ``F.interpolate(x, size=skip.shape, mode=
'nearest')`` (`/root/reference/exps/model/dfp_pafpn.py:125,130`). torch's
legacy 'nearest' maps dst index i -> src index ``floor(i * src / dst)``; this
differs from ``jax.image.resize`` rounding, so we implement the gather
explicitly — it also lowers to a cheap XLA gather that fuses well.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def resize_nearest(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Nearest-neighbor resize of NHWC ``x`` to spatial ``size`` (h, w),
    bit-matching torch ``F.interpolate(mode='nearest')``."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return x
    # floor(i * src / dst) with exact integer arithmetic
    rows = (np.arange(h_out) * h_in) // h_out
    cols = (np.arange(w_out) * w_in) // w_out
    x = jnp.take(x, jnp.asarray(rows), axis=1)
    x = jnp.take(x, jnp.asarray(cols), axis=2)
    return x


def resize_bilinear_torch(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bilinear resize (align_corners=False, half-pixel centers) of NHWC ``x``,
    matching torch ``F.interpolate(mode='bilinear', align_corners=False)`` —
    the op used by the trainer's multiscale ``Exp.preprocess``
    (`/root/reference/cfgs/s_s50_onex_dfp_tal_flip.py:160-171`)."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return x

    def axis_weights(n_in: int, n_out: int):
        scale = n_in / n_out
        center = (np.arange(n_out) + 0.5) * scale - 0.5
        lo = np.floor(center).astype(np.int64)
        frac = center - lo
        lo_c = np.clip(lo, 0, n_in - 1)
        hi_c = np.clip(lo + 1, 0, n_in - 1)
        return lo_c, hi_c, frac.astype(np.float32)

    r_lo, r_hi, r_f = axis_weights(h_in, h_out)
    c_lo, c_hi, c_f = axis_weights(w_in, w_out)

    dtype = x.dtype
    xf = x.astype(jnp.float32)
    top = jnp.take(xf, jnp.asarray(r_lo), axis=1)
    bot = jnp.take(xf, jnp.asarray(r_hi), axis=1)
    rf = jnp.asarray(r_f)[None, :, None, None]
    rows = top * (1.0 - rf) + bot * rf
    left = jnp.take(rows, jnp.asarray(c_lo), axis=2)
    right = jnp.take(rows, jnp.asarray(c_hi), axis=2)
    cf = jnp.asarray(c_f)[None, None, :, None]
    out = left * (1.0 - cf) + right * cf
    return out.astype(dtype)
