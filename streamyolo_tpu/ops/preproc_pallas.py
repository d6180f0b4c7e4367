"""Pallas TPU kernel: fused streaming preprocess (2x bilinear downsample +
uint8 -> bf16 cast).

The online loop feeds 1200x1920 camera frames at input scale 0.5
(`/root/reference/sAP/streamyolo/streamyolo.sh:10`, resize at
`streamyolo_det.py:57-60`). For an exact 0.5 scale, cv2 INTER_LINEAR samples
source coordinate (i + 0.5) / 0.5 - 0.5 = 2i + 0.5 — equal 1/2 weights over
rows/cols 2i and 2i+1, i.e. a 2x2 box average. This kernel computes that
average and the dtype cast in one VMEM pass, so a deployment whose host CPU
is the bottleneck can ship raw uint8 frames and do ALL preprocessing on
device (the BASELINE "letterbox/normalize as fused Pallas preprocessing"
slot; the cv2 host path remains the default for tunnel-attached benches where
H2D bytes dominate).

Layout: the [H, W, 3] frame is viewed as [H, W/2, 6] so one output pixel's
horizontal pair sits in the channel dim; the grid tiles output rows, each
program reading its 2 source rows. Verified bit-exact against cv2
INTER_LINEAR (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_PROGRAM = 8  # output rows per grid step (16 input rows in VMEM)


def _kernel(src_ref, out_ref):
    # src_ref: [2*R, W2, 6] uint8 (two source rows per output row)
    # out_ref: [R, W2, 3] bf16
    src = src_ref[...].astype(jnp.float32)
    r2, w2, _ = src.shape
    # vertical pair: rows (2i, 2i+1)
    rows = src.reshape(r2 // 2, 2, w2, 6)
    vert = rows[:, 0] + rows[:, 1]  # [R, W2, 6]
    # horizontal pair: channels (0:3, 3:6)
    out = (vert[..., 0:3] + vert[..., 3:6]) * 0.25
    out_ref[...] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def downsample2x_bilinear(
    frame_u8: jax.Array, *, out_dtype=jnp.bfloat16, interpret: bool = False
) -> jax.Array:
    """[H, W, 3] uint8 -> [H//2, W//2, 3] ``out_dtype`` (cv2 INTER_LINEAR
    parity at scale 0.5, with cv2's round-half-away from the uint8 path
    applied by the caller if exact integer output is needed)."""
    h, w, c = frame_u8.shape
    assert h % 2 == 0 and w % 2 == 0 and c == 3, (h, w, c)
    h2, w2 = h // 2, w // 2
    src = frame_u8.reshape(h, w2, 6)

    rows = ROWS_PER_PROGRAM
    # pick a row tile that divides the output height
    while h2 % rows:
        rows //= 2
    grid = (h2 // rows,)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((h2, w2, 3), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (2 * rows, w2, 6), lambda i: (i, 0, 0), memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (rows, w2, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(src)


def downsample2x_reference(frame_u8) -> jax.Array:
    """Pure-jnp oracle for the kernel (same 2x2 box average)."""
    h, w, c = frame_u8.shape
    x = frame_u8.astype(jnp.float32).reshape(h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(1, 3))


def run_pallas_preproc_selftest(interpret: bool = False):
    """Compile the downsample kernel and cross-check it bit-exact against
    the jnp oracle on random uint8 frames (incl. the full 1200x1920 camera
    shape). Returns ``(ok, detail)``."""
    import numpy as np

    try:
        rng = np.random.RandomState(0)
        for h, w in ((64, 96), (1200, 1920)):
            frame = rng.randint(0, 256, (h, w, 3), np.uint8)
            got = np.asarray(downsample2x_bilinear(
                frame, out_dtype=jnp.float32, interpret=interpret))
            want = np.asarray(downsample2x_reference(frame)).astype(np.float32)
            if not np.array_equal(got, want):
                return False, (
                    f"downsample mismatch at {h}x{w}: max abs diff "
                    f"{np.abs(got - want).max():.4g}")
        return True, "64x96 + 1200x1920 frames bit-exact vs the jnp oracle"
    except Exception as e:  # compile failures must fall back, not crash
        return False, f"{type(e).__name__}: {e}"


def pallas_preproc_verified(force: bool = False) -> bool:
    """Once-per-cache-dir gate for the compiled downsample kernel
    (``ops/pallas_gate.py`` — same discipline as ``pallas_nms_verified``)."""
    from streamyolo_tpu.ops.pallas_gate import kernel_verified

    return kernel_verified("preproc", run_pallas_preproc_selftest, force=force)


def downsample2x_auto(frame_u8: jax.Array, *, out_dtype=jnp.bfloat16) -> jax.Array:
    """Device-side 0.5x streaming preprocess with backend auto-selection:
    the Pallas kernel on a directly-attached TPU (after the verified gate),
    the jnp oracle otherwise (the axon relay cannot compile Mosaic)."""
    import os

    use_pallas = (
        jax.default_backend() == "tpu"
        and "axon" not in os.environ.get("JAX_PLATFORMS", "")
        and pallas_preproc_verified()
    )
    if use_pallas:
        return downsample2x_bilinear(frame_u8, out_dtype=out_dtype)
    return downsample2x_reference(frame_u8).astype(out_dtype)
