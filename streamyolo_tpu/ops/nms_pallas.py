"""Pallas TPU kernel: the NMS suppression fixed point, fully in VMEM.

The jnp implementation (``ops.nms.nms_padded``) runs the fixed-point
iteration as an XLA ``while_loop`` whose per-iteration overhead (HLO loop
machinery + re-staged [K, K] reductions) shows up when detections are dense
(deep suppression chains). This kernel keeps the IoU matrix, the suppression
mask, and the keep vector resident in VMEM and iterates with a single
in-kernel ``while_loop`` — per-iteration cost is one [K, K] VPU pass with no
loop re-staging (SURVEY.md §7 "Pallas ... NMS inner loop").

Semantics identical to ``nms_padded`` / the sequential greedy oracle; chosen
automatically by ``ops.nms`` on TPU backends for K <= 1024, verified in
interpret mode on CPU against both twins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, out_ref, *, nms_thre: float):
    boxes = boxes_ref[...]  # [K, 4] f32
    valid = valid_ref[...] > 0  # [K] (passed as int32)
    k = boxes.shape[0]

    x1, y1 = boxes[:, 0], boxes[:, 1]
    x2, y2 = boxes[:, 2], boxes[:, 3]
    tlx = jnp.maximum(x1[:, None], x1[None, :])
    tly = jnp.maximum(y1[:, None], y1[None, :])
    brx = jnp.minimum(x2[:, None], x2[None, :])
    bry = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(brx - tlx, 0.0) * jnp.maximum(bry - tly, 0.0)
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    union = area[:, None] + area[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-12)

    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    suppress = (iou > nms_thre) & (row < col)  # earlier kept j suppresses i

    def cond(state):
        keep, prev, it = state
        return (it < k) & jnp.any(keep != prev)

    def body(state):
        keep, _, it = state
        new = valid & ~jnp.any(suppress & keep[:, None], axis=0)
        return new, keep, it + 1

    init = valid & ~jnp.any(suppress & valid[:, None], axis=0)
    keep, _, _ = jax.lax.while_loop(cond, body, (init, valid, jnp.int32(0)))
    out_ref[...] = keep.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("nms_thre", "interpret"))
def nms_padded_pallas(
    boxes: jax.Array, valid: jax.Array, nms_thre: float, interpret: bool = False
) -> jax.Array:
    """[K, 4] xyxy (score-sorted, class-offset) + [K] valid -> [K] bool keep.
    Exact greedy NMS (fixed-point), computed in one VMEM-resident kernel."""
    k = boxes.shape[0]
    keep_i32 = pl.pallas_call(
        functools.partial(_nms_kernel, nms_thre=float(nms_thre)),
        out_shape=jax.ShapeDtypeStruct((k,), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes.astype(jnp.float32), valid.astype(jnp.int32))
    return keep_i32 > 0
