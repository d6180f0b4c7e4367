"""Box geometry utilities (jnp, fixed-shape, vmappable).

Capability parity with the yolox box helpers the reference imports
(SURVEY.md §2.3): ``bboxes_iou`` (`/root/reference/exps/model/tal_head.py:11`),
``xyxy2cxcywh`` / ``xyxy2xywh`` (`exps/data/data_augment_flip.py:14`,
`exps/evaluators/onex_stream_evaluator.py:17`), ``adjust_box_anns``
(`exps/data/tal_flip_mosaicdetection.py:8`).

All functions are pure jnp (usable inside jit and Pallas-adjacent code) and
also accept NumPy arrays on host paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_iou(boxes_a: jax.Array, boxes_b: jax.Array, xyxy: bool = True) -> jax.Array:
    """Pairwise IoU between [Na, 4] and [Nb, 4] -> [Na, Nb].

    ``xyxy=True``: corner format; ``xyxy=False``: (cx, cy, w, h) — matching
    yolox ``bboxes_iou`` used by SimOTA and TAL (`tal_head.py:526,595`).
    Degenerate/empty boxes produce IoU 0 (the ``en`` product in yolox).
    """
    if xyxy:
        tl = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
        br = jnp.minimum(boxes_a[:, None, 2:4], boxes_b[None, :, 2:4])
        area_a = jnp.prod(boxes_a[:, 2:4] - boxes_a[:, :2], axis=1)
        area_b = jnp.prod(boxes_b[:, 2:4] - boxes_b[:, :2], axis=1)
    else:
        tl = jnp.maximum(
            boxes_a[:, None, :2] - boxes_a[:, None, 2:4] / 2,
            boxes_b[None, :, :2] - boxes_b[None, :, 2:4] / 2,
        )
        br = jnp.minimum(
            boxes_a[:, None, :2] + boxes_a[:, None, 2:4] / 2,
            boxes_b[None, :, :2] + boxes_b[None, :, 2:4] / 2,
        )
        area_a = jnp.prod(boxes_a[:, 2:4], axis=1)
        area_b = jnp.prod(boxes_b[:, 2:4], axis=1)

    valid = jnp.all(tl < br, axis=2)
    inter = jnp.prod(br - tl, axis=2) * valid
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


bboxes_iou = pairwise_iou  # reference-surface alias


def elementwise_iou(
    boxes_a: jax.Array, boxes_b: jax.Array, xyxy: bool = True
) -> jax.Array:
    """Elementwise IoU between [..., 4] and [..., 4] -> [...]."""
    if xyxy:
        tl = jnp.maximum(boxes_a[..., :2], boxes_b[..., :2])
        br = jnp.minimum(boxes_a[..., 2:4], boxes_b[..., 2:4])
        area_a = jnp.prod(boxes_a[..., 2:4] - boxes_a[..., :2], axis=-1)
        area_b = jnp.prod(boxes_b[..., 2:4] - boxes_b[..., :2], axis=-1)
    else:
        tl = jnp.maximum(
            boxes_a[..., :2] - boxes_a[..., 2:4] / 2,
            boxes_b[..., :2] - boxes_b[..., 2:4] / 2,
        )
        br = jnp.minimum(
            boxes_a[..., :2] + boxes_a[..., 2:4] / 2,
            boxes_b[..., :2] + boxes_b[..., 2:4] / 2,
        )
        area_a = jnp.prod(boxes_a[..., 2:4], axis=-1)
        area_b = jnp.prod(boxes_b[..., 2:4], axis=-1)

    valid = jnp.all(tl < br, axis=-1)
    inter = jnp.prod(br - tl, axis=-1) * valid
    union = area_a + area_b - inter
    return inter / jnp.maximum(union, 1e-12)


def xyxy2cxcywh(boxes):
    """[x1,y1,x2,y2] -> [cx,cy,w,h] (non-destructive; yolox mutates in place)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + w * 0.5
    cy = boxes[..., 1] + h * 0.5
    stack = jnp.stack if isinstance(boxes, jax.Array) else _np_stack
    return stack([cx, cy, w, h], -1)


def xyxy2xywh(boxes):
    """[x1,y1,x2,y2] -> [x1,y1,w,h] (COCO ltwh)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    stack = jnp.stack if isinstance(boxes, jax.Array) else _np_stack
    return stack([boxes[..., 0], boxes[..., 1], w, h], -1)


def cxcywh2xyxy(boxes):
    """[cx,cy,w,h] -> [x1,y1,x2,y2]."""
    hw = boxes[..., 2] * 0.5
    hh = boxes[..., 3] * 0.5
    stack = jnp.stack if isinstance(boxes, jax.Array) else _np_stack
    return stack(
        [
            boxes[..., 0] - hw,
            boxes[..., 1] - hh,
            boxes[..., 0] + hw,
            boxes[..., 1] + hh,
        ],
        -1,
    )


def _np_stack(arrs, axis):
    import numpy as np

    return np.stack(arrs, axis=axis)


def adjust_box_anns(bbox, scale_ratio, padw, padh, w_max, h_max):
    """Scale + translate xyxy boxes and clip to the mosaic canvas
    (yolox ``adjust_box_anns``). NumPy host-path helper."""
    import numpy as np

    bbox = bbox.copy()
    bbox[:, 0::2] = np.clip(bbox[:, 0::2] * scale_ratio + padw, 0, w_max)
    bbox[:, 1::2] = np.clip(bbox[:, 1::2] * scale_ratio + padh, 0, h_max)
    return bbox
