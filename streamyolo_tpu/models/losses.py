"""StreamYOLO training losses (TAL and plain), fixed-shape and jittable.

Capability parity with the reference loss bodies:
  * TAL: `/root/reference/exps/model/tal_head.py:262-470` — SimOTA targets,
    IoU loss (1 - iou^2), BCE obj over all anchors, BCE cls over foreground,
    optional L1 on the raw regression outputs, and the **Trend-Aware Loss**
    re-weighting: per matched gt, weight = 1/(iou(cur_gt, support_gt)^gamma
    + 1e-8) with a floor (`ignore_thr`/`ignore_value`) for barely-matched
    objects, normalized so the weighted loss sum equals the unweighted sum
    (`tal_head.py:394-406,427-456`).
  * plain (PIPE): `/root/reference/exps/model/pipe_head.py:250-460` — same
    minus the trend weighting (still config).

Everything is a pure function of (raw head outputs, padded labels); the whole
loss — including SimOTA — lives inside the jitted train step. The reference's
OOM->CPU fallback (`tal_head.py:345-376`) is obsolete: shapes are static.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from streamyolo_tpu.models.assign import simota_assign_batch
from streamyolo_tpu.models.heads import flatten_levels, level_grids
from streamyolo_tpu.ops.boxes import pairwise_iou

REG_WEIGHT = 5.0


def iou_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """yolox ``IOUloss(reduction='none', loss_type='iou')``: 1 - iou^2 on
    (cx, cy, w, h) boxes (consumed at `tal_head.py:136,442`)."""
    tl = jnp.maximum(pred[..., :2] - pred[..., 2:] / 2, target[..., :2] - target[..., 2:] / 2)
    br = jnp.minimum(pred[..., :2] + pred[..., 2:] / 2, target[..., :2] + target[..., 2:] / 2)
    area_p = jnp.prod(pred[..., 2:], axis=-1)
    area_g = jnp.prod(target[..., 2:], axis=-1)
    en = jnp.all(tl < br, axis=-1)
    area_i = jnp.prod(br - tl, axis=-1) * en
    iou = area_i / (area_p + area_g - area_i + 1e-16)
    return 1.0 - iou**2


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Numerically-stable BCEWithLogits (torch semantics, no reduction)."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def _tal_weights(
    labels: jax.Array,
    support_labels: jax.Array,
    matched_gt: jax.Array,
    gamma: float,
    ignore_thr: float,
    ignore_value: float,
) -> jax.Array:
    """Per-anchor trend weight for one image (`tal_head.py:394-406`).

    iou_t[gt] = max IoU between the current gt and any support gt; values
    below ``ignore_thr`` are replaced by ``ignore_value`` (new/occluded
    objects get a fixed boost); if the support frame has no gts at all the
    reference uses iou 1 for everything (`:395-396`).
    """
    sup_valid = jnp.sum(support_labels, axis=1) > 0
    sup_any = jnp.any(sup_valid)
    pair = pairwise_iou(labels[:, 1:5], support_labels[:, 1:5], xyxy=False)
    pair = pair * sup_valid[None, :]
    ious = jnp.max(pair, axis=1)  # [M]
    ious = jnp.where(ious < ignore_thr, ignore_value, ious)
    ious = jnp.where(sup_any, ious, 1.0)
    iou_t = ious[matched_gt]  # [N]
    return 1.0 / (iou_t**gamma + 1e-8)


def _get_l1_target(reg_target, anchor_xy, anchor_strides, eps=1e-8):
    """(`tal_head.py:471-477`) gt encoded in raw-output space.
    reg_target [B, N, 4]; anchor_xy [N, 2]; anchor_strides [N]."""
    s = anchor_strides[None, :, None]
    xy = reg_target[..., :2] / s - anchor_xy[None]
    wh = jnp.log(reg_target[..., 2:] / s + eps)
    return jnp.concatenate([xy, wh], axis=-1)


def _normalized_weight(weight, loss, fg):
    """W = w * sum(L) / sum(w * L) over the batch-wide foreground set,
    detached (`tal_head.py:430-438`)."""
    loss_sum = jnp.sum(loss * fg)
    wl_sum = jnp.sum(weight * loss * fg)
    ratio = jnp.where(wl_sum > 0, loss_sum / jnp.maximum(wl_sum, 1e-20), 1.0)
    return jax.lax.stop_gradient(weight * ratio)


def streamyolo_losses(
    outputs: Sequence[jax.Array],
    labels: jax.Array,
    support_labels: Optional[jax.Array],
    num_classes: int,
    strides: Sequence[int] = (8, 16, 32),
    gamma: float = 1.0,
    ignore_thr: float = 0.5,
    ignore_value: float = 1.5,
    use_l1: bool = True,
    use_tal: bool = True,
) -> Dict[str, jax.Array]:
    """Full training loss from raw per-level head maps.

    Args:
      outputs: per-level NHWC raw maps [B, H, W, 4+1+C] (reg, obj, cls).
      labels: [B, M, 5] (cls, cx, cy, w, h) zero-padded — next-frame gt.
      support_labels: [B, M, 5] current-frame gt (TAL); None for plain loss.
      use_tal: apply trend-aware re-weighting (False = PIPE head loss).

    Returns the reference loss dict surface
    (`/root/reference/exps/model/yolox.py:39-46`): total_loss, iou_loss,
    l1_loss, conf_loss, cls_loss, num_fg.
    """
    hw = [o.shape[1:3] for o in outputs]
    grid_xy_np, strides_np, _ = level_grids(hw, strides)
    anchor_xy = jnp.asarray(grid_xy_np)
    anchor_strides = jnp.asarray(strides_np)

    flat = flatten_levels(outputs).astype(jnp.float32)  # [B, N, 5+C]
    labels = labels[..., :5].astype(jnp.float32)  # mixup label_cut rule
    if support_labels is not None:
        support_labels = support_labels[..., :5].astype(jnp.float32)

    raw_reg = flat[..., :4]
    obj_logits = flat[..., 4]
    cls_logits = flat[..., 5:]

    # training decode (`tal_head.py:237-243`)
    s = anchor_strides[None, :, None]
    bbox_preds = jnp.concatenate(
        [(raw_reg[..., :2] + anchor_xy[None]) * s, jnp.exp(raw_reg[..., 2:4]) * s],
        axis=-1,
    )

    assign = simota_assign_batch(
        labels,
        jax.lax.stop_gradient(bbox_preds),
        jax.lax.stop_gradient(obj_logits),
        jax.lax.stop_gradient(cls_logits),
        anchor_xy,
        anchor_strides,
        num_classes,
    )
    fg = assign.fg_mask.astype(jnp.float32)  # [B, N]
    num_fg = jnp.maximum(jnp.sum(assign.num_fg), 1.0)
    num_gts = jnp.maximum(jnp.sum(assign.num_gt), 1.0)

    # per-anchor targets gathered from matched gts
    gather = jax.vmap(lambda lab, idx: lab[idx])
    matched_labels = gather(labels, assign.matched_gt)  # [B, N, 5]
    reg_target = matched_labels[..., 1:5]
    cls_target = (
        jax.nn.one_hot(matched_labels[..., 0].astype(jnp.int32), num_classes)
        * assign.pred_iou[..., None]
    )
    obj_target = fg

    loss_iou_el = iou_loss(bbox_preds, reg_target)  # [B, N]
    loss_obj_el = bce_with_logits(obj_logits, obj_target)  # [B, N]
    loss_cls_el = jnp.sum(bce_with_logits(cls_logits, cls_target), axis=-1)

    if use_l1:
        l1_target = _get_l1_target(reg_target, anchor_xy, anchor_strides)
        loss_l1_el = jnp.abs(raw_reg - l1_target)  # [B, N, 4]

    if use_tal:
        assert support_labels is not None
        weight = jax.vmap(
            functools.partial(
                _tal_weights,
                gamma=gamma,
                ignore_thr=ignore_thr,
                ignore_value=ignore_value,
            )
        )(labels, support_labels, assign.matched_gt)  # [B, N]
        w_iou = _normalized_weight(weight, loss_iou_el, fg)
        loss_iou = jnp.sum(w_iou * loss_iou_el * fg) / num_fg
        if use_l1:
            w_l1 = _normalized_weight(
                weight[..., None], loss_l1_el, fg[..., None]
            )
            loss_l1 = jnp.sum(w_l1 * loss_l1_el * fg[..., None]) / num_fg
        else:
            loss_l1 = jnp.float32(0.0)
    else:
        loss_iou = jnp.sum(loss_iou_el * fg) / num_fg
        loss_l1 = (
            jnp.sum(loss_l1_el * fg[..., None]) / num_fg if use_l1 else jnp.float32(0.0)
        )

    loss_obj = jnp.sum(loss_obj_el) / num_fg
    loss_cls = jnp.sum(loss_cls_el * fg) / num_fg

    total = REG_WEIGHT * loss_iou + loss_obj + loss_cls + loss_l1
    return {
        "total_loss": total,
        "iou_loss": REG_WEIGHT * loss_iou,
        "conf_loss": loss_obj,
        "cls_loss": loss_cls,
        "l1_loss": loss_l1,
        "num_fg": num_fg / num_gts,  # reference clamps num_fg to >=1 first
    }
