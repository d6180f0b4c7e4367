"""SimOTA label assignment, fixed-shape / fully vectorized (no host syncs).

Re-design of the reference assignment
(`/root/reference/exps/model/tal_head.py:479-712`): the torch code loops over
images in Python, calls ``.item()`` on dynamic-k sizes, and boolean-masks to
dynamic shapes — a GPU-host ping-pong per image (SURVEY.md §3.1 hot-loop
note). Here the whole batch is one ``vmap`` of a fixed-shape per-image
assignment: ground truths are padded to ``max_labels`` and every dynamic
quantity becomes a mask, so the assignment jits into the training step and
runs entirely on the TPU.

Semantics preserved exactly (verified by golden tests vs a torch oracle):
  * candidate anchors = in-gt-box OR in-center-radius(2.5 strides)
    (`tal_head.py:594-677`);
  * cost = BCE(sqrt(cls*obj), onehot) + 3*(-log(iou+1e-8)) +
    100000*(not in-box-and-center) (`tal_head.py:529-554`);
  * dynamic-k = clamp(int(sum(top-10 ious)), min 1) per gt; k lowest-cost
    candidates matched per gt (`tal_head.py:679-693`);
  * anchors matched by >1 gt keep the argmin-cost gt over ALL gts
    (`tal_head.py:695-699` — the argmin is taken over the full cost column,
    a reference quirk we replicate).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from streamyolo_tpu.ops.boxes import pairwise_iou

CENTER_RADIUS = 2.5
BIG_COST = 1e9


class Assignment(NamedTuple):
    """Per-anchor assignment result, fixed shape [N] / [N, ...]."""

    fg_mask: jax.Array  # [N] bool — anchor is matched to some gt
    matched_gt: jax.Array  # [N] int32 — index of matched gt (0 if ~fg)
    pred_iou: jax.Array  # [N] f32 — IoU(pred, matched gt) (0 if ~fg)
    num_fg: jax.Array  # [] f32
    num_gt: jax.Array  # [] f32


def _in_boxes_info(gt_boxes, gt_valid, anchor_xy, anchor_strides):
    """[M,N] is_in_boxes, is_in_centers (reference get_in_boxes_info,
    `tal_head.py:594-677`). ``anchor_xy`` are grid indices; centers are
    (grid + 0.5) * stride."""
    centers = (anchor_xy + 0.5) * anchor_strides[:, None]  # [N, 2]
    cx, cy = centers[:, 0][None, :], centers[:, 1][None, :]

    gl = (gt_boxes[:, 0] - 0.5 * gt_boxes[:, 2])[:, None]
    gr = (gt_boxes[:, 0] + 0.5 * gt_boxes[:, 2])[:, None]
    gt_ = (gt_boxes[:, 1] - 0.5 * gt_boxes[:, 3])[:, None]
    gb = (gt_boxes[:, 1] + 0.5 * gt_boxes[:, 3])[:, None]
    in_boxes = (cx > gl) & (cx < gr) & (cy > gt_) & (cy < gb)

    r = CENTER_RADIUS * anchor_strides[None, :]
    ccx, ccy = gt_boxes[:, 0][:, None], gt_boxes[:, 1][:, None]
    in_centers = (
        (cx > ccx - r) & (cx < ccx + r) & (cy > ccy - r) & (cy < ccy + r)
    )
    valid = gt_valid[:, None]
    return in_boxes & valid, in_centers & valid


def _bce_probs(p, y):
    """torch F.binary_cross_entropy on probabilities, with torch's -100 log
    clamp (`tal_head.py:545-547` computes this on sqrt(cls*obj))."""
    log_p = jnp.clip(jnp.log(p), -100.0)
    log_1mp = jnp.clip(jnp.log1p(-p), -100.0)
    return -(y * log_p + (1.0 - y) * log_1mp)


@functools.partial(jax.jit, static_argnames=("num_classes",))
def simota_assign_single(
    labels: jax.Array,  # [M, 5] (cls, cx, cy, w, h), zero-padded
    bbox_preds: jax.Array,  # [N, 4] decoded (cx, cy, w, h)
    obj_logits: jax.Array,  # [N]
    cls_logits: jax.Array,  # [N, C]
    anchor_xy: jax.Array,  # [N, 2] grid indices
    anchor_strides: jax.Array,  # [N]
    num_classes: int,
) -> Assignment:
    """Fixed-shape SimOTA for one image. All inputs fp32."""
    m = labels.shape[0]
    n = bbox_preds.shape[0]

    gt_valid = jnp.sum(labels, axis=1) > 0  # reference nlabel rule
    gt_boxes = labels[:, 1:5]
    gt_cls = labels[:, 0].astype(jnp.int32)
    num_gt = jnp.sum(gt_valid.astype(jnp.float32))

    in_boxes, in_centers = _in_boxes_info(gt_boxes, gt_valid, anchor_xy, anchor_strides)
    fg_cand = jnp.any(in_boxes | in_centers, axis=0)  # [N] is_in_boxes_anchor
    in_boxes_and_center = in_boxes & in_centers  # [M, N]

    # pairwise IoU over candidates only (non-candidates never enter the
    # reference matrices — emulate with hard zero / BIG cost)
    pair_iou = pairwise_iou(gt_boxes, bbox_preds, xyxy=False)  # [M, N]
    pair_iou = pair_iou * (gt_valid[:, None] & fg_cand[None, :])

    # classification cost on sqrt(cls_prob * obj_prob)
    joint = jax.nn.sigmoid(cls_logits) * jax.nn.sigmoid(obj_logits)[:, None]
    p = jnp.sqrt(joint)  # [N, C]
    onehot = jax.nn.one_hot(gt_cls, num_classes, dtype=jnp.float32)  # [M, C]
    # sum_c BCE(p[n,c], onehot[m,c]) — expand via the two BCE branches so the
    # [M,N,C] intermediate is never materialized:
    #   BCE = -(y log p + (1-y) log(1-p)) => sum_c = -(onehot_m . log p_n)
    #         - ((1-onehot_m) . log(1-p_n))
    log_p = jnp.clip(jnp.log(p), -100.0)  # [N, C]
    log_1mp = jnp.clip(jnp.log1p(-p), -100.0)
    pair_cls_loss = -(onehot @ log_p.T + (1.0 - onehot) @ log_1mp.T)  # [M, N]

    pair_iou_loss = -jnp.log(pair_iou + 1e-8)
    cost = (
        pair_cls_loss
        + 3.0 * pair_iou_loss
        + 100000.0 * (~in_boxes_and_center)
        + BIG_COST * (~fg_cand)[None, :]
        + BIG_COST * (~gt_valid)[:, None]
    )

    # dynamic-k and k-lowest-cost selection by 10-step argmax PEELING.
    # dynamic_k = clamp(int(sum of top-10 candidate IoUs)) is ALWAYS <= 10,
    # so at most the 10 extreme elements of each row matter. lax.top_k
    # lowers to a (partial) sort of the 11850-anchor axis on TPU — measured
    # 3.3x slower for the whole assignment than peeling the max 10 times
    # with argmax + scatter (each peel is one cheap [M, N] pass, and the
    # [M, 10, N] one-hot expansion of the scatter-free formulation never
    # materializes). Ties resolve identically (first index wins in both).
    n_cand_k = min(10, n)
    rows = jnp.arange(m)

    # top-10 candidate IoU sum per gt (padded zeros contribute 0, matching
    # the reference's min(10, num_candidates) truncation)
    x = pair_iou
    iou_sum10 = jnp.zeros((m,), jnp.float32)
    for _ in range(n_cand_k):
        i = jnp.argmax(x, axis=1)
        iou_sum10 = iou_sum10 + jnp.max(x, axis=1)
        x = x.at[rows, i].set(-1.0)
    dynamic_ks = jnp.maximum(iou_sum10.astype(jnp.int32), 1)  # [M]

    # peel the dynamic_ks[m] lowest-cost anchors per gt into the matching
    neg_cost = -cost
    matching = jnp.zeros((m, n), jnp.bool_)
    for j in range(n_cand_k):
        i = jnp.argmax(neg_cost, axis=1)
        matching = matching.at[rows, i].max(j < dynamic_ks)
        neg_cost = neg_cost.at[rows, i].set(-jnp.inf)
    matching = matching & gt_valid[:, None] & fg_cand[None, :]

    # conflict resolution: anchors matched by >1 gt -> argmin cost over all gts
    anchor_matches = jnp.sum(matching.astype(jnp.int32), axis=0)  # [N]
    conflicted = anchor_matches > 1
    argmin_gt = jnp.argmin(cost, axis=0)  # [N]
    argmin_onehot = jax.nn.one_hot(argmin_gt, m, axis=0, dtype=jnp.bool_)  # [M, N]
    matching = jnp.where(conflicted[None, :], argmin_onehot, matching)

    fg_mask = jnp.any(matching, axis=0)  # [N]
    matched_gt = jnp.argmax(matching, axis=0).astype(jnp.int32)
    pred_iou = jnp.sum(matching * pair_iou, axis=0)
    num_fg = jnp.sum(fg_mask.astype(jnp.float32))

    return Assignment(fg_mask, matched_gt, pred_iou, num_fg, num_gt)


def simota_assign_batch(
    labels, bbox_preds, obj_logits, cls_logits, anchor_xy, anchor_strides, num_classes
) -> Assignment:
    """vmap over the batch; anchor bookkeeping is shared (broadcast)."""
    fn = functools.partial(
        simota_assign_single,
        anchor_xy=anchor_xy,
        anchor_strides=anchor_strides,
        num_classes=num_classes,
    )
    return jax.vmap(fn)(labels, bbox_preds, obj_logits, cls_logits)
