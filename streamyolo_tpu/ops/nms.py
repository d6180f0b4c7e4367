"""Jittable fixed-shape batched NMS + postprocess.

TPU-native replacement for the reference's dynamic-shape device NMS
(``yolox.utils.postprocess`` at `/root/reference/exps/evaluators/
onex_stream_evaluator.py:148-150` and ``torchvision.ops.batched_nms`` at
`sAP/streamyolo/streamyolo_det.py:75-80`): confidence filter + class-aware
greedy NMS, reformulated with static shapes (top-k candidate selection + a
masked greedy sweep) so the whole serving path stays inside one jitted XLA
program with no host sync per frame (SURVEY.md §7 "Jittable NMS").

Semantics: identical box ordering to torch greedy NMS — candidates are sorted
by score descending, each box suppresses lower-scored boxes with IoU >
``nms_thre``; class-awareness via the coordinate-offset trick (same as
torchvision ``batched_nms``).
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# Large coordinate offset separating classes in class-aware NMS; bigger than
# any image dimension we run (multiscale max is 16*70 = 1120 px).
_CLASS_OFFSET = 8192.0


def _iou_matrix_xyxy(boxes: jax.Array) -> jax.Array:
    """[K,4] xyxy -> [K,K] IoU (torchvision convention: area = (x2-x1)*(y2-y1))."""
    tl = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    br = jnp.minimum(boxes[:, None, 2:4], boxes[None, :, 2:4])
    wh = jnp.clip(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area = jnp.clip(boxes[:, 2] - boxes[:, 0], 0.0) * jnp.clip(
        boxes[:, 3] - boxes[:, 1], 0.0
    )
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def nms_padded_sequential(boxes: jax.Array, valid: jax.Array, nms_thre: float) -> jax.Array:
    """Reference greedy NMS: K sequential suppression steps. Exact but
    serial — kept as the oracle for ``nms_padded`` (dual-implementation
    pattern, SURVEY.md §4.4). Do not use on the hot path: a K-iteration
    ``fori_loop`` costs ~K sequential VPU steps on TPU."""
    k = boxes.shape[0]
    iou = _iou_matrix_xyxy(boxes)
    idx = jnp.arange(k)

    def body(i, keep):
        # If box i survives, suppress all later boxes overlapping it.
        suppress = keep[i] & (iou[i] > nms_thre) & (idx > i)
        return keep & ~suppress

    keep = jax.lax.fori_loop(0, k, body, valid)
    return keep


def nms_padded(boxes: jax.Array, valid: jax.Array, nms_thre: float) -> jax.Array:
    """Greedy NMS over boxes already sorted by descending score — TPU-native
    fixed-point formulation.

    The greedy result is the unique fixed point of
        keep[i] = valid[i] & not exists j < i: keep[j] and iou[j, i] > thr.
    The suppression graph is a DAG (only j < i suppresses), so the fixed
    point is unique and iterating from keep = valid converges within the
    longest suppression-chain depth — typically 3-5 steps on real
    detections, each ONE [K, K] masked reduction on the VPU, instead of K
    sequential steps.

    Args:
      boxes: [K, 4] xyxy (already class-offset if class-aware).
      valid: [K] bool — padding / below-threshold entries.
      nms_thre: IoU suppression threshold.

    Returns [K] bool keep mask. Exactly the sequential greedy result
    (verified against ``nms_padded_sequential`` in tests).
    """
    k = boxes.shape[0]
    iou = _iou_matrix_xyxy(boxes)
    idx = jnp.arange(k)
    # suppress[j, i]: a kept earlier box j would suppress i
    suppress = (iou > nms_thre) & (idx[:, None] < idx[None, :])

    def cond(state):
        keep, prev, it = state
        return (it < k) & jnp.any(keep != prev)

    def body(state):
        keep, _, it = state
        new = valid & ~jnp.any(suppress & keep[:, None], axis=0)
        return new, keep, it + 1

    init = valid & ~jnp.any(suppress & valid[:, None], axis=0)
    keep, _, _ = jax.lax.while_loop(cond, body, (init, valid, jnp.int32(0)))
    return keep


def _postprocess_single(
    pred: jax.Array,
    num_classes: int,
    conf_thre: float,
    nms_thre: float,
    pre_nms_topk: int,
    class_agnostic: bool,
    use_pallas: bool = False,
) -> jax.Array:
    """Single-image postprocess: pred [N, 5+C] (cx,cy,w,h,obj,cls...) ->
    fixed [K, 8] rows (x1,y1,x2,y2,obj,cls_conf,cls,valid)."""
    # corner conversion (yolox postprocess box_corner step)
    half_wh = pred[:, 2:4] * 0.5
    corners = jnp.concatenate(
        [pred[:, :2] - half_wh, pred[:, :2] + half_wh], axis=-1
    )
    obj = pred[:, 4]
    cls_probs = pred[:, 5 : 5 + num_classes]
    cls_conf = jnp.max(cls_probs, axis=-1)
    cls_pred = jnp.argmax(cls_probs, axis=-1).astype(pred.dtype)
    scores = obj * cls_conf
    conf_ok = scores >= conf_thre

    # Top-k candidate selection as ONE multi-operand sort with the box/conf
    # payload riding along (lexicographic key (-score, index) reproduces
    # lax.top_k's order incl. its lower-index-first tie rule). Dynamic
    # row-GATHERS of the candidates (corners[top_idx] etc.) cost ~0.7 ms
    # per streaming step on TPU v5e — 4x the payload sort itself.
    k = min(pre_nms_topk, pred.shape[0])
    masked = jnp.where(conf_ok, scores, -1.0)
    idx = jnp.arange(pred.shape[0], dtype=jnp.int32)
    srt = jax.lax.sort(
        (
            -masked,
            idx,
            corners[:, 0],
            corners[:, 1],
            corners[:, 2],
            corners[:, 3],
            obj,
            cls_conf,
            cls_pred,
        ),
        num_keys=2,
    )
    top_scores = -srt[0][:k]
    boxes_k = jnp.stack([srt[2][:k], srt[3][:k], srt[4][:k], srt[5][:k]], axis=-1)
    obj_k, cls_conf_k, cls_pred_k = srt[6][:k], srt[7][:k], srt[8][:k]
    valid_k = top_scores > 0.0

    nms_boxes = boxes_k
    if not class_agnostic:
        nms_boxes = boxes_k + cls_pred_k[:, None] * _CLASS_OFFSET
    if use_pallas:
        from streamyolo_tpu.ops.nms_pallas import nms_padded_pallas

        keep = nms_padded_pallas(nms_boxes, valid_k, nms_thre)
    else:
        keep = nms_padded(nms_boxes, valid_k, nms_thre)

    out = jnp.concatenate(
        [
            boxes_k,
            obj_k[:, None],
            cls_conf_k[:, None],
            cls_pred_k[:, None],
            keep[:, None].astype(pred.dtype),
        ],
        axis=-1,
    )
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_classes", "conf_thre", "nms_thre", "pre_nms_topk",
        "class_agnostic", "use_pallas",
    ),
)
def postprocess_fixed(
    prediction: jax.Array,
    num_classes: int,
    conf_thre: float = 0.7,
    nms_thre: float = 0.45,
    pre_nms_topk: int = 1000,
    class_agnostic: bool = False,
    use_pallas: bool = None,
) -> jax.Array:
    """Batched jittable postprocess: [B, N, 5+C] -> [B, K, 8] fixed-shape
    detections, rows (x1, y1, x2, y2, obj, cls_conf, cls, valid).

    ``use_pallas=None`` auto-selects the VMEM-resident Pallas NMS kernel on
    directly-attached TPU backends (K <= 1024) — but only after a
    once-per-cache-dir selftest has compiled the kernel and cross-checked it
    bit-exact against the jnp fixed-point twin (``pallas_nms_verified``); the
    jnp path otherwise. The axon dev relay's remote-compile helper cannot
    build Mosaic kernels (HTTP 500), so the kernel is not auto-selected
    there."""
    if use_pallas is None:
        import os

        use_pallas = (
            jax.default_backend() == "tpu"
            and "axon" not in os.environ.get("JAX_PLATFORMS", "")
            and min(pre_nms_topk, prediction.shape[1]) <= 1024
            and pallas_nms_verified()
        )
    fn = functools.partial(
        _postprocess_single,
        num_classes=num_classes,
        conf_thre=conf_thre,
        nms_thre=nms_thre,
        pre_nms_topk=pre_nms_topk,
        class_agnostic=class_agnostic,
        use_pallas=use_pallas,
    )
    return jax.vmap(fn)(prediction.astype(jnp.float32))


def run_pallas_nms_selftest(
    trials: int = 4, k: int = 128, seed: int = 0, interpret: bool = False
):
    """Compile the Pallas NMS kernel and cross-check it bit-exact against the
    jnp fixed-point twin on random score-sorted candidate sets. Returns
    ``(ok, detail)``; any compile or numerics failure is ``(False, why)``."""
    try:
        from streamyolo_tpu.ops.nms_pallas import nms_padded_pallas

        rng = np.random.RandomState(seed)
        for trial in range(trials):
            cxy = rng.uniform(20, 500, (k, 2))
            wh = rng.uniform(5, 80, (k, 2))
            boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1)
            # score-sorted inputs with class offsets, like the real call site
            boxes += rng.randint(0, 3, (k, 1)) * _CLASS_OFFSET
            valid = rng.uniform(size=k) < 0.8
            boxes_j = jnp.asarray(boxes, jnp.float32)
            valid_j = jnp.asarray(valid)
            for thr in (0.45, 0.65):
                got = np.asarray(
                    nms_padded_pallas(boxes_j, valid_j, thr, interpret=interpret)
                )
                want = np.asarray(nms_padded(boxes_j, valid_j, thr))
                if not np.array_equal(got, want):
                    return False, (
                        f"keep-mask mismatch (trial {trial}, thr {thr}): "
                        f"{int((got != want).sum())} of {k} rows differ"
                    )
        return True, f"{trials} trials x 2 thresholds bit-exact (K={k})"
    except Exception as e:  # compile failures must fall back, not crash
        return False, f"{type(e).__name__}: {e}"


def pallas_nms_verified(force: bool = False) -> bool:
    """Once-per-cache-dir gate for the compiled Pallas NMS (safe first
    contact): before the kernel can serve traffic, run
    ``run_pallas_nms_selftest`` on the attached backend and persist the
    verdict next to the XLA compilation cache so later processes skip the
    check (``ops/pallas_gate.py``). ``force=True`` re-runs the selftest and
    rewrites the marker."""
    from streamyolo_tpu.ops.pallas_gate import kernel_verified

    return kernel_verified("nms", run_pallas_nms_selftest, force=force)


def candidate_counts(rows: np.ndarray, conf_thre: float) -> np.ndarray:
    """Per-image count of [..., K, 8] output slots holding above-confidence
    candidates. A count equal to K means the pre-NMS top-k selection
    SATURATED: there were >= K candidates above ``conf_thre`` and the
    lowest-scored ones were silently dropped before NMS (the reference NMS
    is uncapped — `yolox.utils.postprocess`). Every slot carries its raw
    obj/cls_conf payload whether or not it survived NMS, so this is exact
    and costs no extra device transfer."""
    scores = rows[..., 4] * rows[..., 5]
    return (scores >= conf_thre).sum(axis=-1)


def warn_if_saturated(
    rows: np.ndarray, conf_thre: float, n_anchors: Optional[int] = None
) -> int:
    """Log a warning when any image's candidate selection saturated
    ("no silent caps" discipline). Returns the number of saturated images.
    When the K slots cover every anchor (``k >= n_anchors``) nothing can have
    been dropped and a full count is not saturation."""
    k = rows.shape[-2]
    if n_anchors is not None and k >= n_anchors:
        return 0
    counts = candidate_counts(rows, conf_thre)
    n_sat = int((counts >= k).sum())
    if n_sat:
        from streamyolo_tpu.utils.logger import get_logger

        get_logger().warning(
            "pre-NMS candidate selection saturated on %d image(s): >= %d "
            "candidates above conf %.4g — lowest-scored candidates were "
            "dropped before NMS; raise pre_nms_topk if post-NMS rows matter "
            "at this density",
            n_sat, k, conf_thre,
        )
    return n_sat


def postprocess(
    prediction,
    num_classes: int,
    conf_thre: float = 0.7,
    nms_thre: float = 0.45,
    pre_nms_topk: int = 1000,
    class_agnostic: bool = False,
) -> List[Optional[np.ndarray]]:
    """Reference-surface wrapper: returns a per-image list of [n_i, 7] NumPy
    arrays (x1,y1,x2,y2,obj,cls_conf,cls) or None — the exact contract of
    ``yolox.utils.postprocess`` consumed by the evaluators."""
    fixed = np.asarray(
        postprocess_fixed(
            jnp.asarray(prediction),
            num_classes,
            conf_thre,
            nms_thre,
            pre_nms_topk,
            class_agnostic,
        )
    )
    warn_if_saturated(fixed, conf_thre, n_anchors=np.shape(prediction)[1])
    outputs: List[Optional[np.ndarray]] = []
    for row in fixed:
        kept = row[row[:, 7] > 0.5][:, :7]
        outputs.append(kept if len(kept) else None)
    return outputs
