"""Greedy IoU track association.

Capability parity with `/root/reference/sAP/track/__init__.py:90-193`
(``iou_assoc`` / ``iou_assoc_no_tracks`` / ``track_based_shuffle``) and the
Cython speed twin `sAP/track/iou_assoc_cp.pyx:4-48`. The pure-Python version
here is the oracle; ``streamyolo_tpu.native`` provides the C++ twin
(``iou_assoc_cpp``) built with the repo's native extension, selected
automatically when available (dual-implementation pattern, SURVEY.md §4.4).

Boxes are ltwh. For each new detection j (score order), pick the unmatched
same-label previous box with the highest IoU >= threshold; unmatched new
detections start fresh track ids.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

try:  # C++ fast path (built on first import); Python twin is the oracle
    from streamyolo_tpu.native import iou_assoc_greedy_cpp as _iou_assoc_cpp
except Exception:  # pragma: no cover - toolchain missing
    _iou_assoc_cpp = None


def iou_ltwh(bboxes1: np.ndarray, bboxes2: np.ndarray) -> np.ndarray:
    """[m,4] x [n,4] ltwh -> [m,n] IoU (the maskUtils.iou capability used at
    `sAP/track/__init__.py:97`, box-only)."""
    from streamyolo_tpu.eval.cocoeval import bbox_iou_xywh

    bboxes1 = np.asarray(bboxes1, np.float64).reshape(-1, 4)
    bboxes2 = np.asarray(bboxes2, np.float64).reshape(-1, 4)
    return bbox_iou_xywh(bboxes1, bboxes2, np.zeros(len(bboxes2)))


def _greedy_match(ious: np.ndarray, labels1, labels2, match_iou_th: float):
    """For each new detection j (in score order), claim the still-free
    previous box of the same label with the highest IoU >= threshold.

    The per-detection scan is a vectorized masked argmax over previous
    boxes; ``free`` tracks which rows are still claimable. Equal maxima
    resolve to the HIGHEST row index (the sequential scan this replaces
    kept updating on ties), so the C++ twin stays bit-compatible.
    """
    ious = np.asarray(ious, np.float64)
    labels1 = np.asarray(labels1)
    labels2 = np.asarray(labels2)
    m, n = ious.shape
    free = np.ones(m, bool)
    prev_rows: List[int] = []
    new_cols: List[int] = []
    fresh: List[int] = []  # new detections that start their own track
    for j in range(n):
        if m:
            score = np.where(
                free & (labels1 == labels2[j]), ious[:, j], -np.inf
            )
            i = m - 1 - int(score[::-1].argmax())  # last argmax on ties
        if not m or score[i] < match_iou_th:
            fresh.append(j)
        else:
            free[i] = False
            prev_rows.append(i)
            new_cols.append(j)
    return prev_rows, new_cols, fresh


def iou_assoc(
    bboxes1, labels1, tracks1, tkidx: int, bboxes2, labels2,
    match_iou_th: float, no_unmatched1: bool = False,
) -> Tuple[list, list, int, np.ndarray, int]:
    """Associate previous (1) and new (2) detections; propagate track ids.

    Returns (order1, order2, n_matched, tracks2, tkidx) — matched elements
    shuffled to the front of both orders.
    """
    m = len(bboxes1)
    ious = iou_ltwh(bboxes1, bboxes2)
    if _iou_assoc_cpp is not None:
        matched1, matched2, unmatched2 = _iou_assoc_cpp(
            ious, np.asarray(labels1, np.int64), np.asarray(labels2, np.int64),
            match_iou_th,
        )
    else:
        matched1, matched2, unmatched2 = _greedy_match(
            ious, labels1, labels2, match_iou_th
        )

    if no_unmatched1:
        order1 = list(matched1)
    else:
        unmatched1 = list(set(range(m)) - set(matched1))
        order1 = list(matched1) + unmatched1
    order2 = list(matched2) + list(unmatched2)

    n_matched = len(matched2)
    n_unmatched2 = len(unmatched2)
    tracks1 = np.asarray(tracks1)
    tracks2 = np.concatenate(
        (
            tracks1[order1][:n_matched],
            np.arange(tkidx, tkidx + n_unmatched2, dtype=tracks1.dtype),
        )
    )
    tkidx += n_unmatched2
    return order1, order2, n_matched, tracks2, tkidx


def iou_assoc_no_tracks(
    bboxes1, labels1, bboxes2, labels2, match_iou_th: float,
    no_unmatched1: bool = False,
) -> Tuple[list, list, int]:
    m = len(bboxes1)
    ious = iou_ltwh(bboxes1, bboxes2)
    matched1, matched2, unmatched2 = _greedy_match(
        ious, labels1, labels2, match_iou_th
    )
    if no_unmatched1:
        order1 = list(matched1)
    else:
        unmatched1 = list(set(range(m)) - set(matched1))
        order1 = list(matched1) + unmatched1
    order2 = list(matched2) + list(unmatched2)
    return order1, order2, len(matched2)


def track_based_shuffle(tracks1, tracks2, no_unmatched1: bool = False):
    """Reorder two detection sets so entries sharing track ids align at the
    front (`sAP/track/__init__.py:179-193`)."""
    tracks1 = np.asarray(tracks1)
    tracks2 = np.asarray(tracks2)
    in1 = np.isin(tracks1, tracks2)
    in2 = np.isin(tracks2, tracks1)
    matched1 = np.nonzero(in1)[0]
    matched2 = np.nonzero(in2)[0]
    n_matched = len(matched1)
    if no_unmatched1:
        order1 = matched1
    else:
        order1 = np.concatenate((matched1, np.nonzero(~in1)[0]))
    order2 = np.concatenate((matched2, np.nonzero(~in2)[0]))
    return order1, order2, n_matched
