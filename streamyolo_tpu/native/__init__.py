"""ctypes bindings for the native C++ runtime kernels.

Builds ``native/streamyolo_native.cpp`` with g++ on first import (cached as a
shared library next to this file). pybind11 isn't available in this image, so
the bindings use a plain C ABI + ctypes — the same role the reference fills
with its pybind11 COCOeval_opt extension and Cython iou_assoc
(SURVEY.md §2.2).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(
    os.path.dirname(os.path.dirname(_HERE)), "native", "streamyolo_native.cpp"
)
_SO = os.path.join(_HERE, "_streamyolo_native.so")


def _build() -> str:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO + ".tmp"]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_SO + ".tmp", _SO)
    return _SO


def _load() -> ctypes.CDLL:
    if not os.path.exists(_SO) or (
        os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
    ):
        _build()
    return ctypes.CDLL(_SO)


_lib = _load()

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

_lib.cocoeval_match_image.argtypes = [
    _f64p, ctypes.c_int64, ctypes.c_int64,
    _u8p, _u8p, _f64p, ctypes.c_int64,
    _i64p, _i64p, _i64p, _i64p, _u8p,
]
_lib.iou_assoc_greedy.argtypes = [
    _f64p, ctypes.c_int64, ctypes.c_int64,
    _i64p, _i64p, ctypes.c_double,
    _i64p, _i64p, _i64p,
    ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
]
_lib.bbox_iou_ltwh.argtypes = [
    _f64p, ctypes.c_int64, _f64p, ctypes.c_int64, _u8p, _f64p,
]


def cocoeval_match_image_cpp(
    ious: np.ndarray,
    gt_ig: np.ndarray,
    iscrowd: np.ndarray,
    iou_thrs: np.ndarray,
    dt_ids: np.ndarray,
    gt_ids: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Greedy COCO matching for one (image, category) cell.
    Returns (dtm [T,D], gtm [T,G], dt_ig [T,D])."""
    D, G = ious.shape
    T = len(iou_thrs)
    dtm = np.zeros((T, D), np.int64)
    gtm = np.zeros((T, G), np.int64)
    dt_ig = np.zeros((T, D), np.uint8)
    _lib.cocoeval_match_image(
        np.ascontiguousarray(ious, np.float64), D, G,
        np.ascontiguousarray(gt_ig, np.uint8),
        np.ascontiguousarray(iscrowd, np.uint8),
        np.ascontiguousarray(iou_thrs, np.float64), T,
        np.ascontiguousarray(dt_ids, np.int64),
        np.ascontiguousarray(gt_ids, np.int64),
        dtm, gtm, dt_ig,
    )
    return dtm, gtm, dt_ig


def iou_assoc_greedy_cpp(
    ious: np.ndarray, labels1: np.ndarray, labels2: np.ndarray,
    match_iou_th: float,
) -> Tuple[list, list, list]:
    """Greedy association on a precomputed [m, n] IoU matrix.
    Returns (matched1, matched2, unmatched2) index lists."""
    m, n = ious.shape
    matched1 = np.zeros(n, np.int64)
    matched2 = np.zeros(n, np.int64)
    unmatched2 = np.zeros(n, np.int64)
    n_matched = ctypes.c_int64(0)
    n_unmatched2 = ctypes.c_int64(0)
    _lib.iou_assoc_greedy(
        np.ascontiguousarray(ious, np.float64), m, n,
        np.ascontiguousarray(labels1, np.int64),
        np.ascontiguousarray(labels2, np.int64),
        float(match_iou_th),
        matched1, matched2, unmatched2,
        ctypes.byref(n_matched), ctypes.byref(n_unmatched2),
    )
    nm, nu = n_matched.value, n_unmatched2.value
    return (
        matched1[:nm].tolist(), matched2[:nm].tolist(), unmatched2[:nu].tolist()
    )


def bbox_iou_ltwh_cpp(
    dt: np.ndarray, gt: np.ndarray, iscrowd: np.ndarray
) -> np.ndarray:
    dt = np.ascontiguousarray(np.asarray(dt, np.float64).reshape(-1, 4))
    gt = np.ascontiguousarray(np.asarray(gt, np.float64).reshape(-1, 4))
    out = np.zeros((len(dt), len(gt)), np.float64)
    _lib.bbox_iou_ltwh(
        dt, len(dt), gt, len(gt),
        np.ascontiguousarray(iscrowd, np.uint8), out,
    )
    return out


_lib.cocoeval_run.argtypes = [
    ctypes.c_int64, ctypes.c_int64,
    _i64p, _i64p,
    _f64p, _f64p, _f64p,        # dt: scores, boxes, areas
    _f64p, _f64p, _u8p, _u8p,   # gt: boxes, areas, crowd, ignore0
    _f64p, ctypes.c_int64,      # iou_thrs, T
    _f64p, ctypes.c_int64,      # rec_thrs, R
    _f64p, ctypes.c_int64,      # area_rng, A
    _i64p, ctypes.c_int64,      # max_dets, M
    _f64p, _f64p, _f64p,        # precision, recall, scores
]


def cocoeval_run_cpp(
    K, I, dt_off, gt_off, dt_scores, dt_boxes, dt_areas,
    gt_boxes, gt_areas, gt_crowd, gt_ign0,
    iou_thrs, rec_thrs, area_rng, max_dets,
):
    """Full COCO evaluate+accumulate in one native call. Returns
    (precision [T,R,K,A,M], recall [T,K,A,M], scores [T,R,K,A,M])."""
    T, R, A, M = len(iou_thrs), len(rec_thrs), len(area_rng), len(max_dets)
    precision = np.full((T, R, K, A, M), -1.0)
    recall = np.full((T, K, A, M), -1.0)
    scores = np.full((T, R, K, A, M), -1.0)
    _lib.cocoeval_run(
        K, I,
        np.ascontiguousarray(dt_off, np.int64),
        np.ascontiguousarray(gt_off, np.int64),
        np.ascontiguousarray(dt_scores, np.float64),
        np.ascontiguousarray(dt_boxes, np.float64),
        np.ascontiguousarray(dt_areas, np.float64),
        np.ascontiguousarray(gt_boxes, np.float64),
        np.ascontiguousarray(gt_areas, np.float64),
        np.ascontiguousarray(gt_crowd, np.uint8),
        np.ascontiguousarray(gt_ign0, np.uint8),
        np.ascontiguousarray(iou_thrs, np.float64), T,
        np.ascontiguousarray(rec_thrs, np.float64), R,
        np.ascontiguousarray(np.asarray(area_rng, np.float64).reshape(-1)), A,
        np.ascontiguousarray(max_dets, np.int64), M,
        precision.reshape(-1), recall.reshape(-1), scores.reshape(-1),
    )
    return precision, recall, scores
