"""Host-side image transforms (letterbox, HSV, flip) for the data pipeline.

Capability parity with `/root/reference/exps/data/data_augment_flip.py`:
``preproc`` letterbox-resize onto a 114-gray canvas (`:150-167`),
``augment_hsv`` LUT jitter (`:19-32`), deterministic-flag ``_mirror``
(`:143-148`), ``TrainTransform``/``DoubleTrainTransform`` (the SAME coin flip
mirrors both frames — temporal consistency of augmentation, `:224-234`),
``ValTransform``/``DoubleValTransform`` (`:239-275`), plus ``box_candidates``
and ``random_perspective`` (`:35-141`) used by the mosaic wrapper.

TPU-native differences: images stay **HWC uint8/float32 NHWC-ready** (no CHW
transpose — the device path is NHWC throughout) and cv2 work happens in the
loader workers; the device never sees a dynamic shape.
"""

from __future__ import annotations

import math
import random
from typing import Sequence, Tuple

import cv2
import numpy as np

from streamyolo_tpu.ops.boxes import xyxy2cxcywh


def augment_hsv(img: np.ndarray, hgain=0.015, sgain=0.7, vgain=0.4) -> None:
    """In-place LUT-based HSV jitter (BGR image)."""
    r = np.random.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
    dtype = img.dtype

    x = np.arange(0, 256, dtype=np.int16)
    lut_hue = ((x * r[0]) % 180).astype(dtype)
    lut_sat = np.clip(x * r[1], 0, 255).astype(dtype)
    lut_val = np.clip(x * r[2], 0, 255).astype(dtype)

    img_hsv = cv2.merge(
        (cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val))
    ).astype(dtype)
    cv2.cvtColor(img_hsv, cv2.COLOR_HSV2BGR, dst=img)


def box_candidates(box1, box2, wh_thr=2, ar_thr=20, area_thr=0.2):
    """Filter post-augmentation boxes: min side, area ratio, aspect ratio.
    box1/box2 are (4, n) before/after."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + 1e-16), h2 / (w2 + 1e-16))
    return (
        (w2 > wh_thr)
        & (h2 > wh_thr)
        & (w2 * h2 / (w1 * h1 + 1e-16) > area_thr)
        & (ar < ar_thr)
    )


def random_perspective(
    img: np.ndarray,
    targets=(),
    degrees=10,
    translate=0.1,
    scale=(0.5, 1.5),
    shear=10,
    perspective=0.0,
    border=(0, 0),
):
    """Random affine/perspective warp of image + [cls-last xyxy] targets
    (mosaic post-transform)."""
    height = img.shape[0] + border[0] * 2
    width = img.shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -img.shape[1] / 2
    C[1, 2] = -img.shape[0] / 2

    R = np.eye(3)
    a = random.uniform(-degrees, degrees)
    s = random.uniform(scale[0], scale[1])
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)

    S = np.eye(3)
    S[0, 1] = math.tan(random.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(random.uniform(-shear, shear) * math.pi / 180)

    T = np.eye(3)
    T[0, 2] = random.uniform(0.5 - translate, 0.5 + translate) * width
    T[1, 2] = random.uniform(0.5 - translate, 0.5 + translate) * height

    M = T @ S @ R @ C

    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            img = cv2.warpPerspective(img, M, dsize=(width, height), borderValue=(114, 114, 114))
        else:
            img = cv2.warpAffine(img, M[:2], dsize=(width, height), borderValue=(114, 114, 114))

    n = len(targets)
    if n:
        xy = np.ones((n * 4, 3))
        xy[:, :2] = targets[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)
        xy = xy @ M.T
        if perspective:
            xy = (xy[:, :2] / xy[:, 2:3]).reshape(n, 8)
        else:
            xy = xy[:, :2].reshape(n, 8)

        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        xy = np.concatenate((x.min(1), y.min(1), x.max(1), y.max(1))).reshape(4, n).T
        xy[:, [0, 2]] = xy[:, [0, 2]].clip(0, width)
        xy[:, [1, 3]] = xy[:, [1, 3]].clip(0, height)

        keep = box_candidates(box1=targets[:, :4].T * s, box2=xy.T)
        targets = targets[keep]
        targets[:, :4] = xy[keep]

    return img, targets


def _mirror(image: np.ndarray, boxes: np.ndarray, mirror: bool = False):
    """Horizontal flip, gated by an explicit flag so both frames of a pair
    share one coin flip."""
    _, width, _ = image.shape
    if mirror:
        image = image[:, ::-1]
        boxes = boxes.copy()
        boxes[:, 0::2] = width - boxes[:, 2::-2]
    return image, boxes


def preproc(
    img: np.ndarray, input_size: Sequence[int]
) -> Tuple[np.ndarray, float]:
    """Letterbox-resize onto a 114-gray (input_h, input_w) canvas, top-left
    anchored. Returns float32 **HWC** (TPU NHWC layout; the reference
    transposes to CHW here) and the resize ratio."""
    if len(img.shape) == 3:
        padded_img = np.ones((input_size[0], input_size[1], 3), dtype=np.uint8) * 114
    else:
        padded_img = np.ones(input_size, dtype=np.uint8) * 114

    r = min(input_size[0] / img.shape[0], input_size[1] / img.shape[1])
    resized_img = cv2.resize(
        img,
        (int(img.shape[1] * r), int(img.shape[0] * r)),
        interpolation=cv2.INTER_LINEAR,
    ).astype(np.uint8)
    padded_img[: int(img.shape[0] * r), : int(img.shape[1] * r)] = resized_img
    return np.ascontiguousarray(padded_img, dtype=np.float32), r


class TrainTransform:
    """Single-frame train transform: HSV jitter, flag-driven mirror,
    letterbox, xyxy->cxcywh, zero-pad labels to ``max_labels`` x 5."""

    def __init__(self, max_labels: int = 50, hsv: bool = True, flip: bool = True):
        self.max_labels = max_labels
        self.hsv = hsv
        self.flip = flip

    def __call__(self, image, targets, input_dim, mirror: bool = False):
        boxes = targets[:, :4].copy()
        labels = targets[:, 4].copy()
        if len(boxes) == 0:
            padded = np.zeros((self.max_labels, 5), dtype=np.float32)
            image, _ = preproc(image, input_dim)
            return image, padded

        image_o = image.copy()
        boxes_o = xyxy2cxcywh(targets[:, :4].copy())
        labels_o = targets[:, 4].copy()

        if self.hsv:
            augment_hsv(image)
        if self.flip:
            image_t, boxes = _mirror(image, boxes, mirror=mirror)
        else:
            image_t = image
        image_t, r_ = preproc(image_t, input_dim)
        boxes = xyxy2cxcywh(boxes)
        boxes *= r_

        mask_b = np.minimum(boxes[:, 2], boxes[:, 3]) > 1
        boxes_t = boxes[mask_b]
        labels_t = labels[mask_b]

        if len(boxes_t) == 0:
            # All boxes degenerate after augmentation: fall back to the
            # un-augmented image + labels (reference `:207-211`).
            image_t, r_o = preproc(image_o, input_dim)
            boxes_t = boxes_o * r_o
            labels_t = labels_o

        targets_t = np.hstack((np.expand_dims(labels_t, 1), boxes_t))
        padded = np.zeros((self.max_labels, 5), dtype=np.float32)
        padded[: min(len(targets_t), self.max_labels)] = targets_t[: self.max_labels]
        return image_t, np.ascontiguousarray(padded, dtype=np.float32)


class DoubleTrainTransform:
    """Two-frame transform: ONE coin flip applied as the same mirror to both
    frames so the temporal pair stays geometrically consistent."""

    def __init__(self, max_labels: int = 50, hsv: bool = True, flip: bool = True):
        self.transform1 = TrainTransform(max_labels=max_labels, hsv=hsv, flip=flip)
        self.transform2 = TrainTransform(max_labels=max_labels, hsv=hsv, flip=flip)

    def __call__(self, image, targets, input_dim):
        a = bool(random.randrange(2))
        img1, label1 = self.transform1(image[0], targets[0], input_dim, mirror=a)
        img2, label2 = self.transform2(image[1], targets[1], input_dim, mirror=a)
        return img1, img2, label1, label2


class ValTransform:
    """Letterbox only; labels replaced by a single zero row."""

    def __call__(self, img, res, input_size):
        img, _ = preproc(img, input_size)
        return img, np.zeros((1, 5), dtype=np.float32)


class DoubleValTransform:
    def __init__(self):
        self.transform1 = ValTransform()
        self.transform2 = ValTransform()

    def __call__(self, img, res, input_size):
        img1, label1 = self.transform1(img[0], res[0], input_size)
        img2, label2 = self.transform2(img[1], res[1], input_size)
        return img1, img2, label1, label2
