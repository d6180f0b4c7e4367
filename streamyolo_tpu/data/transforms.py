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
    """In-place HSV gain jitter of a BGR uint8 image.

    Draws one multiplicative gain per channel (uniform in ``1 +/- *gain``),
    scales hue modulo the OpenCV 0..179 hue range and saturates S/V at 255,
    then converts back in place. Vectorized directly over the channel planes
    (value-identical to a 256-entry LUT since the map is per-value)."""
    gains = 1.0 + np.random.uniform(-1.0, 1.0, 3) * (hgain, sgain, vgain)
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.float64)
    hsv[..., 0] = (np.floor(hsv[..., 0]) * gains[0]) % 180
    hsv[..., 1:] = np.clip(hsv[..., 1:] * gains[1:], 0, 255)
    cv2.cvtColor(hsv.astype(img.dtype), cv2.COLOR_HSV2BGR, dst=img)


def warp_keep_mask(
    before: np.ndarray,
    after: np.ndarray,
    min_side: float = 2.0,
    max_aspect: float = 20.0,
    min_area_frac: float = 0.2,
) -> np.ndarray:
    """Keep-mask for boxes surviving a geometric warp.

    ``before``/``after`` are (n, 4) xyxy arrays (pre-warp boxes already in
    the warp's scale). A box survives if both post-warp sides exceed
    ``min_side`` px, it retains at least ``min_area_frac`` of its area, and
    its aspect ratio stays under ``max_aspect``.
    """
    eps = 1e-16
    bw, bh = (before[:, 2] - before[:, 0]), (before[:, 3] - before[:, 1])
    aw, ah = (after[:, 2] - after[:, 0]), (after[:, 3] - after[:, 1])
    aspect = np.maximum(aw / (ah + eps), ah / (aw + eps))
    keep = (aw > min_side) & (ah > min_side)
    keep &= aw * ah > min_area_frac * (bw * bh + eps)
    keep &= aspect < max_aspect
    return keep


def box_candidates(box1, box2, wh_thr=2, ar_thr=20, area_thr=0.2):
    """Reference-surface adapter (yolox ``data_augment.box_candidates``,
    SURVEY.md §2.3): (4, n) corner-stacked before/after boxes."""
    return warp_keep_mask(
        np.asarray(box1).T, np.asarray(box2).T,
        min_side=wh_thr, max_aspect=ar_thr, min_area_frac=area_thr,
    )


def _sample_warp_matrix(
    size_hw: Tuple[int, int],
    out_hw: Tuple[int, int],
    degrees: float,
    translate: float,
    scale: Tuple[float, float],
    shear: float,
) -> Tuple[np.ndarray, float]:
    """Draw one random rotate/scale/shear/translate warp as a 3x3 matrix.

    Pixel flow (right-to-left): recenter the source about its middle, rotate
    by a uniform angle while scaling uniformly, shear each axis, then drop
    the origin at a uniformly jittered point of the output canvas. Draw
    order is fixed so callers can replay the warp by reseeding ``random``
    (the mosaic wrapper applies one warp to both frames of a pair).
    """
    angle = math.radians(random.uniform(-degrees, degrees))
    zoom = random.uniform(scale[0], scale[1])
    shear_x = math.tan(math.radians(random.uniform(-shear, shear)))
    shear_y = math.tan(math.radians(random.uniform(-shear, shear)))
    tx = random.uniform(0.5 - translate, 0.5 + translate) * out_hw[1]
    ty = random.uniform(0.5 - translate, 0.5 + translate) * out_hw[0]

    recenter = np.array(
        [[1, 0, -size_hw[1] / 2], [0, 1, -size_hw[0] / 2], [0, 0, 1]], np.float64
    )
    cos_a, sin_a = zoom * math.cos(angle), zoom * math.sin(angle)
    # y grows downward, so a positive angle rotates counter-clockwise on
    # screen (the cv2.getRotationMatrix2D convention).
    rot = np.array([[cos_a, sin_a, 0], [-sin_a, cos_a, 0], [0, 0, 1]], np.float64)
    sh = np.array([[1, shear_x, 0], [shear_y, 1, 0], [0, 0, 1]], np.float64)
    shift = np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], np.float64)
    return shift @ sh @ rot @ recenter, zoom


def _warp_boxes(
    boxes: np.ndarray, matrix: np.ndarray, out_hw: Tuple[int, int], perspective: float
) -> np.ndarray:
    """Warp (n, 4) xyxy boxes: map all four corners, take the axis-aligned
    hull, clip to the output canvas."""
    x1, y1, x2, y2 = boxes.T
    corners = np.stack(
        [
            np.stack([x1, y1], -1),
            np.stack([x2, y2], -1),
            np.stack([x1, y2], -1),
            np.stack([x2, y1], -1),
        ],
        axis=1,
    )  # (n, 4 corners, 2)
    warped = corners @ matrix[:2, :2].T + matrix[:2, 2]
    if perspective:
        w = corners @ matrix[2, :2].T + matrix[2, 2]
        warped = warped / w[..., None]
    lo, hi = warped.min(axis=1), warped.max(axis=1)
    out = np.stack([lo[:, 0], lo[:, 1], hi[:, 0], hi[:, 1]], axis=-1)
    out[:, 0::2] = out[:, 0::2].clip(0, out_hw[1])
    out[:, 1::2] = out[:, 1::2].clip(0, out_hw[0])
    return out


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
    """Random affine/perspective warp of image + [xyxy, cls] targets (the
    mosaic post-transform; capability of yolox ``data_augment``, SURVEY.md
    §2.3). ``border`` shrinks (negative) or grows the output canvas, the
    mosaic wrapper's un-pad. Boxes that degenerate under the warp are
    dropped via ``warp_keep_mask``."""
    out_hw = (img.shape[0] + 2 * border[0], img.shape[1] + 2 * border[1])
    matrix, zoom = _sample_warp_matrix(
        img.shape[:2], out_hw, degrees, translate, scale, shear
    )

    if border != (0, 0) or not np.array_equal(matrix, np.eye(3)):
        gray = (114, 114, 114)
        if perspective:
            img = cv2.warpPerspective(
                img, matrix, dsize=(out_hw[1], out_hw[0]), borderValue=gray
            )
        else:
            img = cv2.warpAffine(
                img, matrix[:2], dsize=(out_hw[1], out_hw[0]), borderValue=gray
            )

    if len(targets):
        warped = _warp_boxes(targets[:, :4], matrix, out_hw, perspective)
        keep = warp_keep_mask(targets[:, :4] * zoom, warped)
        targets = targets[keep]
        targets[:, :4] = warped[keep]

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
    anchored. Returns **uint8 HWC** (TPU NHWC layout; the reference
    transposes to CHW and floats here — `/root/reference/exps/data/
    data_augment.py:142-158`) and the resize ratio. Keeping the host
    pipeline uint8 is lossless (the resize is cast to uint8 either way) and
    4x cheaper in host memory traffic, collate, and H2D than float32; the
    model casts on device (`models/yolox.py`), where the cast fuses into
    the stem's first read."""
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
    return np.ascontiguousarray(padded_img), r


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
