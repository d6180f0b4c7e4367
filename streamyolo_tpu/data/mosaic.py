"""Mosaic + MixUp(CopyPaste) dataset wrappers.

Capability parity with `/root/reference/exps/data/tal_flip_mosaicdetection.py`
(double-frame datasets) and `exps/data/mosaicdetection.py` (still dataset).

Note on the reference: all shipped stream configs set
``no_aug_epochs = max_epoch``, so ``mosaic=False`` from epoch 0 and only the
pass-through branch ever runs (`cfgs/s_s50_onex_dfp_tal_flip.py:24-25`;
SURVEY.md §2.1). The reference's mosaic branch would in fact crash on the
double dataset (its ``pull_item`` unpack expects 4 values but gets 6,
`tal_flip_mosaicdetection.py:197`). We keep the same wrapper surface; the
double wrapper's mosaic branch is implemented *correctly* here (mosaics the
current/support pair consistently) instead of replicating the crash.
"""

from __future__ import annotations

import random

import cv2
import numpy as np

from streamyolo_tpu.data.transforms import box_candidates, random_perspective
from streamyolo_tpu.ops.boxes import adjust_box_anns


def get_mosaic_coordinate(mosaic_index, xc, yc, w, h, input_h, input_w):
    """Paste rectangle in the 2x canvas + source crop for one of the 4 tiles."""
    if mosaic_index == 0:
        x1, y1, x2, y2 = max(xc - w, 0), max(yc - h, 0), xc, yc
        small_coord = w - (x2 - x1), h - (y2 - y1), w, h
    elif mosaic_index == 1:
        x1, y1, x2, y2 = xc, max(yc - h, 0), min(xc + w, input_w * 2), yc
        small_coord = 0, h - (y2 - y1), min(w, x2 - x1), h
    elif mosaic_index == 2:
        x1, y1, x2, y2 = max(xc - w, 0), yc, xc, min(input_h * 2, yc + h)
        small_coord = w - (x2 - x1), 0, w, min(y2 - y1, h)
    else:
        x1, y1, x2, y2 = xc, yc, min(xc + w, input_w * 2), min(input_h * 2, yc + h)
        small_coord = 0, 0, min(w, x2 - x1), min(y2 - y1, h)
    return (x1, y1, x2, y2), small_coord


class _MosaicBase:
    def __init__(
        self, dataset, img_size, mosaic=True, preproc=None,
        degrees=10.0, translate=0.1, scale=(0.5, 1.5), mscale=(0.5, 1.5),
        shear=2.0, perspective=0.0, enable_mixup=True,
        mosaic_prob=1.0, mixup_prob=1.0, *args,
    ):
        self._dataset = dataset
        self.img_size = img_size
        self.preproc = preproc
        self.degrees = degrees
        self.translate = translate
        self.scale = scale
        self.shear = shear
        self.perspective = perspective
        self.mixup_scale = mscale
        self.enable_mosaic = mosaic
        self.enable_mixup = enable_mixup
        self.mosaic_prob = mosaic_prob
        self.mixup_prob = mixup_prob

    # input_dim indirection forwarded to the wrapped dataset
    @property
    def input_dim(self):
        return self._dataset.input_dim

    @input_dim.setter
    def input_dim(self, dim):
        self._dataset.input_dim = dim

    def __len__(self):
        return len(self._dataset)

    def _mosaic_tiles(self, imgs_labels, input_h, input_w, yc, xc):
        """Compose 4 (img, labels) tiles into a 2x mosaic canvas."""
        mosaic_img = None
        mosaic_labels = []
        for i_mosaic, (img, _labels) in enumerate(imgs_labels):
            h0, w0 = img.shape[:2]
            scale = min(1.0 * input_h / h0, 1.0 * input_w / w0)
            img = cv2.resize(
                img, (int(w0 * scale), int(h0 * scale)), interpolation=cv2.INTER_LINEAR
            )
            h, w, c = img.shape[:3]
            if i_mosaic == 0:
                mosaic_img = np.full((input_h * 2, input_w * 2, c), 114, dtype=np.uint8)
            (l_x1, l_y1, l_x2, l_y2), (s_x1, s_y1, s_x2, s_y2) = get_mosaic_coordinate(
                i_mosaic, xc, yc, w, h, input_h, input_w
            )
            mosaic_img[l_y1:l_y2, l_x1:l_x2] = img[s_y1:s_y2, s_x1:s_x2]
            padw, padh = l_x1 - s_x1, l_y1 - s_y1

            labels = _labels.copy()
            if _labels.size > 0:
                labels[:, 0] = scale * _labels[:, 0] + padw
                labels[:, 1] = scale * _labels[:, 1] + padh
                labels[:, 2] = scale * _labels[:, 2] + padw
                labels[:, 3] = scale * _labels[:, 3] + padh
            mosaic_labels.append(labels)

        mosaic_labels = np.concatenate(mosaic_labels, 0)
        np.clip(mosaic_labels[:, 0], 0, 2 * input_w, out=mosaic_labels[:, 0])
        np.clip(mosaic_labels[:, 1], 0, 2 * input_h, out=mosaic_labels[:, 1])
        np.clip(mosaic_labels[:, 2], 0, 2 * input_w, out=mosaic_labels[:, 2])
        np.clip(mosaic_labels[:, 3], 0, 2 * input_h, out=mosaic_labels[:, 3])
        return mosaic_img, mosaic_labels

    def mixup(self, origin_img, origin_labels, input_dim, pull_single):
        """CopyPaste-style mixup (`tal_flip_mosaicdetection.py:259-333`)."""
        jit_factor = random.uniform(*self.mixup_scale)
        FLIP = random.uniform(0, 1) > 0.5
        cp_labels = []
        while len(cp_labels) == 0:
            cp_index = random.randint(0, len(self) - 1)
            _, cp_labels = pull_single(cp_index)
        img, cp_labels = pull_single(cp_index)

        if len(img.shape) == 3:
            cp_img = np.ones((input_dim[0], input_dim[1], 3), dtype=np.uint8) * 114
        else:
            cp_img = np.ones(input_dim, dtype=np.uint8) * 114

        cp_scale_ratio = min(input_dim[0] / img.shape[0], input_dim[1] / img.shape[1])
        resized_img = cv2.resize(
            img,
            (int(img.shape[1] * cp_scale_ratio), int(img.shape[0] * cp_scale_ratio)),
            interpolation=cv2.INTER_LINEAR,
        )
        cp_img[: resized_img.shape[0], : resized_img.shape[1]] = resized_img

        cp_img = cv2.resize(
            cp_img,
            (int(cp_img.shape[1] * jit_factor), int(cp_img.shape[0] * jit_factor)),
        )
        cp_scale_ratio *= jit_factor
        if FLIP:
            cp_img = cp_img[:, ::-1, :]

        origin_h, origin_w = cp_img.shape[:2]
        target_h, target_w = origin_img.shape[:2]
        padded_img = np.zeros(
            (max(origin_h, target_h), max(origin_w, target_w), 3), dtype=np.uint8
        )
        padded_img[:origin_h, :origin_w] = cp_img

        x_offset, y_offset = 0, 0
        if padded_img.shape[0] > target_h:
            y_offset = random.randint(0, padded_img.shape[0] - target_h - 1)
        if padded_img.shape[1] > target_w:
            x_offset = random.randint(0, padded_img.shape[1] - target_w - 1)
        padded_cropped_img = padded_img[
            y_offset : y_offset + target_h, x_offset : x_offset + target_w
        ]

        cp_bboxes_origin_np = adjust_box_anns(
            cp_labels[:, :4].copy(), cp_scale_ratio, 0, 0, origin_w, origin_h
        )
        if FLIP:
            cp_bboxes_origin_np[:, 0::2] = (
                origin_w - cp_bboxes_origin_np[:, 0::2][:, ::-1]
            )
        cp_bboxes_transformed_np = cp_bboxes_origin_np.copy()
        cp_bboxes_transformed_np[:, 0::2] = np.clip(
            cp_bboxes_transformed_np[:, 0::2] - x_offset, 0, target_w
        )
        cp_bboxes_transformed_np[:, 1::2] = np.clip(
            cp_bboxes_transformed_np[:, 1::2] - y_offset, 0, target_h
        )
        keep_list = box_candidates(cp_bboxes_origin_np.T, cp_bboxes_transformed_np.T, 5)

        if keep_list.sum() >= 1.0:
            cls_labels = cp_labels[keep_list, 4:5].copy()
            box_labels = cp_bboxes_transformed_np[keep_list]
            labels = np.hstack((box_labels, cls_labels))
            origin_labels = np.vstack((origin_labels, labels))
            origin_img = origin_img.astype(np.float32)
            origin_img = 0.5 * origin_img + 0.5 * padded_cropped_img.astype(np.float32)

        return origin_img.astype(np.uint8), origin_labels


class MosaicDetection(_MosaicBase):
    """Wrapper for the double-frame (ONE_/TWO_) datasets."""

    def __getitem__(self, idx):
        if self.enable_mosaic and random.random() < self.mosaic_prob:
            input_dim = self._dataset.input_dim
            input_h, input_w = input_dim[0], input_dim[1]
            yc = int(random.uniform(0.5 * input_h, 1.5 * input_h))
            xc = int(random.uniform(0.5 * input_w, 1.5 * input_w))
            indices = [idx] + [
                random.randint(0, len(self._dataset) - 1) for _ in range(3)
            ]

            cur_tiles, sup_tiles = [], []
            for index in indices:
                img, sup_img, label, sup_label, _, _ = self._dataset.pull_item(index)
                cur_tiles.append((img, label))
                sup_tiles.append((sup_img, sup_label))

            # The SAME mosaic geometry for both frames keeps the temporal
            # pair consistent (the augmentation analogue of the shared flip).
            rng_state = random.getstate()
            mosaic_img, mosaic_labels = self._mosaic_tiles(
                cur_tiles, input_h, input_w, yc, xc
            )
            sup_mosaic_img, sup_mosaic_labels = self._mosaic_tiles(
                sup_tiles, input_h, input_w, yc, xc
            )

            random.setstate(rng_state)
            mosaic_img, mosaic_labels = random_perspective(
                mosaic_img, mosaic_labels,
                degrees=self.degrees, translate=self.translate, scale=self.scale,
                shear=self.shear, perspective=self.perspective,
                border=[-input_h // 2, -input_w // 2],
            )
            random.setstate(rng_state)
            sup_mosaic_img, sup_mosaic_labels = random_perspective(
                sup_mosaic_img, sup_mosaic_labels,
                degrees=self.degrees, translate=self.translate, scale=self.scale,
                shear=self.shear, perspective=self.perspective,
                border=[-input_h // 2, -input_w // 2],
            )

            img, sup_img, label, sup_label = self.preproc(
                (mosaic_img, sup_mosaic_img),
                (mosaic_labels, sup_mosaic_labels),
                self.input_dim,
            )
            img_info = (img.shape[0], img.shape[1])
            return (
                np.concatenate((img, sup_img), axis=-1),
                (label, sup_label),
                img_info,
                np.array([idx]),
            )

        self._dataset.input_dim = self.input_dim
        img, support_img, label, support_label, img_info, id_ = self._dataset.pull_item(idx)
        img, support_img, label, support_label = self.preproc(
            (img, support_img), (label, support_label), self.input_dim
        )
        return (
            np.concatenate((img, support_img), axis=-1),
            (label, support_label),
            img_info,
            id_,
        )


class StillMosaicDetection(_MosaicBase):
    """Wrapper for the single-frame STILL dataset
    (`/root/reference/exps/data/mosaicdetection.py`)."""

    def __getitem__(self, idx):
        if self.enable_mosaic and random.random() < self.mosaic_prob:
            input_dim = self._dataset.input_dim
            input_h, input_w = input_dim[0], input_dim[1]
            yc = int(random.uniform(0.5 * input_h, 1.5 * input_h))
            xc = int(random.uniform(0.5 * input_w, 1.5 * input_w))
            indices = [idx] + [
                random.randint(0, len(self._dataset) - 1) for _ in range(3)
            ]
            tiles = []
            for index in indices:
                img, label, _, _ = self._dataset.pull_item(index)
                tiles.append((img, label))
            mosaic_img, mosaic_labels = self._mosaic_tiles(
                tiles, input_h, input_w, yc, xc
            )
            mosaic_img, mosaic_labels = random_perspective(
                mosaic_img, mosaic_labels,
                degrees=self.degrees, translate=self.translate, scale=self.scale,
                shear=self.shear, perspective=self.perspective,
                border=[-input_h // 2, -input_w // 2],
            )
            if (
                self.enable_mixup
                and not len(mosaic_labels) == 0
                and random.random() < self.mixup_prob
            ):
                mosaic_img, mosaic_labels = self.mixup(
                    mosaic_img, mosaic_labels, self.input_dim,
                    lambda i: self._dataset.pull_item(i)[:2],
                )
            mix_img, padded_labels = self.preproc(
                mosaic_img, mosaic_labels, self.input_dim
            )
            img_info = (mix_img.shape[1], mix_img.shape[0])
            return mix_img, padded_labels, img_info, np.array([idx])

        self._dataset.input_dim = self.input_dim
        img, label, img_info, id_ = self._dataset.pull_item(idx)
        img, label = self.preproc(img, label, self.input_dim)
        return img, label, img_info, id_
