"""Argoverse-HD streaming datasets (ONE_/TWO_/STILL_), host-side.

Capability parity with `/root/reference/exps/dataset/`:

  * ``ONE_ARGOVERSEDataset`` (`tal_flip_one_future_argoversedataset.py:17`):
    each sample is a (current, support=t-1) image pair; the training target is
    the labels of frame **t+1** (the model learns to predict the future) and
    the support target is the current frame's labels (TAL needs both).
  * ``TWO_ARGOVERSEDataset`` (`tal_flip_two_future_argoversedataset.py`):
    support = t-2, target = t+2 (2x-velocity variant).
  * ``STILL_ARGOVERSEDataset`` (`still_argoversedataset.py`): plain
    single-frame dataset (target = own labels), optional RAM image cache.

Boundary semantics are replicated exactly — including the reference's quirks,
which matter for metric parity:
  * frame pairing degrades to self-support at sequence starts/ends
    (`tal_flip_one_future_argoversedataset.py:74-91`);
  * the LAST TWO images of the whole dataset query annotations for the
    non-existent image id ``len(ids)`` and therefore get EMPTY targets
    (`:98-100` — getAnnIds on an unknown id returns []);
  * image ids are assumed to be consecutive 0..N-1 and equal to the dataset
    index (the reference indexes ``dataset['images'][int(id_)]`` directly).

Annotation JSON contract (Argoverse-HD format): images carry ``sid`` (sequence
id), ``fid`` (frame-in-sequence id), ``name``; the root carries ``seq_dirs``.
"""

from __future__ import annotations

import os
from typing import Tuple

import cv2
import numpy as np

from streamyolo_tpu.data.coco import COCO


class _ArgoverseBase:
    """Shared COCO-index plumbing. ``img_size`` is (height, width)."""

    def __init__(
        self,
        data_dir: str,
        json_file: str = "train.json",
        name: str = "train",
        img_size: Tuple[int, int] = (416, 416),
        preproc=None,
        cache: bool = False,
    ):
        self.data_dir = data_dir
        self.json_file = json_file
        self.coco = COCO(os.path.join(data_dir, "Argoverse-HD", "annotations", json_file))
        self.ids = self.coco.getImgIds()
        self.seq_dirs = self.coco.dataset["seq_dirs"]
        self.class_ids = sorted(self.coco.getCatIds())
        self._classes = self.coco.cats
        self.name = name
        self.max_labels = 50
        self.img_size = img_size
        # Mutable input dim — the batch sampler pokes this for multiscale
        # training (yolox ``datasets_wrapper.Dataset.input_dim`` indirection).
        self._input_dim = img_size
        self.enable_mosaic = False
        self.preproc = preproc
        # Support-frame dataset index per id (filled by ONE/TWO
        # _load_anno_from_id) — lets the memmap cache serve the support frame
        # without re-running boundary logic. Image ids are consecutive and
        # equal to the dataset index (documented invariant above).
        self._support_idx = {}
        self.annotations = [self._load_anno_from_id(i) for i in self.ids]
        self.imgs = None
        if cache:
            self._cache_images()

    @property
    def input_dim(self):
        return self._input_dim

    @input_dim.setter
    def input_dim(self, dim):
        self._input_dim = tuple(dim)

    def __len__(self):
        return len(self.ids)

    # -- annotation helpers -------------------------------------------------

    def _clean_objs(self, annotations, width, height) -> np.ndarray:
        """COCO anns -> [n, 5] (x1, y1, x2, y2, cls) clipped + letterbox-scaled
        by the dataset ratio (`tal_flip_one_future_argoversedataset.py:115-135`)."""
        objs = []
        for obj in annotations:
            x1 = max(0, obj["bbox"][0])
            y1 = max(0, obj["bbox"][1])
            x2 = min(width - 1, x1 + max(0, obj["bbox"][2]))
            y2 = min(height - 1, y1 + max(0, obj["bbox"][3]))
            if obj["area"] > 0 and x2 >= x1 and y2 >= y1:
                objs.append((x1, y1, x2, y2, self.class_ids.index(obj["category_id"])))
        res = np.zeros((len(objs), 5), dtype=np.float64)
        for ix, o in enumerate(objs):
            res[ix] = o
        r = min(self.img_size[0] / height, self.img_size[1] / width)
        res[:, :4] *= r
        return res

    def _anns_of(self, img_id: int):
        return self.coco.loadAnns(self.coco.getAnnIds(imgIds=[int(img_id)], iscrowd=False))

    def _file_name(self, im_ann) -> str:
        return os.path.join(
            self.data_dir, "Argoverse-1.1", "tracking",
            self.seq_dirs[im_ann["sid"]], im_ann["name"],
        )

    def load_anno(self, index):
        return self.annotations[index][0]

    # -- image IO -----------------------------------------------------------

    def _read_resized(self, file_name: str) -> np.ndarray:
        img = cv2.imread(file_name)
        assert img is not None, f"failed to read {file_name}"
        r = min(self.img_size[0] / img.shape[0], self.img_size[1] / img.shape[1])
        return cv2.resize(
            img,
            (int(img.shape[1] * r), int(img.shape[0] * r)),
            interpolation=cv2.INTER_LINEAR,
        ).astype(np.uint8)

    def _cache_images(self):
        """RAM memmap cache of letterbox-resized frames (pattern from
        `still_argoversedataset.py:60-100`)."""
        max_h = int(self.img_size[0])
        max_w = int(self.img_size[1])
        cache_file = os.path.join(
            self.data_dir, f"img_resized_cache_{self.name}.array"
        )
        if not os.path.exists(cache_file):
            self.imgs = np.memmap(
                cache_file, shape=(len(self.ids), max_h, max_w, 3),
                dtype=np.uint8, mode="w+",
            )
            for i in range(len(self.ids)):
                img = self._read_resized(self.annotations[i][4])
                self.imgs[i, : img.shape[0], : img.shape[1]] = img
            self.imgs.flush()
        self.imgs = np.memmap(
            cache_file, shape=(len(self.ids), max_h, max_w, 3),
            dtype=np.uint8, mode="r+",
        )


class ONE_ARGOVERSEDataset(_ArgoverseBase):
    """1x velocity: support frame t-1, target labels t+1."""

    def _load_anno_from_id(self, id_):
        im_ann = self.coco.loadImgs(id_)[0]
        width, height = im_ann["width"], im_ann["height"]
        images = self.coco.dataset["images"]
        seq_len = len(self.ids)

        # Support image: previous frame, degrading to self at boundaries
        # (`tal_flip_one_future_argoversedataset.py:74-91`).
        if images[int(id_)]["fid"] == 0:
            im_ann_support = im_ann
        elif int(id_) == seq_len - 1:
            im_ann_support = im_ann
        elif images[int(id_ + 1)]["fid"] == 0:
            im_ann_support = im_ann
        else:
            im_ann_support = self.coco.loadImgs(id_ - 1)[0]
        self._support_idx[int(id_)] = int(im_ann_support["id"])

        # Target annotations: next frame's labels, with the reference's
        # empty-target quirk for the last two dataset images (`:98-109`).
        if id_ in (seq_len - 1, seq_len - 2):
            annotations = self.coco.img_to_anns.get(int(seq_len), [])
        elif images[int(id_)]["fid"] == 0:
            annotations = self._anns_of(id_)
        elif images[int(id_ + 1)]["fid"] == 0:
            annotations = self._anns_of(id_)
        else:
            annotations = self._anns_of(id_ + 1)

        res = self._clean_objs(annotations, width, height)
        support_res = self._clean_objs(self._anns_of(id_), width, height)

        r = min(self.img_size[0] / height, self.img_size[1] / width)
        img_info = (height, width)
        resized_info = (int(height * r), int(width * r))
        return (
            res,
            support_res,
            img_info,
            resized_info,
            self._file_name(im_ann),
            self._file_name(im_ann_support),
        )

    def _cached_img(self, index) -> np.ndarray:
        h, w = self.annotations[index][3]  # resized_info
        return self.imgs[index][:h, :w].copy()

    def pull_item(self, index):
        id_ = self.ids[index]
        res, support_res, img_info, _, fname, support_fname = self.annotations[index]
        if self.imgs is not None:
            # --cache: both frames come from the memmap (the support frame is
            # just another dataset row, `_support_idx`); no disk IO per item.
            img = self._cached_img(index)
            support_img = self._cached_img(self._support_idx[int(id_)])
        else:
            img = self._read_resized(fname)
            support_img = self._read_resized(support_fname)
        return img, support_img, res.copy(), support_res.copy(), img_info, np.array([id_])

    def __getitem__(self, index):
        img, support_img, target, support_target, img_info, img_id = self.pull_item(index)
        if self.preproc is not None:
            img, support_img, target, support_target = self.preproc(
                (img, support_img), (target, support_target), self.input_dim
            )
        # NHWC channel concat (the reference concatenates CHW on axis 0).
        return (
            np.concatenate((img, support_img), axis=-1),
            (target, support_target),
            img_info,
            img_id,
        )


class TWO_ARGOVERSEDataset(ONE_ARGOVERSEDataset):
    """2x velocity: support frame t-2, target labels t+2
    (`tal_flip_two_future_argoversedataset.py:63-123`)."""

    def _load_anno_from_id(self, id_):
        im_ann = self.coco.loadImgs(id_)[0]
        width, height = im_ann["width"], im_ann["height"]
        images = self.coco.dataset["images"]
        seq_len = len(self.ids)

        if images[int(id_)]["fid"] == 0:
            im_ann_support = im_ann
        elif images[int(id_)]["fid"] == 1:
            im_ann_support = self.coco.loadImgs(id_ - 1)[0]
        elif int(id_) == seq_len - 1:
            im_ann_support = im_ann
        elif int(id_ + 1) == seq_len - 1:
            im_ann_support = self.coco.loadImgs(id_ - 1)[0]
        elif images[int(id_ + 1)]["fid"] == 0:
            im_ann_support = im_ann
        elif images[int(id_ + 2)]["fid"] == 0:
            im_ann_support = self.coco.loadImgs(id_ - 1)[0]
        else:
            im_ann_support = self.coco.loadImgs(id_ - 2)[0]
        self._support_idx[int(id_)] = int(im_ann_support["id"])

        if id_ in (seq_len - 1, seq_len - 2):
            annotations = self.coco.img_to_anns.get(int(seq_len), [])
        elif images[int(id_)]["fid"] == 0:
            annotations = self._anns_of(id_)
        elif images[int(id_)]["fid"] == 1:
            annotations = self._anns_of(id_ + 1)
        elif images[int(id_ + 1)]["fid"] == 0:
            annotations = self._anns_of(id_)
        elif images[int(id_ + 2)]["fid"] == 0:
            annotations = self._anns_of(id_ + 1)
        else:
            annotations = self._anns_of(id_ + 2)

        res = self._clean_objs(annotations, width, height)
        support_res = self._clean_objs(self._anns_of(id_), width, height)

        r = min(self.img_size[0] / height, self.img_size[1] / width)
        return (
            res,
            support_res,
            (height, width),
            (int(height * r), int(width * r)),
            self._file_name(im_ann),
            self._file_name(im_ann_support),
        )


class STILL_ARGOVERSEDataset(_ArgoverseBase):
    """Single-frame dataset: labels of frame t (`still_argoversedataset.py:17`)."""

    def _load_anno_from_id(self, id_):
        im_ann = self.coco.loadImgs(id_)[0]
        width, height = im_ann["width"], im_ann["height"]
        res = self._clean_objs(self._anns_of(id_), width, height)
        r = min(self.img_size[0] / height, self.img_size[1] / width)
        return (
            res,
            (height, width),
            (int(height * r), int(width * r)),
            self._file_name(im_ann),
        )

    def pull_item(self, index):
        id_ = self.ids[index]
        res, img_info, resized_info, _ = self.annotations[index]
        if self.imgs is not None:
            h, w = resized_info
            img = self.imgs[index][:h, :w].copy()
        else:
            img = self._read_resized(self.annotations[index][3])
        return img, res.copy(), img_info, np.array([id_])

    def __getitem__(self, index):
        img, target, img_info, img_id = self.pull_item(index)
        if self.preproc is not None:
            img, target = self.preproc(img, target, self.input_dim)
        return img, target, img_info, img_id

    def _cache_images(self):
        # STILL stores its file name at annotation slot 3.
        max_h, max_w = int(self.img_size[0]), int(self.img_size[1])
        cache_file = os.path.join(self.data_dir, f"img_resized_cache_{self.name}.array")
        if not os.path.exists(cache_file):
            self.imgs = np.memmap(
                cache_file, shape=(len(self.ids), max_h, max_w, 3),
                dtype=np.uint8, mode="w+",
            )
            for i in range(len(self.ids)):
                img = self._read_resized(self.annotations[i][3])
                self.imgs[i, : img.shape[0], : img.shape[1]] = img
            self.imgs.flush()
        self.imgs = np.memmap(
            cache_file, shape=(len(self.ids), max_h, max_w, 3),
            dtype=np.uint8, mode="r+",
        )
