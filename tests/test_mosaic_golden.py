"""Seeded golden regression for the mosaic/mixup wrappers.

The golden file ``tests/golden/mosaic_golden.npz`` was generated (by running
this module with ``python tests/test_mosaic_golden.py --regen``) from the
round-3 implementation of ``streamyolo_tpu/data/mosaic.py`` immediately
before its round-4 in-house rewrite.  The rewrite is required to be
behavior-preserving — including the order of ``random`` draws — so every
output here must match bit-for-bit.
"""

import json
import os
import random

import numpy as np
import pytest

pytest.importorskip("cv2")

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden", "mosaic_golden.npz")
_H, _W = 64, 100
_IMG_SIZE = (32, 52)


def _build_dataset(root):
    """A tiny Argoverse-HD-format dataset with gradient frames (so resize
    interpolation is non-trivial) and 2 boxes per frame."""
    import cv2

    ann_dir = os.path.join(root, "Argoverse-HD", "annotations")
    os.makedirs(ann_dir, exist_ok=True)
    images, annotations = [], []
    img_id = ann_id = 0
    seq_dirs = ["seq0", "seq1"]
    for sid, n_frames in enumerate((4, 3)):
        d = os.path.join(root, "Argoverse-1.1", "tracking", seq_dirs[sid])
        os.makedirs(d, exist_ok=True)
        for fid in range(n_frames):
            yy, xx = np.mgrid[0:_H, 0:_W]
            frame = np.stack(
                [
                    (yy * 2 + 7 * img_id) % 256,
                    (xx * 3 + 11 * img_id) % 256,
                    (yy + xx + 29 * img_id) % 256,
                ],
                axis=-1,
            ).astype(np.uint8)
            # PNG: lossless, so the goldens don't depend on a jpeg encoder.
            cv2.imwrite(os.path.join(d, f"f{fid}.png"), frame)
            images.append(dict(id=img_id, width=_W, height=_H, sid=sid,
                               fid=fid, name=f"f{fid}.png"))
            for b, bbox in enumerate(([10 + 2 * fid, 20, 14, 10],
                                      [40, 8 + 3 * fid, 20, 16])):
                annotations.append(dict(id=ann_id, image_id=img_id,
                                        category_id=(2, 5)[b], bbox=bbox,
                                        area=bbox[2] * bbox[3], iscrowd=0))
                ann_id += 1
            img_id += 1
    categories = [dict(id=i, name=n) for i, n in enumerate(
        "person bicycle car motorcycle bus truck traffic_light stop_sign".split())]
    data = dict(images=images, annotations=annotations, categories=categories,
                seq_dirs=seq_dirs, sequences=seq_dirs)
    for split in ("train.json", "val.json"):
        with open(os.path.join(ann_dir, split), "w") as f:
            json.dump(data, f)
    return root


def _collect(root):
    """Run every mosaic/mixup surface with fixed seeds; return name→array."""
    from streamyolo_tpu.data import (
        MosaicDetection,
        ONE_ARGOVERSEDataset,
        STILL_ARGOVERSEDataset,
        StillMosaicDetection,
        TrainTransform,
        DoubleTrainTransform,
    )
    from streamyolo_tpu.data.mosaic import get_mosaic_coordinate

    out = {}

    # 1. Quadrant geometry over a grid incl. every clip case.
    rows = []
    for quadrant in range(4):
        for xc, yc in ((10, 12), (60, 50), (95, 60)):
            for w, h in ((30, 20), (104, 64), (3, 70)):
                (dst, src) = get_mosaic_coordinate(
                    quadrant, xc, yc, w, h, _IMG_SIZE[0], _IMG_SIZE[1])
                rows.append(list(dst) + list(src))
    out["coords"] = np.asarray(rows, np.int64)

    # 2. Double-frame mosaic branch.
    ds = ONE_ARGOVERSEDataset(root, "train.json", img_size=_IMG_SIZE)
    wrapped = MosaicDetection(
        ds, img_size=_IMG_SIZE, mosaic=True,
        preproc=DoubleTrainTransform(max_labels=50, hsv=False, flip=True),
        degrees=5.0, translate=0.05, scale=(0.8, 1.2), shear=1.0,
        enable_mixup=False, mosaic_prob=1.0,
    )
    for seed in range(4):
        random.seed(seed)
        stacked, (label, sup_label), _, _ = wrapped[seed % len(wrapped)]
        out[f"double_img_{seed}"] = np.asarray(stacked)
        out[f"double_lab_{seed}"] = np.asarray(label)
        out[f"double_sup_{seed}"] = np.asarray(sup_label)

    # 3. Still mosaic + mixup branch (CopyPaste path incl. crop-offset draws).
    sds = STILL_ARGOVERSEDataset(root, "train.json", img_size=_IMG_SIZE)
    swrapped = StillMosaicDetection(
        sds, img_size=_IMG_SIZE, mosaic=True,
        preproc=TrainTransform(max_labels=50, hsv=False, flip=True),
        degrees=5.0, translate=0.05, scale=(0.8, 1.2), shear=1.0,
        enable_mixup=True, mosaic_prob=1.0, mixup_prob=1.0,
        mscale=(0.6, 1.8),
    )
    for seed in range(6):
        random.seed(100 + seed)
        img, label, _, _ = swrapped[seed % len(swrapped)]
        out[f"still_img_{seed}"] = np.asarray(img)
        out[f"still_lab_{seed}"] = np.asarray(label)

    # 4. mixup() direct, with a pull_single that exercises the
    #    redraw-until-boxes loop (donor 0 is empty) and both overhang axes.
    m = swrapped
    base_y, base_x = np.mgrid[0:_IMG_SIZE[0] * 2, 0:_IMG_SIZE[1] * 2]
    base_img = np.stack([(base_y * 5) % 256, (base_x * 7) % 256,
                         (base_y + base_x) % 256], -1).astype(np.uint8)
    base_labels = np.array([[4.0, 6.0, 30.0, 28.0, 1.0]], np.float32)

    def pull_single(i):
        if i % 3 == 0:
            return base_img[:20, :20], np.zeros((0, 5), np.float32)
        yy, xx = np.mgrid[0:40, 0:70]
        img = np.stack([(yy * 3 + i) % 256, (xx * 2 + i) % 256,
                        (yy - xx + 5 * i) % 256], -1).astype(np.uint8)
        labs = np.array([[5.0 + i, 4.0, 36.0, 30.0, 2.0],
                         [40.0, 10.0, 66.0, 38.0, 0.0]], np.float32)
        return img, labs

    for seed in range(6):
        random.seed(200 + seed)
        img, labels = m.mixup(base_img.copy(), base_labels.copy(),
                              _IMG_SIZE, pull_single)
        out[f"mixup_img_{seed}"] = np.asarray(img)
        out[f"mixup_lab_{seed}"] = np.asarray(labels)
    return out


def test_mosaic_rewrite_matches_round3_golden(tmp_path):
    assert os.path.exists(GOLDEN), "golden file missing — run --regen first"
    got = _collect(_build_dataset(str(tmp_path)))
    want = np.load(GOLDEN)
    assert set(want.files) == set(got)
    for k in want.files:
        np.testing.assert_array_equal(
            got[k], want[k], err_msg=f"mosaic golden mismatch at {k!r}")


if __name__ == "__main__":
    import sys
    import tempfile

    if "--regen" in sys.argv:
        with tempfile.TemporaryDirectory() as td:
            arrays = _collect(_build_dataset(td))
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, **arrays)
        print(f"wrote {GOLDEN}: {len(arrays)} arrays")
