"""Coverage for the still-frame (PIPE) training path, the TWOX evaluator,
and the live mosaic/mixup augmentation branches."""

import argparse
import os

import numpy as np
import pytest

pytest.importorskip("cv2")

from streamyolo_tpu.data import (
    DataLoader,
    DoubleTrainTransform,
    DoubleValTransform,
    MosaicDetection,
    ONE_ARGOVERSEDataset,
    STILL_ARGOVERSEDataset,
    StillMosaicDetection,
    TrainTransform,
    TWO_ARGOVERSEDataset,
)
from streamyolo_tpu.eval import TWOX_COCOEvaluator
from streamyolo_tpu.exp import get_exp
from tests.conftest import FAKE_IMG_SIZE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_still_trainer_smoke(fake_argoverse, tmp_path):
    """PIPE head (no TAL), single-frame labels, STILL evaluator — one epoch."""
    exp = get_exp(os.path.join(REPO, "cfgs", "l_s50_still_dfp_flip.py"))
    exp.depth, exp.width = 0.33, 0.25  # shrink for CPU
    exp.data_dir = fake_argoverse
    exp.input_size = FAKE_IMG_SIZE
    exp.test_size = FAKE_IMG_SIZE
    exp.random_size = None
    exp.data_num_workers = 0
    exp.max_epoch = 1
    exp.no_aug_epochs = 1
    exp.eval_interval = 1
    exp.save_history_ckpt = False
    exp.output_dir = str(tmp_path)
    exp.print_interval = 1

    args = argparse.Namespace(
        batch_size=8, fp16=False, resume=False, ckpt=None, cache=False,
        experiment_name="still_smoke", eval_batch_size=4, start_epoch=None,
    )
    trainer = exp.get_trainer(args)
    assert not trainer.use_tal
    trainer.train()
    assert np.isfinite(float(trainer._last_metrics["total_loss"]))
    assert os.path.exists(os.path.join(str(tmp_path), "still_smoke", "latest_ckpt.pkl"))


def test_twox_evaluator_shift_and_skips(fake_argoverse):
    ds = TWO_ARGOVERSEDataset(
        fake_argoverse, "val.json", name="val", img_size=FAKE_IMG_SIZE,
        preproc=DoubleValTransform(),
    )
    loader = DataLoader(ds, batch_size=1, num_workers=0, shuffle=False)
    evaluator = TWOX_COCOEvaluator(
        loader, img_size=FAKE_IMG_SIZE, confthre=0.3, nmsthre=0.5, num_classes=8,
    )
    coco = evaluator.dataset.coco

    def forward(images):
        preds = np.zeros((images.shape[0], 8, 13), np.float32)
        preds[:, 0, :4] = (10, 22, 8, 6)
        preds[:, 0, 4] = 1.0
        preds[:, 0, 5 + 2] = 1.0
        return preds

    (_, _, _), data_list = evaluator.evaluate(forward, return_outputs=True)
    # 7 images (seqs of 4 + 3): fid 0/1 drop (dead branches), +1/+2 boundary
    # skips drop the sequence tails. Survivors: id 2 of seq0? id2 has
    # images[3].fid=3 !=0 but images[4].fid==0 -> skipped. seq1 id 5? fid=1
    # -> dead branch. So NOTHING survives on this tiny layout at 2x.
    assert data_list == []


def test_twox_evaluator_positive_path(fake_argoverse_long):
    """On an 8-frame sequence the id+2 arithmetic actually emits rows: a
    perfect future-frame oracle (predicts frame t+2's gt from the pair at t)
    must score rows for exactly image_ids 4..7 and AP50 = 4/8 survivors
    (reference append path `twox_stream_evaluator.py:188-206`)."""
    from tests.test_evaluators import _oracle_forward

    ds = TWO_ARGOVERSEDataset(
        fake_argoverse_long, "val.json", name="val", img_size=FAKE_IMG_SIZE,
        preproc=DoubleValTransform(),
    )
    loader = DataLoader(ds, batch_size=1, num_workers=0, shuffle=False)
    evaluator = TWOX_COCOEvaluator(
        loader, img_size=FAKE_IMG_SIZE, confthre=0.3, nmsthre=0.5, num_classes=8,
    )
    (_, ap50, _), data_list = evaluator.evaluate(
        _oracle_forward(ds, shift=2), return_outputs=True
    )
    # ids 0,1: fid in (0,1) dead branches; ids 6,7: id+2 over the tail.
    # Survivors 2..5 append under image_id+2.
    assert sorted(d["image_id"] for d in data_list) == [4, 5, 6, 7]
    # each row is that image's own gt box -> precision 1 up to recall 4/8:
    # 51 of the 101 recall points
    assert ap50 == pytest.approx(51 / 101, abs=1e-6)
    for d in data_list:
        assert d["category_id"] == 2
        x, y, w, h = d["bbox"]
        fid = d["image_id"]  # single sequence: fid == id
        assert (x, y, w, h) == pytest.approx((10 + 2 * fid, 20, 10, 8), abs=1e-3)


def test_double_mosaic_branch(fake_argoverse):
    """The double-frame mosaic branch must produce a consistent 6-channel
    pair (the reference's would crash; ours is implemented, PARITY.md)."""
    ds = ONE_ARGOVERSEDataset(fake_argoverse, "train.json", img_size=FAKE_IMG_SIZE)
    wrapped = MosaicDetection(
        ds, img_size=FAKE_IMG_SIZE, mosaic=True,
        preproc=DoubleTrainTransform(max_labels=120, hsv=False, flip=True),
        degrees=5.0, translate=0.05, scale=(0.8, 1.2), shear=1.0,
        enable_mixup=False, mosaic_prob=1.0,
    )
    import random

    random.seed(0)
    stacked, (label, sup_label), _, _ = wrapped[1]
    assert stacked.shape == (FAKE_IMG_SIZE[0], FAKE_IMG_SIZE[1], 6)
    assert label.shape == (120, 5) and sup_label.shape == (120, 5)


def test_still_mosaic_and_mixup_branch(fake_argoverse):
    ds = STILL_ARGOVERSEDataset(fake_argoverse, "train.json", img_size=FAKE_IMG_SIZE)
    wrapped = StillMosaicDetection(
        ds, img_size=FAKE_IMG_SIZE, mosaic=True,
        preproc=TrainTransform(max_labels=120, hsv=False, flip=True),
        degrees=5.0, translate=0.05, scale=(0.8, 1.2), shear=1.0,
        enable_mixup=True, mosaic_prob=1.0, mixup_prob=1.0,
    )
    import random

    random.seed(1)
    img, label, _, _ = wrapped[0]
    assert img.shape == (FAKE_IMG_SIZE[0], FAKE_IMG_SIZE[1], 3)
    assert label.shape == (120, 5)
