"""Hand-verified golden tests for the native COCOeval implementation.

Each case's expected AP is derived analytically from the COCO protocol
(greedy matching at 10 IoU thresholds, 101-point interpolated precision).
"""

import numpy as np
import pytest

from streamyolo_tpu.data.coco import COCO
from streamyolo_tpu.eval.cocoeval import COCOeval, bbox_iou_xywh


def make_gt(boxes_per_img, cats=None, crowd=None):
    """boxes_per_img: {img_id: [ltwh, ...]}."""
    images = [dict(id=i, width=1000, height=1000) for i in boxes_per_img]
    anns = []
    k = 0
    for img_id, boxes in boxes_per_img.items():
        for j, b in enumerate(boxes):
            anns.append(
                dict(
                    id=k + 1, image_id=img_id,
                    category_id=(cats or {}).get((img_id, j), 1),
                    bbox=list(map(float, b)), area=float(b[2] * b[3]),
                    iscrowd=int((crowd or {}).get((img_id, j), 0)),
                )
            )
            k += 1
    return COCO(
        dict(images=images, annotations=anns,
             categories=[dict(id=1, name="a"), dict(id=2, name="b")])
    )


def run_eval(gt, results):
    dt = gt.loadRes(results)
    e = COCOeval(gt, dt, "bbox")
    e.evaluate()
    e.accumulate()
    e.summarize()
    return e


def test_iou_xywh():
    dt = np.array([[0.0, 0, 10, 10]])
    gt = np.array([[5.0, 0, 10, 10]])
    iou = bbox_iou_xywh(dt, gt, np.zeros(1))
    assert iou[0, 0] == pytest.approx(50 / 150)
    # crowd: denominator is dt area
    iou_c = bbox_iou_xywh(dt, gt, np.ones(1))
    assert iou_c[0, 0] == pytest.approx(50 / 100)


def test_perfect_match_ap1():
    gt = make_gt({0: [[10, 10, 50, 40]]})
    e = run_eval(gt, [dict(image_id=0, category_id=1, bbox=[10, 10, 50, 40], score=0.9)])
    assert e.stats[0] == pytest.approx(1.0)
    assert e.stats[1] == pytest.approx(1.0)
    assert e.stats[8] == pytest.approx(1.0)  # AR@100


def test_iou_06_matches_three_thresholds():
    # dt IoU with gt = 0.6 exactly: TP at thresholds 0.5, 0.55, 0.6 -> AP 0.3
    gt = make_gt({0: [[0, 0, 10, 10]]})
    # shift x by 2.5: inter = 7.5*10 = 75, union = 125 -> iou 0.6
    e = run_eval(gt, [dict(image_id=0, category_id=1, bbox=[2.5, 0, 10, 10], score=0.9)])
    assert e.stats[0] == pytest.approx(0.3)
    assert e.stats[1] == pytest.approx(1.0)  # AP50
    assert e.stats[2] == pytest.approx(0.0)  # AP75


def test_lower_scored_fp_does_not_hurt_ap():
    gt = make_gt({0: [[10, 10, 50, 40]]})
    e = run_eval(
        gt,
        [
            dict(image_id=0, category_id=1, bbox=[10, 10, 50, 40], score=0.9),
            dict(image_id=0, category_id=1, bbox=[500, 500, 50, 40], score=0.5),
        ],
    )
    assert e.stats[1] == pytest.approx(1.0)


def test_higher_scored_fp_halves_ap():
    gt = make_gt({0: [[10, 10, 50, 40]]})
    e = run_eval(
        gt,
        [
            dict(image_id=0, category_id=1, bbox=[500, 500, 50, 40], score=0.95),
            dict(image_id=0, category_id=1, bbox=[10, 10, 50, 40], score=0.9),
        ],
    )
    # precision envelope = 0.5 at every recall point
    assert e.stats[1] == pytest.approx(0.5)


def test_missed_gt_halves_recall_and_ap():
    gt = make_gt({0: [[10, 10, 50, 40]], 1: [[10, 10, 50, 40]]})
    e = run_eval(gt, [dict(image_id=0, category_id=1, bbox=[10, 10, 50, 40], score=0.9)])
    # recall stops at 0.5; precision 1.0 up to recall 0.5 -> 51/101 points
    assert e.stats[1] == pytest.approx(51 / 101)
    assert e.stats[8] == pytest.approx(0.5)


def test_crowd_gt_absorbs_duplicates():
    gt = make_gt({0: [[0, 0, 100, 100], [300, 300, 50, 50]]},
                 crowd={(0, 0): 1})
    # two dts inside the crowd region + one matching the real gt
    e = run_eval(
        gt,
        [
            dict(image_id=0, category_id=1, bbox=[0, 0, 100, 100], score=0.9),
            dict(image_id=0, category_id=1, bbox=[10, 10, 80, 80], score=0.8),
            dict(image_id=0, category_id=1, bbox=[300, 300, 50, 50], score=0.7),
        ],
    )
    # crowd gt is ignored for recall; both crowd-matched dts are ignored;
    # the real gt is matched -> perfect.
    assert e.stats[1] == pytest.approx(1.0)


def test_category_separation():
    gt = make_gt({0: [[10, 10, 50, 40], [200, 200, 50, 40]]},
                 cats={(0, 0): 1, (0, 1): 2})
    # correct box but wrong category for gt 2
    e = run_eval(
        gt,
        [
            dict(image_id=0, category_id=1, bbox=[10, 10, 50, 40], score=0.9),
            dict(image_id=0, category_id=1, bbox=[200, 200, 50, 40], score=0.8),
        ],
    )
    # cat 1: 1 TP + 1 FP (higher-scored TP first -> AP 1.0 up to recall 1)
    # cat 2: no dts -> AP 0 (gt exists)
    assert e.stats[1] == pytest.approx(0.5)


def test_area_ranges():
    # small gt (16x16=256 < 32^2) perfectly matched
    gt = make_gt({0: [[10, 10, 16, 16]]})
    e = run_eval(gt, [dict(image_id=0, category_id=1, bbox=[10, 10, 16, 16], score=0.9)])
    assert e.stats[3] == pytest.approx(1.0)   # AP small
    assert e.stats[4] == -1.0                 # AP medium: no gt
    assert e.stats[5] == -1.0                 # AP large: no gt
