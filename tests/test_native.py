"""Native C++ kernels vs their pure-Python oracles (randomized equivalence,
the dual-implementation pattern from SURVEY.md §4.4)."""

import numpy as np
import pytest

native = pytest.importorskip("streamyolo_tpu.native")

from streamyolo_tpu.data.coco import COCO
from streamyolo_tpu.eval.cocoeval import COCOeval, bbox_iou_xywh
from streamyolo_tpu.eval.cocoeval_ext import COCOeval_opt
from streamyolo_tpu.stream.track import _greedy_match


def _random_coco(rng, n_imgs=6, n_cats=3, crowd_prob=0.15):
    images = [dict(id=i, width=640, height=480) for i in range(n_imgs)]
    anns = []
    k = 1
    for i in range(n_imgs):
        for _ in range(rng.integers(0, 8)):
            w, h = rng.uniform(8, 120, 2)
            x = rng.uniform(0, 640 - w)
            y = rng.uniform(0, 480 - h)
            anns.append(
                dict(id=k, image_id=i, category_id=int(rng.integers(1, n_cats + 1)),
                     bbox=[float(x), float(y), float(w), float(h)],
                     area=float(w * h),
                     iscrowd=int(rng.random() < crowd_prob))
            )
            k += 1
    cats = [dict(id=c, name=f"c{c}") for c in range(1, n_cats + 1)]
    return COCO(dict(images=images, annotations=anns, categories=cats))


def _random_results(rng, gt, jitter=12.0, n_extra=10):
    res = []
    for ann in gt.dataset["annotations"]:
        if rng.random() < 0.8:
            x, y, w, h = ann["bbox"]
            res.append(
                dict(image_id=ann["image_id"], category_id=ann["category_id"],
                     bbox=[x + rng.normal(0, jitter), y + rng.normal(0, jitter),
                           max(4.0, w + rng.normal(0, jitter)),
                           max(4.0, h + rng.normal(0, jitter))],
                     score=float(rng.random()))
            )
    for _ in range(n_extra):
        res.append(
            dict(image_id=int(rng.integers(0, len(gt.dataset["images"]))),
                 category_id=int(rng.integers(1, 4)),
                 bbox=[float(rng.uniform(0, 600)), float(rng.uniform(0, 440)),
                       float(rng.uniform(8, 80)), float(rng.uniform(8, 80))],
                 score=float(rng.random()))
        )
    return res


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cocoeval_cpp_matches_python(seed):
    rng = np.random.default_rng(seed)
    gt = _random_coco(rng)
    results = _random_results(rng, gt)
    if not results:
        pytest.skip("empty random draw")
    dt = gt.loadRes(results)

    e_py = COCOeval(gt, dt, "bbox")
    e_py.evaluate(); e_py.accumulate(); e_py.summarize()
    e_cpp = COCOeval_opt(gt, dt, "bbox")
    e_cpp.evaluate(); e_cpp.accumulate(); e_cpp.summarize()

    np.testing.assert_allclose(e_cpp.stats, e_py.stats, atol=1e-12)
    np.testing.assert_allclose(
        e_cpp.eval["precision"], e_py.eval["precision"], atol=1e-12
    )
    np.testing.assert_allclose(e_cpp.eval["recall"], e_py.eval["recall"], atol=1e-12)


@pytest.mark.parametrize("seed", [3, 4])
def test_iou_assoc_cpp_matches_python(seed):
    rng = np.random.default_rng(seed)
    m, n = 25, 30
    b1 = np.column_stack([rng.uniform(0, 300, m), rng.uniform(0, 300, m),
                          rng.uniform(10, 60, m), rng.uniform(10, 60, m)])
    b2 = np.column_stack([rng.uniform(0, 300, n), rng.uniform(0, 300, n),
                          rng.uniform(10, 60, n), rng.uniform(10, 60, n)])
    l1 = rng.integers(0, 3, m)
    l2 = rng.integers(0, 3, n)
    ious = bbox_iou_xywh(b1, b2, np.zeros(n))
    want = _greedy_match(ious, l1, l2, 0.2)
    got = native.iou_assoc_greedy_cpp(ious, l1, l2, 0.2)
    assert got == tuple(list(x) for x in want) or list(got) == [list(x) for x in want]


def test_bbox_iou_cpp_matches_numpy():
    rng = np.random.default_rng(7)
    dt = np.column_stack([rng.uniform(0, 200, 9), rng.uniform(0, 200, 9),
                          rng.uniform(5, 50, 9), rng.uniform(5, 50, 9)])
    gt = np.column_stack([rng.uniform(0, 200, 11), rng.uniform(0, 200, 11),
                          rng.uniform(5, 50, 11), rng.uniform(5, 50, 11)])
    crowd = (rng.random(11) < 0.3).astype(np.uint8)
    np.testing.assert_allclose(
        native.bbox_iou_ltwh_cpp(dt, gt, crowd),
        bbox_iou_xywh(dt, gt, crowd),
        atol=1e-12,
    )


def test_cocoeval_cpp_maxdets_cap():
    """More than 100 dts in one image: both implementations must apply the
    maxDets cap identically (matching + accumulate slicing)."""
    rng = np.random.default_rng(11)
    images = [dict(id=0, width=1000, height=1000)]
    anns = [dict(id=i + 1, image_id=0, category_id=1,
                 bbox=[float(50 * (i % 10)), float(50 * (i // 10)), 40.0, 40.0],
                 area=1600.0, iscrowd=0) for i in range(30)]
    gt = COCO(dict(images=images, annotations=anns,
                   categories=[dict(id=1, name="a")]))
    res = []
    for i in range(150):  # 150 dts > maxDets=100
        res.append(dict(image_id=0, category_id=1,
                        bbox=[float(rng.uniform(0, 500)), float(rng.uniform(0, 500)),
                              40.0, 40.0],
                        score=float(rng.random())))
    dt = gt.loadRes(res)
    e_py = COCOeval(gt, dt, "bbox"); e_py.evaluate(); e_py.accumulate(); e_py.summarize()
    e_cpp = COCOeval_opt(gt, dt, "bbox"); e_cpp.evaluate(); e_cpp.accumulate(); e_cpp.summarize()
    np.testing.assert_allclose(e_cpp.stats, e_py.stats, atol=1e-12)
    np.testing.assert_allclose(e_cpp.eval["precision"], e_py.eval["precision"], atol=1e-12)
