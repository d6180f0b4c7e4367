"""End-to-end evaluator tests on the synthetic Argoverse dataset.

Validates the pseudo-streaming id-shift protocol: an oracle that predicts the
FUTURE frame's boxes scores perfectly on the frames that survive the boundary
rules, while a current-frame oracle scores lower (its boxes lag the drifting
gt), and the boundary quirks drop exactly the expected frames.
"""

import numpy as np
import pytest

pytest.importorskip("cv2")

from streamyolo_tpu.data import (
    DataLoader,
    DoubleValTransform,
    ONE_ARGOVERSEDataset,
)
from streamyolo_tpu.eval import ONEX_COCOEvaluator
from tests.conftest import FAKE_H, FAKE_IMG_SIZE, FAKE_W

NUM_CLASSES = 8


def _make_loader(fake_argoverse):
    ds = ONE_ARGOVERSEDataset(
        fake_argoverse, "val.json", name="val", img_size=FAKE_IMG_SIZE,
        preproc=DoubleValTransform(),
    )
    return DataLoader(ds, batch_size=1, num_workers=0, shuffle=False)


def _oracle_forward(dataset, shift):
    """Emit one perfect detection per image: the gt box of frame
    (id + shift), encoded (cx, cy, w, h, obj=1, onehot-prob cls) at the
    letterboxed input scale."""
    coco = dataset.coco
    n = len(coco.dataset["images"])
    counter = {"i": 0}

    def forward(images):
        batch = images.shape[0]
        preds = np.zeros((batch, 16, 5 + NUM_CLASSES), np.float32)
        for b in range(batch):
            img_id = counter["i"]
            counter["i"] += 1
            src = min(max(img_id + shift, 0), n - 1)
            anns = coco.img_to_anns[src]
            im = coco.dataset["images"][src]
            r = min(FAKE_IMG_SIZE[0] / im["height"], FAKE_IMG_SIZE[1] / im["width"])
            for k, a in enumerate(anns):
                x, y, w, h = a["bbox"]
                preds[b, k, :4] = ((x + w / 2) * r, (y + h / 2) * r, w * r, h * r)
                preds[b, k, 4] = 1.0
                preds[b, k, 5 + a["category_id"]] = 1.0
        return preds

    return forward


def test_onex_future_oracle_perfect(fake_argoverse):
    loader = _make_loader(fake_argoverse)
    ds = loader.dataset.dataset
    evaluator = ONEX_COCOEvaluator(
        loader, img_size=FAKE_IMG_SIZE, confthre=0.3, nmsthre=0.5,
        num_classes=NUM_CLASSES,
    )
    ap, ap50, info = evaluator.evaluate(_oracle_forward(ds, shift=1))
    # Only ids 1, 2, 5 survive the boundary rules -> predictions exist for
    # image_ids 2, 3, 6; the other 4 gts are missed. Precision 1 up to
    # recall 3/7: AP50 = 43 of 101 recall points (0.00..0.42).
    assert ap50 == pytest.approx(43 / 101, abs=1e-6)
    assert "Average forward time" in info


def test_onex_id_shift_and_boundary_skips(fake_argoverse):
    loader = _make_loader(fake_argoverse)
    ds = loader.dataset.dataset
    evaluator = ONEX_COCOEvaluator(
        loader, img_size=FAKE_IMG_SIZE, confthre=0.3, nmsthre=0.5,
        num_classes=NUM_CLASSES,
    )
    (_, _, _), data_list = evaluator.evaluate(
        _oracle_forward(ds, shift=1), return_outputs=True
    )
    # fid==0 frames (ids 0, 4) drop; id 3 drops (next is fid 0); id 6 drops
    # (dataset tail). Survivors shift by +1.
    assert sorted(d["image_id"] for d in data_list) == [2, 3, 6]


def test_onex_current_frame_oracle_scores_lower(fake_argoverse):
    loader = _make_loader(fake_argoverse)
    ds = loader.dataset.dataset
    evaluator = ONEX_COCOEvaluator(
        loader, img_size=FAKE_IMG_SIZE, confthre=0.3, nmsthre=0.5,
        num_classes=NUM_CLASSES,
    )
    ap_cur, ap50_cur, _ = evaluator.evaluate(_oracle_forward(ds, shift=0))
    loader2 = _make_loader(fake_argoverse)
    evaluator2 = ONEX_COCOEvaluator(
        loader2, img_size=FAKE_IMG_SIZE, confthre=0.3, nmsthre=0.5,
        num_classes=NUM_CLASSES,
    )
    ap_fut, _, _ = evaluator2.evaluate(_oracle_forward(ds, shift=1))
    # lagging boxes overlap the drifted gt at IoU 8/12 < 1 -> strictly lower
    assert ap_fut > ap_cur


def test_distributed_eval_two_process_gather(fake_argoverse, monkeypatch):
    """Two simulated hosts: strided ShardDataset loaders + the evaluate()
    auto-detected gather compose back to the FULL detection set and the
    single-process AP. Proves VERDICT-missing #2: sharded data without the
    gather would score each shard alone."""
    import jax

    from streamyolo_tpu.data import ShardDataset
    from streamyolo_tpu import parallel as par

    WORLD = 2
    rank_box = {"r": 0}
    store = {}

    monkeypatch.setattr(jax, "process_count", lambda: WORLD)
    monkeypatch.setattr(jax, "process_index", lambda: rank_box["r"])
    def fake_gather(obj):
        store[rank_box["r"]] = obj
        return [store[r] for r in sorted(store)]

    monkeypatch.setattr(par, "all_gather_objects", fake_gather)
    monkeypatch.setattr(par, "is_main_process", lambda: rank_box["r"] == 0)
    monkeypatch.setattr(par, "psum_stats", lambda v: v * WORLD)

    def run_rank(rank):
        rank_box["r"] = rank
        base = ONE_ARGOVERSEDataset(
            fake_argoverse, "val.json", name="val", img_size=FAKE_IMG_SIZE,
            preproc=DoubleValTransform(),
        )
        shard = ShardDataset(base, rank, WORLD)
        loader = DataLoader(shard, batch_size=1, num_workers=0, shuffle=False)
        evaluator = ONEX_COCOEvaluator(
            loader, img_size=FAKE_IMG_SIZE, confthre=0.3, nmsthre=0.5,
            num_classes=NUM_CLASSES,
        )

        # shard-aware future oracle: the loader traverses dataset indices
        # rank, rank+2, ... so emit the gt of (index + 1) in that order
        coco = base.coco
        n = len(coco.dataset["images"])
        seq = list(range(rank, n, WORLD))
        it = iter(seq)

        def forward(images):
            preds = np.zeros((images.shape[0], 16, 5 + NUM_CLASSES), np.float32)
            for b in range(images.shape[0]):
                try:
                    img_id = next(it)
                except StopIteration:  # padded tail rows
                    continue
                src = min(img_id + 1, n - 1)
                im = coco.dataset["images"][src]
                r = min(FAKE_IMG_SIZE[0] / im["height"],
                        FAKE_IMG_SIZE[1] / im["width"])
                for k, a in enumerate(coco.img_to_anns[src]):
                    x, y, w, h = a["bbox"]
                    preds[b, k, :4] = ((x + w / 2) * r, (y + h / 2) * r,
                                       w * r, h * r)
                    preds[b, k, 4] = 1.0
                    preds[b, k, 5 + a["category_id"]] = 1.0
            return preds

        # distributed defaults to None -> auto-detects process_count()==2
        return evaluator.evaluate(forward, return_outputs=True)

    (_, _, _), rank1_list = run_rank(1)  # non-main: returns its shard's rows
    (ap, ap50, _), full_list = run_rank(0)

    # same survivors as the single-process run, recovered across both shards
    assert sorted(d["image_id"] for d in full_list) == [2, 3, 6]
    assert ap50 == pytest.approx(43 / 101, abs=1e-6)


def test_distributed_eval_single_process(fake_argoverse):
    """distributed=True on one process: the all-gather degenerates and the
    result matches the plain path."""
    loader = _make_loader(fake_argoverse)
    ds = loader.dataset.dataset
    evaluator = ONEX_COCOEvaluator(
        loader, img_size=FAKE_IMG_SIZE, confthre=0.3, nmsthre=0.5,
        num_classes=NUM_CLASSES,
    )
    ap, ap50, _ = evaluator.evaluate(_oracle_forward(ds, shift=1), distributed=True)
    assert ap50 == pytest.approx(43 / 101, abs=1e-6)
