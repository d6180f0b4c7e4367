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
    assert "Average forward+NMS (fused) time" in info


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


@pytest.fixture(scope="module")
def textured_argoverse(tmp_path_factory):
    """fake_argoverse twin with per-pixel noise frames: the shared fixture's
    constant-gray frames make every spatial location score identically,
    which leaves NMS ordering to tie-breaks — useless for cross-stack row
    equality."""
    import json

    import cv2

    rng = np.random.default_rng(11)
    root = tmp_path_factory.mktemp("argoverse_tex")
    ann_dir = root / "Argoverse-HD" / "annotations"
    ann_dir.mkdir(parents=True)
    images, annotations = [], []
    img_id = ann_id = 0
    for sid, n_frames in enumerate((4, 3)):
        d = root / "Argoverse-1.1" / "tracking" / f"seq{sid}"
        d.mkdir(parents=True)
        for fid in range(n_frames):
            frame = rng.integers(0, 255, (FAKE_H, FAKE_W, 3)).astype(np.uint8)
            cv2.imwrite(str(d / f"f{fid}.jpg"), frame)
            images.append(dict(id=img_id, width=FAKE_W, height=FAKE_H,
                               sid=sid, fid=fid, name=f"f{fid}.jpg"))
            annotations.append(dict(id=ann_id, image_id=img_id, category_id=2,
                                    bbox=[10 + 2 * fid, 20, 10, 8], area=80,
                                    iscrowd=0))
            ann_id += 1
            img_id += 1
    cats = [dict(id=i, name=n) for i, n in enumerate(
        "person bicycle car motorcycle bus truck traffic_light stop_sign".split())]
    data = dict(images=images, annotations=annotations, categories=cats,
                seq_dirs=["seq0", "seq1"], sequences=["seq0", "seq1"])
    with open(ann_dir / "val.json", "w") as f:
        json.dump(data, f)
    return str(root)


def test_pipeline_equality_torch_vs_jax(textured_argoverse):
    """End-to-end bit-match evidence (BASELINE north-star surrogate): the
    synthetic drifting-box video pushed through BOTH stacks —
      torch oracle forward + reference-surface postprocess list + COCO
      conversion (the reference pipeline's semantics), vs
      the production JAX evaluate() (jitted forward + fixed-shape NMS) —
    yields the same COCO rows and the same sAP."""
    import torch

    import jax
    import jax.numpy as jnp

    from streamyolo_tpu.models import DFPPAFPN, TALHead, StreamYOLO
    from streamyolo_tpu.ops.nms import postprocess
    from streamyolo_tpu.utils.torch_import import (
        merge_variables,
        state_dict_to_variables,
    )
    from tests import torch_oracle as oracle

    IMG = (32, 64)  # model needs /32-divisible inputs
    torch.manual_seed(3)
    tmodel = oracle.StreamYOLOOracle(num_classes=NUM_CLASSES, depth=0.33, width=0.25)
    tmodel.eval()
    with torch.no_grad():
        # spread the scores: at init the obj/cls prior bias (-4.6) pins all
        # scores to ~1e-4 (below any usable conf) and near-ties would make
        # NMS ordering knife-edge; jittering only the score-head biases
        # gives distinct, well-separated detections without touching the
        # exp box decode
        for name, p in tmodel.named_parameters():
            if "obj_preds" in name and name.endswith("bias"):
                p.add_(3.0)  # lift obj off the 0.01 prior
            elif "cls_preds" in name and name.endswith("bias"):
                p.add_(2.0 * torch.randn_like(p))
    jmodel = StreamYOLO(
        backbone=DFPPAFPN(depth=0.33, width=0.25),
        head=TALHead(num_classes=NUM_CLASSES, width=0.25),
    )
    variables = jmodel.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *IMG, 6), jnp.float32),
        mode="off_pipe",
    )
    variables = merge_variables(
        variables, state_dict_to_variables(tmodel.state_dict()), strict=True
    )
    conf, nmsthre = 0.001, 0.65

    def make_eval():
        ds = ONE_ARGOVERSEDataset(
            textured_argoverse, "val.json", name="val", img_size=IMG,
            preproc=DoubleValTransform(),
        )
        loader = DataLoader(ds, batch_size=2, num_workers=0, shuffle=False)
        return ONEX_COCOEvaluator(
            loader, img_size=IMG, confthre=conf, nmsthre=nmsthre,
            num_classes=NUM_CLASSES,
        )

    # production JAX path
    ev_j = make_eval()
    fwd = jax.jit(lambda v, x: jmodel.apply(v, x, mode="off_pipe"))
    (ap_j, ap50_j, _), rows_j = ev_j.evaluate(
        lambda x: np.asarray(fwd(variables, jnp.asarray(x)), np.float32),
        return_outputs=True,
    )

    # torch-oracle + reference-surface pipeline
    ev_t = make_eval()
    rows_t = []
    for imgs, _, info_imgs, ids in ev_t.dataloader:
        with torch.no_grad():
            preds = tmodel(
                torch.from_numpy(
                    np.asarray(imgs, np.float32).transpose(0, 3, 1, 2)
                )
            ).numpy()
        outputs = postprocess(preds, NUM_CLASSES, conf, nmsthre)
        rows_t.extend(ev_t.convert_to_coco_format(outputs, info_imgs, ids))
    ap_t, ap50_t, _ = ev_t.evaluate_prediction(
        rows_t, np.array([1.0, 0.0, 1.0])
    )

    assert len(rows_j) == len(rows_t) > 0
    for rj, rt in zip(rows_j, rows_t):
        assert rj["image_id"] == rt["image_id"]
        assert rj["category_id"] == rt["category_id"]
        np.testing.assert_allclose(rj["bbox"], rt["bbox"], atol=1e-3)
        np.testing.assert_allclose(rj["score"], rt["score"], atol=1e-5)
    assert ap_j == pytest.approx(ap_t, abs=1e-9)
    assert ap50_j == pytest.approx(ap50_t, abs=1e-9)


@pytest.mark.parametrize("pairing", ["one", "two"])
def test_sequential_dedup_forward_matches_off_pipe(textured_argoverse, pairing):
    """mode='seq' (one backbone pass per unique frame, shift-gathered support
    features + 2-frame HBM carry) reproduces the off_pipe dual-frame eval
    exactly — including each pairing's self-support boundary rules (ONE:
    shift 1/0; TWO: shift 2/1/0 across fid==0, fid==1, and both tail rows)
    and the padded tail batch — at half the backbone FLOPs."""
    import jax
    import jax.numpy as jnp

    from streamyolo_tpu.data import TWO_ARGOVERSEDataset
    from streamyolo_tpu.eval.seq_forward import SequentialDedupForward
    from streamyolo_tpu.models import DFPPAFPN, TALHead, StreamYOLO

    IMG = (32, 64)
    ds_cls = {"one": ONE_ARGOVERSEDataset, "two": TWO_ARGOVERSEDataset}[pairing]
    ds = ds_cls(
        textured_argoverse, "val.json", name="val", img_size=IMG,
        preproc=DoubleValTransform(),
    )
    loader = DataLoader(ds, batch_size=2, num_workers=0, shuffle=False)

    model = StreamYOLO(
        backbone=DFPPAFPN(depth=0.33, width=0.25),
        head=TALHead(num_classes=NUM_CLASSES, width=0.25),
    )
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, *IMG, 6), jnp.float32),
        mode="off_pipe",
    )
    off = jax.jit(
        lambda v, x: model.apply(v, x, mode="off_pipe", train=False)
    )
    dedup = SequentialDedupForward(model, variables, ds)

    bs = loader.batch_size
    for imgs, _, info_imgs, ids in loader:
        imgs = np.asarray(imgs, np.float32)
        n_real = imgs.shape[0]
        if n_real < bs:  # replicate evaluate()'s tail padding
            imgs = np.concatenate(
                [imgs, np.zeros((bs - n_real,) + imgs.shape[1:], imgs.dtype)]
            )
        want = np.asarray(off(variables, imgs))
        got = np.asarray(dedup(imgs, ids))
        np.testing.assert_allclose(
            got[:n_real], want[:n_real], atol=1e-5, rtol=1e-5
        )

    # The trainer's per-epoch path reuses one compiled seq program across
    # fresh wrapper instances (fresh EMA variables each epoch): a second
    # wrapper built on the shared jit_fn must reproduce the first epoch's
    # first batch bit-for-bit.
    dedup2 = SequentialDedupForward(model, variables, ds, jit_fn=dedup.jit_fn)
    assert dedup2.jit_fn is dedup.jit_fn
    imgs0, _, _, ids0 = next(iter(loader))
    imgs0 = np.asarray(imgs0, np.float32)
    np.testing.assert_allclose(
        np.asarray(dedup2(imgs0, ids0)),
        np.asarray(off(variables, imgs0)),
        atol=1e-5, rtol=1e-5,
    )
