"""Data layer tests: COCO index, ONE_/TWO_/STILL pairing rules (including the
reference's boundary quirks), transforms, and the loader round trip.

The pairing expectations mirror `/root/reference/exps/dataset/
tal_flip_one_future_argoversedataset.py:74-110` and the TWO_ variant.
"""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from streamyolo_tpu.data import (
    COCO,
    DoubleTrainTransform,
    DoubleValTransform,
    ONE_ARGOVERSEDataset,
    STILL_ARGOVERSEDataset,
    TWO_ARGOVERSEDataset,
    TrainTransform,
    preproc,
)

from tests.conftest import FAKE_H as H, FAKE_IMG_SIZE as IMG_SIZE, FAKE_W as W


def test_coco_index(fake_argoverse):
    coco = COCO(os.path.join(fake_argoverse, "Argoverse-HD/annotations/train.json"))
    assert coco.getImgIds() == list(range(7))
    assert sorted(coco.getCatIds()) == list(range(8))
    assert coco.getAnnIds(imgIds=[3], iscrowd=False) == [3]
    assert coco.getAnnIds(imgIds=[999]) == []  # unknown id -> empty (quirk relied on)
    assert coco.loadImgs(2)[0]["fid"] == 2


def test_one_dataset_pairing(fake_argoverse):
    ds = ONE_ARGOVERSEDataset(fake_argoverse, "train.json", img_size=IMG_SIZE)
    r = min(IMG_SIZE[0] / H, IMG_SIZE[1] / W)

    # id 1 (seq0, fid1): support file = frame 0, target = labels of id 2.
    res, sup_res, _, _, fname, sup_fname = ds.annotations[1]
    assert fname.endswith("seq0/f1.jpg") and sup_fname.endswith("seq0/f0.jpg")
    assert res[0, 0] == pytest.approx((10 + 2 * 2) * r)  # x of frame fid=2
    assert sup_res[0, 0] == pytest.approx((10 + 2 * 1) * r)  # own labels

    # id 0 (fid 0): self-support, target = own labels.
    _, _, _, _, fname0, sup_fname0 = ds.annotations[0]
    assert fname0 == sup_fname0

    # id 3 = last of seq0: self-support, target = own labels.
    res3, _, _, _, fname3, sup_fname3 = ds.annotations[3]
    assert fname3 == sup_fname3
    assert res3[0, 0] == pytest.approx((10 + 2 * 3) * r)

    # last two dataset ids (5, 6): EMPTY target (reference quirk).
    assert ds.annotations[5][0].shape == (0, 5)
    assert ds.annotations[6][0].shape == (0, 5)


def test_two_dataset_pairing(fake_argoverse):
    ds = TWO_ARGOVERSEDataset(fake_argoverse, "train.json", img_size=IMG_SIZE)
    r = min(IMG_SIZE[0] / H, IMG_SIZE[1] / W)
    # id 2 (seq0, fid2; id+1 is last of seq0 -> 'fid==0 at id+2' branch):
    # support = id 1, target = labels of id 3.
    res, sup_res, _, _, fname, sup_fname = ds.annotations[2]
    assert fname.endswith("seq0/f2.jpg") and sup_fname.endswith("seq0/f1.jpg")
    assert res[0, 0] == pytest.approx((10 + 2 * 3) * r)
    # id 0: fid 0 -> self support, own labels
    assert ds.annotations[0][4] == ds.annotations[0][5]


def test_still_dataset(fake_argoverse):
    ds = STILL_ARGOVERSEDataset(fake_argoverse, "train.json", img_size=IMG_SIZE)
    img, target, img_info, img_id = ds.pull_item(2)
    assert img_info == (H, W)
    r = min(IMG_SIZE[0] / H, IMG_SIZE[1] / W)
    assert img.shape == (int(H * r), int(W * r), 3)
    assert target[0, 4] == 2  # class id


def test_getitem_double_transform(fake_argoverse):
    ds = ONE_ARGOVERSEDataset(
        fake_argoverse, "train.json", img_size=IMG_SIZE,
        preproc=DoubleTrainTransform(max_labels=50, hsv=False, flip=True),
    )
    stacked, (target, sup_target), _, _ = ds[1]
    assert stacked.shape == (IMG_SIZE[0], IMG_SIZE[1], 6)
    assert target.shape == (50, 5) and sup_target.shape == (50, 5)
    # both frames mirrored with the same coin: box cx columns either both
    # original or both flipped
    assert (target[0, 1] > 0) and (sup_target[0, 1] > 0)


def test_val_transform_pair(fake_argoverse):
    ds = ONE_ARGOVERSEDataset(
        fake_argoverse, "val.json", name="val", img_size=IMG_SIZE,
        preproc=DoubleValTransform(),
    )
    stacked, _, _, img_id = ds[4]  # seq1 fid0
    assert stacked.shape == (IMG_SIZE[0], IMG_SIZE[1], 6)
    assert img_id[0] == 4
    # fid==0 -> self-support: both halves identical
    np.testing.assert_array_equal(stacked[..., :3], stacked[..., 3:])


def test_preproc_letterbox_matches_reference_semantics():
    img = np.random.RandomState(0).randint(0, 255, (50, 60, 3), np.uint8)
    out, r = preproc(img, (32, 64))
    assert out.shape == (32, 64, 3) and out.dtype == np.uint8
    assert r == min(32 / 50, 64 / 60)
    nh, nw = int(50 * r), int(60 * r)
    assert np.all(out[nh:, :] == 114) and np.all(out[:, nw:] == 114)


def test_train_transform_flip_consistency():
    img = np.random.RandomState(1).randint(0, 255, (50, 60, 3), np.uint8)
    targets = np.array([[10.0, 10.0, 30.0, 24.0, 2.0]])
    t = TrainTransform(max_labels=5, hsv=False, flip=True)
    img_n, lab_n = t(img.copy(), targets.copy(), (50, 60), mirror=False)
    img_f, lab_f = t(img.copy(), targets.copy(), (50, 60), mirror=True)
    # mirrored cx + original cx == width (cxcywh encoding)
    assert lab_n[0, 1] + lab_f[0, 1] == pytest.approx(60.0)
    assert lab_n[0, 2] == pytest.approx(lab_f[0, 2])  # cy unchanged
    np.testing.assert_array_equal(np.asarray(img_f), img[:, ::-1])


def test_loader_roundtrip(fake_argoverse):
    from streamyolo_tpu.data import (
        DataLoader,
        InfiniteSampler,
        MosaicDetection,
        YoloBatchSampler,
    )

    ds = ONE_ARGOVERSEDataset(
        fake_argoverse, "train.json", img_size=IMG_SIZE,
        preproc=None,
    )
    wrapped = MosaicDetection(
        ds, img_size=IMG_SIZE, mosaic=False,
        preproc=DoubleTrainTransform(max_labels=50, hsv=False, flip=True),
    )
    sampler = InfiniteSampler(len(ds), seed=0)
    batch_sampler = YoloBatchSampler(sampler, batch_size=2, drop_last=False, mosaic=False)
    loader = DataLoader(wrapped, batch_sampler=batch_sampler, num_workers=0)
    it = iter(loader)
    images, (labels, support_labels), _, _ = next(it)
    assert images.shape == (2, IMG_SIZE[0], IMG_SIZE[1], 6)
    assert labels.shape == (2, 50, 5)
    assert support_labels.shape == (2, 50, 5)
    assert images.dtype == np.uint8  # uint8 host pipeline: 4x less collate+H2D


class _ListLoader:
    """Minimal loader: yields (images, (labels, support)) tuples."""

    def __init__(self, batches, delay_s=0.0):
        self._batches = batches
        self._delay = delay_s

    def __iter__(self):
        import time

        for b in self._batches:
            if self._delay:
                time.sleep(self._delay)
            yield b


def _mk_batches(n):
    return [
        (np.full((2, 4, 4, 6), i, np.uint8),
         (np.zeros((2, 5, 5), np.float32), np.ones((2, 5, 5), np.float32)))
        for i in range(n)
    ]


def test_device_prefetcher_order_and_exhaustion():
    from streamyolo_tpu.data import DevicePrefetcher

    pf = DevicePrefetcher(_ListLoader(_mk_batches(3)))
    for i in range(3):
        b = pf.next()
        assert b["images"][0, 0, 0, 0] == i
        assert set(b) == {"images", "labels", "support_labels"}
    assert pf.next() is None  # exhausted -> None, like the reference prefetcher


def test_device_prefetcher_propagates_worker_errors():
    from streamyolo_tpu.data import DevicePrefetcher

    class _Boom:
        def __iter__(self):
            yield _mk_batches(1)[0]
            raise RuntimeError("decode failed")

    pf = DevicePrefetcher(_Boom())
    pf.next()  # first batch fine
    with pytest.raises(RuntimeError, match="decode failed"):
        pf.next()


def test_device_prefetcher_overlaps_host_prep_with_step():
    """The preload thread must hide host batch prep behind a (simulated)
    dispatched device step: wall/iter ~= max(prep, step), not prep + step."""
    import time

    from streamyolo_tpu.data import DevicePrefetcher

    prep_s, step_s, n = 0.05, 0.05, 6
    pf = DevicePrefetcher(_ListLoader(_mk_batches(n + 1), delay_s=prep_s))
    pf.next()  # warm: first preload started at construction
    t0 = time.perf_counter()
    for _ in range(n):
        pf.next()
        time.sleep(step_s)  # a dispatched TPU step: zero host CPU
    wall = (time.perf_counter() - t0) / n
    serial = prep_s + step_s
    # generous bound (CI noise): full overlap is ~step_s, serial is 2x that
    assert wall < 0.8 * serial, f"no overlap: {wall * 1e3:.0f} ms/iter"


def test_shard_dataset(fake_argoverse):
    from streamyolo_tpu.data import ShardDataset

    ds = ONE_ARGOVERSEDataset(
        fake_argoverse, "val.json", name="val", img_size=IMG_SIZE,
        preproc=DoubleValTransform(),
    )
    shards = [ShardDataset(ds, r, 3) for r in range(3)]
    assert sum(len(s) for s in shards) == len(ds)
    seen = sorted(int(s[i][3][0]) for s in shards for i in range(len(s)))
    assert seen == list(range(len(ds)))  # partition covers every image id once
    assert shards[0].coco is ds.coco  # attribute forwarding


def test_augment_hsv_inplace():
    from streamyolo_tpu.data import augment_hsv

    img = np.random.RandomState(0).randint(0, 255, (40, 60, 3), np.uint8)
    before = img.copy()
    np.random.seed(3)
    augment_hsv(img)
    assert img.shape == before.shape and img.dtype == np.uint8
    assert (img != before).any()  # actually jittered, in place


def test_wrapper_datasets_pickle_roundtrip(fake_argoverse):
    """Dataset wrappers must survive pickling (worker processes); a naive
    __getattr__ recursed infinitely during unpickling."""
    import pickle

    from streamyolo_tpu.data import ShardDataset
    from streamyolo_tpu.data.loader import _IndexUnpackDataset

    ds = ONE_ARGOVERSEDataset(
        fake_argoverse, "val.json", name="val", img_size=IMG_SIZE,
        preproc=DoubleValTransform(),
    )
    for wrapped in (_IndexUnpackDataset(ds), ShardDataset(ds, 0, 2)):
        again = pickle.loads(pickle.dumps(wrapped))
        assert len(again) == len(wrapped)
        assert again.class_ids == ds.class_ids  # attr forwarding survives


def test_eval_loader_with_worker_processes(fake_argoverse):
    """End-to-end: eval loader with real worker processes (num_workers=2)."""
    ds = ONE_ARGOVERSEDataset(
        fake_argoverse, "val.json", name="val", img_size=IMG_SIZE,
        preproc=DoubleValTransform(),
    )
    from streamyolo_tpu.data import DataLoader

    loader = DataLoader(ds, batch_size=2, num_workers=2, shuffle=False)
    batches = list(loader)
    assert sum(b[0].shape[0] for b in batches) == len(ds)


def test_train_loader_with_worker_processes(fake_argoverse):
    """Train path with real worker processes: mosaic wrapper + (flag, idx)
    batch-sampler items + double targets collate across the pickle boundary."""
    from streamyolo_tpu.data import (
        DataLoader,
        InfiniteSampler,
        MosaicDetection,
        YoloBatchSampler,
        worker_init_reset_seed,
    )

    ds = ONE_ARGOVERSEDataset(fake_argoverse, "train.json", img_size=IMG_SIZE)
    wrapped = MosaicDetection(
        ds, img_size=IMG_SIZE, mosaic=False,
        preproc=DoubleTrainTransform(max_labels=50, hsv=False, flip=True),
    )
    loader = DataLoader(
        wrapped,
        batch_sampler=YoloBatchSampler(
            InfiniteSampler(len(ds), seed=0), batch_size=2, drop_last=False,
            mosaic=False,
        ),
        num_workers=2,
        worker_init_fn=worker_init_reset_seed,
    )
    images, (labels, support_labels), _, _ = next(iter(loader))
    assert images.shape == (2, IMG_SIZE[0], IMG_SIZE[1], 6)
    assert labels.shape == (2, 50, 5) and support_labels.shape == (2, 50, 5)


def test_one_two_dataset_memmap_cache(fake_argoverse, monkeypatch):
    """--cache must actually serve BOTH frames from the memmap for the stream
    datasets (round-2 finding: only STILL consulted ``self.imgs``); with the
    cache built, pull_item performs zero disk reads and returns the same
    images as the uncached path."""
    for cls, name in ((ONE_ARGOVERSEDataset, "cache_one"),
                      (TWO_ARGOVERSEDataset, "cache_two")):
        plain = cls(fake_argoverse, "train.json", img_size=IMG_SIZE)
        cached = cls(fake_argoverse, "train.json", name=name,
                     img_size=IMG_SIZE, cache=True)
        assert cached.imgs is not None

        def _no_disk(fname):
            raise AssertionError(f"disk read with cache enabled: {fname}")

        monkeypatch.setattr(cached, "_read_resized", _no_disk)
        for i in range(len(cached)):
            img, sup, res, sup_res, info, iid = cached.pull_item(i)
            p_img, p_sup, p_res, p_sup_res, p_info, p_iid = plain.pull_item(i)
            np.testing.assert_array_equal(img, p_img)
            np.testing.assert_array_equal(sup, p_sup)
            np.testing.assert_array_equal(res, p_res)
            assert info == p_info and iid == p_iid


def test_random_perspective_geometry():
    """House-idiom warp: pinned parameters give predictable geometry."""
    import random as pyrandom

    from streamyolo_tpu.data import random_perspective, warp_keep_mask

    img = np.zeros((40, 60, 3), np.uint8)
    img[18:22, 28:32] = 255  # small centered blob
    boxes = np.array([[20.0, 10.0, 40.0, 30.0, 1.0]])

    # degrees=0, translate=0, scale pinned to 1, shear=0 => identity
    pyrandom.seed(0)
    out_img, out_boxes = random_perspective(
        img.copy(), boxes.copy(), degrees=0, translate=0, scale=(1, 1), shear=0
    )
    np.testing.assert_array_equal(out_img, img)
    np.testing.assert_allclose(out_boxes[0, :4], boxes[0, :4], atol=1e-6)

    # scale pinned to 2 => box doubles around the image center
    pyrandom.seed(0)
    _, zoomed = random_perspective(
        img.copy(), boxes.copy(), degrees=0, translate=0, scale=(2, 2), shear=0
    )
    cx, cy = 30.0, 20.0
    want = [cx + 2 * (20 - cx), cy + 2 * (10 - cy), cx + 2 * (40 - cx), cy + 2 * (30 - cy)]
    want = np.clip(want, 0, [60, 40, 60, 40])
    np.testing.assert_allclose(zoomed[0, :4], want, atol=1e-6)

    # keep-mask semantics: degenerate post-warp boxes are dropped
    before = np.array([[0.0, 0.0, 20.0, 20.0], [0.0, 0.0, 20.0, 20.0]])
    after = np.array([[0.0, 0.0, 20.0, 20.0], [0.0, 0.0, 1.0, 20.0]])
    np.testing.assert_array_equal(warp_keep_mask(before, after), [True, False])
