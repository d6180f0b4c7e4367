"""Aux tooling tests: visualization, dataset builders, summary aggregation,
model info."""

import json
import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from streamyolo_tpu.data.dbcode import (
    COCO_CLASSES,
    COCO_TO_AVHD,
    db_from_img_folder,
    pseudo_gt_from_detections,
)
from streamyolo_tpu.stream.collect_summary import collect_summary
from streamyolo_tpu.vis import (
    contrast_composite,
    draw_detections,
    html_all_sequences,
    html_gallery,
    make_video,
    split_anime_swing,
    vis_contrast,
    vis_det,
)


def _frames(tmp_path, seq="seq0", n=4):
    d = tmp_path / seq
    d.mkdir(parents=True, exist_ok=True)
    paths = []
    for i in range(n):
        img = np.full((48, 64, 3), 20 * i, np.uint8)
        p = str(d / f"f{i}.jpg")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def test_draw_and_vis_det(tmp_path):
    img = np.zeros((60, 80, 3), np.uint8)
    out = draw_detections(
        img, [[10, 10, 40, 40]], [2], ["a", "b", "car"], scores=[0.9]
    )
    assert out.shape == img.shape and out.sum() > 0
    f = str(tmp_path / "vis" / "d.jpg")
    vis_det(img, [[10, 10, 40, 40]], [2], ["a", "b", "car"], scores=[0.9], out_file=f)
    assert os.path.isfile(f)


def test_vis_contrast():
    a = np.zeros((40, 50, 3), np.uint8)
    b = np.ones((40, 50, 3), np.uint8)
    c = vis_contrast(a, b)
    assert c.shape == (40, 100, 3)


def test_contrast_composite_split_and_divider():
    a = np.zeros((40, 100, 3), np.uint8)
    b = np.full((40, 100, 3), 200, np.uint8)
    c = contrast_composite(a, b, split_pos=0.5, line_width=15)
    assert c.shape == a.shape
    # divider band: start = 50 - 7, end = 50 + 7 (exclusive), color BGR
    assert np.all(c[:, 43:57] == np.array([93, 159, 241], np.uint8))
    assert np.all(c[:, :43] == 0) and np.all(c[:, 57:] == 200)
    # pixel-valued split (>1) and horizontal split
    ch = contrast_composite(a, b, split_pos=10.0, horizontal=True,
                            line_width=3)
    assert np.all(ch[:9] == 0) and np.all(ch[12:] == 200)
    # split at/below 0 -> all B (reference vis_contrast.py:149-150)
    assert np.all(contrast_composite(a, b, split_pos=-5.0, line_width=1,
                                     split_in_pixels=True)[:, 1:] == 200)


def test_split_anime_swing_keyframes():
    # durations [4,1,3,2,3,1]: hold, sweep to far edge, hold, sweep to near
    # edge, hold, sweep home (reference vis_contrast.py:46-89)
    pos, length, lw = 50.0, 100, 15
    big_end = length + lw // 2
    small_end = -lw // 2 - 1
    assert split_anime_swing(0.0, pos, length, lw) == pos
    assert split_anime_swing(3.9, pos, length, lw) == pos
    mid = split_anime_swing(4.5, pos, length, lw)
    assert pos < mid < big_end and mid == pytest.approx((pos + big_end) / 2)
    assert split_anime_swing(6.0, pos, length, lw) == big_end
    assert split_anime_swing(9.0, pos, length, lw) == pytest.approx(
        (big_end + small_end) / 2)
    assert split_anime_swing(11.0, pos, length, lw) == small_end
    assert split_anime_swing(13.5, pos, length, lw) == pytest.approx(
        (small_end + pos) / 2)
    assert split_anime_swing(20.0, pos, length, lw) == pos


def test_make_video(tmp_path):
    paths = _frames(tmp_path)
    out = make_video(paths, str(tmp_path / "out.mp4"), fps=10, numbered=True)
    assert os.path.getsize(out) > 0


def test_html_galleries(tmp_path):
    _frames(tmp_path / "vis", "seq0")
    _frames(tmp_path / "vis", "seq1")
    g = html_gallery(
        [str(tmp_path / "vis" / "seq0" / "f0.jpg")], str(tmp_path / "g.html")
    )
    assert "<img" in open(g).read()
    h = html_all_sequences(str(tmp_path / "vis"), str(tmp_path / "all.html"), per_seq=2)
    assert open(h).read().count("<img") >= 4


def test_db_from_img_folder_and_pgt(tmp_path):
    _frames(tmp_path / "data", "seqA", 3)
    _frames(tmp_path / "data", "seqB", 2)
    db = db_from_img_folder(str(tmp_path / "data"), str(tmp_path / "db.json"))
    assert len(db["images"]) == 5
    assert db["sequences"] == ["seqA", "seqB"]
    assert db["images"][3] == dict(id=3, width=64, height=48, name="f0.jpg", sid=1, fid=0)

    dets = [
        dict(image_id=0, category_id=2, bbox=[1, 1, 10, 10], score=0.9),   # car
        dict(image_id=0, category_id=4, bbox=[1, 1, 10, 10], score=0.9),   # airplane: dropped
        dict(image_id=1, category_id=7, bbox=[2, 2, 8, 8], score=0.3),     # below th
    ]
    pgt = pseudo_gt_from_detections(db, dets, score_th=0.5, class_mapping=COCO_TO_AVHD)
    assert len(pgt["annotations"]) == 1
    assert pgt["annotations"][0]["category_id"] == COCO_TO_AVHD[2]  # car -> 2
    assert len(COCO_CLASSES) == 80


def test_collect_summary(tmp_path):
    d = tmp_path / "exp1"
    d.mkdir()
    with open(d / "eval_summary.pkl", "wb") as f:
        pickle.dump({"stats": np.linspace(0.1, 0.9, 12)}, f)
    with open(d / "time_info.pkl", "wb") as f:
        pickle.dump({"runtime_all": [0.02, 0.03], "n_processed": 2,
                     "n_total": 4, "n_small_runtime": 2}, f)
    rows = collect_summary([str(d)], str(tmp_path / "s.csv"))
    assert rows[0]["sAP"] == 10.0
    assert rows[0]["runtime_mean_ms"] == 25.0
    assert rows[0]["pct_realtime"] == 100.0
    assert os.path.isfile(tmp_path / "s.csv")


def test_model_info():
    import jax

    from streamyolo_tpu.exp import get_exp

    exp = get_exp(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "cfgs", "s_s50_onex_dfp_tal_flip.py"))
    model = exp.get_model()
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 96, 3), np.float32),
        mode="off_pipe", train=False,
    )
    from streamyolo_tpu.utils.model_info import count_params, get_model_info

    n = count_params(variables)
    assert 8_000_000 < n < 10_000_000  # StreamYOLO-s ~9M params
    info = get_model_info(model, variables, (64, 96))
    assert info.startswith("Params: ") and "Gflops" in info


def test_multihost_helpers_single_process():
    from streamyolo_tpu.parallel import (
        all_gather_objects,
        get_rank,
        get_world_size,
        is_main_process,
        psum_stats,
        synchronize,
    )

    assert get_rank() == 0 and get_world_size() == 1 and is_main_process()
    synchronize()  # no-op
    assert all_gather_objects({"a": [1, 2]}) == [{"a": [1, 2]}]
    np.testing.assert_array_equal(psum_stats(np.array([1.0, 2.0])), [1.0, 2.0])


def test_aot_compile_roundtrip():
    import jax.numpy as jnp

    from streamyolo_tpu.utils.aot import aot_compile

    compiled, secs = aot_compile(lambda x: x * 2 + 1, np.ones((4,), np.float32))
    np.testing.assert_allclose(np.asarray(compiled(np.ones(4, np.float32))), 3.0)
    assert secs >= 0


def test_bbox_conversions():
    from streamyolo_tpu.stream.bbox import (
        bbox_sqrt_area,
        cxywh2ltrb,
        ltrb2cxywh,
        ltrb2ltwh,
        ltwh2ltrb,
        ltwh2ltrb_,
    )

    ltwh = np.array([[10.0, 20.0, 30.0, 40.0]])
    ltrb = ltwh2ltrb(ltwh)
    np.testing.assert_allclose(ltrb, [[10, 20, 40, 60]])
    np.testing.assert_allclose(ltrb2ltwh(ltrb), ltwh)
    np.testing.assert_allclose(cxywh2ltrb([[25.0, 40.0, 30.0, 40.0]]), [[10, 20, 40, 60]])
    np.testing.assert_allclose(ltrb2cxywh(ltrb), [[25, 40, 30, 40]])
    np.testing.assert_allclose(bbox_sqrt_area(ltwh), [np.sqrt(1200.0)])
    # in-place variant mutates
    arr = ltwh.copy()
    ltwh2ltrb_(arr)
    np.testing.assert_allclose(arr, ltrb)


def test_vis_results_cli(fake_argoverse, tmp_path, monkeypatch):
    import pickle
    import sys as _sys

    _sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    import importlib

    vis_mod = importlib.import_module("vis_results")

    # one detection on image 1
    ccf = [dict(image_id=1, category_id=2, bbox=[10.0, 20.0, 10.0, 8.0], score=0.9)]
    res_path = tmp_path / "results_ccf.pkl"
    with open(res_path, "wb") as f:
        pickle.dump(ccf, f)
    out_dir = tmp_path / "vis"
    monkeypatch.setattr(
        _sys, "argv",
        ["vis_results.py",
         "--data-root", os.path.join(fake_argoverse, "Argoverse-1.1", "tracking"),
         "--annot-path", os.path.join(fake_argoverse, "Argoverse-HD/annotations/val.json"),
         "--results", str(res_path), "--out-dir", str(out_dir),
         "--video", "--html"],
    )
    vis_mod.main()
    assert os.path.isfile(out_dir / "seq0" / "f1.jpg")
    assert os.path.isfile(out_dir / "seq0.mp4")
    assert os.path.isfile(out_dir / "index.html")


def test_vis_results_cli_contrast(fake_argoverse, tmp_path, monkeypatch):
    """--contrast: two experiments' pkls -> split-screen frames with each
    pane carrying its own detections (reference sAP/vis/vis_contrast.py)."""
    import pickle
    import sys as _sys

    _sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    import importlib

    vis_mod = importlib.import_module("vis_results")

    ccf_a = [dict(image_id=1, category_id=2, bbox=[5.0, 20.0, 10.0, 8.0], score=0.9)]
    ccf_b = [dict(image_id=1, category_id=3, bbox=[40.0, 20.0, 10.0, 8.0], score=0.8)]
    path_a, path_b = tmp_path / "a.pkl", tmp_path / "b.pkl"
    for p, ccf in ((path_a, ccf_a), (path_b, ccf_b)):
        with open(p, "wb") as f:
            pickle.dump(ccf, f)
    out_dir = tmp_path / "vis_contrast"
    monkeypatch.setattr(
        _sys, "argv",
        ["vis_results.py",
         "--data-root", os.path.join(fake_argoverse, "Argoverse-1.1", "tracking"),
         "--annot-path", os.path.join(fake_argoverse, "Argoverse-HD/annotations/val.json"),
         "--results", str(path_a), "--out-dir", str(out_dir),
         "--contrast", str(path_b), "--split-animation", "swing",
         "--score-th", "0.1", "--html"],
    )
    vis_mod.main()
    frame = cv2.imread(str(out_dir / "seq0" / "f1.jpg"))
    assert frame is not None
    # the divider band must be present (f1 has fid 1 -> t≈0.03 s, split 0.5)
    w = frame.shape[1]
    band = frame[:, w // 2 - 3 : w // 2 + 3].reshape(-1, 3).astype(int)
    assert (np.abs(band - [93, 159, 241]).max(axis=1) < 30).mean() > 0.9
    assert os.path.isfile(out_dir / "index.html")
