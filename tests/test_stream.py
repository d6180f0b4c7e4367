"""Streaming harness tests: fake-clock protocol simulation, sAP pairing
math, runtime distributions, and the exact-arithmetic schedule simulator —
all CPU-deterministic (the testability pattern SURVEY.md §4.3 calls for)."""

import os
import pickle
from fractions import Fraction

import numpy as np
import pytest

pytest.importorskip("cv2")

from streamyolo_tpu.data.coco import COCO
from streamyolo_tpu.stream import (
    Empirical,
    SimClock,
    SimulatedDetector,
    add_to_runtime_zoo,
    dist_from_zoo,
    pair_streaming_results,
    eval_ccf,
    sim,
    stream_sequence,
)
from streamyolo_tpu.stream.schedule_sim import (
    p_idle_free,
    p_idle_next,
    p_shrinking_tail,
)

FPS = 30.0


def _db(fake_argoverse):
    return COCO(os.path.join(fake_argoverse, "Argoverse-HD/annotations/val.json"))


def _gt_oracle(db, sid):
    offset = min(i["id"] for i in db.dataset["images"] if i["sid"] == sid)

    def gt(fidx):
        anns = db.img_to_anns[offset + fidx]
        boxes = [
            [a["bbox"][0], a["bbox"][1], a["bbox"][0] + a["bbox"][2], a["bbox"][1] + a["bbox"][3]]
            for a in anns
        ]
        labels = [a["category_id"] for a in anns]
        return boxes, labels

    return gt


def _run_sim(db, runtime_s):
    """Streaming run over both sequences with a constant simulated runtime."""
    results = {}
    for sid, seq in enumerate(db.dataset["sequences"]):
        n = sum(1 for i in db.dataset["images"] if i["sid"] == sid)
        det = SimulatedDetector(_gt_oracle(db, sid), None)
        results[seq] = stream_sequence(
            list(range(n)),
            det,
            fps=FPS,
            clock=SimClock(),
            runtime_dist=Empirical([runtime_s], seed=0),
            frame_arg_is_index=True,
        )
    return results


def test_stream_protocol_one_period_runtime(fake_argoverse):
    db = _db(fake_argoverse)
    results = _run_sim(db, runtime_s=1.0 / FPS)
    # seq0 (4 frames): outputs for fidx 0,1,2 at t=1/30,2/30,3/30 (the
    # 4th finishes exactly at the horizon and is dropped).
    r0 = results["seq0"]
    assert r0["input_fidx"] == [0, 1, 2]
    np.testing.assert_allclose(r0["timestamps"], [1 / 30, 2 / 30, 3 / 30], atol=1e-9)

    ccf, assoc = pair_streaming_results(db, results, fps=FPS, eta=0)
    # first frame of each sequence has no output yet -> 2 misses;
    # every other frame pairs with the previous frame's detection.
    assert assoc == {"miss": 2, "in_time": 0, "mismatch": 5}

    summary = eval_ccf(db, ccf)
    # lag-1 boxes: IoU vs drifted gt = 8/12 -> TP at 0.5, FN at 0.75;
    # recall 5/7 -> AP50 = 72/101.
    assert summary["stats"][1] == pytest.approx(72 / 101, abs=1e-9)
    assert summary["stats"][2] == pytest.approx(0.0, abs=1e-9)


def test_stream_future_prediction_recovers_sap(fake_argoverse):
    """The core StreamYOLO thesis, reproduced by the harness: at eta=0 even a
    near-instant detector pairs each gt frame with the PREVIOUS frame's
    output (its result lands strictly after the frame's own query time), so a
    current-frame oracle is permanently one frame stale — while an oracle
    that predicts the NEXT frame's boxes scores perfect sAP75."""
    db = _db(fake_argoverse)

    def run(shift):
        results = {}
        for sid, seq in enumerate(db.dataset["sequences"]):
            n = sum(1 for i in db.dataset["images"] if i["sid"] == sid)
            gt = _gt_oracle(db, sid)
            det = SimulatedDetector(lambda f, gt=gt, n=n: gt(min(f + shift, n - 1)), None)
            results[seq] = stream_sequence(
                list(range(n)), det, fps=FPS, clock=SimClock(),
                runtime_dist=Empirical([1e-4], seed=0), frame_arg_is_index=True,
            )
        return pair_streaming_results(db, results, fps=FPS, eta=0)

    ccf_cur, assoc_cur = run(shift=0)
    # even near-zero latency: output for frame ii lands at ii/30 + eps,
    # after ii's query time -> one-frame stale everywhere
    assert assoc_cur == {"miss": 2, "in_time": 0, "mismatch": 5}
    cur = eval_ccf(db, ccf_cur)
    assert cur["stats"][2] == pytest.approx(0.0, abs=1e-9)  # lag-1 IoU 8/12 < 0.75

    ccf_fut, _ = run(shift=1)  # StreamYOLO-style next-frame prediction
    fut = eval_ccf(db, ccf_fut)
    assert fut["stats"][1] == pytest.approx(72 / 101, abs=1e-9)
    assert fut["stats"][2] == pytest.approx(72 / 101, abs=1e-9)  # exact boxes


def test_detections_for_image_matches_filter(fake_argoverse):
    """detections_for_image (the result_from_ccf role): the sequential scan
    over an image_id-sorted ccf list returns exactly the full-filter answer,
    and sweeping the db via next_start_idx visits every row once."""
    from streamyolo_tpu.stream import detections_for_image

    db = _db(fake_argoverse)
    ccf, _ = pair_streaming_results(db, _run_sim(db, 1.0 / FPS), fps=FPS, eta=0)
    assert len(ccf) > 0
    idx = 0
    seen = 0
    for img in db.dataset["images"]:
        nxt, bb, sc, lb = detections_for_image(ccf, img["id"], start_idx=idx)
        _, bb_f, sc_f, lb_f = detections_for_image(ccf, img["id"])
        np.testing.assert_array_equal(bb, bb_f)
        np.testing.assert_array_equal(sc, sc_f)
        np.testing.assert_array_equal(lb, lb_f)
        assert bb.shape == (len(sc), 4)
        seen += len(sc)
        idx = nxt
    assert seen == len(ccf)


def test_stream_slow_detector_accumulates_mismatch(fake_argoverse):
    db = _db(fake_argoverse)
    results = _run_sim(db, runtime_s=2.0 / FPS)  # 2 periods per inference
    _, assoc = pair_streaming_results(db, results, fps=FPS, eta=0)
    fast = pair_streaming_results(db, _run_sim(db, 1.0 / FPS), fps=FPS, eta=0)[1]
    assert assoc["mismatch"] > fast["mismatch"]
    assert assoc["miss"] >= fast["miss"]


def test_empirical_distribution():
    d = Empirical([0.01, 0.02, 0.03], perf_factor=2.0, seed=0)
    assert d.mean() == pytest.approx(0.01)  # halved by perf_factor
    assert d.draw_sequential() == pytest.approx(0.005)
    assert d.draw_sequential() == pytest.approx(0.01)
    assert d.draw_sequential() == pytest.approx(0.015)
    assert d.draw_sequential() == pytest.approx(0.005)  # wraps
    assert d.min() <= d.draw() <= d.max()


def test_runtime_zoo_roundtrip(tmp_path):
    time_info = {"runtime_all": [0.03, 0.04, 0.05]}
    ti_path = tmp_path / "time_info.pkl"
    with open(ti_path, "wb") as f:
        pickle.dump(time_info, f)
    zoo_path = tmp_path / "zoo.pkl"
    add_to_runtime_zoo(str(ti_path), str(zoo_path), "tpu_v5e_l")
    d = dist_from_zoo(str(zoo_path), "tpu_v5e_l")
    assert d.mean() == pytest.approx(0.04)


def test_schedule_sim_exact():
    # hand-traced: r=2 frame-periods, T=4, eta=0, idle-free -> the only
    # reported mismatch is at t=3 (result from frame 0): 3.
    assert sim(p_idle_free, Fraction(2), 4, 0) == 3
    # r = 1/2: the detector always finishes within the period; every policy
    # produces the same (minimal) mismatch
    assert sim(p_idle_free, Fraction(1, 2), 13, 0) == sim(
        p_idle_next, Fraction(1, 2), 13, 0
    )
    # the paper's headline: for fractional runtimes, shrinking-tail never
    # does worse than either naive policy (exact rational comparison)
    for r in (Fraction(3, 2), Fraction(5, 4), Fraction(7, 3)):
        st = sim(p_shrinking_tail, r, 13, 0)
        assert st <= sim(p_idle_free, r, 13, 0)
        assert st <= sim(p_idle_next, r, 13, 0)


def test_run_streaming_detection_and_eval_files(fake_argoverse, tmp_path):
    """Whole-dataset simulated run -> per-seq pkls + time_info.pkl ->
    streaming_eval reads them back and produces the sAP summary files."""
    from streamyolo_tpu.stream import (
        run_streaming_detection,
        streaming_eval,
    )

    db = _db(fake_argoverse)

    class GtDetector:
        """Reads the (already loaded) frame index via closure state: emits
        the gt of whatever frame it is given (frames are BGR arrays here, so
        track the call order per sequence via reset())."""

        def __init__(self):
            self.sid = -1

        def reset(self):
            self.sid += 1
            self.fidx = 0
            self.gt = _gt_oracle(db, self.sid)

        def __call__(self, frame):
            boxes, labels = self.gt(self.fidx)
            self.fidx += 1
            return (np.asarray(boxes, float), np.ones(len(boxes)),
                    np.asarray(labels, np.int32), None)

    det = GtDetector()
    out_dir = str(tmp_path / "run")
    from streamyolo_tpu.stream import Empirical, SimClock

    time_info = run_streaming_detection(
        db, os.path.join(fake_argoverse, "Argoverse-1.1", "tracking"), out_dir,
        det, fps=FPS, clock=SimClock(),
        runtime_dist=Empirical([1.0 / FPS], seed=0), overwrite=True,
    )
    assert os.path.isfile(os.path.join(out_dir, "seq0.pkl"))
    assert os.path.isfile(os.path.join(out_dir, "time_info.pkl"))
    assert time_info["n_total"] == 7
    assert time_info["n_small_runtime"] == 0  # exactly one period, not under

    summary, assoc = streaming_eval(db, out_dir, fps=FPS, eta=0, overwrite=True)
    assert os.path.isfile(os.path.join(out_dir, "eval_summary.pkl"))
    assert os.path.isfile(os.path.join(out_dir, "eval_assoc.pkl"))
    assert assoc["miss"] == 2
    # detector consumed frames in order 0,1,2 per sequence under the 1-period
    # runtime -> same protocol as test_stream_protocol_one_period_runtime
    assert summary["stats"][1] == pytest.approx(72 / 101, abs=1e-9)


def test_det_stride_skips_frames(fake_argoverse):
    """det_stride=2: only every other grabbed frame is processed."""
    db = _db(fake_argoverse)
    n = 4  # seq0
    det = SimulatedDetector(_gt_oracle(db, 0), None)
    out = stream_sequence(
        list(range(n)), det, fps=FPS, clock=SimClock(),
        runtime_dist=Empirical([0.2 / FPS], seed=0),
        det_stride=2, frame_arg_is_index=True,
    )
    fidx = out["input_fidx"]
    assert len(fidx) >= 2
    assert all(b - a >= 2 for a, b in zip(fidx, fidx[1:]))


def test_dynamic_schedule_never_starts_late(fake_argoverse):
    """dynamic-schedule: a detection never starts more than half a frame
    period after its input frame arrived (`streamyolo_det.py:165-174`)."""
    db = _db(fake_argoverse)
    n = 30
    det = SimulatedDetector(lambda f: ([[0, 0, 10, 10]], [2]), None)
    out = stream_sequence(
        list(range(n)), det, fps=FPS, clock=SimClock(),
        runtime_dist=Empirical([1.6 / FPS], seed=0),
        dynamic_schedule=True, frame_arg_is_index=True,
    )
    assert len(out["input_fidx"]) >= 5
    for ts, rt, fidx in zip(out["timestamps"], out["runtime"], out["input_fidx"]):
        start_lateness = (ts - rt) * FPS - fidx
        assert start_lateness <= 0.5 + 1e-6

    # without dynamic scheduling the same loop DOES start late sometimes
    det2 = SimulatedDetector(lambda f: ([[0, 0, 10, 10]], [2]), None)
    out2 = stream_sequence(
        list(range(n)), det2, fps=FPS, clock=SimClock(),
        runtime_dist=Empirical([1.6 / FPS], seed=0),
        dynamic_schedule=False, frame_arg_is_index=True,
    )
    lateness = [
        (ts - rt) * FPS - fidx
        for ts, rt, fidx in zip(out2["timestamps"], out2["runtime"], out2["input_fidx"])
    ]
    assert max(lateness) > 0.5
